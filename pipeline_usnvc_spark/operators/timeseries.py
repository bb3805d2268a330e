"""Time-series densification: bucketed rollup over a dense time spine
with forward fill.

The hypertable-rollup shape: raw events aggregate into fixed buckets,
but downstream consumers (dashboards, models, window features) need
EVERY bucket present — silent gaps read as "no data" when they mean
"no events". The spine is generated per key from the observed global
bounds (sequence + explode: a few rows per key, never a shuffle of
the fact table), the rollup left-joins onto it, and carried-forward
values come from an ignore-nulls last() window.

At 100 TB the spine cardinality is |keys| × |buckets| — independent
of event volume — and the single shuffle is the rollup groupBy; the
spine join is broadcast-able whenever keys × buckets stays small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hourly_gap_fill(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """(key, hour, n_events, total_value, ffill_total) on a dense
    hourly spine: n_events is 0 in gap hours, total_value stays null
    there, and ffill_total carries the last observed total forward."""
    hourly = events.groupBy(
        F.col(key_col), F.date_trunc("hour", F.col(ts_col)).alias("hour")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("tv"),
    )
    bounds = hourly.agg(F.min("hour").alias("mn"), F.max("hour").alias("mx"))
    keys = events.select(key_col).distinct()
    spine = keys.crossJoin(F.broadcast(bounds)).select(
        key_col,
        F.explode(
            F.sequence(F.col("mn"), F.col("mx"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, [key_col, "hour"], "left")
        .select(
            key_col,
            "hour",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
            F.col("tv").alias("total_value"),
            F.last("tv", ignorenulls=True).over(w).alias("ffill_total"),
        )
    )

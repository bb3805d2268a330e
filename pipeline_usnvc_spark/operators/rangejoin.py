"""Range join via bucket expansion.

Spark has no native range join: an inequality-only join plans as a
nested-loop (quadratic). The scalable rewrite buckets the range
dimension: each interval row expands into the buckets it covers, the
point side maps to its single bucket, and the join becomes an
equi-join on (key, bucket) followed by the exact interval filter.
Shuffle volume is O(rows x interval/bucket_width) instead of O(n*m)
comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str,
    interval_start: str,
    interval_days: int,
    bucket_days: int = 7,
) -> DataFrame:
    """Join each point to every interval of the same ``key`` whose
    [start, start + interval_days) window contains the point.

    Both sides bucket timestamps to ``bucket_days``-sized cells; an
    interval covers ceil(interval_days / bucket_days) + 1 cells.
    """
    n_buckets = interval_days // bucket_days + 2
    p = points.withColumn(
        "_bucket", F.floor(F.unix_date(F.col(point_ts).cast("date")) / bucket_days)
    )
    i = intervals.withColumn(
        "_b0", F.floor(F.unix_date(F.col(interval_start).cast("date")) / bucket_days)
    ).withColumn(
        "_bucket", F.explode(F.sequence(F.col("_b0"), F.col("_b0") + F.lit(n_buckets - 1)))
    )
    joined = p.join(i, [key, "_bucket"])
    in_range = (F.col(point_ts) >= F.col(interval_start)) & (
        F.col(point_ts) < F.col(interval_start) + F.expr(f"INTERVAL {interval_days} DAYS")
    )
    return joined.filter(in_range).drop("_bucket", "_b0")

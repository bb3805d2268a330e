"""2-D skyline (Pareto frontier) as a distributed single pass.

A row is on the minimize-(x, y) skyline iff no other row has x' <= x
and y' <= y with at least one strict. The naive formulation is an
O(n^2) theta anti-join (the DuckDB oracle does exactly that — fine at
sf0.01, never at 100 TB). The scalable exact algorithm for 2-D relies
on the classic sweep: after deduplicating to distinct (x, y) points
and ordering lexicographically by (x asc, y asc), a point is dominated
iff ANY lexicographic predecessor has y' <= y.

Proof sketch: a predecessor has x' < x (dominates if y' <= y), or
x' == x and y' < y (dominates). Conversely a dominator (x' <= x,
y' <= y, one strict) over *distinct* points is always a lexicographic
predecessor. So: skyline = points where running-min(y) over the
strict lexicographic prefix is > y (or no prefix).

Distribution uses the same two-phase trick as ``operators/rank.py``:
range-partition on (x, y), a parallel per-partition running min, and a
(#partitions)-row prefix-min correction broadcast back — one range
shuffle total, no single-task sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipeline_usnvc_spark.operators.checkpoint import materialize


def skyline_2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """Distinct (x, y) points on the minimize-(x, y) Pareto frontier."""
    pts = df.select(x, y).distinct()
    # materialized once: the sweep and the carry table both consume it,
    # and repartitionByRange re-samples its child per execution
    ranged = materialize(
        pts.repartitionByRange(F.col(x), F.col(y)).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(x, y)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn("_prev_min", F.min(y).over(w))
    # prefix min of y across all PRECEDING ranges (tiny side table)
    carry = (
        ranged.groupBy("_pid")
        .agg(F.min(y).alias("_pmin"))
        .withColumn(
            "_carry",
            F.min("_pmin").over(
                Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .select("_pid", "_carry")
    )
    best_before = F.least(
        F.coalesce(F.col("_prev_min"), F.col("_carry")),
        F.coalesce(F.col("_carry"), F.col("_prev_min")),
    )
    return (
        local.join(F.broadcast(carry), "_pid")
        .filter(best_before.isNull() | (best_before > F.col(y)))
        .select(x, y)
    )

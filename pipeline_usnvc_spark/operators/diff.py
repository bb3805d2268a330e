"""Table reconciliation: row-level diff between two versions of a
keyed table.

The audit primitive for a 100 TB pipeline rerun: given yesterday's
and today's snapshot, report every key as added / removed / changed
(unchanged rows are dropped — at scale the diff output is tiny next
to the inputs). One full outer join on the key, null-safe column
comparison for change detection; no hashing needed, so any column
type Spark can compare participates directly and there are no
collision caveats. The join shuffles both sides on the key — at
scale, write both snapshots bucketed by the key and the shuffle
disappears entirely.

Reference parity note: the reference pipeline rebuilds every document
each run (usnvc.py:241-242 "takes quite a while"); diffing two runs
is the capability its change ledger approximates. SURVEY §2.1 S6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(key..., change) with change ∈ added | removed | changed.

    ``compare_cols`` defaults to every shared non-key column. Rows
    equal under null-safe comparison (null == null) are omitted.
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]

    o = old.select(
        *[F.col(c).alias(f"k_{c}") for c in key_cols],
        *[F.col(c).alias(f"o_{c}") for c in compare_cols],
        F.lit(True).alias("in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"nk_{c}") for c in key_cols],
        *[F.col(c).alias(f"n_{c}") for c in compare_cols],
        F.lit(True).alias("in_new"),
    )
    cond = None
    for c in key_cols:
        eq = F.col(f"k_{c}").eqNullSafe(F.col(f"nk_{c}"))
        cond = eq if cond is None else cond & eq
    joined = o.join(n, cond, "full_outer")

    # No compare columns (key-only membership diff) ⇒ rows present on
    # both sides are never "changed": seed with literal True so the
    # ~same below is well-formed instead of ~None (TypeError).
    same = F.lit(True)
    for c in compare_cols:
        eq = F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}"))
        same = same & eq

    change = (
        F.when(F.col("in_old").isNull(), F.lit("added"))
        .when(F.col("in_new").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    keys = [
        F.coalesce(F.col(f"k_{c}"), F.col(f"nk_{c}")).alias(c) for c in key_cols
    ]
    return (
        joined.select(*keys, change.alias("change"))
        .filter(F.col("change").isNotNull())
    )

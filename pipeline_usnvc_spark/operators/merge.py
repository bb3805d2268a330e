"""MERGE-less upsert: the Delta/Iceberg MERGE INTO contract on plain
DataFrames.

    merged = anti-join(target, source keys)  UNION  source

Matched keys take the source row entirely (whole-row UPDATE), new
keys INSERT, unmatched target rows carry over — the semantics of

    MERGE INTO t USING s ON t.k = s.k
    WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED THEN INSERT *

One shuffle per side on the key; at scale, write the target bucketed
by the key and only the (small) source side shuffles. Pairs with
operators/diff.table_diff (the read-side audit of the same rerun) and
cdc_queries.q90 (the history-keeping variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_upsert(target: DataFrame, source: DataFrame, key_cols: list[str]) -> DataFrame:
    """Whole-row upsert of ``source`` into ``target`` on ``key_cols``.

    Columns must match (unionByName). Source must be unique per key —
    the caller's contract, as with MERGE INTO.
    """
    keep = target.join(source.select(*key_cols), key_cols, "left_anti")
    return keep.unionByName(source.select(*target.columns))

"""Frequency sketches: Misra-Gries heavy hitters.

A bounded-memory, mergeable frequent-items summary. At 100 TB an
exact token-frequency groupBy shuffles one record per distinct token
occurrence (billions of distinct keys); the sketch path instead keeps
at most ``k`` counters per partition (one Arrow-batched pass, no
intermediate state larger than k rows per task), ships only ``k``
rows per partition into a tiny final aggregation, and still carries a
hard guarantee: every item with true frequency > n/(k+1) survives,
with estimate in [true - n/(k+1), true].

Merging is the Agarwal et al. "Mergeable Summaries" MG merge: add
counters, then subtract the (k+1)-th largest count from all and drop
non-positives. Per-batch exact value_counts are themselves error-free
MG summaries, so folding batches through the same merge keeps the
per-partition error budget <= (sum of subtracted offsets) and the
global undercount <= n/(k+1) after the final sum-by-token.

Reference scope note: the reference pipeline has no sketching surface
(SURVEY.md §2.4 — counting and list-nesting only); this is part of the
LLM-training-data extension set alongside MinHash/SimHash/HLL.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_compress(counters: dict[str, int], k: int) -> dict[str, int]:
    if len(counters) <= k:
        return counters
    # (k+1)-th largest count is the offset to subtract (MG merge step).
    offset = sorted(counters.values(), reverse=True)[k]
    return {t: c - offset for t, c in counters.items() if c > offset}


def misra_gries_heavy_hitters(
    df: DataFrame, col: str, k: int = 256, top_n: int = 20
) -> DataFrame:
    """Top ``top_n`` candidate heavy hitters of string column ``col``.

    Returns (token, est_count) with est_count a lower bound on the
    true count, undercounting by at most n/(k+1). Deterministic for a
    fixed input layout (MG depends on encounter order within a
    partition, which is fixed for a given parquet file set).
    """

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for tok, c in pdf[col].value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(c)
            counters = _mg_compress(counters, k)
        yield pd.DataFrame(
            {col: list(counters.keys()), "cnt": list(counters.values())},
            columns=[col, "cnt"],
        )

    partials = df.select(F.col(col).cast("string").alias(col)).filter(
        F.col(col).isNotNull()
    ).mapInPandas(mg_partition, schema=f"{col} string, cnt long")
    return (
        partials.groupBy(col)
        .agg(F.sum("cnt").alias("est_count"))
        .orderBy(F.desc("est_count"), F.asc(col))
        .limit(top_n)
    )

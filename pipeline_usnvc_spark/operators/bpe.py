"""Byte-pair-encoding merge training — corpus-scale tokenizer learning.

Classic BPE (Sennrich et al. 2016) trains on the *word-frequency
table*, not the raw corpus: by Heaps' law the distinct-word table is
orders of magnitude smaller than a 100 TB corpus, so after one
corpus-wide word count every merge round runs on a vocabulary-sized
DataFrame. Each round is fully set-based:

1. adjacent symbol pairs explode map-side from the per-word symbol
   arrays, weighted by word count — one exchange on the pair key;
2. the argmax pair is a 1-row ``orderBy().limit(1)`` collect (the
   only driver traffic: one row per round);
3. the merge applies as a native ``F.aggregate`` left fold over each
   symbol array (greedy leftmost non-overlapping, the standard BPE
   application order) — no UDF, no Python in the hot path.

Per-round ``materialize()`` keeps the lineage flat (five rounds of
nested higher-order lambdas would otherwise stack in one codegen
stage) and avoids re-counting words each round.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from pipeline_usnvc_spark.functions.text import tokens
from pipeline_usnvc_spark.operators.checkpoint import materialize

MERGE_SCHEMA = StructType(
    [
        StructField("merge_round", LongType(), False),
        StructField("left", StringType(), False),
        StructField("right", StringType(), False),
        StructField("merged", StringType(), False),
        StructField("pair_count", LongType(), False),
    ]
)

# Adjacent-pair separator: tokens are alphanumeric, so NUL can never
# occur inside a symbol and the (left, right) split-back is unambiguous.
_SEP = "\x00"


def word_symbol_table(
    docs: DataFrame, text_col: str = "text", keep_word: bool = False
) -> DataFrame:
    """(syms: array<string>, cnt) — the word-frequency table with each
    distinct word exploded into single-character symbols.
    ``keep_word`` carries the word itself through (q219's encode path
    reads the trained state back at word grain)."""
    words = (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    chars = F.filter(F.split("word", "(?!^)"), lambda s: s != F.lit(""))
    cols = (["word"] if keep_word else []) + [chars.alias("syms"), "cnt"]
    return words.select(*cols)


def adjacent_pair_counts(syms_df: DataFrame) -> DataFrame:
    """(pair, n) — corpus-weighted adjacent symbol-pair frequencies."""
    length = F.greatest(F.size("syms") - F.lit(1), F.lit(0))
    pairs = F.zip_with(
        F.slice("syms", 1, length),
        F.slice("syms", 2, length),
        lambda a, b: F.concat_ws(_SEP, a, b),
    )
    return (
        syms_df.select(F.explode(pairs).alias("pair"), "cnt")
        .groupBy("pair")
        .agg(F.sum("cnt").cast("bigint").alias("n"))
    )


def merge_pair(syms: Column, left: str, right: str) -> Column:
    """Greedy leftmost non-overlapping merge of (left, right) →
    left+right inside a symbol array, as a native fold.

    Accumulator: (out, carry) — ``carry`` holds the previous symbol
    not yet committed; seeing (carry==left, s==right) commits the
    merged symbol and clears the carry, so an overlapping run like
    ``a a a`` with pair (a, a) yields ``[aa, a]`` exactly like
    reference BPE implementations.
    """
    merged_lit = F.lit(left + right)
    empty = F.array().cast("array<string>")

    def step(acc: Column, s: Column) -> Column:
        hit = (
            acc["carry"].isNotNull()
            & (acc["carry"] == F.lit(left))
            & (s == F.lit(right))
        )
        flushed = F.when(
            acc["carry"].isNotNull(), F.concat(acc["out"], F.array(acc["carry"]))
        ).otherwise(acc["out"])
        return F.when(
            hit,
            F.struct(
                F.concat(acc["out"], F.array(merged_lit)).alias("out"),
                F.lit(None).cast("string").alias("carry"),
            ),
        ).otherwise(F.struct(flushed.alias("out"), s.alias("carry")))

    def finish(acc: Column) -> Column:
        return F.when(
            acc["carry"].isNotNull(), F.concat(acc["out"], F.array(acc["carry"]))
        ).otherwise(acc["out"])

    init = F.struct(
        empty.alias("out"), F.lit(None).cast("string").alias("carry")
    )
    return F.aggregate(syms, init, step, finish)


# The default support floor for a merge; q171's in-plan contract
# imports this so trainer and contract can never drift apart.
MIN_PAIR_COUNT_DEFAULT = 2


def train_bpe(
    docs: DataFrame,
    n_merges: int = 5,
    text_col: str = "text",
    min_pair_count: int = MIN_PAIR_COUNT_DEFAULT,
    return_state: bool = False,
):
    """Learn the top-``n_merges`` BPE merges; returns the merge table
    (merge_round, left, right, merged, pair_count) in training order —
    or, with ``return_state``, the tuple (merge table, final
    word-grain symbol state): training already folds every merge into
    the vocabulary, so the final state IS the corpus encoding and the
    encode path (q219) must not pay the five folds twice.

    Driver traffic is exactly one row per round; all heavy lifting is
    the pair-count exchange over the vocabulary table.
    """
    spark: SparkSession = docs.sparkSession
    # NON-eager checkpoints (r14, guide §7 driver-side cost): BPE is
    # inherently sequential (each round's argmax depends on the last
    # merge), so eager materialization ran TWO driver-blocking jobs
    # per round (checkpoint, then top-1 collect) — profiled 2.9 s of
    # between-job gaps vs 1.5 s inside jobs at sf0.1. The lazy
    # checkpoint folds them: the next round's top-1 collect computes
    # THROUGH the pending checkpoint (TakeOrdered touches every
    # partition, so the state is fully persisted by that one job) and
    # every later consumer reads the persisted blocks. Consumers are
    # strictly sequential here, so the duplicated-concurrent-compute
    # hazard that made the lazy variant slower on the q349 spine
    # cannot occur.
    syms_df = materialize(
        word_symbol_table(docs, text_col, keep_word=return_state), eager=False
    )
    merges: list[tuple] = []
    for r in range(1, n_merges + 1):
        # bounded: top-1 pair slice per merge round
        best = (
            adjacent_pair_counts(syms_df)
            .orderBy(F.desc("n"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_pair_count:
            break
        pair, n = best[0]["pair"], int(best[0]["n"])
        left, right = pair.split(_SEP, 1)
        merges.append((r, left, right, left + right, n))
        syms_df = materialize(
            syms_df.select(
                *(["word"] if return_state else []),
                merge_pair(F.col("syms"), left, right).alias("syms"),
                "cnt",
            ),
            eager=False,
        )
    merge_df = spark.createDataFrame(merges, MERGE_SCHEMA)
    if return_state:
        # The final state leaves this function with its checkpoint
        # still pending and MULTIPLE downstream consumers (q219's
        # totals agg + top-k) — force it now so concurrent consumers
        # read persisted blocks instead of racing to compute the last
        # fold twice. Intermediate rounds stay lazy: their single
        # sequential consumer (the next argmax) is the materializer.
        syms_df.count()
    return (merge_df, syms_df) if return_state else merge_df

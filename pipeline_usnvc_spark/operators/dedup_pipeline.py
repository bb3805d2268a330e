"""End-to-end corpus deduplication: the full dedup stack composed
into one auditable pipeline.

    exact stage   fingerprint groupBy → keep min id per group
    near stage    (on exact survivors) shingle inverted index →
                  Jaccard-verified pairs → connected components →
                  keep min id per component

Output is a per-document verdict (kept / exact_dup / near_dup) so a
100 TB run produces both the cleaned corpus (filter kept) and the
removal audit trail in one pass. Every stage is the deterministic,
engine-portable formulation used by q50/q54/q55, so the whole
pipeline has an exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipeline_usnvc_spark.functions.text import doc_fingerprint
from pipeline_usnvc_spark.operators.checkpoint import materialize
from pipeline_usnvc_spark.operators.dedup import ngram_jaccard_pairs
from pipeline_usnvc_spark.operators.graph import connected_components


def dedup_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """(doc_id, verdict, survivor_id): verdict ∈ kept | exact_dup |
    near_dup; survivor_id = the document this one deduplicates to
    (itself when kept)."""
    fp = docs.select(F.col(id_col), doc_fingerprint(text_col).alias("fp"))
    keeper_per_fp = fp.groupBy("fp").agg(F.min(id_col).alias("exact_keeper"))
    # Materialized once: both the survivor filter (feeding the near
    # stage) and the final verdict consume this, and the fingerprint
    # is an md5 over the FULL text — the one map-side expression worth
    # never computing twice.
    exact = (
        fp.join(keeper_per_fp, "fp")
        .select(
            id_col,
            "exact_keeper",
            (F.col(id_col) == F.col("exact_keeper")).alias("is_exact_keeper"),
        )
        .transform(materialize)
    )

    survivors = docs.join(
        exact.filter("is_exact_keeper").select(id_col), id_col, "left_semi"
    )
    pairs = ngram_jaccard_pairs(survivors, id_col, text_col, threshold=jaccard_threshold)
    comp = connected_components(pairs.select("id_a", "id_b"), "id_a", "id_b")

    verdict = (
        exact.join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.when(~F.col("is_exact_keeper"), F.lit("exact_dup"))
            .when(F.col("component").isNotNull() & (F.col("component") != F.col(id_col)), F.lit("near_dup"))
            .otherwise(F.lit("kept"))
            .alias("verdict"),
            F.when(~F.col("is_exact_keeper"), F.col("exact_keeper"))
            .when(F.col("component").isNotNull(), F.col("component"))
            .otherwise(F.col(id_col))
            .alias("survivor_id"),
        )
    )
    return verdict

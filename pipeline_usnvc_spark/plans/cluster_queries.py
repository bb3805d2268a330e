"""Dedup clustering + tf-idf ranking — the last mile of a dedup
pipeline (pairs → clusters → keepers) and relevance scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pipeline_usnvc_spark.operators.dedup import ngram_jaccard_pairs
from pipeline_usnvc_spark.operators.graph import connected_components
from pipeline_usnvc_spark.plans.registry import query
from pipeline_usnvc_spark.sources.tables import load_table

from pipeline_usnvc_spark.functions.text import TOKENIZE_SQL as _TOKS_SQL

_SHINGLES_SQL = f"""
    SELECT doc_id, unnest(
        list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                       i -> toks[i] || '_' || toks[i+1] || '_' || toks[i+2])
    ) AS shingle
    FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
"""

_PAIRS_SQL = f"""
        WITH sh AS (SELECT DISTINCT doc_id, shingle FROM ({_SHINGLES_SQL})),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT id_a, id_b
        FROM inter JOIN sizes sa ON inter.id_a = sa.doc_id
                   JOIN sizes sb ON inter.id_b = sb.doc_id
        WHERE CAST(n_inter AS DOUBLE) / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) >= 0.5
"""


# ---------------------------------------------------------------------------
# q55 — near-dup clusters: verified pairs (Jaccard ≥ 0.5) → connected
# components (iterative HashMin) vs a recursive-CTE closure oracle.
# Output: every clustered doc with its component and the keeper flag.
# ---------------------------------------------------------------------------
@query(
    "q55_dup_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_PAIRS_SQL}),
    edges AS (
        SELECT id_a AS x, id_b AS y FROM pairs
        UNION
        SELECT id_b AS x, id_a AS y FROM pairs
    ),
    reach (x, y) AS (
        SELECT x, y FROM edges
        UNION
        SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
    )
    SELECT x AS doc_id,
           least(x, min(y)) AS component,
           CASE WHEN least(x, min(y)) = x THEN true ELSE false END AS is_keeper
    FROM reach GROUP BY x
    """,
)
def q55_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).select("id_a", "id_b")
    comp = connected_components(pairs, "id_a", "id_b")
    return comp.select(
        F.col("node").alias("doc_id"),
        "component",
        (F.col("component") == F.col("node")).alias("is_keeper"),
    )


# ---------------------------------------------------------------------------
# q56 — the full dedup pipeline verdict: exact stage (fingerprint
# keeper) then near stage (Jaccard components on exact survivors).
# survivor_id is the one-hop dedup target (exact keeper, or component
# min for near-dups, or self). Exact SQL oracle composes the same
# stages.
# ---------------------------------------------------------------------------
@query(
    "q56_dedup_pipeline",
    oracle=f"""
    WITH RECURSIVE fp AS (
        SELECT doc_id, md5(coalesce(array_to_string({_TOKS_SQL}, ' '), '')) AS fp FROM documents
    ),
    keeper AS (SELECT fp, min(doc_id) AS exact_keeper FROM fp GROUP BY fp),
    exact AS (
        SELECT fp.doc_id, k.exact_keeper, fp.doc_id = k.exact_keeper AS is_exact_keeper
        FROM fp JOIN keeper k ON fp.fp = k.fp
    ),
    survivors AS (SELECT doc_id FROM exact WHERE is_exact_keeper),
    sh AS (
        SELECT DISTINCT s.doc_id,
               CAST('0x' || substr(md5(t.shingle), 1, 15) AS BIGINT) AS shingle
        FROM ({_SHINGLES_SQL}) t JOIN survivors s ON t.doc_id = s.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
        SELECT id_a, id_b FROM inter
          JOIN sizes sa ON inter.id_a = sa.doc_id
          JOIN sizes sb ON inter.id_b = sb.doc_id
        WHERE CAST(n_inter AS DOUBLE) / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) >= 0.5
    ),
    edges AS (
        SELECT id_a AS x, id_b AS y FROM pairs UNION SELECT id_b, id_a FROM pairs
    ),
    reach (x, y) AS (
        SELECT x, y FROM edges
        UNION
        SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
    ),
    comp AS (SELECT x AS doc_id, least(x, min(y)) AS component FROM reach GROUP BY x)
    SELECT e.doc_id,
           CASE WHEN NOT e.is_exact_keeper THEN 'exact_dup'
                WHEN c.component IS NOT NULL AND c.component <> e.doc_id THEN 'near_dup'
                ELSE 'kept' END AS verdict,
           CASE WHEN NOT e.is_exact_keeper THEN e.exact_keeper
                WHEN c.component IS NOT NULL THEN c.component
                ELSE e.doc_id END AS survivor_id
    FROM exact e LEFT JOIN comp c ON e.doc_id = c.doc_id
    """,
)
def q56_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.operators.dedup_pipeline import dedup_corpus

    return dedup_corpus(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# q35 — tf-idf top-3 terms per document. Scores are rounded to 6
# decimals BEFORE ranking so ordering is deterministic and identical
# across engines (ln() can differ in the last ulp between libms; at
# 6 dp the collision probability is negligible and ties break by term).
# ---------------------------------------------------------------------------
@query(
    "q35_tfidf_topk",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY term),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               round(CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)), 6) AS tfidf
        FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, CAST(rk AS INT) AS rk FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
        FROM scored
    ) WHERE rk <= 3
    """,
)
def q35_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    # corpus count stays IN the plan (one-row agg broadcast into the
    # scored frame) — an eager docs.count() here would submit a full
    # scan at plan-construction time and scan documents twice per run
    n = docs.agg(F.count("*").cast("double").alias("n_docs"))
    # Examined r13, left alone: the tokenize+explode map pass executes
    # twice (the tf and df subtrees are specialized differently by the
    # optimizer, so their exchanges never canonicalize equal), but the
    # two single-task passes run CONCURRENTLY as independent stages, so
    # the wall cost is ~one pass. A fan_out repartition below the
    # duplicated subtree shuffles the text twice and measured SLOWER
    # (interleaved A/B 1.5-1.7 s plain vs 2.1-2.8 s spread); a
    # (doc, term) checkpoint would be corpus-sized at 100 TB and a
    # window-on-term df rewrite trades the second scan for a skew-prone
    # corpus-wide shuffle — all three rejected.
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # df derived FROM tf (one row per (doc, term) => count == distinct
    # docs per term) instead of a second aggregation over tok: both
    # consumers now share the same (doc_id, term) exchange (AQE stage
    # reuse), so the tokenize+explode map pass runs once, not twice,
    # and the countDistinct's two-phase expansion disappears.
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("n_docs") / F.col("df").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf", "rk")
    )

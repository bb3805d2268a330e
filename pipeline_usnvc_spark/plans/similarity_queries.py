"""Similarity-search queries over ``embeddings`` (operators/similarity.py).

The brute-force baseline and the within-label near-dup sweep have
exact DuckDB oracles: both engines compute the identical IEEE
double sequence (cast-to-double, sequential left-fold), so cosine
values hash-match without tolerance. Since round 13 the SINGLE-PROBE
LSH paths (q62 top-k, q164 near-dup) are hash-oracled too: their
bucket bits are exact integer predicates (floor(x*1e7) components ×
md5-derived integer planes — operators/similarity.lsh_buckets_sql is
the DuckDB twin) and their verify/rank stages ride the sequential
fold, so candidate sets AND measured recall certify end-to-end.
The remaining approximate variants (multi-probe q64, IVF q63, PQ
q65) stay rows-only with executed recall contracts; their recall is
additionally asserted against brute force in tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pipeline_usnvc_spark.functions.vectors import cosine_similarity, to_double_array
from pipeline_usnvc_spark.operators.similarity import brute_force_topk, lsh_topk
from pipeline_usnvc_spark.plans.registry import query
from pipeline_usnvc_spark.sources.tables import load_table

# dot(a,b) with a left fold seeded by the first product — identical to
# Spark's aggregate(zip_with(...), 0.0, +) because 0.0 + x == x.
_DOT = "list_reduce(list_transform(range(1, 65), i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
_NORM = "sqrt(list_reduce(list_transform({v}, x -> x * x), (x, y) -> x + y))"
_COS = f"({_DOT.format(a='qe', b='ve')} / ({_NORM.format(v='qe')} * {_NORM.format(v='ve')}))"


# ---------------------------------------------------------------------------
# q60 — exact cosine top-5 for the query subset vec_id % 100 == 0.
# ---------------------------------------------------------------------------
@query(
    "q60_cosine_topk",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, ve AS qe FROM v WHERE vec_id % 100 = 0),
    scored AS (
        SELECT q.query_id, v.vec_id AS neighbor_id, {_COS} AS sim
        FROM v CROSS JOIN q
        WHERE v.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, sim
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def q60_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return brute_force_topk(emb, queries, k=5)


# ---------------------------------------------------------------------------
# q61 — within-label embedding similar-pair sweep (cosine ≥ 0.4).
# A production near-dup gate uses ≥ 0.9; this threshold is pinned to
# the SYNTHETIC corpus's measured similarity band because 0.9 finds
# zero pairs at sf0.01, which made the driver's r02 green row vacuous
# (lowering it here was VERDICT r02 item 4's explicit ask — the
# testdata is driver-owned/read-only, so planting real ≥0.9 pairs in
# the fixture is not an option). The threshold is the fan-out knob:
# on a real corpus set it back to the near-dup band, where the
# label-partitioned pair join stays sparse. Label acts as the
# IVF-style coarse partition, so the join is an equi-join on label,
# not an all-pairs cross.
# ---------------------------------------------------------------------------
@query(
    "q61_embedding_near_dup",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        FROM embeddings
    )
    SELECT id_a, id_b, sim FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {_DOT.format(a='a.ve', b='b.ve')}
                 / ({_NORM.format(v='a.ve')} * {_NORM.format(v='b.ve')}) AS sim
        FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
    ) WHERE sim >= 0.4
    """,
)
def q61_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.functions.vectors import dot, l2_norm

    # Per-row norm bound BEFORE the self-join: the per-pair cosine
    # re-evaluated both norm folds for every within-label pair (3
    # interpreted HOF folds per pair); binding each side's norm once
    # per row leaves only the dot per pair. Bit-identical: same
    # sequential fold, same dot/(na*nb) tree.
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_array("embedding").alias("ve")
    ).withColumn("nrm", l2_norm(F.col("ve")))
    a = emb.alias("a")
    b = emb.alias("b")
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            (
                dot(F.col("a.ve"), F.col("b.ve"))
                / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("sim"),
        )
        .filter(F.col("sim") >= 0.4)
    )


def _attach_recall_contract(
    ann: DataFrame, queries: DataFrame, exact: DataFrame, k: int, bound: float
) -> DataFrame:
    """Make an approximate top-k query SELF-CERTIFYING for the
    driver's rows-only check (VERDICT r03 item 4): reshape to
    QUERY-grain — one row per query from the query SPINE (never
    empty, so the contract can never pass vacuously on an empty ANN
    result), with neighbors serialized to a csv string, per-query
    ``recall`` vs the exact top-k (0 for queries with no results,
    so the mean is query-weighted, not row-weighted), and the global
    ``mean_recall`` enforced >= ``bound`` through a contract FILTER
    (`operators/contracts.py`) that executes under any consumption —
    a bare assert column is pruned by count(). Verification-only
    cost: the exact reference re-runs the brute-force plan; the
    production operator is the ANN path alone. All contract frames
    are query-grain (~1% of the corpus)."""
    from pipeline_usnvc_spark.operators.contracts import contract_filter

    per_q_ann = ann.groupBy("query_id").agg(
        F.count("*").cast("bigint").alias("n_results"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("rank"), F.col("neighbor_id")))
                ),
                lambda s: s["neighbor_id"].cast("string"),
            ),
            ",",
        ).alias("neighbors"),
    )
    hits = (
        ann.select("query_id", "neighbor_id")
        .intersect(exact.select("query_id", "neighbor_id"))
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    spine = queries.select(F.col("vec_id").alias("query_id"))
    # query-grain base frame, materialized: the ANN + brute-force
    # upstream runs once though two consumers (per-query rows and the
    # recall totals) read it below
    from pipeline_usnvc_spark.operators.checkpoint import materialize

    per_q0 = materialize(
        spine.join(F.broadcast(per_q_ann), "query_id", "left")
        .join(F.broadcast(hits), "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_results", F.lit(0)).cast("bigint").alias("n_results"),
            F.coalesce("neighbors", F.lit("")).alias("neighbors"),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("_n_hits"),
        )
    )
    # mean recall as ONE integer-exact division (round 13, so q62 can
    # be hash-oracled): hit counts sum exactly as bigints and the
    # final tot/(k*n_q) is a single IEEE division both engines
    # reproduce — the old avg() window summed per-query doubles in
    # engine-dependent order, which is not hashable cross-engine
    totals = per_q0.agg(
        F.sum("_n_hits").cast("bigint").alias("_th"),
        F.count("*").cast("bigint").alias("_nq"),
    )
    per_q = (
        per_q0.crossJoin(F.broadcast(totals))
        .select(
            "query_id",
            "n_results",
            "neighbors",
            (F.col("_n_hits").cast("double") / F.lit(float(k))).alias("recall"),
            (
                F.col("_th").cast("double")
                / (F.col("_nq") * F.lit(k)).cast("double")
            ).alias("mean_recall"),
        )
    )
    return contract_filter(
        per_q,
        F.col("mean_recall") >= F.lit(bound),
        F.concat(F.lit("mean recall below contract: "), F.col("mean_recall")),
    )


def _ann_recall_oracle(bucket_prefix: str, cand_sql: str, k: int = 5) -> str:
    """Shared DuckDB twin of ``_attach_recall_contract``'s reshape for
    the hash-oracled ANN queries (q62 multi-table LSH, q64 multi-probe
    LSH): ``bucket_prefix`` supplies the engine-exact bucket CTEs,
    ``cand_sql`` the candidate-pair SELECT (over those CTEs); the tail
    — sequential-fold scoring, top-k ranking, brute-force reference,
    per-query recall and the integer-exact mean — is identical."""
    return f"""
    WITH {bucket_prefix},
    v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, ve AS qe FROM v WHERE vec_id % 100 = 0),
    cand AS ({cand_sql}
    ),
    scored AS (
        SELECT c.query_id, c.neighbor_id, {_COS} AS sim
        FROM cand c JOIN q ON q.query_id = c.query_id
        JOIN v ON v.vec_id = c.neighbor_id
    ),
    ann AS (
        SELECT query_id, neighbor_id, rank FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY sim DESC, neighbor_id) AS rank
            FROM scored
        ) WHERE rank <= {k}
    ),
    exact AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, v.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q.query_id
                                      ORDER BY {_COS} DESC, v.vec_id) AS rank
            FROM v CROSS JOIN q WHERE v.vec_id <> q.query_id
        ) WHERE rank <= {k}
    ),
    hits AS (
        SELECT a.query_id, CAST(count(*) AS BIGINT) AS n_hits
        FROM ann a JOIN exact e ON e.query_id = a.query_id
                               AND e.neighbor_id = a.neighbor_id
        GROUP BY 1
    ),
    agg AS (
        SELECT query_id, CAST(count(*) AS BIGINT) AS n_results,
               string_agg(CAST(neighbor_id AS VARCHAR), ',' ORDER BY rank)
                   AS neighbors
        FROM ann GROUP BY 1
    ),
    per_q AS (
        SELECT q.query_id,
               CAST(coalesce(g.n_results, 0) AS BIGINT) AS n_results,
               coalesce(g.neighbors, '') AS neighbors,
               CAST(coalesce(h.n_hits, 0) AS BIGINT) AS nh
        FROM q LEFT JOIN agg g ON g.query_id = q.query_id
        LEFT JOIN hits h ON h.query_id = q.query_id
    ),
    tot AS (
        SELECT CAST(sum(nh) AS BIGINT) AS th, CAST(count(*) AS BIGINT) AS nq
        FROM per_q
    )
    SELECT query_id, n_results, neighbors,
           CAST(nh AS DOUBLE) / {float(k)} AS recall,
           CAST(th AS DOUBLE) / CAST(nq * {k} AS DOUBLE) AS mean_recall
    FROM per_q CROSS JOIN tot
    """


def _q62_oracle() -> str:
    from pipeline_usnvc_spark.operators.similarity import lsh_buckets_sql

    return _ann_recall_oracle(
        lsh_buckets_sql(16, 4),
        """
        SELECT DISTINCT qb.vec_id AS query_id, vb.vec_id AS neighbor_id
        FROM buckets qb JOIN buckets vb ON vb.t = qb.t AND vb.b = qb.b
        WHERE qb.vec_id % 100 = 0 AND vb.vec_id <> qb.vec_id""",
    )


def _q64_oracle(n_planes: int = 4, nprobe: int = 5) -> str:
    """Multi-probe candidate CTEs over the single-table exact buckets:
    ``plane_sums`` already carries the integer margins, so the probe
    ranking (|margin| asc, plane asc — `_exact_probe_buckets`'s stable
    argsort) and the XOR flips are plain integer SQL."""
    from pipeline_usnvc_spark.operators.similarity import lsh_buckets_sql

    prefix = f"""{lsh_buckets_sql(1, n_planes)},
    flips AS (
        SELECT vec_id, CAST(1 << p AS BIGINT) AS mask
        FROM (
            SELECT vec_id, p,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY abs(s), p) AS rn
            FROM plane_sums WHERE vec_id % 100 = 0
        ) WHERE rn <= {nprobe - 1}
    ),
    probes AS (
        SELECT vec_id, b AS pb FROM buckets WHERE vec_id % 100 = 0
        UNION ALL
        SELECT b.vec_id, xor(b.b, f.mask) AS pb
        FROM buckets b JOIN flips f USING (vec_id)
    )"""
    return _ann_recall_oracle(
        prefix,
        """
        SELECT DISTINCT p.vec_id AS query_id, vb.vec_id AS neighbor_id
        FROM probes p JOIN buckets vb ON vb.b = p.pb
        WHERE vb.vec_id <> p.vec_id""",
    )


# ---------------------------------------------------------------------------
# q62 — multi-table LSH approximate top-k, HASH-GREEN since round 13
# (VERDICT r12 item 1): the bucket bits are exact integer predicates
# (floor(x*1e7) components × md5-derived integer planes —
# operators/similarity.lsh_buckets_sql is the DuckDB twin, asserted
# bit-identical in tests), candidate scoring is the deterministic
# sequential fold, and the recall-contract reshape (per-query
# neighbors csv, recall vs brute force, integer-exact mean recall) is
# plain SQL — so the oracle certifies bucketing, candidate set,
# ranking, AND the measured recall end-to-end. Default 16 tables × 4
# planes: measured recall@5 = 1.00 at sf0.001 / 0.84 at sf0.01 vs
# brute force, asserted ≥ 0.7 in tests/test_multimodal.py (VERDICT
# r1: single-table default retired for weak recall ~0.2) and
# re-asserted at runtime by the embedded recall contract.
# ---------------------------------------------------------------------------
@query("q62_lsh_topk", oracle=_q62_oracle())
def q62_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return _attach_recall_contract(
        lsh_topk(emb, queries, k=5), queries,
        brute_force_topk(emb, queries, k=5), k=5, bound=0.7
    )


# ---------------------------------------------------------------------------
# q63 — IVF approximate top-k with a learned k-means coarse quantizer
# (rows-only; recall vs brute force asserted in tests).
# ---------------------------------------------------------------------------
@query("q63_ivf_topk")
def q63_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return _attach_recall_contract(
        ivf_topk(emb, queries, k=5), queries,
        brute_force_topk(emb, queries, k=5), k=5, bound=0.5
    )


# ---------------------------------------------------------------------------
# q64 — multi-probe LSH top-k: probe own bucket plus XOR-flips of the
# closest hyperplanes (smallest |margin|). HASH-GREEN since round 13:
# the operator moved to the q62 exact-integer bucket discipline
# (floor(x*1e7) components x md5 integer planes), where the margins
# ARE the integer plane dots — so the probe ranking, candidate set,
# sequential-fold scores, and the recall contract reshape all have a
# DuckDB twin (_q64_oracle). Recall vs single-probe asserted in
# tests/test_multimodal.py; mean recall >= 0.4 vs brute force
# enforced in-plan AND re-computed by the oracle.
# ---------------------------------------------------------------------------
@query("q64_multiprobe_lsh_topk", oracle=_q64_oracle())
def q64_multiprobe_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.operators.similarity import multiprobe_lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return _attach_recall_contract(
        multiprobe_lsh_topk(emb, queries, k=5, n_planes=4, nprobe=5),
        queries,
        brute_force_topk(emb, queries, k=5),
        k=5,
        bound=0.4,
    )


# ---------------------------------------------------------------------------
# q65 — product-quantization top-k by asymmetric distance: corpus
# encoded to m=16 sub-codes of 4 dims each (pq_topk defaults), queries
# score via per-subspace distance tables (rows-only; recall vs exact
# L2 asserted in tests).
# ---------------------------------------------------------------------------
@query("q65_pq_topk")
def q65_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.operators.similarity import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return _attach_recall_contract(
        pq_topk(emb, queries, k=5), queries,
        brute_force_topk(emb, queries, k=5), k=5, bound=0.3
    )


# ---------------------------------------------------------------------------
# q66 — Arrow-batched exact cosine top-k: the BLAS scale path for the
# same answer as q60. BLAS only SELECTS (a padded 2k-per-partition
# candidate slate); the emitted sim is recomputed with the JVM
# sequential fold — the identical IEEE sequence as q60 and this
# oracle — so the compare is bit-exact with no rounding grid to
# straddle (numpy banker's-rounding vs DuckDB half-away never enters).
# ---------------------------------------------------------------------------
@query(
    "q66_cosine_topk_arrow",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, ve AS qe FROM v WHERE vec_id % 100 = 0),
    scored AS (
        SELECT q.query_id, v.vec_id AS neighbor_id, {_COS} AS sim
        FROM v CROSS JOIN q
        WHERE v.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, sim
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def q66_cosine_topk_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.operators.similarity import batched_cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return batched_cosine_topk(emb, queries, k=5)


# ---------------------------------------------------------------------------
# q132 — k-means cluster assignment: the IVF coarse quantizer exposed
# as a first-class clustering operator (deterministic Lloyd's, lowest-
# id init, no RNG). Rows-only: float centroid means make bit-exact
# SQL replication impractical; determinism + SSE-descent are asserted
# in tests/test_scale_ops.py instead.
#
# Scale shape: centroids live in the plan as literals (a few KB), so
# assignment is a map-only expression over the corpus — zero shuffle,
# zero UDF; each Lloyd's round is one shuffle (per-(cluster,dim)
# partial means) + an O(k·dim) driver collect.
# ---------------------------------------------------------------------------
@query("q132_kmeans_clusters")
def q132_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.operators.similarity import (
        _nearest_centroid,
        kmeans_centroids,
    )
    from pipeline_usnvc_spark.functions.vectors import to_double_array

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = kmeans_centroids(emb, k=8, iters=4)
    from pipeline_usnvc_spark.operators.checkpoint import materialize

    # assigned feeds BOTH k_used and the contract frame: materialize
    # so the 8-centroid x 64-dim argmin fold runs once per row, not
    # twice (the q420 shared-frame rule).
    assigned = materialize(
        emb.select(
            "vec_id",
            _nearest_centroid(to_double_array("embedding"), centroids).alias("cluster"),
        )
    )
    # Non-degeneracy contract (VERDICT r03 item 4): assignments stay
    # in [0, k) and the clustering actually separates the corpus
    # (≥ 2 non-empty clusters) — enforced through a contract FILTER
    # (operators/contracts.py) so it executes under any consumption.
    # (SSE descent + determinism are the deeper pytest properties.)
    from pipeline_usnvc_spark.operators.contracts import contract_filter

    k_used = assigned.agg(
        F.countDistinct("cluster").cast("int").alias("n_clusters"),
        F.min("cluster").alias("min_c"),
        F.max("cluster").alias("max_c"),
    )
    return contract_filter(
        assigned.crossJoin(F.broadcast(k_used)),
        (F.col("n_clusters") >= 2)
        & (F.col("min_c") >= 0)
        & (F.col("max_c") < F.lit(len(centroids))),
        F.concat(F.lit("degenerate clustering: n="), F.col("n_clusters")),
    ).drop("min_c", "max_c")


# ---------------------------------------------------------------------------
# q135 — int8 embedding quantization: per-dimension min/max scaling of
# the corpus embeddings to 0..255 codes (the storage-compression pass
# before an ANN index ships to serving). Output is the exploded
# (vec_id, pos, q8) form so the byte codes are engine-comparable.
#
# Scale shape: ONE explode pass feeds a per-dimension min/max
# aggregation (dim-bounded — tiny) that broadcast-joins back into the
# same exploded view; quantization is a map-side double expression.
# No driver collect, no second corpus scan (AQE reuses the exchange).
# ---------------------------------------------------------------------------
@query(
    "q135_int8_quantize",
    oracle="""
    WITH e AS (
        SELECT vec_id,
               CAST(unnest(embedding) AS DOUBLE) AS x,
               generate_subscripts(embedding, 1) AS pos
        FROM embeddings
    ),
    stats AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM e GROUP BY pos)
    SELECT e.vec_id, e.pos,
           CAST(round(255 * (e.x - s.mn) / (s.mx - s.mn), 0) AS INT) AS q8
    FROM e JOIN stats s ON s.pos = e.pos
    WHERE s.mx > s.mn
    """,
)
def q135_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "x")
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), "x")
    stats = e.groupBy("pos").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    return (
        e.join(F.broadcast(stats), "pos")
        .filter(F.col("mx") > F.col("mn"))
        .select(
            "vec_id",
            "pos",
            F.round(255 * (F.col("x") - F.col("mn")) / (F.col("mx") - F.col("mn")), 0)
            .cast("int")
            .alias("q8"),
        )
    )


def _q164_oracle() -> str:
    from pipeline_usnvc_spark.operators.similarity import lsh_buckets_sql

    cos_ab = (
        f"{_DOT.format(a='a.ve', b='b.ve')}"
        f" / ({_NORM.format(v='a.ve')} * {_NORM.format(v='b.ve')})"
    )
    return f"""
    WITH {lsh_buckets_sql(24, 4)},
    v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        FROM embeddings
    ),
    cand AS (
        SELECT DISTINCT ba.vec_id AS id_a, bb.vec_id AS id_b
        FROM buckets ba JOIN buckets bb
          ON bb.t = ba.t AND bb.b = ba.b AND ba.vec_id < bb.vec_id
    ),
    found AS (
        SELECT c.id_a, c.id_b
        FROM cand c JOIN v a ON a.vec_id = c.id_a JOIN v b ON b.vec_id = c.id_b
        WHERE {cos_ab} >= 0.4
    ),
    exact AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM v a JOIN v b ON a.vec_id < b.vec_id
        WHERE {cos_ab} >= 0.4
    ),
    tagged AS (
        SELECT coalesce(f.id_a, e.id_a) AS id_a,
               coalesce(f.id_b, e.id_b) AS id_b,
               (f.id_a IS NOT NULL) AS in_found,
               (e.id_a IS NOT NULL) AS in_exact
        FROM found f FULL OUTER JOIN exact e
          ON e.id_a = f.id_a AND e.id_b = f.id_b
    ),
    endpoints AS (
        SELECT id_a AS vec_id, in_found, in_exact FROM tagged
        UNION ALL
        SELECT id_b AS vec_id, in_found, in_exact FROM tagged
    ),
    per_vec AS (
        SELECT vec_id,
               CAST(sum(CASE WHEN in_found THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_found_partners,
               CAST(sum(CASE WHEN in_exact THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_exact_partners,
               CAST(sum(CASE WHEN in_found AND in_exact THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hit_partners
        FROM endpoints GROUP BY vec_id
    ),
    tot AS (
        SELECT CAST(coalesce(sum(n_exact_partners), 0) AS BIGINT) AS tot_exact,
               CAST(coalesce(sum(n_hit_partners), 0) AS BIGINT) AS tot_hit
        FROM per_vec
    )
    SELECT e.vec_id, e.label,
           CAST(coalesce(p.n_found_partners, 0) AS BIGINT) AS n_found_partners,
           CAST(coalesce(p.n_exact_partners, 0) AS BIGINT) AS n_exact_partners,
           CASE WHEN t.tot_exact = 0 THEN 1.0
                ELSE CAST(t.tot_hit AS DOUBLE) / CAST(t.tot_exact AS DOUBLE)
           END AS pair_recall
    FROM embeddings e LEFT JOIN per_vec p USING (vec_id) CROSS JOIN tot t
    """


# ---------------------------------------------------------------------------
# q164 — embedding near-duplicates WITHOUT a blocking key: multi-table
# LSH candidate blocking + exact cosine verify. HASH-GREEN since round
# 13 (VERDICT r12 item 1): the integer-exact bucket bits
# (lsh_buckets_sql twin), the fold-certified verify (BLAS pre-filters
# at threshold-1e-9, the JVM sequential fold decides — the q66
# discipline), and the vector-grain audit reshape are all
# SQL-expressible, so the DuckDB oracle certifies the candidate set,
# the verified pairs, AND the measured pair recall end-to-end.
# Threshold 0.4 is the synthetic corpus's near-dup band (its max
# pairwise sim is ~0.5); measured recall 1.00 at 24 tables vs the
# exact all-pairs sweep, zero false positives, asserted ≥ 0.95 in
# tests/test_multimodal.py. q61 is the exact variant when a blocking
# key exists; this is the 100 TB path when it doesn't.
# ---------------------------------------------------------------------------
@query("q164_embedding_near_dup_lsh", oracle=_q164_oracle())
def q164_embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.operators.similarity import embedding_near_dup_lsh

    from pipeline_usnvc_spark.operators.contracts import contract_filter

    emb = load_table(spark, sf_dir, "embeddings")
    found = embedding_near_dup_lsh(emb, threshold=0.4, n_tables=24)
    # Self-certifying recall contract (VERDICT r03 item 4 + the r4
    # review sweep): output is a VECTOR-grain audit over the full
    # embedding spine — never empty, so the contract cannot pass
    # vacuously when the LSH stage finds nothing — and the exact
    # all-pairs reference sweep executes exactly ONCE: found and
    # exact pairs meet in one full-outer join, whose exploded
    # endpoints feed both the per-vector partner counts and (via a
    # single window) the global pair recall. False positives are
    # impossible by construction (candidates are exact-cosine
    # verified); pair recall < 0.95 fails the executed contract.
    v = emb.select("vec_id", to_double_array("embedding").alias("ve"))
    a, b = v.alias("a"), v.alias("b")
    exact = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cosine_similarity(F.col("a.ve"), F.col("b.ve")).alias("sim"),
        )
        .filter(F.col("sim") >= 0.4)
        .select("id_a", "id_b", F.lit(True).alias("in_exact"))
    )
    tagged = (
        found.select("id_a", "id_b", F.lit(True).alias("in_found"))
        .join(exact, ["id_a", "id_b"], "full_outer")
        .select(
            "id_a",
            "id_b",
            F.coalesce("in_found", F.lit(False)).alias("in_found"),
            F.coalesce("in_exact", F.lit(False)).alias("in_exact"),
        )
    )
    endpoints = tagged.select(
        F.explode(F.array("id_a", "id_b")).alias("vec_id"), "in_found", "in_exact"
    )
    per_vec = endpoints.groupBy("vec_id").agg(
        F.sum(F.when(F.col("in_found"), 1).otherwise(0)).cast("bigint").alias("n_found_partners"),
        F.sum(F.when(F.col("in_exact"), 1).otherwise(0)).cast("bigint").alias("n_exact_partners"),
        F.sum(F.when(F.col("in_found") & F.col("in_exact"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_hit_partners"),
    )
    # per_vec feeds BOTH the audit join and the recall totals below;
    # materialize so the LSH + exact pair sweep upstream runs once.
    from pipeline_usnvc_spark.operators.checkpoint import materialize

    per_vec = materialize(per_vec)
    audit = (
        emb.select("vec_id", "label")
        # per_vec is corpus-grain (every endpoint of every pair): no
        # broadcast hint — plain vec_id shuffle join scales.
        .join(per_vec, "vec_id", "left")
        .select(
            "vec_id",
            "label",
            F.coalesce("n_found_partners", F.lit(0)).cast("bigint").alias("n_found_partners"),
            F.coalesce("n_exact_partners", F.lit(0)).cast("bigint").alias("n_exact_partners"),
            F.coalesce("n_hit_partners", F.lit(0)).cast("bigint").alias("n_hit_partners"),
        )
    )
    # recall totals as a ONE-ROW agg broadcast back over the corpus
    # spine (the q132 k_used pattern) — a lit(1) window here would
    # funnel the whole corpus-grain audit frame through one task.
    # coalesce: an empty per_vec (no pairs at either threshold) must
    # read as 0 totals -> recall 1.0, as the old spine-window did
    totals = per_vec.agg(
        F.coalesce(F.sum("n_exact_partners"), F.lit(0)).cast("bigint").alias("tot_exact"),
        F.coalesce(F.sum("n_hit_partners"), F.lit(0)).cast("bigint").alias("tot_hit"),
    )
    audit = (
        audit.crossJoin(F.broadcast(totals))
        .withColumn(
            "pair_recall",
            F.when(F.col("tot_exact") == 0, F.lit(1.0)).otherwise(
                F.col("tot_hit").cast("double") / F.col("tot_exact").cast("double")
            ),
        )
        .drop("n_hit_partners", "tot_exact", "tot_hit")
    )
    return contract_filter(
        audit,
        F.col("pair_recall") >= 0.95,
        F.concat(F.lit("near-dup pair recall below 0.95: "), F.col("pair_recall")),
    )


# ---------------------------------------------------------------------------
# q169 — label-centroid similarity matrix: mean embedding per label,
# then pairwise cosine between the 10 centroids — the class-confusion
# diagnostic (labels whose centroids cosine-overlap are candidates for
# merging or re-labelling). Determinism: components are fixed-point
# floor(x·1e7) BIGINTs summed as decimals (q142 discipline), means are
# the identical double division on both engines, and the cosine is
# the usual sequential fold. Cosine is scale-invariant, so centroids
# stay in fixed-point units (no 1e-7 rescale needed).
# Scale shape: one exchange on (label, dim) with map-side partials;
# everything after runs on a |labels|×|dims| table ≪ corpus, and the
# pairwise step is a broadcast self-join of |labels| rows.
# ---------------------------------------------------------------------------
# derived from the module's single fold definitions so the
# IEEE-identical shape can never drift between q60/q61 and q169
_CENT_DOT = _DOT.format(a="a.ce", b="b.ce")
_CENT_NORM = _NORM


@query(
    "q169_label_centroid_sim",
    oracle=f"""
    WITH comps AS (
        SELECT label, dim,
               CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT) AS q
        FROM (
            SELECT label, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS dim
            FROM embeddings
        )
    ),
    means AS (
        SELECT label, dim,
               CAST(sum(CAST(q AS DECIMAL(38,0))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m
        FROM comps GROUP BY label, dim
    ),
    cents AS (
        SELECT label, list(m ORDER BY dim) AS ce FROM means GROUP BY label
    )
    SELECT a.label AS label_a, b.label AS label_b,
           {_CENT_DOT}
             / ({_CENT_NORM.format(v='a.ce')} * {_CENT_NORM.format(v='b.ce')}) AS sim
    FROM cents a JOIN cents b ON a.label < b.label
    """,
)
def q169_label_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    comps = emb.select(
        "label", F.posexplode(to_double_array("embedding")).alias("pos", "x")
    ).select(
        "label",
        (F.col("pos") + 1).alias("dim"),
        F.floor(F.col("x") * 10000000).alias("q"),
    )
    means = comps.groupBy("label", "dim").agg(
        (
            F.sum(F.col("q").cast("decimal(38,0)")).cast("double")
            / F.count("*").cast("double")
        ).alias("m")
    )
    cents = means.groupBy("label").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
        ).alias("ce")
    )
    a, b = cents.alias("a"), cents.alias("b")
    return (
        a.join(F.broadcast(b), F.col("a.label") < F.col("b.label"))
        .select(
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_b"),
            cosine_similarity(F.col("a.ce"), F.col("b.ce")).alias("sim"),
        )
    )


# ---------------------------------------------------------------------------
# q170 — Matryoshka truncation audit: for each query vector, how much
# of the exact 64-dim top-5 survives when retrieval runs on the first
# 16 dimensions only (the truncate-the-embedding cost/quality dial).
# Both rankings are exact brute force over identical IEEE doubles, so
# the overlap count is oracle-exact — this is an *audit of an
# approximation*, not an approximation itself.
# Scale shape: two broadcast-scored corpus passes (no corpus shuffle)
# + a join of two k·|queries|-row top-k tables.
# ---------------------------------------------------------------------------
_DOT16 = "list_reduce(list_transform(range(1, 17), i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
_NORM16 = "sqrt(list_reduce(list_transform({v}[1:16], x -> x * x), (x, y) -> x + y))"


@query(
    "q170_matryoshka_overlap",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, ve AS qe FROM v WHERE vec_id % 100 = 0),
    full_top AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, v.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY {_COS} DESC, v.vec_id
                   ) AS rank
            FROM v CROSS JOIN q WHERE v.vec_id <> q.query_id
        ) WHERE rank <= 5
    ),
    trunc_top AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, v.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY {_DOT16.format(a='qe', b='ve')}
                                / ({_NORM16.format(v='qe')} * {_NORM16.format(v='ve')}) DESC,
                                v.vec_id
                   ) AS rank
            FROM v CROSS JOIN q WHERE v.vec_id <> q.query_id
        ) WHERE rank <= 5
    )
    SELECT f.query_id,
           CAST(count(t.neighbor_id) AS BIGINT) AS n_overlap,
           CAST(count(t.neighbor_id) AS DOUBLE) / 5.0 AS overlap_at_5
    FROM full_top f
    LEFT JOIN trunc_top t
      ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
    GROUP BY f.query_id
    """,
)
def q170_matryoshka_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    full_top = brute_force_topk(emb, emb.filter(F.col("vec_id") % 100 == 0), k=5)
    emb16 = emb.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    trunc_top = brute_force_topk(
        emb16, emb16.filter(F.col("vec_id") % 100 == 0), k=5
    )
    f = full_top.select("query_id", "neighbor_id")
    t = trunc_top.select(
        F.col("query_id").alias("t_qid"), F.col("neighbor_id").alias("t_nid")
    )
    joined = f.join(
        t, (F.col("query_id") == F.col("t_qid")) & (F.col("neighbor_id") == F.col("t_nid")), "left"
    )
    return joined.groupBy("query_id").agg(
        F.count("t_nid").cast("bigint").alias("n_overlap"),
        (F.count("t_nid").cast("double") / F.lit(5.0)).alias("overlap_at_5"),
    )


# ---------------------------------------------------------------------------
# q173 — per-dimension corpus statistics (n / mean / population std /
# min / max for each of the 64 dimensions): the normalization /
# whitening-diagnostics table computed before scaling embeddings or
# choosing quantization ranges. Fixed-point floor(x·1e7) BIGINTs with
# decimal sums make every aggregate exact; the mean/std finalization
# is the identical double expression on both engines (q142
# discipline), so no rounding tolerance is needed anywhere.
# Scale shape: ONE exchange on dim (64 keys) with map-side partials —
# the posexplode fan-out (64× rows) never shuffles raw; only 64
# partial-aggregate rows per task cross the wire.
# ---------------------------------------------------------------------------
@query(
    "q173_embedding_dim_stats",
    oracle="""
    WITH comps AS (
        SELECT dim, CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT) AS q
        FROM (
            SELECT unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS dim
            FROM embeddings
        )
    ),
    agg AS (
        SELECT dim,
               count(*) AS n,
               CAST(sum(CAST(q AS DECIMAL(38,0))) AS DOUBLE) AS s,
               CAST(sum(CAST(q AS DECIMAL(19,0)) * CAST(q AS DECIMAL(19,0))) AS DOUBLE) AS sq,
               min(q) AS mn, max(q) AS mx
        FROM comps GROUP BY dim
    )
    SELECT CAST(dim AS BIGINT) AS dim, CAST(n AS BIGINT) AS n,
           s / CAST(n AS DOUBLE) / 10000000.0 AS mean,
           sqrt(sq / CAST(n AS DOUBLE) - (s / CAST(n AS DOUBLE)) * (s / CAST(n AS DOUBLE))) / 10000000.0 AS std_pop,
           CAST(mn AS DOUBLE) / 10000000.0 AS min_val,
           CAST(mx AS DOUBLE) / 10000000.0 AS max_val
    FROM agg
    """,
)
def q173_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    comps = emb.select(
        F.posexplode(to_double_array("embedding")).alias("pos", "x")
    ).select(
        (F.col("pos") + 1).cast("bigint").alias("dim"),
        F.floor(F.col("x") * 10000000).alias("q"),
    )
    dq = F.col("q").cast("decimal(19,0)")
    agg = comps.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum(F.col("q").cast("decimal(38,0)")).cast("double").alias("s"),
        F.sum(dq * dq).cast("double").alias("sq"),
        F.min("q").alias("mn"),
        F.max("q").alias("mx"),
    )
    n_d = F.col("n").cast("double")
    mean_q = F.col("s") / n_d
    return agg.select(
        "dim",
        F.col("n").cast("bigint").alias("n"),
        (mean_q / F.lit(10000000.0)).alias("mean"),
        (
            F.sqrt(F.col("sq") / n_d - mean_q * mean_q) / F.lit(10000000.0)
        ).alias("std_pop"),
        (F.col("mn").cast("double") / F.lit(10000000.0)).alias("min_val"),
        (F.col("mx").cast("double") / F.lit(10000000.0)).alias("max_val"),
    )


# ---------------------------------------------------------------------------
# q186 — FILTERED vector search over the curated corpus: exact top-3
# neighbors per query, restricted to documents the q174 curation gate
# kept — the "filtered ANN" shape every retrieval stack needs
# (search only what survived dedup/quality/quota). Composition
# showcase: the keep-set is the curate() audit filtered to 'kept',
# semi-joined into the corpus BEFORE scoring, so dropped documents
# never cost a single dot product. Brute force + identical fold
# arithmetic → oracle-exact (the oracle embeds the full q174 SQL).
# ---------------------------------------------------------------------------
def _q186_oracle() -> str:
    # ensure q174's oracle is registered regardless of plans/__init__
    # import order (curation_queries has no import cycle back here)
    from pipeline_usnvc_spark.plans import curation_queries  # noqa: F401
    from pipeline_usnvc_spark.plans.registry import ORACLES

    return f"""
    WITH audit AS ({ORACLES["q174_curation_pipeline"]}),
    kept AS (SELECT doc_id FROM audit WHERE drop_stage = 'kept'),
    v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        FROM embeddings JOIN kept ON embeddings.vec_id = kept.doc_id
    ),
    q AS (
        SELECT vec_id AS query_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
        FROM embeddings WHERE vec_id % 100 = 0
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, sim
    FROM (
        SELECT q.query_id, v.vec_id AS neighbor_id,
               row_number() OVER (
                   PARTITION BY q.query_id ORDER BY {_COS} DESC, v.vec_id
               ) AS rank,
               {_COS} AS sim
        FROM v CROSS JOIN q WHERE v.vec_id <> q.query_id
    ) WHERE rank <= 3
    """


@query("q186_filtered_vector_search", oracle=_q186_oracle())
def q186_filtered_vector_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.operators.dedup_pipeline import curate
    from pipeline_usnvc_spark.plans.curation_queries import (
        _CURATE_JACCARD,
        _CURATE_QUOTA,
    )

    docs = load_table(spark, sf_dir, "documents")
    kept = (
        curate(docs, jaccard_threshold=_CURATE_JACCARD, quota=_CURATE_QUOTA)
        .filter(F.col("drop_stage") == "kept")
        .select(F.col("doc_id").alias("vec_id"))
    )
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.join(kept, "vec_id", "left_semi")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return brute_force_topk(corpus, queries, k=3)


# ---------------------------------------------------------------------------
# q195 — hard-negative mining for contrastive training: for each
# query vector, the top-3 most-similar vectors with a DIFFERENT
# label (high-similarity wrong-class examples are the negatives that
# sharpen an embedding model). Same broadcast-scoring shape as q60 —
# the corpus never shuffles; the label inequality rides the join
# condition so same-class pairs are never scored.
# ---------------------------------------------------------------------------
@query(
    "q195_hard_negatives",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, label AS qlabel, ve AS qe FROM v WHERE vec_id % 100 = 0)
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, sim,
           CAST(neighbor_label AS INT) AS neighbor_label
    FROM (
        SELECT q.query_id, v.vec_id AS neighbor_id, v.label AS neighbor_label,
               row_number() OVER (
                   PARTITION BY q.query_id ORDER BY {_COS} DESC, v.vec_id
               ) AS rank,
               {_COS} AS sim
        FROM v JOIN q ON v.label <> q.qlabel
    ) WHERE rank <= 3
    """,
)
def q195_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.functions.vectors import dot, l2_norm

    # norms bound once per row, not re-folded per (query, corpus) pair
    # — same IEEE tree, 3 interpreted folds per pair down to 1 (r13)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_array("embedding").alias("ve")
    ).withColumn("nrm", l2_norm(F.col("ve")))
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("ve").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    scored = emb.join(F.broadcast(q), F.col("label") != F.col("qlabel")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        (dot(F.col("qe"), F.col("ve")) / (F.col("qn") * F.col("nrm"))).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            "sim",
            F.col("neighbor_label").cast("int").alias("neighbor_label"),
        )
    )


# ---------------------------------------------------------------------------
# q196 — top-20 most-correlated embedding-dimension pairs (|Pearson|):
# the redundancy audit run before dimensionality reduction. Components
# are quantized to ints (floor(x*1e7), the q173 pattern), so every Σ
# (per-dim and per-pair) is decimal-EXACT and Pearson — which is
# scale-invariant, so quantization cancels — is one identical float
# expression on both sides.
#
# Scale: the relational form explodes each vector into d(d-1)/2 = 2016
# pair rows, but groupBy partial aggregation combines them map-side,
# so the shuffle carries only 2016 groups × a few sums regardless of
# corpus size. (At very large d, switch to the q66-style Arrow X^T X
# accumulator; at d=64 the explode+combine is simpler and exact.)
# ---------------------------------------------------------------------------
@query(
    "q196_dim_correlation",
    oracle="""
    WITH comps AS (
        SELECT vec_id, dim, CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT) AS q
        FROM (
            SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS dim
            FROM embeddings
        )
    ),
    dim_stats AS (
        SELECT dim, count(*) AS n,
               sum(CAST(q AS DECIMAL(38,0))) AS s,
               sum(CAST(q AS DECIMAL(19,0)) * CAST(q AS DECIMAL(19,0))) AS ss
        FROM comps GROUP BY dim
    ),
    pair_stats AS (
        SELECT a.dim AS di, b.dim AS dj,
               sum(CAST(a.q AS DECIMAL(19,0)) * CAST(b.q AS DECIMAL(19,0))) AS sxy
        FROM comps a JOIN comps b ON a.vec_id = b.vec_id AND a.dim < b.dim
        GROUP BY a.dim, b.dim
    ),
    corr AS (
        SELECT CAST(p.di AS INT) AS dim_i, CAST(p.dj AS INT) AS dim_j,
               (CAST(i.n AS DOUBLE) * CAST(p.sxy AS DOUBLE)
                - CAST(i.s AS DOUBLE) * CAST(j.s AS DOUBLE))
               / (sqrt(CAST(i.n AS DOUBLE) * CAST(i.ss AS DOUBLE)
                       - CAST(i.s AS DOUBLE) * CAST(i.s AS DOUBLE))
                  * sqrt(CAST(j.n AS DOUBLE) * CAST(j.ss AS DOUBLE)
                         - CAST(j.s AS DOUBLE) * CAST(j.s AS DOUBLE))) AS pearson
        FROM pair_stats p
        JOIN dim_stats i ON i.dim = p.di
        JOIN dim_stats j ON j.dim = p.dj
    )
    SELECT dim_i, dim_j, pearson
    FROM (
        SELECT *, row_number() OVER (ORDER BY abs(pearson) DESC, dim_i, dim_j) AS rk
        FROM corr
    ) WHERE rk <= 20
    """,
)
def q196_dim_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The shared Arrow gram kernel in dim-sums mode (r13 — formerly
    # the explode-self-join formulation this kernel was built to
    # replace, already its documented "scale path for large d"): ONE
    # mapInPandas pass accumulates the exact quantized X^T X per
    # chunk, and the (i,j)/(i,-1)/(-3,-3) sentinel cells carry pair
    # sums, per-dim sums and the row count — every integer identical
    # to the relational form (asserted bit-for-bit in
    # tests/test_scale_ops.py), so the Pearson doubles are unchanged.
    # Plan: the N x 64 comps exchange + pair self-join + three
    # aggregations collapse into kernel + one cell-grain groupBy.
    from pipeline_usnvc_spark.operators.checkpoint import materialize
    from pipeline_usnvc_spark.operators.similarity import gram_matrix_quantized

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    # Materialized (r13): FOUR consumers (pair_stats, diag, margins,
    # nrow) and runtime scan counts proved AQE does NOT reuse the
    # kernel exchange across them (4x the embeddings records read,
    # i.e. the X^T X pass ran four times). The frame is d(d+1)/2 + d
    # + 1 rows (~2.1k at d=64) — bounded by DIMENSION, not corpus.
    cells = materialize(gram_matrix_quantized(emb, with_dim_sums=True))
    pair_stats = cells.filter(
        (F.col("dim_i") > 0) & (F.col("dim_j") > 0) & (F.col("dim_i") < F.col("dim_j"))
    ).select(F.col("dim_i").alias("di"), F.col("dim_j").alias("dj"), "sxy")
    diag = cells.filter(
        (F.col("dim_i") > 0) & (F.col("dim_i") == F.col("dim_j"))
    ).select(F.col("dim_i").alias("dim"), F.col("sxy").alias("ss"))
    margins = cells.filter(F.col("dim_j") == -1).select(
        F.col("dim_i").alias("dim"), F.col("sxy").alias("s")
    )
    nrow = cells.filter(F.col("dim_i") == -3).select(F.col("sxy").alias("n"))
    dim_stats = diag.join(margins, "dim").crossJoin(F.broadcast(nrow))
    i = dim_stats.alias("i")
    j = dim_stats.alias("j")
    joined = (
        pair_stats.join(F.broadcast(i), F.col("i.dim") == F.col("di"))
        .join(F.broadcast(j), F.col("j.dim") == F.col("dj"))
    )
    nd = F.col("i.n").cast("double")
    pearson = (
        nd * F.col("sxy").cast("double")
        - F.col("i.s").cast("double") * F.col("j.s").cast("double")
    ) / (
        F.sqrt(nd * F.col("i.ss").cast("double") - F.col("i.s").cast("double") * F.col("i.s").cast("double"))
        * F.sqrt(
            F.col("j.n").cast("double") * F.col("j.ss").cast("double")
            - F.col("j.s").cast("double") * F.col("j.s").cast("double")
        )
    )
    corr = joined.select(
        F.col("di").cast("int").alias("dim_i"),
        F.col("dj").cast("int").alias("dim_j"),
        pearson.alias("pearson"),
    )
    w = Window.orderBy(F.desc(F.abs(F.col("pearson"))), "dim_i", "dim_j")
    return corr.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 20).drop("rk")


# ---------------------------------------------------------------------------
# q221 — semantic dedup, SemDeDup-style (Abbas et al. 2023, public
# method): within each coarse cluster (label — the same role as
# SemDeDup's k-means cluster id), drop every vector that is the
# HIGHER id of a cosine ≥ 0.4 pair (the q174 single-pass keeper rule,
# not transitive closure — that's q55/q56's territory), and report a
# per-vector audit: kept flag + number of near-dup partners. Fully
# SQL-expressible → oracle-exact: pair similarity reuses q61's fold
# arithmetic (IEEE-identical sequential sums).
#
# Scale shape: the pair join is label-partitioned (an equi-join on
# the cluster key — never all-pairs across the corpus); the audit is
# one aggregation on the pair endpoints joined back to the vector
# spine on vec_id. At 100 TB the label comes from q132's centroid
# assignment (map-only) and per-cluster populations are bounded by
# the clustering, so the pairwise work stays sparse.
# ---------------------------------------------------------------------------
@query(
    "q221_semantic_dedup",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        FROM embeddings
    ),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE {_DOT.format(a='a.ve', b='b.ve')}
                / ({_NORM.format(v='a.ve')} * {_NORM.format(v='b.ve')}) >= 0.4
    ),
    partners AS (
        SELECT vec_id, CAST(count(*) AS BIGINT) AS n_partners
        FROM (
            SELECT id_a AS vec_id FROM pairs
            UNION ALL
            SELECT id_b AS vec_id FROM pairs
        ) GROUP BY vec_id
    ),
    dropped AS (SELECT DISTINCT id_b AS vec_id FROM pairs)
    SELECT v.vec_id, v.label,
           COALESCE(p.n_partners, 0) AS n_partners,
           d.vec_id IS NULL AS kept
    FROM v
    LEFT JOIN partners p ON p.vec_id = v.vec_id
    LEFT JOIN dropped d ON d.vec_id = v.vec_id
    """,
)
def q221_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from pipeline_usnvc_spark.functions.vectors import dot, l2_norm

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_array("embedding").alias("ve")
    )
    # BLAS pre-filters, the JVM fold certifies (the q66/q164
    # discipline, applied r13 — the within-label pair sweep previously
    # evaluated 3 interpreted HOF folds PER PAIR in the join filter,
    # ~200k pairs x 192 lambda steps at sf0.1): each label group is
    # scored in ONE blocked matmul (block x |group| sims at a time, so
    # memory stays bounded on a hot cluster) at threshold - 1e-9 —
    # numpy pairwise summation and the sequential fold agree to ~1e-13
    # on 64-dim vectors, so the margin can never drop a fold-passing
    # pair — and the surviving candidates (near-dup grain, tiny) are
    # re-scored with the deterministic JVM-side sequential fold with
    # the EXACT threshold on the fold value: the emitted pair set is
    # the same IEEE sequence the SQL oracle computes. Group shuffle
    # moves each vector ONCE (vs twice for the former self-join).
    # Null labels pair with nothing (the join-on-equality semantics),
    # so they are filtered before the grouping.
    pre = 0.4 - 1e-9
    id_type = emb.schema["vec_id"].dataType.simpleString()

    def group_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        M = np.stack(pdf["ve"].to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(M, axis=1)
        out_a: list = []
        out_b: list = []
        blk = 1024
        with np.errstate(divide="ignore", invalid="ignore"):
            for lo in range(0, len(ids), blk):
                s = (M[lo : lo + blk] @ M.T) / (
                    nrm[lo : lo + blk, None] * nrm[None, :]
                )
                ia, ib = np.nonzero(s >= pre)
                # strict upper triangle in vec_id order (ids sorted, so
                # position order IS id order) = the a.vec_id < b.vec_id
                # candidate discipline; diagonal self-pairs drop here
                keep = (ia + lo) < ib
                out_a.append(ids[ia[keep] + lo])
                out_b.append(ids[ib[keep]])
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
            }
        )

    cand = (
        emb.filter(F.col("label").isNotNull())
        .groupBy("label")
        .applyInPandas(group_pairs, f"id_a {id_type}, id_b {id_type}")
    )
    nemb = emb.withColumn("nrm", l2_norm(F.col("ve")))
    va = nemb.select(
        F.col("vec_id").alias("id_a"), F.col("ve").alias("va"), F.col("nrm").alias("na")
    )
    vb = nemb.select(
        F.col("vec_id").alias("id_b"), F.col("ve").alias("vb"), F.col("nrm").alias("nb")
    )
    pairs = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        # per-row norms bound once; dot/(na*nb) is the identical IEEE
        # tree cosine_similarity built per pair
        .withColumn("sim", dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .filter(F.col("sim") >= 0.4)
        .select("id_a", "id_b")
    )
    # pairs feeds BOTH audit frames below — materialize once or the
    # label-partitioned scoring (the expensive stage) runs twice.
    from pipeline_usnvc_spark.operators.checkpoint import materialize

    pairs = materialize(pairs)
    endpoints = pairs.select(F.col("id_a").alias("vec_id")).unionAll(
        pairs.select(F.col("id_b").alias("vec_id"))
    )
    partners = endpoints.groupBy("vec_id").agg(
        F.count("*").cast("bigint").alias("n_partners")
    )
    dropped = pairs.select(F.col("id_b").alias("vec_id")).distinct().withColumn(
        "is_dropped", F.lit(True)
    )
    # partners/dropped are corpus-grain (one row per vector with a
    # near-dup partner), so on a dup-heavy corpus they are O(n): no
    # broadcast hints — a plain shuffle join on vec_id scales, and AQE
    # may still pick broadcast when the frames turn out tiny. The
    # audit join-backs carry only (vec_id, label), never the vector
    # payload, so the exchanges move two ints + a short string.
    return (
        emb.select("vec_id", "label")
        .join(partners, "vec_id", "left")
        .join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "label",
            F.coalesce("n_partners", F.lit(0)).cast("bigint").alias("n_partners"),
            F.col("is_dropped").isNull().alias("kept"),
        )
    )

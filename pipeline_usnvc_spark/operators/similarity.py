"""Similarity search over an ``array<float>`` embedding column.

Two tiers:
  brute_force_topk — exact cosine top-k for a (small) query set:
      broadcast the queries, one pass over the corpus, per-query
      window top-k. The corpus never shuffles for scoring; the only
      shuffle is the final top-k aggregation keyed by query id.
      At 100 TB this is the "scan once, score vectorized" baseline.
  lsh_topk — multi-table random-hyperplane LSH: vectors hash to a
      sign-bit bucket in each of L independent tables; queries score
      the union of their buckets. Candidate generation is an
      equi-join on (table, bucket) — the scale path when the query
      set is itself large. Default 16×4 measures recall@5 ≥ 0.84 on
      the synthetic embeddings (see docstring).

Vector math uses sequential-fold native expressions (functions/
vectors.py): deterministic summation order, so exact oracle parity.
The hyperplanes are derived deterministically from md5 of
(plane, dim) — no RNG state, reproducible across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipeline_usnvc_spark.functions.vectors import cosine_similarity, to_double_array


def _cosine_topk_candidates(q, v, k: int):
    """(query_id, neighbor_id, v_vec) candidate rows for exact cosine
    top-k: per Arrow batch, a numpy cosine pass keeps every vector
    within a margin of the batch's (k+1)-th best score per query (+1:
    the self-pair is dropped downstream) — candidates can only be
    ADDED; the exact fold downstream decides. Soundness of the
    margin (the q221 argument, made dimension-aware per review): both
    the numpy cosine and the sequential fold equal the true cosine to
    within ~dim·eps (Cauchy-Schwarz bounds Σ|a_i·b_i| ≤ |a||b|, so
    the summation error of the dot divided by the norms is at most a
    small multiple of dim·2.2e-16, whatever the vector magnitudes);
    the band is max(1e-9, 64·dim·eps), orders above that divergence
    at any dimension this engine targets. Non-finite cosines
    (zero-norm vectors) are kept unconditionally (Spark sorts NaN
    first under desc), and rows the kernel cannot score vectorized —
    null or wrong-length arrays, whose exact sim is null and ranks
    LAST — are emitted as candidates for every query so the exact
    path reproduces the old plan's null handling bit-for-bit.

    NOTE: building this DataFrame collect()s the queries subtree (one
    Spark job at construction time) — bounded by the operator
    contract (queries are broadcast-small), the same build-time-action
    convention as the repo's eager materialize()."""
    import numpy as np
    import pandas as pd

    # bounded by the operator contract: queries are broadcast-small
    q_rows = q.select("query_id", "q_vec").collect()
    id_type = v.schema["neighbor_id"].dataType.simpleString()
    schema = f"query_id {id_type}, neighbor_id {id_type}, v_vec array<double>"
    if not q_rows:
        return v.sparkSession.createDataFrame([], schema)
    qids = [r["query_id"] for r in q_rows]
    Qm = np.stack([np.asarray(r["q_vec"], dtype=np.float64) for r in q_rows])
    qn = np.sqrt((Qm * Qm).sum(axis=1))
    dim = Qm.shape[1]
    band = max(1e-9, 64.0 * dim * np.finfo(np.float64).eps)

    def batches(it):
        for pdf in it:
            if not len(pdf):
                continue
            nid = pdf["neighbor_id"].to_numpy()
            vv = pdf["v_vec"].to_numpy()
            ok = np.array(
                [x is not None and np.shape(x) == (dim,) for x in vv], dtype=bool
            )
            inv_idx = np.flatnonzero(~ok)
            sel_q, sel_n, sel_v = [], [], []
            val_idx = np.flatnonzero(ok)
            if len(val_idx):
                V = np.stack(vv[val_idx]).astype(np.float64)
                vn = np.sqrt((V * V).sum(axis=1))
                with np.errstate(divide="ignore", invalid="ignore"):
                    S = (V @ Qm.T) / (vn[:, None] * qn[None, :])
                S[~np.isfinite(S)] = np.inf
                n_ok = len(val_idx)
                k_eff = min(k + 1, n_ok)
                for j, qid in enumerate(qids):
                    col = S[:, j]
                    kth = np.partition(col, n_ok - k_eff)[n_ok - k_eff]
                    idx = val_idx[np.flatnonzero(col >= kth - band)]
                    sel_q.extend([qid] * len(idx))
                    sel_n.extend(nid[idx])
                    sel_v.extend(vv[idx])
            if len(inv_idx):
                for qid in qids:
                    sel_q.extend([qid] * len(inv_idx))
                    sel_n.extend(nid[inv_idx])
                    sel_v.extend(vv[inv_idx])
            yield pd.DataFrame(
                {"query_id": sel_q, "neighbor_id": sel_n, "v_vec": sel_v}
            )

    return v.select("neighbor_id", "v_vec").mapInPandas(batches, schema=schema)


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, rank, sim).

    ``queries`` must be small (it is broadcast against the corpus).
    Deterministic tie-break on neighbor id. ``metric`` is ``cosine``
    (descending similarity) or ``l2`` (ascending squared distance,
    reported negated in ``sim`` so the rank ordering reads the same).
    """
    # Norms are bound per ROW (one fold per query / per vector) instead
    # of inside the per-pair cosine, which re-evaluated both norm folds
    # for every (query, vector) pair — 3 interpreted HOF folds per pair
    # down to 1 (the dot). Bit-identical: the per-row fold is the same
    # sequential expression over the same array, and the final
    # dot/(qn*vn) tree is unchanged (measured q60 1.15 s -> 0.75 s at
    # sf0.1, hash-identical result).
    from pipeline_usnvc_spark.functions.vectors import dot, l2_norm

    q = queries.select(
        F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("q_vec")
    ).withColumn("_qn", l2_norm(F.col("q_vec")))
    # NOTE: deliberately NOT fan_out here — measured 2x slower at test
    # scale (2k vectors): the broadcast-join scoring is cheaper than
    # the extra round-robin exchange; the window top-k repartitions
    # anyway. Revisit only for corpora large enough to out-scale their
    # row-group count, where the scan itself yields many partitions.
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), to_double_array(vec_col).alias("v_vec")
    ).withColumn("_vn", l2_norm(F.col("v_vec")))
    if metric == "cosine":
        # r14 (the q221 pattern, guide §4.2): the all-pairs interpreted
        # dot fold cost |queries| x |vectors| x dim interpreted ops in
        # whatever parallelism the scan yields (x10 probe: 24 s, ONE
        # task). A float64 BLAS pass now nominates per-batch candidates
        # — every vector whose numpy cosine is within 1e-9 of the
        # batch's k-th best per query (numpy and the sequential fold
        # agree to ~1e-13 for 64-dim inputs, so the band can only ADD
        # candidates; non-finite scores rank as +inf, matching Spark's
        # NaN-sorts-first-under-desc) — and only the survivors pay the
        # exact sequential fold, whose value feeds the final rank
        # exactly as before. Top-k soundness per query: the global
        # exact top-k is a subset of the union of per-batch exact
        # top-(k+1) (the +1 absorbs the self-pair dropped below), each
        # of which is inside its batch's band. Vectors round-trip
        # Arrow as float64 (bit-exact), so the re-scored fold sees the
        # identical doubles.
        candidates = _cosine_topk_candidates(q, v, k)
        scored = (
            candidates.join(F.broadcast(q), "query_id")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select(
                "query_id",
                "neighbor_id",
                (
                    dot(F.col("q_vec"), F.col("v_vec"))
                    / (F.col("_qn") * l2_norm(F.col("v_vec")))
                ).alias("sim"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "sim")
        )
    elif metric == "l2":
        score = -F.aggregate(
            F.zip_with(F.col("q_vec"), F.col("v_vec"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    else:
        raise ValueError(f"unknown metric {metric!r}")
    scored = (
        v.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", score.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def _hyperplane(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) is
    derived from md5(f"{p}:{d}") mapped into [-1, 1). Pure function of
    (p, d) — identical on every engine/run with no RNG."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16)
            row.append((h / float(0xFFFFFFFF)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket_ids(
    vectors: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket) — sign-bit bucket from random hyperplanes.

    The planes ship as literal arrays inside the plan (a few KB) —
    effectively a broadcast of the quantizer, no driver loop.
    """
    planes = _hyperplane(n_planes, dim)
    v = vectors.select(F.col(id_col), to_double_array(vec_col).alias("v"))
    bucket = F.lit(0).cast("bigint")
    for p, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(x) for x in plane])
        d = F.aggregate(
            F.zip_with(F.col("v"), plane_col, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d > 0, F.lit(2**p).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return v.select(id_col, bucket.alias("bucket"))


def kmeans_centroids(
    vectors: DataFrame,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic Lloyd's k-means for the IVF coarse quantizer.

    Init: the k lowest-id vectors (deterministic, no RNG). Each
    iteration: assign (map-side, centroids as plan literals) → update
    (one shuffle: per-(cluster, dim) mean) → collect k×dim floats to
    the driver. The collect is O(k·dim) — a few KB — which is the
    legitimate driver-side footprint of a coarse quantizer; the
    corpus itself never leaves the executors.
    """
    v = vectors.select(F.col(id_col), to_double_array(vec_col).alias("v"))
    # bounded: k seed rows (the coarse-quantizer footprint)
    centroids = [
        [float(x) for x in r["v"]]
        for r in v.orderBy(id_col).limit(k).collect()
    ]
    # Corpora smaller than k seed fewer centroids; clamp k so the
    # update loop never indexes past the list (each point is its own
    # centroid — the correct degenerate quantizer).
    k = len(centroids)
    for _ in range(iters):
        assigned = v.withColumn("c", _nearest_centroid(F.col("v"), centroids))
        # bounded: k x dim centroid-stat rows
        per_dim = (
            assigned.select("c", F.posexplode("v").alias("pos", "x"))
            .groupBy("c", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = {}
        for r in per_dim:
            new.setdefault(r["c"], {})[r["pos"]] = r["m"]
        centroids = [
            [new[c][p] for p in sorted(new[c])] if c in new else centroids[c]
            for c in range(k)
        ]
    return centroids


def _nearest_centroid(v: Column, centroids: list[list[float]]) -> Column:
    """Index of the nearest centroid (squared L2), as a plan-literal
    expression — no shuffle, no UDF. Argmin via array_min over
    (dist, idx) structs: linear expression size (a chained
    when(d<best_d) formulation embeds the previous best twice per step
    → exponential tree → analyzer hang at k=16)."""
    structs = []
    for i, c in enumerate(centroids):
        c_col = F.array(*[F.lit(x) for x in c])
        d = F.aggregate(
            F.zip_with(v, c_col, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        structs.append(F.struct(d.alias("d"), F.lit(i).alias("cell")))
    return F.array_min(F.array(*structs))["cell"]


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    kmeans_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: corpus partitioned by nearest centroid;
    each query scores only its ``nprobe`` nearest cells.

    The candidate join is an equi-join on cell id — at 100 TB the
    corpus is bucketed/partitioned by cell once and each query reads
    nprobe/n_centroids of it. Recall tunes with nprobe.
    """
    from pipeline_usnvc_spark.functions.vectors import dot, l2_norm

    centroids = kmeans_centroids(vectors, n_centroids, kmeans_iters, id_col, vec_col)
    # norms bound once per corpus/query row (r13) — the candidate
    # scorer below folds only the dot per pair, same IEEE tree
    v = vectors.select(F.col(id_col).alias("neighbor_id"), to_double_array(vec_col).alias("v_vec")).withColumn("_vn", l2_norm(F.col("v_vec")))
    v_cells = v.withColumn("cell", _nearest_centroid(F.col("v_vec"), centroids))
    q = queries.select(F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("q_vec")).withColumn("_qn", l2_norm(F.col("q_vec")))
    # Each query probes its nprobe nearest cells (rank the centroid
    # distances with the same literal expressions).
    probe_structs = []
    for i, c in enumerate(centroids):
        c_col = F.array(*[F.lit(x) for x in c])
        d = F.aggregate(
            F.zip_with(F.col("q_vec"), c_col, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        probe_structs.append(F.struct(d.alias("d"), F.lit(i).alias("cell")))
    probes = F.transform(
        F.slice(F.array_sort(F.array(*probe_structs)), 1, nprobe), lambda s: s["cell"]
    )
    q_cells = q.withColumn("cell", F.explode(probes))
    scored = (
        q_cells.join(v_cells, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", (dot(F.col("q_vec"), F.col("v_vec")) / (F.col("_qn") * F.col("_vn"))).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def _exact_probe_buckets(
    df: DataFrame,
    n_planes: int,
    nprobe: int,
    dim: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, bucket) exploded to ``nprobe`` probe buckets per vector:
    its own sign-bit bucket plus XOR-flips of the ``nprobe - 1``
    planes with the smallest |margin| (classic multi-probe LSH, Lv et
    al. VLDB'07). EXACT arithmetic throughout (the q62 discipline):
    components quantize to floor(x*1e7) int64, planes are the
    md5-derived int64s of ``_multitable_planes(1, ...)`` (table 0 —
    the same constants as ``lsh_buckets_sql(1, n_planes)``), margins
    are the integer plane dots themselves, and the flip ranking is
    (|margin| asc, plane idx asc) via a stable argsort — so the probe
    set, and with it q64's full candidate set, is bit-reproducible in
    SQL and hash-oracle-able."""
    import numpy as np
    import pandas as pd

    planes_T = _multitable_planes(1, n_planes, dim).T.copy()
    pows = np.power(2, np.arange(n_planes), dtype=np.int64)
    n_flips = min(max(nprobe - 1, 0), n_planes)

    def batches(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            S = np.floor(V * 1e7).astype(np.int64) @ planes_T  # (n, n_planes)
            b = (S > 0) @ pows  # (n,)
            # stable argsort on |margin| == (|margin| asc, p asc)
            closest = np.argsort(np.abs(S), axis=1, kind="stable")[:, :n_flips]
            probes = np.concatenate(
                [b[:, None], b[:, None] ^ pows[closest]], axis=1
            )  # (n, 1 + n_flips)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), 1 + n_flips),
                    "bucket": probes.reshape(-1),
                }
            )

    flat = df.select(F.col(id_col), to_double_array(vec_col).alias("_v"))
    id_type = flat.schema[id_col].dataType.simpleString()
    return flat.mapInPandas(batches, schema=f"{id_col} {id_type}, bucket bigint")


def multiprobe_lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Multi-probe LSH top-k: each query probes its own bucket plus the
    ``nprobe - 1`` buckets reached by flipping the sign bits with the
    smallest |margin| (the planes it sits closest to). Recovers most of
    the recall lost to bucket-boundary splits without adding planes —
    the candidate join stays an equi-join on bucket id, with candidate
    volume multiplied by nprobe instead of the corpus being re-hashed.

    EXACT bucketing since round 13 (``_exact_probe_buckets``): the
    corpus buckets are ``_table_bucket_ids``' single-table integer
    buckets and the probe expansion ranks integer margins, so the
    candidate set is engine-portable and q64 carries a full DuckDB
    hash oracle. Scored sims use the JVM sequential fold — the same
    IEEE sequence as the oracle's ``_COS``.

    At 100 TB: the corpus-side bucket table is computed once (and can
    be bucketed-by on write); only the tiny query side explodes
    nprobe ways before the join, and both bucket frames are SLIM
    (id + bigint) — vectors join back after candidate dedup.
    """
    # dim must match the embedding width (like the sibling LSH/PQ
    # entry points): a mismatch would quantize garbage or collapse
    # buckets, turning the equi-join into a near-cross-product.
    vb = _table_bucket_ids(vectors, 1, n_planes, dim, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("tb")["b"].alias("bucket")
    )
    qp = _exact_probe_buckets(queries, n_planes, nprobe, dim, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), "bucket"
    )
    cand = (
        qp.join(vb, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    from pipeline_usnvc_spark.functions.vectors import dot, l2_norm

    # norms bound once per row (r13): candidate scoring folds only the
    # dot per pair — identical IEEE tree to the per-pair cosine
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), to_double_array(vec_col).alias("v_vec")
    ).withColumn("_vn", l2_norm(F.col("v_vec")))
    q = queries.select(
        F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("q_vec")
    ).withColumn("_qn", l2_norm(F.col("q_vec")))
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(v, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("q_vec"), F.col("v_vec")) / (F.col("_qn") * F.col("_vn"))).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def pq_codebooks(
    vectors: DataFrame,
    m: int = 4,
    ksub: int = 16,
    iters: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Product-quantization codebooks: the vector space is split into
    ``m`` contiguous subspaces of dim/m dims; each gets its own k-means
    codebook of ``ksub`` centroids (Jégou et al., TPAMI'11). Learned
    with the same deterministic Lloyd's iterations as the IVF coarse
    quantizer — subspace training runs on sliced columns, the corpus
    never leaves the executors."""
    dsub = dim // m
    books = []
    for j in range(m):
        sub = vectors.select(
            F.col(id_col),
            F.slice(to_double_array(vec_col), j * dsub + 1, dsub).alias("sub"),
        )
        books.append(kmeans_centroids(sub, k=ksub, iters=iters, id_col=id_col, vec_col="sub"))
    return books


def pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 16,
    ksub: int = 16,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ approximate top-k by asymmetric distance (ADC):
    (query_id, neighbor_id, rank, approx_dist).

    The corpus is encoded once into ``m`` byte-sized codes (m=16 bytes
    per vector vs 256 bytes of raw float32 — the 100 TB story: the
    scored representation is ~16× smaller than the embeddings, so the
    scan is ~16× cheaper and the codes table fits where the raw
    vectors never would). Each query builds an m×ksub distance table
    (plan-literal folds); scoring is ``m`` array lookups + adds per
    candidate — no per-candidate vector math at all.
    """
    dsub = dim // m
    books = pq_codebooks(vectors, m, ksub, iters, dim, id_col, vec_col)
    # Encode corpus: nearest sub-centroid index per subspace.
    v = vectors.select(F.col(id_col).alias("neighbor_id"), to_double_array(vec_col).alias("v"))
    code_cols = [
        _nearest_centroid(F.slice(F.col("v"), j * dsub + 1, dsub), books[j]).alias(f"c{j}")
        for j in range(m)
    ]
    v_codes = v.select("neighbor_id", *code_cols)
    # Query-side ADC tables: distance from the query subvector to every
    # sub-centroid, one literal array per subspace.
    q = queries.select(F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("q"))
    dtable_cols = []
    for j in range(m):
        qsub = F.slice(F.col("q"), j * dsub + 1, dsub)
        dists = []
        for c in books[j]:
            c_col = F.array(*[F.lit(x) for x in c])
            dists.append(
                F.aggregate(
                    F.zip_with(qsub, c_col, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )
        dtable_cols.append(F.array(*dists).alias(f"t{j}"))
    q_tables = q.select("query_id", *dtable_cols)
    approx = sum(
        F.element_at(F.col(f"t{j}"), F.col(f"c{j}").cast("int") + 1) for j in range(m)
    )
    scored = (
        v_codes.join(F.broadcast(q_tables), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", approx.alias("approx_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "approx_dist")
    )


def _multitable_planes(n_tables: int, n_planes: int, dim: int):
    """(n_tables*n_planes, dim) int64 matrix of deterministic
    hyperplanes — component (t, p, d) is 2*h16 - 65535 where h16 is
    the first 16 bits of md5(f"{t}:{p}:{d}"): an odd integer in
    [-65535, 65535]. Pure function of the indices, no RNG.

    INTEGER planes (round 13, VERDICT r12 item 1): with the vector
    quantized to q_d = floor(x_d * 1e7) (the suite-wide 1e7 fixed-
    point discipline), each sign bit is sign(Σ q_d * c_d) — an exact
    integer predicate any engine reproduces bit-for-bit, which is
    what lets q62/q164 carry full DuckDB hash oracles instead of
    rows-only recall contracts. 16-bit plane resolution is
    statistically indistinguishable from float hyperplanes for LSH
    (the direction grid is ~2e-5 radians coarse), and the int64
    accumulator is overflow-safe to |x| <= 2e3 per component
    (64 * 2e10 * 65535 < 2^63)."""
    import hashlib

    import numpy as np

    P = np.empty((n_tables * n_planes, dim), dtype=np.int64)
    for t in range(n_tables):
        for p in range(n_planes):
            for d in range(dim):
                h = int(hashlib.md5(f"{t}:{p}:{d}".encode()).hexdigest()[:4], 16)
                P[t * n_planes + p, d] = 2 * h - 65535
    return P


def lsh_buckets_sql(
    n_tables: int, n_planes: int, dim: int = 64, rel: str = "embeddings"
) -> str:
    """DuckDB CTE block (``planes``/``comps``/``plane_sums``/
    ``buckets``) reproducing ``_table_bucket_ids`` bit-for-bit: the
    md5-derived integer planes, the 1e7 fixed-point quantization, the
    exact integer sign predicate, and the power-of-two bucket packing
    are all integer arithmetic, so the (vec_id, t, b) bucket table is
    engine-identical by construction."""
    return f"""
    planes AS (
        SELECT t, p, d,
               2 * CAST('0x' || substr(md5(CAST(t AS VARCHAR) || ':'
                        || CAST(p AS VARCHAR) || ':'
                        || CAST(d AS VARCHAR)), 1, 4) AS BIGINT)
                 - 65535 AS c
        FROM range({n_tables}) r1(t), range({n_planes}) r2(p), range({dim}) r3(d)
    ),
    comps AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS d,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000000)
                    AS BIGINT) AS q
        FROM {rel}
    ),
    plane_sums AS (
        SELECT c.vec_id, pl.t, pl.p, sum(c.q * pl.c) AS s
        FROM comps c JOIN planes pl USING (d)
        GROUP BY 1, 2, 3
    ),
    buckets AS (
        SELECT vec_id, t,
               CAST(sum(CASE WHEN s > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS b
        FROM plane_sums GROUP BY 1, 2
    )
    """


def _table_bucket_ids(
    df: DataFrame,
    n_tables: int,
    n_planes: int,
    dim: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, tb=(table, bucket)) exploded across ``n_tables``
    independent hash tables, computed as ONE ``Q @ C.T`` integer
    matmul per Arrow batch inside mapInPandas. SLIM by design — only
    the id and a 2-int struct ride the ×n_tables explode; vectors are
    joined back after candidate dedup.

    The earlier native formulation (n_tables·n_planes literal-array
    fold expressions) spent ~10 s on 500 rows at 24×4 — Catalyst
    interprets higher-order lambdas per element, so 96 folds × 64
    dims of plan-literal arithmetic dominated. The BLAS batch is
    milliseconds for the same rows and keeps the operator map-side
    (no shuffle; same q66 Arrow-scale-path discipline).

    EXACT bucketing (round 13): components quantize to
    floor(x * 1e7) int64 (the multiply and floor are single IEEE-754
    double ops, identical in numpy and any SQL engine), planes are
    md5-derived odd int64s (``_multitable_planes``), and the sign
    predicate is an exact integer comparison — so the bucket table is
    bit-reproducible across engines (``lsh_buckets_sql`` is the
    DuckDB twin) and q62/q164 can be hash-oracled end-to-end.
    Overflow headroom: |x| <= 2e3 per component (module constant
    below); synthetic and unit-normalized embeddings sit at |x| <= 1.
    """
    import numpy as np
    import pandas as pd

    planes_T = _multitable_planes(n_tables, n_planes, dim).T.copy()
    pows = np.power(2, np.arange(n_planes), dtype=np.int64)

    def batches(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            Q = np.floor(V * 1e7).astype(np.int64)
            bits = (Q @ planes_T) > 0  # (n, n_tables*n_planes)
            B = bits.reshape(len(pdf), n_tables, n_planes) @ pows  # (n, n_tables)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), n_tables),
                    "t": np.tile(np.arange(n_tables, dtype=np.int32), n),
                    "b": B.reshape(-1),
                }
            )

    flat = df.select(F.col(id_col), to_double_array(vec_col).alias("_v"))
    id_type = flat.schema[id_col].dataType.simpleString()
    out = flat.mapInPandas(batches, schema=f"{id_col} {id_type}, t int, b bigint")
    return out.select(id_col, F.struct("t", "b").alias("tb"))


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH: candidates
    are the union of same-bucket pairs across ``n_tables`` independent
    hash tables of ``n_planes`` sign bits each (the classic
    Indyk–Motwani recall amplification: miss probability decays as
    (1 - p^b)^L). Returns (query_id, neighbor_id, rank, sim).

    Measured recall@5 vs brute force on the synthetic ``embeddings``
    table at the DEFAULT config (16 tables × 4 planes): 1.00 at
    sf0.001, 0.84 at sf0.01 (asserted ≥ 0.7 in
    tests/test_multimodal.py). The old single-table default
    (n_tables=1, n_planes=8) measured only ~0.2 — kept reachable for
    candidate-volume experiments, but no longer the default.

    Scale shape: the bucket tables are SLIM (id + 2-int struct — the
    ×n_tables explode never carries vectors), candidate generation is
    an equi-join on (table, bucket), pairs dedup BEFORE vectors are
    fetched, and only the deduped candidate set is scored. On the
    near-uniform synthetic embeddings the union candidate set
    approaches corpus size (no free lunch on random data); on real
    clustered embeddings the same config probes a small corpus
    fraction per query.
    """
    vb = _table_bucket_ids(vectors, n_tables, n_planes, dim, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "tb"
    )
    qb = _table_bucket_ids(queries, n_tables, n_planes, dim, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), "tb"
    )
    from pipeline_usnvc_spark.functions.vectors import dot, l2_norm

    # norms bound once per row (r13) — see ivf_topk
    v = vectors.select(F.col(id_col).alias("neighbor_id"), to_double_array(vec_col).alias("v_vec")).withColumn("_vn", l2_norm(F.col("v_vec")))
    q = queries.select(F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("q_vec")).withColumn("_qn", l2_norm(F.col("q_vec")))
    cand = (
        qb.join(vb, "tb")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(v, "neighbor_id")
        .select("query_id", "neighbor_id", (dot(F.col("q_vec"), F.col("v_vec")) / (F.col("_qn") * F.col("_vn"))).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def embedding_near_dup_lsh(
    vectors: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 4,
    n_tables: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, sim) for pairs with cosine ≥ ``threshold``,
    candidates blocked by multi-table hyperplane LSH — the
    embedding-space near-duplicate detector when no blocking key
    (label/source) exists.

    High-similarity pairs are exactly where sign-bit LSH is strong:
    at sim ≥ 0.9 the per-plane collision probability is 1 − θ/π ≈
    0.86, so a 4-bit table catches ≈ 54% and 16 tables miss < 10⁻⁵
    of true pairs. Even down at the synthetic corpus's near-dup band
    (sim ≥ 0.4, p ≈ 0.63) measured recall vs the exact all-pairs
    sweep is 0.92 with 16 tables and 1.00 with 24, zero false
    positives (verify is exact) — tests/test_multimodal.py.
    Candidate generation is an equi-join on (table, bucket) over
    SLIM rows; the corpus never cross-joins.
    """
    import numpy as np
    import pandas as pd

    b = _table_bucket_ids(vectors, n_tables, n_planes, dim, id_col, vec_col)
    ba, bb = b.alias("ba"), b.alias("bb")
    cand = (
        ba.join(
            bb,
            (F.col("ba.tb") == F.col("bb.tb"))
            & (F.col(f"ba.{id_col}") < F.col(f"bb.{id_col}")),
        )
        .select(
            F.col(f"ba.{id_col}").alias("id_a"), F.col(f"bb.{id_col}").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    id_type = vectors.schema[id_col].dataType.simpleString()
    v = vectors.select(F.col(id_col), to_double_array(vec_col).alias("v"))
    va = v.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"))
    vb = v.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"))
    paired = cand.join(va, "id_a").join(vb, "id_b")

    # BLAS pre-filters, the JVM fold certifies (the q66 discipline,
    # extended here in round 13 so q164 is hash-oracle-able): one
    # vectorized cosine per Arrow batch discards the candidate bulk
    # at (threshold - 1e-9) — numpy's pairwise summation and the
    # sequential fold agree to ~1e-13 on 64-dim vectors, so the
    # margin can never drop a fold-passing pair — then the survivors
    # (near-dup grain, tiny) are re-scored with the deterministic
    # JVM-side sequential fold and the EXACT threshold applies to the
    # fold value: the emitted (pair, sim) set is the same IEEE
    # sequence a SQL engine computes.
    pre = threshold - 1e-9

    def prefilter(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            A = np.stack(pdf["va"].to_numpy()).astype(np.float64)
            B = np.stack(pdf["vb"].to_numpy()).astype(np.float64)
            sims = (A * B).sum(axis=1) / (
                np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
            )
            keep = sims >= pre
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].to_numpy()[keep],
                    "id_b": pdf["id_b"].to_numpy()[keep],
                }
            )

    survivors = paired.mapInPandas(
        prefilter, schema=f"id_a {id_type}, id_b {id_type}"
    )
    return (
        survivors.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            cosine_similarity(F.col("va"), F.col("vb")).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def batched_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-batched exact cosine top-k: (query_id, neighbor_id, rank, sim).

    BLAS selects, the JVM fold certifies. The (small) query set ships
    to executors as a broadcast numpy matrix, and each Arrow batch of
    the corpus is scored in one ``V @ Q.T`` matmul inside
    ``mapInPandas`` — ~100x fewer Python ops than per-row evaluation.
    Each batch emits only a LOCAL candidate slate of 2k neighbors per
    query (a map-side reduction: 2k rows per query per partition cross
    the shuffle, not the corpus), carrying the neighbor's double-cast
    vector so no second corpus scan is needed. The final ``sim`` is
    then RECOMPUTED on the candidate slate with the deterministic
    JVM-side sequential fold (``functions/vectors.cosine_similarity``
    — the identical IEEE sequence as ``brute_force_topk`` and the
    DuckDB oracle), and the global top-k ranks on those fold values.
    Result: bit-exact fold semantics at BLAS throughput.

    Why 2k local candidates: BLAS pairwise summation and the
    sequential fold differ by at most a few ulps, so the fold top-k
    can escape the BLAS local top-2k only if k+1 distinct similarities
    sit within ulps of each other inside one partition — not a real
    risk for continuous embeddings, and the driver's hash-compare
    against the exact oracle re-certifies it every run.
    """
    import numpy as np
    import pandas as pd

    id_type = vectors.schema[id_col].dataType.simpleString()
    # bounded: the eval query set is driver-sized by contract
    q_pdf = queries.select(F.col(id_col), to_double_array(vec_col).alias("qv")).toPandas()
    if len(q_pdf) == 0:
        raise ValueError("query set is empty")
    q_ids = q_pdf[id_col].to_numpy()
    Q = np.stack(q_pdf["qv"].to_numpy()).astype(np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    bc = vectors.sparkSession.sparkContext.broadcast((q_ids, Qn.T.copy()))
    n_local = 2 * k

    def score(batches):
        q_ids_l, QnT = bc.value
        m = len(q_ids_l)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            S = Vn @ QnT  # raw BLAS scores: selection only, never emitted
            # raw id values as keys (no int() coercion): the id
            # column is generic — string ids would crash int(), and
            # truncating coercions could miss the self-exclusion
            row_of = {i: r for r, i in enumerate(ids)}
            out_q, out_n, out_v = [], [], []
            for j in range(m):
                col = S[:, j].copy()
                self_row = row_of.get(q_ids_l[j])
                if self_row is not None:
                    col[self_row] = -np.inf
                # lexsort: last key is primary -> (-sim, id) asc == sim desc, id asc
                order = np.lexsort((ids, -col))[:n_local]
                order = order[np.isfinite(col[order])]
                out_q.append(np.full(len(order), q_ids_l[j]))
                out_n.append(ids[order])
                out_v.extend(list(V[order]))
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "nv": out_v,
                }
            )

    candidates = vectors.select(id_col, vec_col).mapInPandas(
        score, f"query_id {id_type}, neighbor_id {id_type}, nv array<double>"
    )
    # query-grain broadcast join attaches qe; sim is the exact fold
    qe = queries.select(
        F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("qe")
    )
    from pipeline_usnvc_spark.functions.vectors import cosine_similarity

    exact = candidates.join(F.broadcast(qe), "query_id").withColumn(
        "sim", cosine_similarity(F.col("qe"), F.col("nv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def gram_matrix_quantized(
    vectors: DataFrame,
    vec_col: str = "embedding",
    quant: int = 10_000_000,
    *,
    with_dim_sums: bool = False,
    label_col: str | None = None,
    add_bias: bool = False,
) -> DataFrame:
    """Exact upper-triangle Gram matrix Σ qᵢ·qⱼ over the quantized
    components (q = floor(x·quant)) — the X^T X accumulator that is
    q196's scale path for large d: instead of exploding each vector
    into d(d-1)/2 pair rows, every Arrow batch accumulates one d×d
    int64 partial product matrix and emits d(d+1)/2 rows PER
    PARTITION; the only shuffle carries (#partitions × d²/2) rows
    regardless of corpus size.

    Partial products accumulate in int64 per CHUNK of at most
    9e18/quant² rows (≈92k at quant=1e7 — batches beyond the bound
    are re-chunked, so no configuration can overflow silently); the
    cross-chunk reduction sums as DECIMAL(38,0), so the result is
    EXACT and equals the relational pair-explode formulation
    bit-for-bit (asserted in tests/test_scale_ops.py).

    Returns (dim_i, dim_j, sxy) with 1-based dims, dim_i <= dim_j —
    diagonal included (the per-dim second moments), so one pass
    yields everything Pearson needs.

    This is also the suite's ONE quantized-kernel definition (the
    round-10 review found four per-query copies); the extra
    per-query outputs ride as SENTINEL cells on the same stream:

    - ``with_dim_sums`` (the q364 covariance / q373 whitening shape):
      per-dim component sums at (i, -1) and the row count at
      (-3, -3).
    - ``label_col`` (the q363 ridge-probe shape; combine with
      ``add_bias`` to append an exactly-quantized bias feature,
      q = quant): the X^T y matvec at (i, -1) and the exact label
      moments Σy / Σy² / n at (-1,-1) / (-2,-2) / (-3,-3). The
      chunk bound also covers the q·y products whenever
      max|y| <= max|q| (integer labels against micro-quantized
      features — asserted by the caller's grain).
    """
    import numpy as np
    import pandas as pd

    if with_dim_sums and label_col:
        raise ValueError("with_dim_sums and label_col sentinel encodings collide")

    # int64 safety bound PER CHUNK: rows × max|q|² must stay below
    # 2^63, with max|q| measured from the batch itself (≈92k rows at
    # unit-normalized inputs and quant=1e7; far fewer for
    # unnormalized embeddings). Accumulating ACROSS batches would
    # silently wrap negative (numpy int64 has no overflow check) —
    # each chunk yields its own partial instead and the cross-chunk
    # reduction is the exact decimal sum.
    def partials(it):
        for pdf in it:
            mat = np.stack(pdf["v"].to_numpy())  # rows × d, float64
            q = np.floor(mat * quant).astype(np.int64)
            if add_bias:
                q = np.concatenate(
                    [q, np.full((q.shape[0], 1), quant, dtype=np.int64)], axis=1
                )
            y = pdf["y"].to_numpy().astype(np.int64) if label_col else None
            # chunk bound from the BATCH's actual magnitude, not an
            # assumed |x| <= 1: unnormalized embeddings make |q|
            # exceed quant, and rows × max|q|² past 2^63 wraps
            # negative with no numpy error
            maxq = int(np.abs(q).max()) if q.size else 0
            max_rows = max(1, int(9.0e18 / float(max(1, maxq)) ** 2))
            for lo in range(0, len(q), max_rows):
                qc = q[lo : lo + max_rows]
                g = qc.T @ qc
                d = g.shape[0]
                iu, ju = np.triu_indices(d)
                cols_i = [iu + 1]
                cols_j = [ju + 1]
                vals = [g[iu, ju]]
                if with_dim_sums:
                    cols_i += [np.arange(1, d + 1), [-3]]
                    cols_j += [np.full(d, -1), [-3]]
                    vals += [qc.sum(axis=0), [len(qc)]]
                if label_col:
                    yc = y[lo : lo + max_rows]
                    cols_i += [np.arange(1, d + 1), [-1, -2, -3]]
                    cols_j += [np.full(d, -1), [-1, -2, -3]]
                    vals += [qc.T @ yc, [int(yc.sum()), int((yc * yc).sum()), len(yc)]]
                yield pd.DataFrame(
                    {
                        "dim_i": np.concatenate(cols_i),
                        "dim_j": np.concatenate(cols_j),
                        "part_sxy": np.concatenate(vals),
                    }
                )

    sel = [to_double_array(vec_col).alias("v")]
    if label_col:
        sel.append(F.col(label_col).alias("y"))
    v = vectors.select(*sel)
    parts = v.mapInPandas(partials, schema="dim_i int, dim_j int, part_sxy long")
    return parts.groupBy("dim_i", "dim_j").agg(
        F.sum(F.col("part_sxy").cast("decimal(38,0)")).alias("sxy")
    )

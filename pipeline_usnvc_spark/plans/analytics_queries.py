"""Distributed-analytics queries: exact global ranking (equi-depth
histogram), graph triangle counting, Pareto skyline, and the
shuffle-compacted Jaccard join.

Each pairs a scale-aware Spark formulation (two-phase rank/sweep, no
single-partition sorts, integer-hashed join keys) with a brute-force
DuckDB oracle — identical output proves the distributed algorithm is
lossless, which is the point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_usnvc_spark.functions.text import tokens
from pipeline_usnvc_spark.plans.dedup_queries import _SHINGLES_SQL
from pipeline_usnvc_spark.plans.registry import query
from pipeline_usnvc_spark.sources.tables import load_table


def _d38(c):
    """Exact-integer product/sum domain (overflow-safe sufficient
    statistics — the suite-wide DECIMAL(38,0) discipline)."""
    return c.cast("decimal(38,0)")


# ---------------------------------------------------------------------------
# q96 — equi-depth histogram of lineitem prices via EXACT global rank.
# A bare Window.orderBy would funnel the table through one task; the
# operators/rank.py two-phase formulation (range shuffle + local
# row_number + broadcast offsets) keeps every stage parallel. Ties on
# price are interchangeable across the bucket boundary, so every
# aggregate below is deterministic at any sf.
# ---------------------------------------------------------------------------
@query(
    "q96_equidepth_histogram",
    oracle="""
    WITH ranked AS (
        SELECT l_extendedprice,
               row_number() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS r,
               count(*) OVER () AS n
        FROM lineitem
    )
    SELECT ((r - 1) * 8) // n + 1 AS bucket,
           count(*) AS n_rows,
           min(l_extendedprice) AS lo,
           max(l_extendedprice) AS hi,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS bucket_revenue
    FROM ranked GROUP BY 1
    """,
)
def q96_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.operators.rank import with_global_rank

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    ranked = with_global_rank(
        li, "l_extendedprice", "l_orderkey", "l_linenumber", rank_col="r"
    )
    # total row count from the (materialized) ranked table itself —
    # max(rank) — instead of a second parquet scan of lineitem
    total = ranked.groupBy().agg(F.max("r").alias("n"))
    return (
        ranked.join(F.broadcast(total))
        # integer div on both sides: no float rounding at boundaries
        .withColumn("bucket", F.expr("(r - 1) * 8 div n + 1"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("bucket_revenue"),
        )
    )


# Per-key basket cap shared by the co-purchase graph builders (q97,
# q120/copurchase_edges): keep the lowest-id max_items per key before
# any quadratic same-key self-join. The window shuffles on the same
# key as the join, so AQE reuses the exchange — bounding fan-out
# costs no extra shuffle. The SAME constant is interpolated into both
# oracles so engine and oracle can never drift apart.
_BFS_MAX_ITEMS_PER_KEY = 32


def cap_items_per_key(op, key: str, item: str, max_items: int):
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(item)
    return (
        op.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_items)
        .drop("_rn")
    )


def supported_copurchase_edges(
    spark: SparkSession, sf_dir: str, min_support: int = 2
) -> DataFrame:
    """The support-filtered co-purchase graph shared by the graph family
    (q97 triangles, q277 degree power-law, q420 k-core): undirected
    (pa < pb) part pairs appearing in >= ``min_support`` common orders
    (1 = every distinct pair), with the per-order basket capped
    (cap_items_per_key) so the pair join stays bounded."""
    op = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    op = cap_items_per_key(op, "l_orderkey", "l_partkey", _BFS_MAX_ITEMS_PER_KEY)
    a, b = op.alias("a"), op.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .agg(F.count("*").alias("_support"))
    )
    if min_support > 1:
        edges = edges.filter(F.col("_support") >= min_support)
    return edges.select("pa", "pb")


# The capped-basket CTE and the undirected edge construction, shared
# VERBATIM by the q97/q277 oracles (review finding: three hand-kept
# copies of the cap-then-self-join block; q120's directed variant
# reuses the op CTE). One definition keeps the cap constant and the
# pa < pb / support discipline engine-and-oracle identical.
_OP_CTE_SQL = f"""op_all AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    op AS (
        SELECT l_orderkey, l_partkey FROM op_all
        QUALIFY row_number() OVER (PARTITION BY l_orderkey ORDER BY l_partkey) <= {_BFS_MAX_ITEMS_PER_KEY}
    )"""


def _copurchase_edges_sql(min_support: int) -> str:
    having = f" HAVING count(*) >= {min_support}" if min_support > 1 else ""
    return f"""{_OP_CTE_SQL},
    edges AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2{having}
    )"""


# ---------------------------------------------------------------------------
# q97 — triangle counting on the co-purchase graph (parts appearing in
# the same order ≥2 times). The support filter is the real-world guard
# that keeps edge count (and the wedge join) bounded; AQE handles the
# residual skew on hub parts. Per-node triangle participation makes a
# richer check than one global count.
# ---------------------------------------------------------------------------
@query(
    "q97_triangle_count",
    oracle=f"""
    WITH {_copurchase_edges_sql(2)},
    tri AS (
        SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
        FROM edges e1
        JOIN edges e2 ON e1.pb = e2.pa
        JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    )
    SELECT node, count(*) AS n_triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    ) GROUP BY node
    """,
)
def q97_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = supported_copurchase_edges(spark, sf_dir)
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.pb") == F.col("e2.pa"))
        .join(e3, (F.col("e3.pa") == F.col("e1.pa")) & (F.col("e3.pb") == F.col("e2.pb")))
        .select(F.col("e1.pa").alias("a"), F.col("e1.pb").alias("b"), F.col("e2.pb").alias("c"))
    )
    nodes = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count("*").alias("n_triangles"))


# ---------------------------------------------------------------------------
# q98 — Pareto skyline of part on (minimize retail price, minimize
# size). Spark runs the O(n log n) distributed sweep
# (operators/skyline.py); the oracle is the O(n^2) NOT EXISTS
# domination anti-join. Identical rows prove the sweep exact.
# ---------------------------------------------------------------------------
@query(
    "q98_skyline",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size)
    )
    """,
)
def q98_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.operators.skyline import skyline_2d

    part = load_table(spark, sf_dir, "part")
    front = skyline_2d(part, "p_retailprice", "p_size")
    return part.join(front, ["p_retailprice", "p_size"]).select(
        "p_partkey", "p_retailprice", "p_size"
    )


# ---------------------------------------------------------------------------
# q99 — exact shingle-set Jaccard with 60-bit INTEGER shingle keys
# (ROADMAP: shuffle-bytes compaction). Same pairs as the string-keyed
# q54/q94 path at threshold 0.2; the inverted-index self-join
# exchanges 8-byte longs instead of ~25-byte strings — the win at
# 100 TB where the pair-join shuffle dominates. Oracle hashes
# identically, so the comparison stays bit-exact.
# ---------------------------------------------------------------------------
@query(
    "q99_int_shingle_jaccard",
    oracle=f"""
    WITH sh AS (
        SELECT DISTINCT doc_id,
               CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS shingle
        FROM ({_SHINGLES_SQL})
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           CAST(n_inter AS DOUBLE) / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) AS jaccard
    FROM inter
      JOIN sizes sa ON inter.id_a = sa.doc_id
      JOIN sizes sb ON inter.id_b = sb.doc_id
    WHERE CAST(n_inter AS DOUBLE) / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) >= 0.2
    """,
)
def q99_int_shingle_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.2, int_hash=True
    )


# ---------------------------------------------------------------------------
# q100 — mergeable distinct-count sketches (Datasketches HLL). The
# 100 TB story: sketches aggregate map-side and MERGE across
# partitions/days (register-wise max — associative, order-free), so a
# year of daily sketches rolls up without rescanning raw data.
# Estimates are approximate → rows-only check; the pytest property
# asserts union-of-group-sketches == direct whole-table sketch and
# <3% error vs exact counts.
# ---------------------------------------------------------------------------
@query("q100_hll_mergeable_distinct")
def q100_hll_mergeable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("exact_users"),
    )
    est = per_type.select(
        "event_type",
        "n_events",
        F.hll_sketch_estimate("sk").cast("bigint").alias("approx_users"),
        "exact_users",
    )
    # Self-certifying accuracy contract (VERDICT r03 item 4): the
    # exact distinct is tiny (per-type grain); the contract rides a
    # filter, so any consumption proves the estimate sits inside
    # 3×rsd (lgConfigK=12 → rsd ≈ 1.6%).
    from pipeline_usnvc_spark.operators.contracts import attach_error_contract

    return attach_error_contract(est, "approx_users", "exact_users", 0.05, "HLL sketch")


def _q101_oracle(iterations: int = 10) -> str:
    """Chained-CTE unrolling of the exact fixed-point PageRank
    (VERDICT r12 item 2): a FIXED iteration count sidesteps DuckDB's
    no-aggregates-in-recursive-CTE limit (the q420 blocker) — each
    round is one non-recursive CTE joining the previous iterate to
    the adjacency list. Integer floor division and integer sums make
    every iterate engine-identical; the final rank is one
    CAST/divide."""
    from pipeline_usnvc_spark.operators.graph import PAGERANK_SCALE

    teleport = PAGERANK_SCALE * 15 // 100
    ctes = [
        f"r0 AS (SELECT node, CAST({PAGERANK_SCALE} AS BIGINT) AS r FROM nodes)"
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""r{i} AS (
        SELECT n.node,
               CAST({teleport} + (85 * coalesce(s.inflow, 0)) // 100
                    AS BIGINT) AS r
        FROM nodes n LEFT JOIN (
            SELECT a.v AS node, sum(r.r // a.deg) AS inflow
            FROM adj a JOIN r{i - 1} r ON r.node = a.u
            GROUP BY a.v
        ) s ON s.node = n.node
    )"""
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH e AS (SELECT DISTINCT l_suppkey AS u, l_partkey AS v FROM lineitem),
    nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY u),
    adj AS (SELECT e.u, e.v, d.deg FROM e JOIN deg d ON d.u = e.u),
    {joined}
    SELECT node, CAST(r AS DOUBLE) / {float(PAGERANK_SCALE)} AS rank
    FROM r{iterations}
    """


# ---------------------------------------------------------------------------
# q101 — PageRank over the supplier→part supply graph (10 damped
# rounds; operators/graph.pagerank). HASH-GREEN since round 13: the
# fixed-point integer recurrence makes every iterate bit-reproducible
# (see the operator docstring), and the oracle unrolls the 10 rounds
# as chained non-recursive CTEs. The pytest property checks mass
# conservation and hub ordering independently.
# ---------------------------------------------------------------------------
@query("q101_pagerank", oracle=_q101_oracle())
def q101_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").alias("src"), F.col("l_partkey").alias("dst")
    )
    ranks = pagerank(edges, iterations=10)
    # Self-certifying invariants (VERDICT r03 item 4): with the
    # rank(v) = (1-d) + d·Σ inflow recurrence, every node's rank is
    # ≥ the teleport floor (1-d), and total mass never exceeds the
    # node count (dangling parts leak mass, so ≤, not ==; equality on
    # the all-out-degree graph is the pytest property). The contract
    # rides a FILTER (operators/contracts.py) so it executes under
    # any consumption — a bare assert column is pruned by count().
    from pipeline_usnvc_spark.operators.contracts import contract_filter

    bounds = ranks.agg(
        F.min("rank").alias("min_rank"),
        F.sum("rank").alias("total_rank"),
        F.count("*").cast("bigint").alias("n_nodes"),
    )
    return contract_filter(
        ranks.crossJoin(F.broadcast(bounds)),
        (F.col("min_rank") >= F.lit(0.15) - F.lit(1e-9))
        & (F.col("total_rank") <= F.col("n_nodes").cast("double") + F.lit(1e-6)),
        F.concat(
            F.lit("pagerank invariants violated: min="),
            F.col("min_rank"),
            F.lit(" total="),
            F.col("total_rank"),
        ),
    ).drop("min_rank", "total_rank", "n_nodes")


# ---------------------------------------------------------------------------
# q102 — correlated LATERAL subquery join: per-customer top-2 orders.
# Catalyst rewrites the lateral limit into a ranked window under
# DomainJoin — no per-row re-execution — while DuckDB executes the
# same ANSI construct natively. The per-group LIMIT needs a total
# order (o_totalprice DESC, o_orderkey) to be engine-portable.
# ---------------------------------------------------------------------------
@query(
    "q102_lateral_topk",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, l.o_orderkey, l.o_totalprice
    FROM customer c, LATERAL (
        SELECT o.o_orderkey, o.o_totalprice
        FROM orders o WHERE o.o_custkey = c.c_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2
    ) l
    """,
)
def q102_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("q102_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("q102_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, l.o_orderkey, l.o_totalprice
        FROM q102_customer c, LATERAL (
            SELECT o.o_orderkey, o.o_totalprice
            FROM q102_orders o WHERE o.o_custkey = c.c_custkey
            ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2
        ) l
        """
    )


# ---------------------------------------------------------------------------
# q120 — bounded BFS reachability (hop distance ≤ 4) over the
# co-purchase part graph, from the smallest part key. Iterative
# frontier expansion: each round joins only the current frontier
# against the edge list (shuffle keyed on the join key), anti-joins
# the visited set, and materializes the new level to cut lineage —
# the same reliable-checkpoint discipline as connected components.
# Oracle is a depth-bounded recursive CTE. At 100 TB the edge list is
# the scale risk: the same-order self-join is QUADRATIC in
# items-per-order, so the basket is capped (cap_items_per_key, shared
# with q97) BEFORE the self-join, identically on both engines. TPC-H
# baskets are bounded (≤ 7) so the cap is inert on testdata; on a
# skewed real catalog it bounds edge fan-out at cap² per order (same
# stop-shingle discipline as ngram_jaccard_pairs' max_doc_freq).
# Bounded fan-out asserted on a skewed fixture in tests/test_scale_ops.
# ---------------------------------------------------------------------------


def copurchase_edges(
    op: DataFrame,
    key: str = "l_orderkey",
    item: str = "l_partkey",
    max_items_per_key: int = _BFS_MAX_ITEMS_PER_KEY,
) -> DataFrame:
    """Distinct co-occurrence edges (src, dst) from a (key, item)
    table, with the per-key basket capped at ``max_items_per_key``
    (lowest item ids win) BEFORE the quadratic self-join. The cap
    window shuffles on the same key as the join, so AQE reuses the
    exchange — bounding fan-out costs no extra shuffle."""
    capped = cap_items_per_key(op, key, item, max_items_per_key)
    a, b = capped.alias("a"), capped.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{key}") == F.col(f"b.{key}"))
            & (F.col(f"a.{item}") != F.col(f"b.{item}")),
        )
        .select(F.col(f"a.{item}").alias("src"), F.col(f"b.{item}").alias("dst"))
        .distinct()
    )


@query(
    "q120_bfs_reachability",
    oracle=f"""
    WITH RECURSIVE {_OP_CTE_SQL},
    edges AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    bfs (node, dist) AS (
        SELECT (SELECT min(l_partkey) FROM lineitem) AS node, 0 AS dist
        UNION
        SELECT e.dst, bfs.dist + 1
        FROM bfs JOIN edges e ON e.src = bfs.node
        WHERE bfs.dist < 4
    )
    SELECT node AS part_id, CAST(min(dist) AS INT) AS hops
    FROM bfs GROUP BY node
    """,
)
def q120_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    from pipeline_usnvc_spark.operators.checkpoint import materialize

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    edges = materialize(copurchase_edges(op))
    seed = li.agg(F.min("l_partkey").alias("node")).select(
        "node", F.lit(0).cast("int").alias("dist")
    )
    schema = StructType(
        [StructField("node", LongType()), StructField("dist", IntegerType())]
    )
    visited = materialize(spark.createDataFrame(seed.collect(), schema))
    frontier = visited
    for depth in range(1, 5):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(depth).cast("int"))
        )
        frontier = materialize(nxt)
        if not frontier.take(1):
            break
        visited = materialize(visited.unionByName(frontier))
    return visited.select(F.col("node").alias("part_id"), F.col("dist").alias("hops"))


# ---------------------------------------------------------------------------
# q140 — Count-Min sketch: a (d=4, w=1024) CM sketch over the corpus
# token stream, then point estimates for every token whose true count
# is ≥ 50. Estimates are deterministic (md5-derived bucket hashes, the
# engine-portable idiom from q37), so unlike most sketches this one is
# oracle-EXACT — DuckDB builds the identical sketch and reads the same
# min-of-d-counters, overestimates included.
#
# Scale shape: the sketch is an additive groupBy — map-side partial
# aggregation reduces every partition to ≤ d·w counter rows, so the
# shuffle is O(d·w·partitions) no matter the corpus size, and sketches
# of disjoint corpus splits merge by addition (the mergeability that
# makes CM the streaming/windowed counterpart of exact counts). The
# probe join broadcasts the d·w-row sketch.
# ---------------------------------------------------------------------------
_CM_D, _CM_W = 4, 1024


def _cm_bucket_sql(token_expr: str, i_expr: str) -> str:
    return (
        f"CAST('0x' || substr(md5({token_expr} || ':' || CAST({i_expr} AS VARCHAR)), 1, 8) AS BIGINT) % {_CM_W}"
    )


@query(
    "q140_count_min",
    oracle=f"""
    WITH tok AS (
        SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-zA-Z0-9]+'), t -> t <> '')) AS token
        FROM documents
    ),
    rows_i AS (SELECT i FROM range({_CM_D}) t(i)),
    sketch AS (
        SELECT r.i, {_cm_bucket_sql('tok.token', 'r.i')} AS bucket, count(*) AS c
        FROM tok CROSS JOIN rows_i r
        GROUP BY r.i, {_cm_bucket_sql('tok.token', 'r.i')}
    ),
    truec AS (SELECT token, count(*) AS true_cnt FROM tok GROUP BY token),
    probes AS (SELECT token, true_cnt FROM truec WHERE true_cnt >= 50)
    SELECT p.token, p.true_cnt, min(s.c) AS cm_est
    FROM probes p
    CROSS JOIN rows_i r
    JOIN sketch s ON s.i = r.i AND s.bucket = {_cm_bucket_sql('p.token', 'r.i')}
    GROUP BY p.token, p.true_cnt
    """,
)
def q140_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens("text")).alias("token"))
    rows_i = spark.range(_CM_D).select(F.col("id").cast("int").alias("i"))

    def bucket(token_col, i_col):
        return (
            F.conv(
                F.substring(F.md5(F.concat(token_col, F.lit(":"), i_col.cast("string"))), 1, 8),
                16,
                10,
            ).cast("bigint")
            % _CM_W
        )

    sketch = (
        tok.crossJoin(F.broadcast(rows_i))
        .groupBy("i", bucket(F.col("token"), F.col("i")).alias("bucket"))
        .agg(F.count("*").alias("c"))
    )
    truec = tok.groupBy("token").agg(F.count("*").alias("true_cnt"))
    probes = truec.filter(F.col("true_cnt") >= 50)
    return (
        probes.crossJoin(F.broadcast(rows_i))
        .withColumn("bucket", bucket(F.col("token"), F.col("i")))
        .join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy("token", "true_cnt")
        .agg(F.min("c").alias("cm_est"))
    )


# ---------------------------------------------------------------------------
# q142 — grouped least-squares trend: per-user slope/intercept of
# event value over time, from the five sufficient statistics
# (n, Σx, Σy, Σxy, Σx²) — the map-side-combinable way to fit millions
# of tiny regressions in ONE shuffle (what regr_slope does
# internally). Exactness recipe: x = whole seconds since the user's
# first event (bigint), y = floor(value·1000) milli-units (bigint) —
# every sum is integer/decimal-exact in both engines, and the final
# slope/intercept arithmetic is identical IEEE double ops. Spark's
# unix_timestamp truncates fractional seconds; the oracle mirrors it
# with floor(epoch(ts)).
# ---------------------------------------------------------------------------
@query(
    "q142_trend_regression",
    oracle="""
    WITH base AS (
        SELECT user_id,
               CAST(floor(epoch(ts)) AS BIGINT)
                 - min(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id) AS xs,
               CAST(floor(value * 1000) AS BIGINT) AS ys
        FROM events
    ),
    stats AS (
        SELECT user_id,
               count(*) AS n,
               CAST(sum(CAST(xs AS DECIMAL(38,0))) AS DOUBLE) AS sx,
               CAST(sum(CAST(ys AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(sum(CAST(xs AS DECIMAL(19,0)) * CAST(ys AS DECIMAL(19,0))) AS DOUBLE) AS sxy,
               CAST(sum(CAST(xs AS DECIMAL(19,0)) * CAST(xs AS DECIMAL(19,0))) AS DOUBLE) AS sxx
        FROM base
        GROUP BY user_id
    )
    SELECT user_id, n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx) * 3600.0 / 1000.0, 9) AS slope_per_hour,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n / 1000.0, 9) AS intercept
    FROM stats
    WHERE n >= 10 AND (n * sxx - sx * sx) > 0
    """,
)
def q142_trend_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts").cast("bigint")
    x0 = F.min(epoch).over(Window.partitionBy("user_id"))
    base = ev.select(
        "user_id",
        (epoch - x0).alias("xs"),
        F.floor(F.col("value") * 1000).cast("bigint").alias("ys"),
    )
    dx, dy = F.col("xs").cast("decimal(19,0)"), F.col("ys").cast("decimal(19,0)")
    stats = base.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(F.col("xs").cast("decimal(38,0)")).cast("double").alias("sx"),
        F.sum(F.col("ys").cast("decimal(38,0)")).cast("double").alias("sy"),
        F.sum(dx * dy).cast("double").alias("sxy"),
        F.sum(dx * dx).cast("double").alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return (
        stats.filter((n >= 10) & (n * sxx - sx * sx > 0))
        .select(
            "user_id",
            "n",
            F.round(slope * 3600.0 / 1000.0, 9).alias("slope_per_hour"),
            F.round((sy - slope * sx) / n / 1000.0, 9).alias("intercept"),
        )
    )


# ---------------------------------------------------------------------------
# q183 — bitmap-accelerated exact distinct counts (Spark 3.5+ bitmap
# aggregates): the two-level (group, bitmap_bucket) formulation — one
# RoaringBitmap-style fixed 4 KB bitmap per (group, 32768-value
# bucket) constructed map-side, counts summed per group. EXACT (not a
# sketch), so the oracle is plain COUNT(DISTINCT); at 100 TB this is
# the dense-int-key distinct strategy where per-bucket bitmaps merge
# associatively in the combiner and the shuffle carries bitmaps, not
# values (the same pattern warehouses use for user-id distincts).
# ---------------------------------------------------------------------------
@query(
    "q183_bitmap_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q183_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def bitmap_distinct(col: str, alias: str) -> DataFrame:
        inner = li.groupBy(
            "l_returnflag", F.expr(f"bitmap_bucket_number({col})").alias("_b")
        ).agg(
            F.expr(
                f"bitmap_count(bitmap_construct_agg(bitmap_bit_position({col})))"
            ).alias("_c")
        )
        return inner.groupBy("l_returnflag").agg(
            F.sum("_c").cast("bigint").alias(alias)
        )

    return bitmap_distinct("l_partkey", "n_parts").join(
        bitmap_distinct("l_suppkey", "n_supps"), "l_returnflag"
    )


# ---------------------------------------------------------------------------
# q198 — KMV (k-minimum-values) distinct-count sketch per source over
# the token vocabulary, k=32: keep the k smallest 60-bit md5 hashes
# of the distinct tokens; estimate distinct = (k-1) / (h_k / 2^60).
# The KMV estimator (Bar-Yossef et al. 2002) is mergeable by
# min-merging hash sets — the union-merge identity is property-tested
# in tests/test_scale_ops.py, and q100 gives the HLL counterpart.
# Deterministic md5 hashing makes the ESTIMATE itself oracle-exact;
# the exact distinct count and signed relative error ride along, so
# the result doubles as an accuracy report.
#
# Scale: per-(source, token) distinct first (map-side combine), then
# a size-k top-k per source — the shuffle carries one hash per
# distinct token, never documents; state per source is k longs.
# ---------------------------------------------------------------------------
@query(
    "q198_kmv_distinct",
    oracle="""
    WITH toks AS (
        SELECT DISTINCT source, tok
        FROM (
            SELECT source,
                   unnest(list_filter(string_split_regex(lower(text), '[^a-zA-Z0-9]+'),
                                      t -> t <> '')) AS tok
            FROM documents
        )
    ),
    hashed AS (
        SELECT source, tok, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
        FROM toks
    ),
    kept AS (
        SELECT source, h,
               row_number() OVER (PARTITION BY source ORDER BY h, tok) AS rk,
               count(*) OVER (PARTITION BY source) AS n_exact
        FROM hashed
    )
    SELECT source,
           CAST(max(n_exact) AS BIGINT) AS exact_distinct,
           CAST(count(*) AS BIGINT) AS n_kept,
           CASE WHEN max(n_exact) < 32 THEN CAST(max(n_exact) AS DOUBLE)
                ELSE 31.0 / (CAST(max(CASE WHEN rk = 32 THEN h END) AS DOUBLE)
                             / 1152921504606846976.0)
           END AS est_distinct,
           (CASE WHEN max(n_exact) < 32 THEN CAST(max(n_exact) AS DOUBLE)
                 ELSE 31.0 / (CAST(max(CASE WHEN rk = 32 THEN h END) AS DOUBLE)
                              / 1152921504606846976.0)
            END - CAST(max(n_exact) AS DOUBLE)) / CAST(max(n_exact) AS DOUBLE) AS rel_err
    FROM kept WHERE rk <= 32
    GROUP BY source
    """,
)
def q198_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("source", F.explode(tokens("text")).alias("tok"))
        .distinct()
    )
    hashed = toks.select(
        "source",
        "tok",
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    w_rk = Window.partitionBy("source").orderBy("h", "tok")
    w_all = Window.partitionBy("source")
    kept = hashed.select(
        "source",
        "h",
        F.row_number().over(w_rk).alias("rk"),
        F.count("*").over(w_all).alias("n_exact"),
    ).filter(F.col("rk") <= 32)
    TWO60 = 1152921504606846976.0
    agg = kept.groupBy("source").agg(
        F.max("n_exact").cast("bigint").alias("exact_distinct"),
        F.count("*").cast("bigint").alias("n_kept"),
        F.max(F.when(F.col("rk") == 32, F.col("h"))).alias("h_k"),
    )
    est = F.when(
        F.col("exact_distinct") < 32, F.col("exact_distinct").cast("double")
    ).otherwise(F.lit(31.0) / (F.col("h_k").cast("double") / F.lit(TWO60)))
    return agg.select(
        "source",
        "exact_distinct",
        "n_kept",
        est.alias("est_distinct"),
        (
            (est - F.col("exact_distinct").cast("double"))
            / F.col("exact_distinct").cast("double")
        ).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# q212 — approximate rolling active users via mergeable day-sketches:
# one HLL sketch per day (the only pass over raw events), then each
# day's trailing-7-day WAU = the UNION of 7 daily sketches — no
# per-window rescan of events, which is what makes rolling distinct
# affordable at 100 TB (q205 is the exact counterpart; this is its
# scale path). The 7× fan-out joins day-grain SKETCH rows (KBs), and
# hll_union_agg merges them losslessly (the q100 property).
# Approximate → rows-only; accuracy vs the exact q205 is asserted in
# tests (HLL++ default rsd ≈ 5%).
# ---------------------------------------------------------------------------
@query("q212_rolling_actives_sketch")
def q212_rolling_actives_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day_sketches = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
    )
    spine = day_sketches.select(F.col("day").alias("s_day"))
    # TRUE 7x fan-out + equi-join back to the observed-day spine (the
    # q205 review fix): the old pure-inequality spine join planned as
    # a BroadcastNestedLoopJoin over |days|^2 predicate pairs. The
    # spine join keeps gap days (activity within 7d but none that day)
    # out of the result, exactly as the inner inequality join did.
    rolled = (
        day_sketches.select(
            "sk",
            F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias("s_day"),
        )
        .join(spine, "s_day")
        .groupBy("s_day")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("bigint").alias("approx_wau"))
    )
    # Self-certifying contract vs the EXACT trailing-7-day WAU
    # (VERDICT r03 item 4): computed from (day, user) distinct pairs
    # — day×user grain, the q205 shape, never raw events — and
    # asserted within 3×rsd (lgConfigK=12 → rsd ≈ 1.6%) during
    # execution, so the rows-only driver row certifies the estimate.
    # user-day grain explode (NOT an inequality spine join — that
    # nested-loops the whole user-day table against every spine day);
    # days outside the spine drop in the inner join with rolled below.
    day_users = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    exact = (
        day_users.select(
            "user_id",
            F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias("s_day"),
        )
        .groupBy("s_day")
        .agg(F.countDistinct("user_id").cast("bigint").alias("exact_wau"))
    )
    from pipeline_usnvc_spark.operators.contracts import attach_error_contract

    return attach_error_contract(
        rolled.join(exact, "s_day"), "approx_wau", "exact_wau", 0.05, "WAU sketch"
    ).select(
        F.date_format("s_day", "yyyy-MM-dd").alias("day"),
        "approx_wau",
        "exact_wau",
        "rel_err",
        "within_rsd_bounds",
    )


# ---------------------------------------------------------------------------
# q227 — RFM segmentation: the classic customer-value partitioning
# (recency / frequency / monetary quintiles + a rule-based segment
# label). Exactness recipe: recency is an integer day diff against a
# FIXED reference date, monetary is integer cents, and every ntile
# ordering folds c_custkey in as the tiebreaker so the quintile
# boundaries are deterministic at every sf. One exchange on custkey
# for the per-customer aggregate; the three ntiles share one
# customer-grain frame (tiny).
# ---------------------------------------------------------------------------
@query(
    "q227_rfm_segmentation",
    oracle="""
    WITH rfm AS (
        SELECT o_custkey,
               CAST(date_diff('day', CAST(max(o_orderdate) AS DATE), DATE '2002-01-01') AS BIGINT) AS recency_days,
               CAST(count(*) AS BIGINT) AS frequency,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
        FROM orders GROUP BY o_custkey
    ),
    scored AS (
        SELECT *,
               CAST(ntile(5) OVER (ORDER BY recency_days ASC, o_custkey) AS INT) AS r_score,
               CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS INT) AS f_score,
               CAST(ntile(5) OVER (ORDER BY monetary_cents DESC, o_custkey) AS INT) AS m_score
        FROM rfm
    )
    SELECT o_custkey, recency_days, frequency, monetary_cents,
           r_score, f_score, m_score,
           CASE WHEN r_score = 1 AND f_score <= 2 AND m_score <= 2 THEN 'champion'
                WHEN f_score <= 2 THEN 'loyal'
                WHEN r_score >= 4 AND f_score >= 4 THEN 'hibernating'
                WHEN r_score >= 4 THEN 'at_risk'
                ELSE 'regular' END AS segment
    FROM scored
    """,
)
def q227_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("2002-01-01").cast("date"), F.max("o_orderdate").cast("date")
        )
        .cast("bigint")
        .alias("recency_days"),
        F.count("*").cast("bigint").alias("frequency"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("monetary_cents"),
    )
    # Three customer-grain quintiles WITHOUT unpartitioned ntile
    # windows (each would be a single-partition sort of the whole
    # customer table): with_global_rank per dimension + the exact
    # map-side NTILE formula. Each order includes o_custkey so the
    # total order is tie-free and parity with SQL NTILE is exact.
    from pipeline_usnvc_spark.operators.checkpoint import materialize
    from pipeline_usnvc_spark.operators.rank import ntile_from_rank, with_global_rank

    rfm = materialize(rfm)  # consumed by 3 rank passes + the count
    n = rfm.agg(F.count("*").cast("bigint").alias("_n"))
    scored = rfm
    for rank_col, order in (
        ("_rr", [F.col("recency_days").asc(), F.col("o_custkey")]),
        ("_fr", [F.col("frequency").desc(), F.col("o_custkey")]),
        ("_mr", [F.col("monetary_cents").desc(), F.col("o_custkey")]),
    ):
        scored = with_global_rank(scored, *order, rank_col=rank_col)
    scored = (
        scored.crossJoin(F.broadcast(n))
        .withColumn("r_score", ntile_from_rank(F.col("_rr"), F.col("_n"), 5))
        .withColumn("f_score", ntile_from_rank(F.col("_fr"), F.col("_n"), 5))
        .withColumn("m_score", ntile_from_rank(F.col("_mr"), F.col("_n"), 5))
        .drop("_rr", "_fr", "_mr", "_n")
    )
    seg = (
        F.when(
            (F.col("r_score") == 1) & (F.col("f_score") <= 2) & (F.col("m_score") <= 2),
            "champion",
        )
        .when(F.col("f_score") <= 2, "loyal")
        .when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "hibernating")
        .when(F.col("r_score") >= 4, "at_risk")
        .otherwise("regular")
    )
    return scored.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        "r_score",
        "f_score",
        "m_score",
        seg.alias("segment"),
    )


# ---------------------------------------------------------------------------
# q228 — market-basket association rules at brand grain: support /
# confidence / lift for co-ordered brand pairs. Items-per-basket is
# the distinct (order, brand) table; the pair join is an equi-join on
# l_orderkey (baskets are small, so pair fan-out is bounded by
# basket-size², never corpus²). All three metrics derive from exact
# integer counts with the final ratios as identical double divisions;
# the support threshold compares integers.
# ---------------------------------------------------------------------------
@query(
    "q228_association_rules",
    oracle="""
    WITH basket AS (
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n_orders AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS total FROM basket),
    brand_cnt AS (
        SELECT p_brand, CAST(count(*) AS BIGINT) AS cnt FROM basket GROUP BY p_brand
    ),
    pair_cnt AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, CAST(count(*) AS BIGINT) AS n_ab
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY a.p_brand, b.p_brand
    )
    SELECT p.brand_a, p.brand_b, p.n_ab,
           ca.cnt AS n_a, cb.cnt AS n_b,
           CAST(p.n_ab AS DOUBLE) / CAST(t.total AS DOUBLE) AS support,
           CAST(p.n_ab AS DOUBLE) / CAST(ca.cnt AS DOUBLE) AS confidence_a_to_b,
           (CAST(p.n_ab AS DOUBLE) * CAST(t.total AS DOUBLE))
             / (CAST(ca.cnt AS DOUBLE) * CAST(cb.cnt AS DOUBLE)) AS lift
    FROM pair_cnt p
    JOIN brand_cnt ca ON ca.p_brand = p.brand_a
    JOIN brand_cnt cb ON cb.p_brand = p.brand_b
    CROSS JOIN n_orders t
    WHERE p.n_ab >= 5
    """,
)
def q228_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    basket = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    total = basket.agg(F.countDistinct("l_orderkey").cast("bigint").alias("total"))
    brand_cnt = basket.groupBy("p_brand").agg(F.count("*").cast("bigint").alias("cnt"))
    a, b = basket.alias("a"), basket.alias("b")
    pair_cnt = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"), F.col("b.p_brand").alias("brand_b")
        )
        .agg(F.count("*").cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= 5)
    )
    ca = brand_cnt.select(F.col("p_brand").alias("brand_a"), F.col("cnt").alias("n_a"))
    cb = brand_cnt.select(F.col("p_brand").alias("brand_b"), F.col("cnt").alias("n_b"))
    return (
        pair_cnt.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .crossJoin(F.broadcast(total))
        .select(
            "brand_a",
            "brand_b",
            "n_ab",
            "n_a",
            "n_b",
            (F.col("n_ab").cast("double") / F.col("total").cast("double")).alias("support"),
            (F.col("n_ab").cast("double") / F.col("n_a").cast("double")).alias(
                "confidence_a_to_b"
            ),
            (
                (F.col("n_ab").cast("double") * F.col("total").cast("double"))
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# q229 — top navigation paths: each user's first-3-event-type path
# (ordered by whole-second timestamp with event_id tiebreak — the
# suite's floor(epoch) discipline), counted across users. The path
# build is one user-keyed window exchange; the path count is a
# string-keyed aggregate over user-grain rows (tiny).
# ---------------------------------------------------------------------------
@query(
    "q229_top_paths",
    oracle="""
    WITH ranked AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                    ORDER BY floor(epoch(ts)), event_id) AS rn
        FROM events
    ),
    paths AS (
        SELECT user_id,
               string_agg(event_type, ' > ' ORDER BY rn) AS path
        FROM ranked WHERE rn <= 3 GROUP BY user_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_users
    FROM paths GROUP BY path
    """,
)
def q229_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.floor(F.col("ts").cast("double")).cast("bigint"), "event_id"
    )
    ranked = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 3)
    paths = ranked.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            " > ",
        ).alias("path")
    )
    return paths.groupBy("path").agg(F.count("*").cast("bigint").alias("n_users"))


# ---------------------------------------------------------------------------
# q230 — Benford first-digit audit (data-quality profiling): the
# observed first-significant-digit distribution of order totals vs
# Benford's log10(1 + 1/d) expectation. The first digit comes from
# the STRING form of integer cents (substr of a BIGINT's decimal
# rendering — engine-identical; deriving it via floor(log10(x))
# flips on 1-ulp log differences near powers of ten). Shares are
# exact-int divisions; the expectation rounds to 6 dp (the ln/libm
# discipline) before the deviation subtraction on both engines.
# ---------------------------------------------------------------------------
@query(
    "q230_benford_audit",
    oracle="""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS d
        FROM orders WHERE o_totalprice > 0
    ),
    obs AS (SELECT d, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY d),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM obs)
    SELECT o.d AS first_digit, o.n,
           CAST(o.n AS DOUBLE) / CAST(t.total AS DOUBLE) AS observed_share,
           round(ln(1.0 + 1.0 / CAST(o.d AS DOUBLE)) / ln(10.0), 6) AS benford_share,
           CAST(o.n AS DOUBLE) / CAST(t.total AS DOUBLE)
             - round(ln(1.0 + 1.0 / CAST(o.d AS DOUBLE)) / ln(10.0), 6) AS deviation
    FROM obs o CROSS JOIN tot t
    """,
)
def q230_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digits = o.select(
        F.substring(
            F.floor(F.col("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("d")
    )
    obs = digits.groupBy("d").agg(F.count("*").cast("bigint").alias("n"))
    tot = obs.agg(F.sum("n").cast("bigint").alias("total"))
    share = F.col("n").cast("double") / F.col("total").cast("double")
    benford = F.round(
        F.log(F.lit(1.0) + F.lit(1.0) / F.col("d").cast("double")) / F.log(F.lit(10.0)),
        6,
    )
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("first_digit"),
            "n",
            share.alias("observed_share"),
            benford.alias("benford_share"),
            (share - benford).alias("deviation"),
        )
    )


# ---------------------------------------------------------------------------
# q231 — weighted median: per return flag, the price at which half
# the total shipped QUANTITY sits below (quantity-weighted median
# price). Exact: integer cents + integer centi-quantity, cumulative
# weight via a window ordered by (price, orderkey, linenumber) —
# tie-free — and the answer is the FIRST row where 2·cumweight ≥
# total (an integer comparison; no interpolation, so no float at
# all until the output cast). One exchange for the flag-keyed window.
# ---------------------------------------------------------------------------
@query(
    "q231_weighted_median",
    oracle="""
    WITH t AS (
        SELECT l_returnflag,
               CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_cents,
               CAST(floor(l_quantity * 100) AS BIGINT) AS qty_centi,
               l_orderkey, l_linenumber
        FROM lineitem
    ),
    cum AS (
        SELECT l_returnflag, price_cents,
               sum(qty_centi) OVER (PARTITION BY l_returnflag
                    ORDER BY price_cents, l_orderkey, l_linenumber
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w,
               sum(qty_centi) OVER (PARTITION BY l_returnflag) AS total_w
        FROM t
    ),
    hit AS (
        SELECT l_returnflag, price_cents, cum_w, total_w,
               row_number() OVER (PARTITION BY l_returnflag
                    ORDER BY cum_w, price_cents) AS rn
        FROM cum WHERE 2 * cum_w >= total_w
    )
    SELECT l_returnflag,
           CAST(price_cents AS DOUBLE) / 100.0 AS weighted_median_price,
           CAST(total_w AS BIGINT) AS total_centi_qty
    FROM hit WHERE rn = 1
    """,
)
def q231_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("price_cents"),
        F.floor(F.col("l_quantity") * 100).cast("bigint").alias("qty_centi"),
        "l_orderkey",
        "l_linenumber",
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("price_cents", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("l_returnflag")
    cum = t.select(
        "l_returnflag",
        "price_cents",
        F.sum("qty_centi").over(w_cum).alias("cum_w"),
        F.sum("qty_centi").over(w_tot).alias("total_w"),
    ).filter(2 * F.col("cum_w") >= F.col("total_w"))
    w_first = Window.partitionBy("l_returnflag").orderBy("cum_w", "price_cents")
    return (
        cum.withColumn("rn", F.row_number().over(w_first))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            (F.col("price_cents").cast("double") / F.lit(100.0)).alias(
                "weighted_median_price"
            ),
            F.col("total_w").cast("bigint").alias("total_centi_qty"),
        )
    )


# ---------------------------------------------------------------------------
# q232 — Gini coefficient of customer spend (inequality profiling of
# the revenue base) per market segment, via the exact rank formula
#     G = (2·Σ(i·x_i)) / (n·Σx_i) − (n+1)/n
# over integer cents with a tie-free rank ordering (spend, custkey).
# Both Σ terms are exact integer sums (DECIMAL(38,0) products — an
# i·x_i product can pass 2^63 at scale); the final expression is the
# identical double arithmetic on both engines. One exchange for the
# customer aggregate, one segment-keyed window for ranks, and a
# segment-grain aggregate (tiny).
# ---------------------------------------------------------------------------
@query(
    "q232_gini_spend",
    oracle="""
    WITH spend AS (
        SELECT c.c_mktsegment, c.c_custkey,
               CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment, c.c_custkey
    ),
    ranked AS (
        SELECT c_mktsegment, cents,
               CAST(row_number() OVER (PARTITION BY c_mktsegment
                    ORDER BY cents, c_custkey) AS BIGINT) AS i
        FROM spend
    ),
    agg AS (
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sum_x,
               CAST(sum(CAST(i AS DECIMAL(38,0)) * CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sum_ix
        FROM ranked GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, n,
           CAST(sum_x AS BIGINT) AS total_cents,
           (2.0 * CAST(sum_ix AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sum_x AS DOUBLE))
             - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) AS gini
    FROM agg
    """,
)
def q232_gini_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    spend = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy("cents", "c_custkey")
    ranked = spend.withColumn("i", F.row_number().over(w).cast("bigint"))
    agg = ranked.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(_d38(F.col("cents"))).cast("decimal(38,0)").alias("sum_x"),
        F.sum(_d38(F.col("i")) * _d38(F.col("cents"))).cast("decimal(38,0)").alias("sum_ix"),
    )
    return agg.select(
        "c_mktsegment",
        "n",
        F.col("sum_x").cast("bigint").alias("total_cents"),
        (
            (F.lit(2.0) * F.col("sum_ix").cast("double"))
            / (F.col("n").cast("double") * F.col("sum_x").cast("double"))
            - (F.col("n").cast("double") + F.lit(1.0)) / F.col("n").cast("double")
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# q277 — degree distribution + power-law fit of the co-purchase
# graph: degree histogram of the part↔part graph, with the log-log
# least-squares slope from exact sufficient statistics over
# 6dp-quantized ln values (the q142/q168 recipe — ln differs in the
# last ulp between JVM and libm, so each ln quantizes to micro-units
# BEFORE the cross-row sums; the slope is then a ratio of exact
# integer sums).
# ---------------------------------------------------------------------------
@query(
    "q277_degree_powerlaw",
    oracle=f"""
    WITH {_copurchase_edges_sql(1)},
    deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
            SELECT pa AS node FROM edges UNION ALL SELECT pb FROM edges
        ) GROUP BY node
    ),
    hist AS (SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes FROM deg GROUP BY degree),
    pts AS (
        SELECT degree, n_nodes,
               CAST(round(ln(CAST(degree AS DOUBLE)) * 1000000.0) AS BIGINT) AS lx_micro,
               CAST(round(ln(CAST(n_nodes AS DOUBLE)) * 1000000.0) AS BIGINT) AS ly_micro
        FROM hist
    ),
    fit AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(lx_micro) AS BIGINT) AS sx,
               CAST(sum(ly_micro) AS BIGINT) AS sy,
               CAST(sum(CAST(lx_micro AS DECIMAL(38,0)) * CAST(ly_micro AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
               CAST(sum(CAST(lx_micro AS DECIMAL(38,0)) * CAST(lx_micro AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx
        FROM pts
    )
    SELECT p.degree, p.n_nodes,
           CASE WHEN f.k < 2 OR CAST(f.k AS DOUBLE) * CAST(f.sxx AS DOUBLE)
                                 - CAST(f.sx AS DOUBLE) * CAST(f.sx AS DOUBLE) = 0.0
                THEN 0.0
                ELSE (CAST(f.k AS DOUBLE) * CAST(f.sxy AS DOUBLE) - CAST(f.sx AS DOUBLE) * CAST(f.sy AS DOUBLE))
                     / (CAST(f.k AS DOUBLE) * CAST(f.sxx AS DOUBLE) - CAST(f.sx AS DOUBLE) * CAST(f.sx AS DOUBLE))
           END AS powerlaw_slope
    FROM pts p CROSS JOIN fit f
    """,
)
def q277_degree_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    # min_support=1: every distinct capped pair (the degree histogram
    # wants the raw graph; q97/q420 use the >= 2 supported variant)
    edges = supported_copurchase_edges(spark, sf_dir, min_support=1)
    deg = (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("degree"))
    )
    hist = deg.groupBy("degree").agg(F.count("*").cast("bigint").alias("n_nodes"))
    micro = lambda c: F.round(F.log(c.cast("double")) * 1000000.0).cast("bigint")  # noqa: E731
    pts = hist.select(
        "degree",
        "n_nodes",
        micro(F.col("degree")).alias("lx_micro"),
        micro(F.col("n_nodes")).alias("ly_micro"),
    )
    fit = pts.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("lx_micro").cast("bigint").alias("sx"),
        F.sum("ly_micro").cast("bigint").alias("sy"),
        F.sum(_d38(F.col("lx_micro")) * _d38(F.col("ly_micro"))).cast("decimal(38,0)").alias("sxy"),
        F.sum(_d38(F.col("lx_micro")) * _d38(F.col("lx_micro"))).cast("decimal(38,0)").alias("sxx"),
    )
    kd = F.col("k").cast("double")
    denom = kd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    # single-point histogram → 0/0 slope: Spark NULL vs DuckDB NaN —
    # guard to 0.0 on both engines (r4 review).
    slope = F.when((F.col("k") < 2) | (denom == 0.0), F.lit(0.0)).otherwise(
        (kd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double"))
        / denom
    )
    return (
        pts.select("degree", "n_nodes")
        .crossJoin(F.broadcast(fit))
        .select("degree", "n_nodes", slope.alias("powerlaw_slope"))
    )


# ---------------------------------------------------------------------------
# q282 — Apriori level 2→3: frequent brand TRIPLES generated the
# level-wise way — join frequent pairs sharing a leading brand to
# form candidates, verify support by intersecting baskets (an
# equi-join on the order key), and keep triples meeting min-support.
# The candidate-generation-then-verify loop is THE classic frequent-
# itemset shape; one level is enough to pin the join/prune mechanics
# (deeper levels repeat the same plan). All counts exact ints.
# ---------------------------------------------------------------------------
@query(
    "q282_apriori_triples",
    oracle="""
    WITH basket AS (
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    pair_cnt AS (
        SELECT a.p_brand AS b1, b.p_brand AS b2, CAST(count(*) AS BIGINT) AS n12
        FROM basket a JOIN basket b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY 1, 2 HAVING count(*) >= 5
    ),
    cand AS (
        SELECT x.b1, x.b2, y.b2 AS b3
        FROM pair_cnt x JOIN pair_cnt y ON y.b1 = x.b1 AND y.b2 > x.b2
    ),
    verified AS (
        SELECT c.b1, c.b2, c.b3, CAST(count(*) AS BIGINT) AS support
        FROM cand c
        JOIN basket x ON x.p_brand = c.b1
        JOIN basket y ON y.l_orderkey = x.l_orderkey AND y.p_brand = c.b2
        JOIN basket z ON z.l_orderkey = x.l_orderkey AND z.p_brand = c.b3
        GROUP BY c.b1, c.b2, c.b3 HAVING count(*) >= 5
    )
    SELECT b1, b2, b3, support FROM verified
    """,
)
def q282_apriori_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    basket = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a, b = basket.alias("a"), basket.alias("b")
    pair_cnt = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(F.col("a.p_brand").alias("b1"), F.col("b.p_brand").alias("b2"))
        .agg(F.count("*").cast("bigint").alias("n12"))
        .filter(F.col("n12") >= 5)
    )
    x, y = pair_cnt.alias("x"), pair_cnt.alias("y")
    cand = x.join(
        y, (F.col("y.b1") == F.col("x.b1")) & (F.col("y.b2") > F.col("x.b2"))
    ).select(F.col("x.b1").alias("b1"), F.col("x.b2").alias("b2"), F.col("y.b2").alias("b3"))
    # Verification is ORDER-keyed, not brand-keyed (round-6 fix): the
    # old plan joined the broadcast candidate list to baskets on
    # p_brand == b1 — a brand-equality fan-out whose intermediate is
    # |cand| × |orders-per-brand| (~150M rows at sf0.1; OOMs a
    # default-heap session, and at 100 TB it is THE bottleneck). The
    # order-keyed form generates each basket's own C(k,3) triples
    # (bounded by per-basket width, co-partitioned on l_orderkey so
    # the three-way self-join reuses ONE exchange) and then
    # candidate-prunes via the broadcast semi-join — identical
    # support counts, linear in baskets.
    bx, by, bz = basket.alias("bx"), basket.alias("by"), basket.alias("bz")
    triples = (
        bx.join(
            by,
            (F.col("by.l_orderkey") == F.col("bx.l_orderkey"))
            & (F.col("by.p_brand") > F.col("bx.p_brand")),
        )
        .join(
            bz,
            (F.col("bz.l_orderkey") == F.col("bx.l_orderkey"))
            & (F.col("bz.p_brand") > F.col("by.p_brand")),
        )
        .select(
            F.col("bx.p_brand").alias("b1"),
            F.col("by.p_brand").alias("b2"),
            F.col("bz.p_brand").alias("b3"),
        )
    )
    return (
        triples.join(F.broadcast(cand), ["b1", "b2", "b3"])
        .groupBy("b1", "b2", "b3")
        .agg(F.count("*").cast("bigint").alias("support"))
        .filter(F.col("support") >= 5)
    )


# ---------------------------------------------------------------------------
# q235 — Theil–Sen robust trend of daily revenue: the median pairwise
# slope, the standard outlier-proof alternative to OLS (Sen 1968 —
# public method). Scale shape: the pair lattice lives at DAY grain
# (calendar-bounded, data-size-independent — ~2.4k days → ~3M pairs at
# ANY sf), so the O(n²) step never touches fact rows; fact work is one
# day-level rollup. The median is taken WITHOUT a single-partition
# sort: slopes quantize to exact micro-ints, the two middle ranks come
# from operators/rank.with_global_rank under a tie-broken total order,
# and their exact integer sum is the engine-portable median witness
# (odd pair-count → both ranks coincide).
# ---------------------------------------------------------------------------
_THEIL_SEN_MAX_SPAN_DAYS: int | None = None  # long-span cap knob (COVERAGE.md)


@query(
    "q235_theil_sen_trend",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    slopes AS (
        SELECT a.d AS d_i, b.d AS d_j,
               CAST(round(1000000.0 * CAST(b.cents - a.cents AS DOUBLE)
                          / CAST(b.d - a.d AS DOUBLE)) AS BIGINT) AS slope_micro
        FROM daily a JOIN daily b ON b.d > a.d
    ),
    ranked AS (
        SELECT slope_micro,
               row_number() OVER (ORDER BY slope_micro, d_i, d_j) AS r,
               count(*) OVER () AS m
        FROM slopes
    )
    SELECT CAST(max(m) AS BIGINT) AS n_pairs,
           CAST(sum(slope_micro) AS BIGINT) AS mid_sum_micro,
           CAST(count(*) AS BIGINT) AS n_mid,
           CAST(sum(slope_micro) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0
             AS slope_cents_per_day
    FROM ranked
    WHERE r IN ((m + 1) // 2, m // 2 + 1)
    """,
)
def q235_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.operators.checkpoint import materialize
    from pipeline_usnvc_spark.operators.rank import with_global_rank

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date"))
        .cast("bigint")
        .alias("d")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    a, b = daily.alias("a"), daily.alias("b")
    # O(days²) theta join — calendar-bounded, NOT data-bounded (see
    # COVERAGE.md scale-path pairs): row scale-up leaves the day grain
    # unchanged; only a 100× TIME-SPAN blows the pair count up
    # quadratically. The standard mitigation is windowed Theil-Sen:
    # set _THEIL_SEN_MAX_SPAN_DAYS to cap |d_j - d_i| (the theta join
    # gains a band predicate → a range join), at the cost of the
    # textbook all-pairs estimator. None = exact all-pairs (the
    # oracle-matched default).
    pair_pred = F.col("b.d") > F.col("a.d")
    if _THEIL_SEN_MAX_SPAN_DAYS is not None:
        pair_pred = pair_pred & (
            F.col("b.d") - F.col("a.d") <= F.lit(_THEIL_SEN_MAX_SPAN_DAYS)
        )
    slopes = a.join(b, pair_pred).select(
        F.col("a.d").alias("d_i"),
        F.col("b.d").alias("d_j"),
        F.round(
            F.lit(1000000.0)
            * (F.col("b.cents") - F.col("a.cents")).cast("double")
            / (F.col("b.d") - F.col("a.d")).cast("double")
        )
        .cast("bigint")
        .alias("slope_micro"),
    )
    ranked = materialize(
        with_global_rank(slopes, "slope_micro", "d_i", "d_j", rank_col="r")
    )
    m = ranked.agg(F.count("*").cast("bigint").alias("m"))
    return (
        ranked.crossJoin(F.broadcast(m))
        .filter(
            (F.col("r") == F.floor((F.col("m") + 1) / 2))
            | (F.col("r") == F.floor(F.col("m") / 2) + 1)
        )
        .agg(
            F.max("m").cast("bigint").alias("n_pairs"),
            F.sum("slope_micro").cast("bigint").alias("mid_sum_micro"),
            F.count("*").cast("bigint").alias("n_mid"),
            # avg of the selected middle values (1 when the pair count
            # is odd, 2 when even) IS the exact median
            (
                F.sum("slope_micro").cast("double")
                / F.count("*").cast("double")
                / F.lit(1000000.0)
            ).alias("slope_cents_per_day"),
        )
    )


# ---------------------------------------------------------------------------
# q236 — Mann–Kendall monotonic-trend test on daily event counts
# (Mann 1945 / Kendall 1975 — public method): S = Σ_{i<j} sign(c_j −
# c_i) over day-ordered counts, variance with the tie-group
# correction. Day-grain pair lattice (calendar-bounded); every output
# is an exact integer except tau, a single division of exact ints.
# var18 = 18·Var(S) keeps the tie-correction term integral.
# ---------------------------------------------------------------------------
@query(
    "q236_mann_kendall",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT CAST(sum(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        FROM daily a JOIN daily b ON b.d > a.d
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
    ties AS (
        SELECT CAST(COALESCE(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie_term
        FROM (SELECT count(*) AS t FROM daily GROUP BY c HAVING count(*) > 1)
    )
    SELECT n.n_days, s.s_stat,
           CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - ties.tie_term AS BIGINT) AS var18,
           CAST(s.s_stat AS DOUBLE) / (CAST(n.n_days * (n.n_days - 1) AS DOUBLE) / 2.0) AS tau
    FROM s, n, ties
    """,
)
def q236_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    a, b = daily.alias("a"), daily.alias("b")
    s = a.join(b, F.col("b.d") > F.col("a.d")).agg(
        F.sum(
            F.when(F.col("b.c") > F.col("a.c"), 1)
            .when(F.col("b.c") < F.col("a.c"), -1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("s_stat")
    )
    n = daily.agg(F.count("*").cast("bigint").alias("n_days"))
    ties = (
        daily.groupBy("c")
        .agg(F.count("*").cast("bigint").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)), F.lit(0)
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    nd = F.col("n_days")
    return (
        s.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(ties))
        .select(
            "n_days",
            "s_stat",
            (nd * (nd - 1) * (2 * nd + 5) - F.col("tie_term"))
            .cast("bigint")
            .alias("var18"),
            (
                F.col("s_stat").cast("double")
                / ((nd * (nd - 1)).cast("double") / F.lit(2.0))
            ).alias("tau"),
        )
    )


# ---------------------------------------------------------------------------
# q243 — Pareto revenue-coverage: the smallest number of customers
# whose (descending) revenue covers 50/80/90% of the total — the
# "how concentrated is my revenue" curve at three checkpoints.
# Scale shape: customer-grain revenue → operators/rank.
# with_global_cumsum (range-exchange prefix sum, no single-partition
# window); the crossing point per threshold is a pure aggregate over
# the cumulated frame joined to a 3-row literal spine. All
# comparisons are exact-integer cross-products (cents × pct), so the
# crossing row is engine-identical.
# ---------------------------------------------------------------------------
@query(
    "q243_pareto_coverage",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
    ),
    cum AS (
        SELECT cents,
               sum(cents) OVER (ORDER BY cents DESC, o_custkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
        FROM per_cust
    ),
    tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM per_cust)
    SELECT t.pct,
           CAST(count(*) FILTER (WHERE 100 * (c.cum_cents - c.cents) < t.pct * tot.total) AS BIGINT) AS n_customers,
           CAST(min(c.cum_cents) FILTER (WHERE 100 * c.cum_cents >= t.pct * tot.total) AS DOUBLE)
             / CAST(tot.total AS DOUBLE) AS share_reached
    FROM cum c
    CROSS JOIN tot
    CROSS JOIN (SELECT unnest([50, 80, 90]) AS pct) t
    GROUP BY t.pct, tot.total
    """,
)
def q243_pareto_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.operators.rank import with_global_cumsum

    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    cum = with_global_cumsum(
        per_cust, "cents", F.col("cents").desc(), "o_custkey", cumsum_col="cum_cents"
    )
    tot = per_cust.agg(F.sum("cents").cast("bigint").alias("total"))
    spine = spark.createDataFrame([(50,), (80,), (90,)], "pct int").coalesce(1)
    covered = _d38(F.lit(100)) * _d38(F.col("cum_cents") - F.col("cents")) < _d38(
        F.col("pct")
    ) * _d38(F.col("total"))
    crossed = _d38(F.lit(100)) * _d38(F.col("cum_cents")) >= _d38(F.col("pct")) * _d38(
        F.col("total")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(spine))
        .groupBy("pct", "total")
        .agg(
            F.count(F.when(covered, 1)).cast("bigint").alias("n_customers"),
            (
                F.min(F.when(crossed, F.col("cum_cents"))).cast("double")
                / F.col("total").cast("double")
            ).alias("share_reached"),
        )
        .select("pct", "n_customers", "share_reached")
    )


# ---------------------------------------------------------------------------
# q253 — order-priority mix shift: monthly share of each order
# priority and its month-over-month delta — the BI "did our order mix
# move" monitor. Everything after one fact rollup lives at
# month × priority grain (calendar-bounded); the MoM lag partitions
# by priority over months, so no window ever sees fact rows. Shares
# divide exact counts; deltas subtract two such doubles, rounded 6dp.
# ---------------------------------------------------------------------------
@query(
    "q253_priority_mix_shift",
    oracle="""
    WITH monthly AS (
        SELECT strftime(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m') AS month,
               o_orderpriority AS priority,
               CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY 1, 2
    ),
    shared AS (
        SELECT month, priority, n,
               CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY month) AS DOUBLE) AS share
        FROM monthly
    )
    SELECT month, priority, n, share,
           round(share - lag(share) OVER (PARTITION BY priority ORDER BY month), 6) AS mom_delta
    FROM shared
    """,
)
def q253_priority_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format(F.date_trunc("month", F.to_date("o_orderdate")), "yyyy-MM").alias(
            "month"
        ),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count("*").cast("bigint").alias("n"))
    # both windows run over month×priority aggregates, never orders
    w_m = Window.partitionBy("month")
    w_p = Window.partitionBy("priority").orderBy("month")
    shared = monthly.withColumn(
        "share", F.col("n").cast("double") / F.sum("n").over(w_m).cast("double")
    )
    return shared.withColumn(
        "mom_delta", F.round(F.col("share") - F.lag("share").over(w_p), 6)
    )


# ---------------------------------------------------------------------------
# q258 — RFM-segment migration matrix: spend quintile per customer in
# the first half of the order window vs the second, cross-tabulated —
# the "are my best customers decaying" movement report (quintile 0 =
# absent from that half). Scale shape: each half is quintiled
# independently through with_global_rank + the exact map-side NTILE
# formula (no single-partition ntile), the halves meet in one
# customer-keyed full-outer join, and the matrix is a ≤36-cell rollup.
# ---------------------------------------------------------------------------
@query(
    "q258_rfm_migration",
    oracle="""
    WITH bounds AS (
        SELECT min(CAST(o_orderdate AS DATE)) AS d0, max(CAST(o_orderdate AS DATE)) AS d1
        FROM orders
    ),
    tagged AS (
        SELECT o.o_custkey,
               CASE WHEN CAST(o.o_orderdate AS DATE)
                         <= b.d0 + CAST(floor(date_diff('day', b.d0, b.d1) / 2) AS INT)
                    THEN 'early' ELSE 'late' END AS half,
               CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o, bounds b
    ),
    per_cust AS (
        SELECT half, o_custkey, CAST(sum(cents) AS BIGINT) AS spend
        FROM tagged GROUP BY 1, 2
    ),
    seg AS (
        SELECT half, o_custkey,
               ntile(5) OVER (PARTITION BY half ORDER BY spend DESC, o_custkey) AS q
        FROM per_cust
    )
    SELECT COALESCE(e.q, 0) AS seg_early, COALESCE(l.q, 0) AS seg_late,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM (SELECT o_custkey, q FROM seg WHERE half = 'early') e
    FULL OUTER JOIN (SELECT o_custkey, q FROM seg WHERE half = 'late') l
      ON l.o_custkey = e.o_custkey
    GROUP BY 1, 2
    """,
)
def q258_rfm_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.operators.checkpoint import materialize
    from pipeline_usnvc_spark.operators.rank import ntile_from_rank, with_global_rank

    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.to_date("o_orderdate")).alias("d0"),
        F.max(F.to_date("o_orderdate")).alias("d1"),
    )
    tagged = o.crossJoin(F.broadcast(bounds)).select(
        "o_custkey",
        F.when(
            F.to_date("o_orderdate")
            <= F.date_add(
                F.col("d0"), F.floor(F.datediff("d1", "d0") / 2).cast("int")
            ),
            "early",
        )
        .otherwise("late")
        .alias("half"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    per_cust = tagged.groupBy("half", "o_custkey").agg(
        F.sum("cents").cast("bigint").alias("spend")
    )

    def quintiled(half: str):
        part = materialize(per_cust.filter(F.col("half") == half))
        n = part.agg(F.count("*").cast("bigint").alias("_n"))
        return (
            with_global_rank(
                part, F.col("spend").desc(), F.col("o_custkey"), rank_col="_r"
            )
            .crossJoin(F.broadcast(n))
            .select("o_custkey", ntile_from_rank(F.col("_r"), F.col("_n"), 5).alias("q"))
        )

    e = quintiled("early").withColumnRenamed("q", "q_e")
    l = quintiled("late").withColumnRenamed("q", "q_l")
    return (
        e.join(l, "o_custkey", "full_outer")
        .groupBy(
            F.coalesce("q_e", F.lit(0)).cast("int").alias("seg_early"),
            F.coalesce("q_l", F.lit(0)).cast("int").alias("seg_late"),
        )
        .agg(F.count("*").cast("bigint").alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# q269 — inter-order gap medians: each customer's exact median gap
# (days) between consecutive orders, rolled into a gap-median
# histogram — the purchase-cadence profile behind replenishment
# models. Scale shape: per-customer order dates fold into a bounded
# sorted array (per-customer order counts are small by construction —
# the array never exceeds one customer's history), the median is
# exact array math (2× median to stay integral), and the output is a
# ≤ #distinct-median rollup. No window touches order rows.
# ---------------------------------------------------------------------------
@query(
    "q269_order_gap_medians",
    oracle="""
    WITH gaps AS (
        SELECT o_custkey,
               date_diff('day', lag(CAST(o_orderdate AS DATE))
                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                   CAST(o_orderdate AS DATE)) AS gap
        FROM orders
    ),
    lists AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_gaps,
               list_sort(list(gap)) AS s
        FROM gaps WHERE gap IS NOT NULL
        GROUP BY o_custkey
    ),
    per_cust AS (
        SELECT o_custkey, n_gaps,
               CAST(CASE WHEN n_gaps % 2 = 1
                    THEN 2 * s[CAST((n_gaps + 1) // 2 AS INT)]
                    ELSE s[CAST((n_gaps + 1) // 2 AS INT)] + s[CAST(n_gaps // 2 + 1 AS INT)]
                    END AS BIGINT) AS med2
        FROM lists
    )
    SELECT med2, CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(n_gaps) AS BIGINT) AS total_gaps
    FROM per_cust GROUP BY med2
    """,
)
def q269_order_gap_medians(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff(
            F.to_date("o_orderdate"), F.lag(F.to_date("o_orderdate")).over(w)
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    # per-customer exact median from a BOUNDED sorted array (one
    # customer's gap list); 2× median keeps it integral for any parity
    per_cust = gaps.groupBy("o_custkey").agg(
        F.count("*").cast("bigint").alias("n_gaps"),
        F.array_sort(F.collect_list("gap")).alias("s"),
    )
    n = F.col("n_gaps")
    lo = F.element_at("s", ((n + 1) / 2).cast("int"))
    hi = F.element_at("s", (n / 2 + 1).cast("int"))
    med2 = F.when(n % 2 == 1, 2 * lo).otherwise(lo + hi).cast("bigint")
    return (
        per_cust.select(med2.alias("med2"), "n_gaps")
        .groupBy("med2")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum("n_gaps").cast("bigint").alias("total_gaps"),
        )
    )

"""Round-10 query family: physical design / table maintenance — the
operations a 100 TB lakehouse actually schedules — plus the last
documented-but-unimplemented trap mitigation from COVERAGE.md's
domain-bounded theta-join table.

- q410 capped episode mining ↔ q321 exact episode mining: q321's
  user-keyed band self-join is linear in users but QUADRATIC in
  events-per-user-per-window (SCALE.md measured ×145 pair volume at
  4× density — the one measured blow-up in the repo). COVERAGE.md
  names the mitigation: "cap pairs per anchor event (next-K rank
  inside the window)". q410 IS that mitigation, and it drops the
  self-join entirely: K=8 `lead` windows per user stream give each
  anchor its K nearest subsequent events, and the 30-minute predicate
  filters the array BEFORE the explode — O(K·n) rows, ONE exchange
  (the user-keyed window sort), no join. Because the per-user stream
  order (t, event_id) is primarily by time, the in-window successors
  are a PREFIX of the stream successors, so lead(1..K) + time filter
  is EXACTLY "row_number ≤ K inside the window" (the oracle's
  formulation).
- q411 zone-map skipping audit: the file-skipping question every
  columnar table format (parquet row groups, Delta/Iceberg data-file
  stats) answers with min/max zone maps — how much of the table does
  a month-range predicate scan under a given physical layout? Blocks
  of 512 rows are assigned by exact global rank under two layouts
  (natural o_orderkey order vs clustered by o_orderdate); per-block
  min/max dates join the ~84-month calendar spine on range overlap.
  The global rank rides operators/rank.with_global_rank (range
  exchange + map-side id decode — never a single-partition window).
- q412 compaction bin planner: small-file compaction planning —
  concatenation-order bin packing. Each document is a "file" of
  n_chars bytes; within a source files pack greedily into 64 KiB
  target groups via group = cum_bytes_before div target (one
  source-partitioned cumulative window over exact integer bytes).
  Output is the per-source maintenance summary a compaction scheduler
  reads (file count, group count, largest planned group).
- q413 RLE run-count audit: encoding effectiveness of a sort order —
  the run count of o_orderpriority under natural vs clustered layout
  (runs = rows − adjacent-equal pairs). Clustered run count equals
  the distinct-value count (the RLE best case); the adjacency is a
  distributed rank equi-join (y.r = x.r + 1), NOT a single-partition
  lag window — the oracle uses the lag formulation, making the pair
  a real cross-formulation check.

Reference scope note: the reference pipeline (usnvc/usnvc.py) has no
physical-design tooling — this family belongs to the mandated
LLM-pipeline / analytics extension surface (layout family: q370
bucketed co-located join was its only prior member).

Oracle-parity discipline as plans/round9_queries.py: exact integer
sufficient statistics end-to-end (counts, byte sums, block ids, run
counts), integer `div` / `//` for every ratio quantization (micro
units), and the single final double per output produced by the
IDENTICAL expression tree on both engines (micro / 1e6 — exact in
double, no rounding step that could land on a half).

Scale shape: q410 is one window exchange at user grain; q411/q413
pay one range exchange per layout (the price of any global sort) and
join block stats against a calendar-bounded month spine / the
shifted-rank twin; q412 is one hash exchange at source grain. No
data-grain broadcasts anywhere — the only broadcast is the ~84-row
month spine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pipeline_usnvc_spark.plans.registry import query
from pipeline_usnvc_spark.sources.tables import load_table

_CAP_K = 8
_EPISODE_WINDOW_US = 1_800_000_000  # 30 minutes
_BLOCK_ROWS = 512
_COMPACT_TARGET_BYTES = 65_536


# ---------------------------------------------------------------------------
# q410 — capped episode mining (the q321 pair's density-safe path):
# ordered event-type pairs (a → b) within 30 minutes of one user's
# stream, counting AT MOST the K=8 nearest successors per anchor
# event. lead(1..K) over the (t, event_id)-ordered user stream + an
# in-array time filter ≡ row_number ≤ K inside the window (the
# in-window successor set is a prefix of the stream successor set).
# O(K·n) pair rows, one exchange, no self-join.
# ---------------------------------------------------------------------------
@query(
    "q410_capped_episode_mining",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events
    ),
    nxt AS (
        SELECT a.user_id, a.event_type AS type_a, b.event_type AS type_b,
               row_number() OVER (
                   PARTITION BY a.user_id, a.event_id
                   ORDER BY b.t, b.event_id
               ) AS k
        FROM e a JOIN e b
          ON a.user_id = b.user_id
         AND (b.t > a.t OR (b.t = a.t AND b.event_id > a.event_id))
         AND b.t <= a.t + 1800000000
    )
    SELECT type_a, type_b,
           CAST(8 AS BIGINT) AS cap_k,
           CAST(count(*) AS BIGINT) AS n_occurrences_capped,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM nxt WHERE k <= 8
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q410_capped_episode_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("t")
    )
    return capped_episode_mining(ev)


def capped_episode_mining(
    ev: DataFrame,
    cap_k: int = _CAP_K,
    window_us: int = _EPISODE_WINDOW_US,
) -> DataFrame:
    """Capped episode mining over a (user_id, event_id, event_type, t)
    frame. Factored out of q410 (the q406/q340 factoring pattern) so
    the K-prefix truncation is unit-testable on a synthetic DENSE
    stream — the shipped test data's max in-window out-degree is 3, so
    the default cap never binds there and only a dense fixture proves
    the truncation semantics."""
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    nexts = F.array(
        *[
            F.struct(
                F.lead("t", k).over(w).alias("tb"),
                F.lead("event_type", k).over(w).alias("type_b"),
            )
            for k in range(1, cap_k + 1)
        ]
    )
    pairs = (
        ev.select(
            "user_id",
            F.col("event_type").alias("type_a"),
            "t",
            nexts.alias("nx"),
        )
        .select(
            "user_id",
            "type_a",
            F.explode(
                F.filter(
                    "nx",
                    lambda s: s["tb"].isNotNull()
                    & (s["tb"] <= F.col("t") + F.lit(window_us)),
                )
            ).alias("b"),
        )
    )
    return (
        pairs.groupBy("type_a", F.col("b.type_b").alias("type_b"))
        .agg(
            F.count("*").cast("bigint").alias("n_occurrences_capped"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .select(
            "type_a",
            "type_b",
            F.lit(cap_k).cast("bigint").alias("cap_k"),
            "n_occurrences_capped",
            "n_users",
        )
        .orderBy("type_a", "type_b")
    )


def _order_blocks(o: DataFrame, layout: str, *order_cols: str) -> DataFrame:
    """Per-block (512 rows) min/max order date under an exact global
    rank — with_global_rank is the distributed two-phase rank (range
    exchange + map-side id decode), never a single-partition window."""
    from pipeline_usnvc_spark.operators.rank import with_global_rank

    ranked = with_global_rank(o, *order_cols, rank_col="r")
    return (
        ranked.select(F.expr(f"(r - 1) div {_BLOCK_ROWS}").alias("blk"), "od")
        .groupBy("blk")
        .agg(F.min("od").alias("mn"), F.max("od").alias("mx"))
        .withColumn("layout", F.lit(layout))
    )


def _month_spine(o: DataFrame) -> DataFrame:
    """The distinct calendar months present as [m0, m1] intervals —
    the calendar-bounded (~84-row) broadcast spine every zone-map
    workload in this family joins against."""
    return (
        o.select(F.trunc("od", "month").alias("m0")).distinct()
        .select("m0", F.last_day("m0").alias("m1"))
    )


def _two_dim_blocks(
    keyed: DataFrame, order_cols: list[str], layout: str
) -> DataFrame:
    """Per-block (512 rows) min/max for BOTH zone-map dimensions
    (order date, custkey residue) under an exact global rank — the
    q415/q419 block-stats builder. Only the rank keys plus (od, c)
    ride the range exchange: callers project before ranking so dead
    columns (e.g. the Z key for non-Z layouts) never shuffle."""
    from pipeline_usnvc_spark.operators.rank import with_global_rank

    ranked = with_global_rank(
        keyed.select(*dict.fromkeys([*order_cols, "od", "c"])),
        *order_cols,
        rank_col="r",
    )
    return (
        ranked.select(
            F.expr(f"(r - 1) div {_BLOCK_ROWS}").alias("blk"), "od", "c"
        )
        .groupBy("blk")
        .agg(
            F.min("od").alias("mn_d"),
            F.max("od").alias("mx_d"),
            F.min("c").alias("mn_c"),
            F.max("c").alias("mx_c"),
        )
        .withColumn("layout", F.lit(layout))
    )


def _concurrent_union(*builders) -> DataFrame:
    """unionByName of independent layout branches, built in driver
    THREADS (guide §2.6 — overlap independent jobs): each branch's
    with_global_rank runs an eager range-sample + checkpoint action,
    and building N branches sequentially serializes 2N small jobs on
    the driver (q422 profiled 1.55 s of between-job gaps across 36
    jobs). Spark's scheduler runs concurrent actions fine; the branch
    results and the union are identical to the sequential build."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(builders)) as pool:
        dfs = [f.result() for f in [pool.submit(b) for b in builders]]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


# ---------------------------------------------------------------------------
# q411 — zone-map skipping audit: fraction of 512-row blocks a
# min/max zone map lets a one-month range predicate skip, under the
# natural (o_orderkey) layout vs the date-clustered layout. The month
# spine is the distinct calendar months present (~84 — broadcast);
# a block is SCANNED for month m iff [mn, mx] overlaps [m0, m1].
# scan_fraction = scanned block-month pairs / (blocks × months),
# quantized by exact integer division to micro units.
# ---------------------------------------------------------------------------
@query(
    "q411_zonemap_skipping",
    oracle="""
    WITH o AS (
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od FROM orders
    ),
    nat AS (
        SELECT od, (row_number() OVER (ORDER BY o_orderkey) - 1) // 512 AS blk
        FROM o
    ),
    clu AS (
        SELECT od, (row_number() OVER (ORDER BY od, o_orderkey) - 1) // 512 AS blk
        FROM o
    ),
    nb AS (
        SELECT 'clustered_by_date' AS layout, blk, min(od) AS mn, max(od) AS mx
        FROM clu GROUP BY blk
        UNION ALL
        SELECT 'natural_orderkey' AS layout, blk, min(od) AS mn, max(od) AS mx
        FROM nat GROUP BY blk
    ),
    months AS (
        SELECT DISTINCT date_trunc('month', od) AS m0, last_day(od) AS m1 FROM o
    ),
    scans AS (
        SELECT b.layout,
               CAST(count(*) AS BIGINT) AS scanned
        FROM nb b JOIN months m ON b.mn <= m.m1 AND b.mx >= m.m0
        GROUP BY 1
    ),
    sizes AS (
        SELECT layout, CAST(count(*) AS BIGINT) AS n_blocks FROM nb GROUP BY 1
    ),
    nm AS (SELECT CAST(count(*) AS BIGINT) AS n_months FROM months)
    SELECT s.layout,
           CAST(512 AS BIGINT) AS block_rows,
           z.n_blocks, nm.n_months,
           s.scanned AS scanned_block_months,
           CAST((1000000 * s.scanned) // (z.n_blocks * nm.n_months) AS BIGINT)
               AS scan_fraction_micro,
           CAST((1000000 * s.scanned) // (z.n_blocks * nm.n_months) AS BIGINT)
               / 1000000.0 AS scan_fraction
    FROM scans s JOIN sizes z USING (layout) CROSS JOIN nm
    ORDER BY s.layout
    """,
)
def q411_zonemap_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od")
    )
    from pipeline_usnvc_spark.operators.checkpoint import materialize

    # block-grain (rows/512 — tiny) and consumed by scans + sizes:
    # materialize so the two global range exchanges run once (the
    # q422/q416 pattern; without the cut each consumer re-aggregated
    # the full rank output — plan showed the nb subtree twice, zero
    # ReusedExchange)
    blocks = materialize(
        _concurrent_union(
            lambda: _order_blocks(o, "natural_orderkey", "o_orderkey"),
            lambda: _order_blocks(o, "clustered_by_date", "od", "o_orderkey"),
        )
    )
    # calendar-bounded month spine (~84 rows) — the one broadcast here
    months = _month_spine(o)
    scans = (
        blocks.join(
            F.broadcast(months),
            (F.col("mn") <= F.col("m1")) & (F.col("mx") >= F.col("m0")),
        )
        .groupBy("layout")
        .agg(F.count("*").cast("bigint").alias("scanned"))
    )
    sizes = blocks.groupBy("layout").agg(
        F.count("*").cast("bigint").alias("n_blocks")
    )
    nm = months.agg(F.count("*").cast("bigint").alias("n_months"))
    return (
        scans.join(sizes, "layout")
        .crossJoin(F.broadcast(nm))
        .select(
            "layout",
            F.lit(_BLOCK_ROWS).cast("bigint").alias("block_rows"),
            "n_blocks",
            "n_months",
            F.col("scanned").alias("scanned_block_months"),
            F.expr("(1000000 * scanned) div (n_blocks * n_months)")
            .cast("bigint")
            .alias("scan_fraction_micro"),
            (
                F.expr("(1000000 * scanned) div (n_blocks * n_months)").cast(
                    "bigint"
                )
                / F.lit(1000000.0)
            ).alias("scan_fraction"),
        )
        .orderBy("layout")
    )


# ---------------------------------------------------------------------------
# q412 — compaction bin planner: pack each source's document "files"
# (n_chars bytes, doc_id order) into 64 KiB target groups by
# concatenation-order bin packing — group = cumulative bytes BEFORE
# the file, div target. One source-partitioned cumulative window over
# exact integer bytes; output is the per-source compaction summary.
# ---------------------------------------------------------------------------
@query(
    "q412_compaction_plan",
    oracle="""
    WITH f AS (
        SELECT source, doc_id, CAST(n_chars AS BIGINT) AS bytes FROM documents
    ),
    g AS (
        SELECT source, bytes,
               CAST(COALESCE(sum(bytes) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   // 65536 AS grp
        FROM f
    ),
    grouped AS (
        SELECT source, grp,
               CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(bytes) AS BIGINT) AS grp_bytes
        FROM g GROUP BY 1, 2
    )
    SELECT source,
           CAST(65536 AS BIGINT) AS target_bytes,
           CAST(sum(n_files) AS BIGINT) AS n_files,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(grp_bytes) AS BIGINT) AS total_bytes,
           CAST(max(grp_bytes) AS BIGINT) AS max_group_bytes,
           CAST(min(n_files) AS BIGINT) AS min_group_files,
           CAST(max(n_files) AS BIGINT) AS max_group_files
    FROM grouped GROUP BY 1 ORDER BY 1
    """,
)
def q412_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.col("n_chars").cast("bigint").alias("bytes")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g = f.select(
        "source",
        "bytes",
        F.coalesce(F.sum("bytes").over(w), F.lit(0))
        .cast("bigint")
        .alias("cum_before"),
    ).select(
        "source",
        "bytes",
        F.expr(f"cum_before div {_COMPACT_TARGET_BYTES}").alias("grp"),
    )
    grouped = g.groupBy("source", "grp").agg(
        F.count("*").cast("bigint").alias("n_files"),
        F.sum("bytes").cast("bigint").alias("grp_bytes"),
    )
    return (
        grouped.groupBy("source")
        .agg(
            F.sum("n_files").cast("bigint").alias("n_files"),
            F.count("*").cast("bigint").alias("n_groups"),
            F.sum("grp_bytes").cast("bigint").alias("total_bytes"),
            F.max("grp_bytes").cast("bigint").alias("max_group_bytes"),
            F.min("n_files").cast("bigint").alias("min_group_files"),
            F.max("n_files").cast("bigint").alias("max_group_files"),
        )
        .select(
            "source",
            F.lit(_COMPACT_TARGET_BYTES).cast("bigint").alias("target_bytes"),
            "n_files",
            "n_groups",
            "total_bytes",
            "max_group_bytes",
            "min_group_files",
            "max_group_files",
        )
        .orderBy("source")
    )


def _run_count(o: DataFrame, layout: str, *order_cols: str) -> DataFrame:
    """Run count of o_orderpriority under an exact global rank via the
    DISTRIBUTED adjacency formulation: runs = rows − |{i : v(i) =
    v(i+1)}|, with adjacency as a rank equi-join (y.r = x.r + 1) —
    never a single-partition lag window. The oracle side uses the lag
    formulation, so the parity check crosses formulations."""
    from pipeline_usnvc_spark.operators.rank import with_global_rank

    ranked = with_global_rank(
        o.select("o_orderkey", F.col("o_orderpriority").alias("v")),
        *order_cols,
        rank_col="r",
    ).select("v", "r")
    x, y = ranked.alias("x"), ranked.alias("y")
    adj = x.join(y, F.col("y.r") == F.col("x.r") + 1).agg(
        F.sum(F.when(F.col("x.v") == F.col("y.v"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_equal_adjacent")
    )
    n = ranked.agg(F.count("*").cast("bigint").alias("n_rows"))
    return (
        n.crossJoin(F.broadcast(adj))
        .select(
            F.lit(layout).alias("layout"),
            "n_rows",
            (F.col("n_rows") - F.col("n_equal_adjacent"))
            .cast("bigint")
            .alias("n_runs"),
        )
    )


# ---------------------------------------------------------------------------
# q413 — RLE run-count audit: how well would run-length encoding
# compress o_orderpriority under the natural layout vs clustered by
# the column itself? Clustered runs = the distinct-value count (the
# RLE best case); mean run length is quantized by exact integer
# division to micro units.
# ---------------------------------------------------------------------------
@query(
    "q413_rle_run_audit",
    oracle="""
    WITH nat AS (
        SELECT o_orderpriority AS v,
               row_number() OVER (ORDER BY o_orderkey) AS r
        FROM orders
    ),
    clu AS (
        SELECT o_orderpriority AS v,
               row_number() OVER (ORDER BY o_orderpriority, o_orderkey) AS r
        FROM orders
    ),
    runs AS (
        SELECT 'clustered_by_value' AS layout,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) FILTER (WHERE pv IS NULL OR pv <> v) AS BIGINT)
                   AS n_runs
        FROM (SELECT v, lag(v) OVER (ORDER BY r) AS pv FROM clu)
        UNION ALL
        SELECT 'natural_orderkey' AS layout,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) FILTER (WHERE pv IS NULL OR pv <> v) AS BIGINT)
                   AS n_runs
        FROM (SELECT v, lag(v) OVER (ORDER BY r) AS pv FROM nat)
    )
    SELECT layout, n_rows, n_runs,
           CAST((n_rows * 1000000) // n_runs AS BIGINT) AS mean_run_len_micro,
           CAST((n_rows * 1000000) // n_runs AS BIGINT) / 1000000.0
               AS mean_run_len
    FROM runs ORDER BY layout
    """,
)
def q413_rle_run_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    runs = _run_count(o, "natural_orderkey", "o_orderkey").unionByName(
        _run_count(o, "clustered_by_value", "v", "o_orderkey")
    )
    return runs.select(
        "layout",
        "n_rows",
        "n_runs",
        F.expr("(n_rows * 1000000) div n_runs")
        .cast("bigint")
        .alias("mean_run_len_micro"),
        (
            F.expr("(n_rows * 1000000) div n_runs").cast("bigint")
            / F.lit(1000000.0)
        ).alias("mean_run_len"),
    ).orderBy("layout")


# ---------------------------------------------------------------------------
# q414 — streaming zone-map maintenance (rows-only: stateful
# streaming): the INCREMENTAL side of q411. A lakehouse doesn't
# rebuild file-stats from scratch on every commit — per-partition
# zone maps (min/max/count) are maintained as data arrives. Here the
# day-partitioned zone stats (min/max user_id, min/max event-time
# micros, row count) are maintained by a streaming aggregation over
# the event arrival stream (complete mode — min/max/count are
# mergeable, so state is one row per day) and audited row-for-row
# against the batch recompute via the q81/q83 full-outer
# batch-equivalence pattern: a missing day, a phantom day, or ANY
# stat divergence EXISTS as an audit row and the executed in-plan
# contract evaluates on it.
# ---------------------------------------------------------------------------
@query("q414_streaming_zonemap_maintenance")
def q414_streaming_zonemap_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pipeline_usnvc_spark.operators.contracts import contract_filter
    from pipeline_usnvc_spark.streaming.pipeline import (
        read_event_stream,
        run_stream_to_memory,
    )

    def zone_stats(ev: DataFrame) -> DataFrame:
        return ev.groupBy(
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("zone_day")
        ).agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("user_id").cast("bigint").alias("min_user"),
            F.max("user_id").cast("bigint").alias("max_user"),
            F.min(F.unix_micros("ts")).cast("bigint").alias("min_t"),
            F.max(F.unix_micros("ts")).cast("bigint").alias("max_t"),
        )

    streamed = run_stream_to_memory(
        zone_stats(read_event_stream(spark, sf_dir)),
        "q414_zonemap_stream",
        output_mode="complete",
    )
    batch = zone_stats(
        load_table(spark, sf_dir, "events").select("user_id", "ts")
    ).select(
        F.col("zone_day").alias("b_day"),
        F.col("n_rows").alias("b_n"),
        F.col("min_user").alias("b_min_user"),
        F.col("max_user").alias("b_max_user"),
        F.col("min_t").alias("b_min_t"),
        F.col("max_t").alias("b_max_t"),
    )
    audit = streamed.join(
        batch, streamed["zone_day"] == batch["b_day"], "full_outer"
    )
    ok = (
        F.col("zone_day").isNotNull()
        & F.col("b_day").isNotNull()
        & (F.col("n_rows") == F.col("b_n"))
        & (F.col("min_user") == F.col("b_min_user"))
        & (F.col("max_user") == F.col("b_max_user"))
        & (F.col("min_t") == F.col("b_min_t"))
        & (F.col("max_t") == F.col("b_max_t"))
    )
    return (
        contract_filter(
            audit,
            ok,
            F.concat(
                F.lit("zone-map maintenance divergence for day "),
                F.coalesce(F.col("zone_day"), F.col("b_day")),
            ),
        )
        .select("zone_day", "n_rows", "min_user", "max_user", "min_t", "max_t")
        .orderBy("zone_day")
    )


def _z_expr(d_col: str, c_col: str, bits: int, *, duck: bool) -> str:
    """Bit-interleave two non-negative ints (12 bits each) into a
    Z-order key — the SAME arithmetic emitted as engine-native text
    for both sides (Spark lacks `<<`/`>>` operators; DuckDB lacks
    shiftleft/shiftright functions), so the oracle runs the identical
    expression tree."""
    terms = []
    for i in range(bits):
        if duck:
            terms.append(f"((({d_col} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({c_col} >> {i}) & 1) << {2 * i + 1})")
        else:
            terms.append(
                f"shiftleft(shiftright({d_col}, {i}) & 1, {2 * i})"
            )
            terms.append(
                f"shiftleft(shiftright({c_col}, {i}) & 1, {2 * i + 1})"
            )
    return " + ".join(terms)


_Z_BITS = 12  # day index < 2600 and custkey residue < 4096 both fit


# ---------------------------------------------------------------------------
# q415 — Z-order skipping audit (q411's multi-dimensional sequel):
# a single-column sort serves ONE predicate class perfectly and the
# orthogonal one not at all; Z-ordering (bit-interleaving the day
# index with a custkey residue) spreads locality across BOTH. Blocks
# of 512 rows carry min/max zone maps for BOTH dimensions; the audit
# measures the scanned-block fraction for two predicate workloads —
# calendar months (od ranges) and 16 equal custkey-residue slices —
# under the date-clustered layout vs the Z-ordered layout. The
# classic lakehouse trade, measured: date-clustering wins months and
# full-scans residue slices; Z-order is moderate on both.
# ---------------------------------------------------------------------------
@query(
    "q415_zorder_skipping",
    oracle=f"""
    WITH o AS (
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) AS od,
               CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
               CAST(o_custkey % 4096 AS BIGINT) AS c
        FROM orders
    ),
    keyed AS (
        SELECT *, CAST({_z_expr('d', 'c', _Z_BITS, duck=True)} AS BIGINT) AS z FROM o
    ),
    lin AS (
        SELECT od, c, (row_number() OVER (ORDER BY od, o_orderkey) - 1) // 512 AS blk
        FROM keyed
    ),
    zord AS (
        SELECT od, c, (row_number() OVER (ORDER BY z, o_orderkey) - 1) // 512 AS blk
        FROM keyed
    ),
    nb AS (
        SELECT 'clustered_by_date' AS layout, blk,
               min(od) AS mn_d, max(od) AS mx_d,
               min(c) AS mn_c, max(c) AS mx_c
        FROM lin GROUP BY blk
        UNION ALL
        SELECT 'zorder_date_custkey' AS layout, blk,
               min(od) AS mn_d, max(od) AS mx_d,
               min(c) AS mn_c, max(c) AS mx_c
        FROM zord GROUP BY blk
    ),
    months AS (
        SELECT DISTINCT date_trunc('month', od) AS m0, last_day(od) AS m1 FROM o
    ),
    cslices AS (
        SELECT CAST(k * 256 AS BIGINT) AS c0, CAST(k * 256 + 255 AS BIGINT) AS c1
        FROM (SELECT unnest(range(0, 16)) AS k)
    ),
    month_scans AS (
        SELECT layout, 'month_range' AS predicate_class,
               CAST(count(*) AS BIGINT) AS scanned,
               CAST((SELECT count(*) FROM months) AS BIGINT) AS n_preds
        FROM nb b JOIN months m ON b.mn_d <= m.m1 AND b.mx_d >= m.m0
        GROUP BY 1
    ),
    slice_scans AS (
        SELECT layout, 'custkey_slice' AS predicate_class,
               CAST(count(*) AS BIGINT) AS scanned,
               CAST(16 AS BIGINT) AS n_preds
        FROM nb b JOIN cslices s ON b.mn_c <= s.c1 AND b.mx_c >= s.c0
        GROUP BY 1
    ),
    sizes AS (
        SELECT layout, CAST(count(*) AS BIGINT) AS n_blocks FROM nb GROUP BY 1
    ),
    allscans AS (
        SELECT * FROM month_scans UNION ALL SELECT * FROM slice_scans
    )
    SELECT a.layout, a.predicate_class, z.n_blocks, a.n_preds,
           a.scanned AS scanned_block_preds,
           CAST((1000000 * a.scanned) // (z.n_blocks * a.n_preds) AS BIGINT)
               AS scan_fraction_micro,
           CAST((1000000 * a.scanned) // (z.n_blocks * a.n_preds) AS BIGINT)
               / 1000000.0 AS scan_fraction
    FROM allscans a JOIN sizes z USING (layout)
    ORDER BY a.layout, a.predicate_class
    """,
)
def q415_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("od"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date"))
        .cast("bigint")
        .alias("d"),
        (F.col("o_custkey") % 4096).cast("bigint").alias("c"),
    )
    keyed = o.withColumn(
        "z", F.expr(_z_expr("d", "c", _Z_BITS, duck=False)).cast("bigint")
    )
    from pipeline_usnvc_spark.operators.checkpoint import materialize

    # block-grain (rows/512 — tiny) and consumed by month_scans +
    # slice_scans + sizes: materialize so the two global range
    # exchanges run once (the q422/q416 pattern; the before-plan
    # showed the nb subtree re-aggregated per consumer, zero
    # ReusedExchange)
    nb = materialize(
        _concurrent_union(
            lambda: _two_dim_blocks(keyed, ["od", "o_orderkey"], "clustered_by_date"),
            lambda: _two_dim_blocks(keyed, ["z", "o_orderkey"], "zorder_date_custkey"),
        )
    )
    # calendar-bounded month spine + fixed 16-slice residue spine —
    # the only broadcasts here
    months = _month_spine(o)
    cslices = spark.range(0, 16).select(
        (F.col("id") * 256).cast("bigint").alias("c0"),
        (F.col("id") * 256 + 255).cast("bigint").alias("c1"),
    )
    n_months = months.agg(F.count("*").cast("bigint").alias("nm"))
    month_scans = (
        nb.join(
            F.broadcast(months),
            (F.col("mn_d") <= F.col("m1")) & (F.col("mx_d") >= F.col("m0")),
        )
        .groupBy("layout")
        .agg(F.count("*").cast("bigint").alias("scanned"))
        .crossJoin(F.broadcast(n_months))
        .select(
            "layout",
            F.lit("month_range").alias("predicate_class"),
            "scanned",
            F.col("nm").alias("n_preds"),
        )
    )
    slice_scans = (
        nb.join(
            F.broadcast(cslices),
            (F.col("mn_c") <= F.col("c1")) & (F.col("mx_c") >= F.col("c0")),
        )
        .groupBy("layout")
        .agg(F.count("*").cast("bigint").alias("scanned"))
        .select(
            "layout",
            F.lit("custkey_slice").alias("predicate_class"),
            "scanned",
            F.lit(16).cast("bigint").alias("n_preds"),
        )
    )
    sizes = nb.groupBy("layout").agg(
        F.count("*").cast("bigint").alias("n_blocks")
    )
    return (
        month_scans.unionByName(slice_scans)
        .join(sizes, "layout")
        .select(
            "layout",
            "predicate_class",
            "n_blocks",
            "n_preds",
            F.col("scanned").alias("scanned_block_preds"),
            F.expr("(1000000 * scanned) div (n_blocks * n_preds)")
            .cast("bigint")
            .alias("scan_fraction_micro"),
            (
                F.expr("(1000000 * scanned) div (n_blocks * n_preds)").cast(
                    "bigint"
                )
                / F.lit(1000000.0)
            ).alias("scan_fraction"),
        )
        .orderBy("layout", "predicate_class")
    )


_TTL_CUTOFF = "1997-01-01"
_SCATTER_MOD = 97
_FILE_BLOCKS = 8
_RANGE_PARTS = 32


# ---------------------------------------------------------------------------
# q416 — deletion-vector staleness audit: row-level deletes (Delta /
# Iceberg deletion vectors) never rewrite the data files, so the
# per-block zone maps KEEP advertising deleted rows — a month
# predicate scans blocks whose only matching rows are dead. Two
# deterministic delete policies over the date-clustered layout:
# a retention TTL (everything before 1997-01-01 — the delete that
# correlates with the clustering key, leaving whole blocks dead) and
# a scatter delete (o_orderkey % 97 == 0 — the GDPR-style delete that
# touches every block a little). Per policy: vacuum set (fully-dead
# blocks), rewrite candidates (>=25% dead), and the scan
# amplification of stale stats vs freshly recomputed live stats over
# the month workload. Everything is exact-integer: block ids from the
# exact global rank, date interval overlaps, counts, and one micro
# floor-division for the amplification ratio.
# ---------------------------------------------------------------------------
@query(
    "q416_deletion_staleness_audit",
    oracle=f"""
    WITH o AS (
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od FROM orders
    ),
    b AS (
        SELECT od,
               (row_number() OVER (ORDER BY od, o_orderkey) - 1) // 512 AS blk,
               CASE WHEN od < DATE '{_TTL_CUTOFF}' THEN 0 ELSE 1 END AS live_ttl,
               CASE WHEN o_orderkey % {_SCATTER_MOD} = 0 THEN 0 ELSE 1 END AS live_sct
        FROM o
    ),
    blocks AS (
        SELECT blk,
               CAST(count(*) AS BIGINT) AS n_rows,
               min(od) AS mn_s, max(od) AS mx_s,
               CAST(sum(live_ttl) AS BIGINT) AS nl_ttl,
               min(CASE WHEN live_ttl = 1 THEN od END) AS mn_ttl,
               max(CASE WHEN live_ttl = 1 THEN od END) AS mx_ttl,
               CAST(sum(live_sct) AS BIGINT) AS nl_sct,
               min(CASE WHEN live_sct = 1 THEN od END) AS mn_sct,
               max(CASE WHEN live_sct = 1 THEN od END) AS mx_sct
        FROM b GROUP BY blk
    ),
    pol AS (
        SELECT blk, n_rows, mn_s, mx_s, 'ttl_before_1997' AS policy,
               nl_ttl AS n_live, mn_ttl AS mn_f, mx_ttl AS mx_f FROM blocks
        UNION ALL
        SELECT blk, n_rows, mn_s, mx_s, 'scatter_mod97' AS policy,
               nl_sct AS n_live, mn_sct AS mn_f, mx_sct AS mx_f FROM blocks
    ),
    months AS (
        SELECT DISTINCT date_trunc('month', od) AS m0, last_day(od) AS m1 FROM o
    ),
    stale AS (
        SELECT CAST(count(*) AS BIGINT) AS scanned_stale
        FROM blocks x JOIN months m ON x.mn_s <= m.m1 AND x.mx_s >= m.m0
    ),
    fresh AS (
        SELECT policy, CAST(count(*) AS BIGINT) AS scanned_fresh
        FROM pol p JOIN months m ON p.mn_f <= m.m1 AND p.mx_f >= m.m0
        WHERE p.n_live > 0
        GROUP BY policy
    ),
    summary AS (
        SELECT policy,
               CAST(count(*) AS BIGINT) AS n_blocks,
               CAST(sum(n_rows) AS BIGINT) AS n_rows,
               CAST(sum(n_rows - n_live) AS BIGINT) AS n_deleted,
               CAST(count(*) FILTER (WHERE n_live = 0) AS BIGINT)
                   AS fully_dead_blocks,
               CAST(count(*) FILTER (
                   WHERE n_live > 0 AND 4 * (n_rows - n_live) >= n_rows
               ) AS BIGINT) AS rewrite_blocks
        FROM pol GROUP BY policy
    )
    SELECT s.policy, s.n_blocks, s.n_rows, s.n_deleted,
           s.fully_dead_blocks, s.rewrite_blocks,
           st.scanned_stale AS scanned_stale_block_months,
           f.scanned_fresh AS scanned_fresh_block_months,
           CAST((1000000 * st.scanned_stale) // f.scanned_fresh AS BIGINT)
               AS scan_amplification_micro,
           CAST((1000000 * st.scanned_stale) // f.scanned_fresh AS BIGINT)
               / 1000000.0 AS scan_amplification
    FROM summary s JOIN fresh f USING (policy) CROSS JOIN stale st
    ORDER BY s.policy
    """,
)
def q416_deletion_staleness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.operators.rank import with_global_rank

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od")
    )
    ranked = with_global_rank(o, "od", "o_orderkey", rank_col="r")
    b = ranked.select(
        F.expr(f"(r - 1) div {_BLOCK_ROWS}").alias("blk"),
        "od",
        F.when(F.col("od") < F.lit(_TTL_CUTOFF).cast("date"), 0)
        .otherwise(1)
        .alias("live_ttl"),
        F.when(F.col("o_orderkey") % _SCATTER_MOD == 0, 0)
        .otherwise(1)
        .alias("live_sct"),
    )
    from pipeline_usnvc_spark.operators.checkpoint import materialize

    # materialized ONCE: three consumers below (the policy unpivot —
    # read twice — and the stale scan) would each re-run the
    # data-grain aggregate over the ranked frame otherwise; the
    # checkpointed frame is block-grain (rows/512)
    blocks = materialize(
        b.groupBy("blk").agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("od").alias("mn_s"),
            F.max("od").alias("mx_s"),
            F.sum("live_ttl").cast("bigint").alias("nl_ttl"),
            F.min(F.when(F.col("live_ttl") == 1, F.col("od"))).alias("mn_ttl"),
            F.max(F.when(F.col("live_ttl") == 1, F.col("od"))).alias("mx_ttl"),
            F.sum("live_sct").cast("bigint").alias("nl_sct"),
            F.min(F.when(F.col("live_sct") == 1, F.col("od"))).alias("mn_sct"),
            F.max(F.when(F.col("live_sct") == 1, F.col("od"))).alias("mx_sct"),
        )
    )
    pol = blocks.select(
        "blk", "n_rows", "mn_s", "mx_s",
        F.lit("ttl_before_1997").alias("policy"),
        F.col("nl_ttl").alias("n_live"),
        F.col("mn_ttl").alias("mn_f"),
        F.col("mx_ttl").alias("mx_f"),
    ).unionByName(
        blocks.select(
            "blk", "n_rows", "mn_s", "mx_s",
            F.lit("scatter_mod97").alias("policy"),
            F.col("nl_sct").alias("n_live"),
            F.col("mn_sct").alias("mn_f"),
            F.col("mx_sct").alias("mx_f"),
        )
    )
    months = _month_spine(o)
    stale = (
        blocks.join(
            F.broadcast(months),
            (F.col("mn_s") <= F.col("m1")) & (F.col("mx_s") >= F.col("m0")),
        )
        .agg(F.count("*").cast("bigint").alias("scanned_stale"))
    )
    fresh = (
        pol.filter(F.col("n_live") > 0)
        .join(
            F.broadcast(months),
            (F.col("mn_f") <= F.col("m1")) & (F.col("mx_f") >= F.col("m0")),
        )
        .groupBy("policy")
        .agg(F.count("*").cast("bigint").alias("scanned_fresh"))
    )
    summary = pol.groupBy("policy").agg(
        F.count("*").cast("bigint").alias("n_blocks"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.sum(F.col("n_rows") - F.col("n_live")).cast("bigint").alias("n_deleted"),
        F.sum(F.when(F.col("n_live") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("fully_dead_blocks"),
        F.sum(
            F.when(
                (F.col("n_live") > 0)
                & (4 * (F.col("n_rows") - F.col("n_live")) >= F.col("n_rows")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("rewrite_blocks"),
    )
    return (
        summary.join(fresh, "policy")
        .crossJoin(F.broadcast(stale))
        .select(
            "policy", "n_blocks", "n_rows", "n_deleted",
            "fully_dead_blocks", "rewrite_blocks",
            F.col("scanned_stale").alias("scanned_stale_block_months"),
            F.col("scanned_fresh").alias("scanned_fresh_block_months"),
            F.expr("(1000000 * scanned_stale) div scanned_fresh")
            .cast("bigint")
            .alias("scan_amplification_micro"),
            (
                F.expr("(1000000 * scanned_stale) div scanned_fresh")
                .cast("bigint")
                / F.lit(1000000.0)
            ).alias("scan_amplification"),
        )
        .orderBy("policy")
    )


# ---------------------------------------------------------------------------
# q417 — hierarchical manifest pruning (Iceberg's manifest → data-file
# → row-group cascade): stats live at TWO granularities — files of
# 8×512 rows and blocks of 512 — and a scan consults per-block stats
# only inside files that survive file-level pruning. The audit
# measures, per layout (natural vs date-clustered), both the scan
# fractions at each granularity AND the metadata-read economics: flat
# reads n_blocks stats entries per predicate; the cascade reads
# n_files file entries plus block entries only for surviving files.
# On a clustered layout the cascade reads a fraction of the metadata;
# on a natural layout every file survives and the cascade DEGRADES to
# flat + file overhead — the audit shows both, exact-integer.
# ---------------------------------------------------------------------------
@query(
    "q417_manifest_cascade_pruning",
    oracle=f"""
    WITH o AS (
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od FROM orders
    ),
    nat AS (
        SELECT od, (row_number() OVER (ORDER BY o_orderkey) - 1) // 512 AS blk
        FROM o
    ),
    clu AS (
        SELECT od, (row_number() OVER (ORDER BY od, o_orderkey) - 1) // 512 AS blk
        FROM o
    ),
    nb AS (
        SELECT 'clustered_by_date' AS layout, blk, blk // {_FILE_BLOCKS} AS fil,
               min(od) AS mn, max(od) AS mx
        FROM clu GROUP BY blk
        UNION ALL
        SELECT 'natural_orderkey' AS layout, blk, blk // {_FILE_BLOCKS} AS fil,
               min(od) AS mn, max(od) AS mx
        FROM nat GROUP BY blk
    ),
    nf AS (
        SELECT layout, fil, min(mn) AS mn, max(mx) AS mx,
               CAST(count(*) AS BIGINT) AS nb_in_file
        FROM nb GROUP BY layout, fil
    ),
    months AS (
        SELECT DISTINCT date_trunc('month', od) AS m0, last_day(od) AS m1 FROM o
    ),
    fscan AS (
        SELECT layout,
               CAST(count(*) AS BIGINT) AS file_scanned,
               CAST(sum(nb_in_file) AS BIGINT) AS cascade_block_entries
        FROM nf f JOIN months m ON f.mn <= m.m1 AND f.mx >= m.m0
        GROUP BY layout
    ),
    bscan AS (
        SELECT layout, CAST(count(*) AS BIGINT) AS block_scanned
        FROM nb b JOIN months m ON b.mn <= m.m1 AND b.mx >= m.m0
        GROUP BY layout
    ),
    sizes AS (
        SELECT layout,
               CAST(count(*) AS BIGINT) AS n_blocks,
               CAST(count(DISTINCT fil) AS BIGINT) AS n_files
        FROM nb GROUP BY layout
    ),
    nm AS (SELECT CAST(count(*) AS BIGINT) AS n_months FROM months)
    SELECT z.layout, z.n_files, z.n_blocks, nm.n_months,
           f.file_scanned, b.block_scanned,
           CAST((1000000 * f.file_scanned) // (z.n_files * nm.n_months) AS BIGINT)
               AS file_scan_fraction_micro,
           CAST((1000000 * b.block_scanned) // (z.n_blocks * nm.n_months) AS BIGINT)
               AS block_scan_fraction_micro,
           CAST(z.n_blocks * nm.n_months AS BIGINT) AS stats_entries_flat,
           CAST(z.n_files * nm.n_months + f.cascade_block_entries AS BIGINT)
               AS stats_entries_cascade,
           CAST((1000000 * (z.n_files * nm.n_months + f.cascade_block_entries))
                // (z.n_blocks * nm.n_months) AS BIGINT)
               AS cascade_read_ratio_micro,
           CAST((1000000 * (z.n_files * nm.n_months + f.cascade_block_entries))
                // (z.n_blocks * nm.n_months) AS BIGINT) / 1000000.0
               AS cascade_read_ratio
    FROM sizes z JOIN fscan f USING (layout) JOIN bscan b USING (layout)
    CROSS JOIN nm
    ORDER BY z.layout
    """,
)
def q417_manifest_cascade_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od")
    )
    from pipeline_usnvc_spark.operators.checkpoint import materialize

    # block-grain (rows/512 — tiny) and consumed by nf + bscan +
    # sizes: materialize so the two global range exchanges run once
    # (the q422/q416 pattern; the before-plan showed the nb subtree
    # re-aggregated per consumer, zero ReusedExchange)
    nb = materialize(
        _concurrent_union(
            lambda: _order_blocks(o, "natural_orderkey", "o_orderkey"),
            lambda: _order_blocks(o, "clustered_by_date", "od", "o_orderkey"),
        )
        .select(
            "layout", "blk",
            F.expr(f"blk div {_FILE_BLOCKS}").alias("fil"),
            "mn", "mx",
        )
    )
    nf = nb.groupBy("layout", "fil").agg(
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
        F.count("*").cast("bigint").alias("nb_in_file"),
    )
    months = _month_spine(o)
    fscan = (
        nf.join(
            F.broadcast(months),
            (F.col("mn") <= F.col("m1")) & (F.col("mx") >= F.col("m0")),
        )
        .groupBy("layout")
        .agg(
            F.count("*").cast("bigint").alias("file_scanned"),
            F.sum("nb_in_file").cast("bigint").alias("cascade_block_entries"),
        )
    )
    bscan = (
        nb.join(
            F.broadcast(months),
            (F.col("mn") <= F.col("m1")) & (F.col("mx") >= F.col("m0")),
        )
        .groupBy("layout")
        .agg(F.count("*").cast("bigint").alias("block_scanned"))
    )
    sizes = nb.groupBy("layout").agg(
        F.count("*").cast("bigint").alias("n_blocks"),
        F.countDistinct("fil").cast("bigint").alias("n_files"),
    )
    nm = months.agg(F.count("*").cast("bigint").alias("n_months"))
    return (
        sizes.join(fscan, "layout")
        .join(bscan, "layout")
        .crossJoin(F.broadcast(nm))
        .select(
            "layout", "n_files", "n_blocks", "n_months",
            "file_scanned", "block_scanned",
            F.expr("(1000000 * file_scanned) div (n_files * n_months)")
            .cast("bigint")
            .alias("file_scan_fraction_micro"),
            F.expr("(1000000 * block_scanned) div (n_blocks * n_months)")
            .cast("bigint")
            .alias("block_scan_fraction_micro"),
            (F.col("n_blocks") * F.col("n_months"))
            .cast("bigint")
            .alias("stats_entries_flat"),
            (F.col("n_files") * F.col("n_months") + F.col("cascade_block_entries"))
            .cast("bigint")
            .alias("stats_entries_cascade"),
            F.expr(
                "(1000000 * (n_files * n_months + cascade_block_entries))"
                " div (n_blocks * n_months)"
            )
            .cast("bigint")
            .alias("cascade_read_ratio_micro"),
            (
                F.expr(
                    "(1000000 * (n_files * n_months + cascade_block_entries))"
                    " div (n_blocks * n_months)"
                ).cast("bigint")
                / F.lit(1000000.0)
            ).alias("cascade_read_ratio"),
        )
        .orderBy("layout")
    )


# ---------------------------------------------------------------------------
# q418 — range-partition boundary planner: pick the B=32 range split
# points a repartitionByRange / range-partitioned table should use.
# Spark's RangePartitioner answers this with reservoir SAMPLING; this
# is the exact version — equi-depth boundaries as exact integer order
# statistics on the value spine (boundary_k = smallest value whose
# cumulative count reaches ceil(k·n/B)), audited against naive
# equal-width boundaries on the same skewed column (events.value in
# cents — right-skewed, so equal-width crams most rows into the first
# few partitions). Output per scheme: non-empty partitions, max/min
# partition sizes, and the imbalance ratio max/(n/B) in exact micro
# units. The spine is VALUE-grain (bounded by the metric's cent
# domain, not by row count); boundaries/bounds are ≤31-row/scalar
# broadcasts; rows never leave aggregate grain.
# ---------------------------------------------------------------------------
@query(
    "q418_range_boundary_plan",
    oracle=f"""
    WITH v AS (
        SELECT CAST(floor(value * 100) AS BIGINT) AS vc FROM events
        WHERE value IS NOT NULL
    ),
    spine AS (
        SELECT vc, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY vc
    ),
    cum AS (
        SELECT vc, c,
               CAST(sum(c) OVER (
                   ORDER BY vc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cc
        FROM spine
    ),
    nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM spine),
    bounds AS (SELECT min(vc) AS mn, max(vc) AS mx FROM spine),
    ks AS (SELECT CAST(unnest(range(1, {_RANGE_PARTS})) AS BIGINT) AS k),
    bnds AS (
        SELECT k, min(vc) AS b
        FROM cum, ks, nn
        WHERE cc >= (k * n + {_RANGE_PARTS} - 1) // {_RANGE_PARTS}
        GROUP BY k
    ),
    depth_parts AS (
        SELECT p, CAST(sum(c) AS BIGINT) AS rows_in_part FROM (
            SELECT s.vc, s.c, CAST(count(b.b) AS BIGINT) AS p
            FROM spine s LEFT JOIN bnds b ON b.b <= s.vc
            GROUP BY s.vc, s.c
        ) GROUP BY p
    ),
    width_parts AS (
        SELECT ((s.vc - bo.mn) * {_RANGE_PARTS}) // (bo.mx - bo.mn + 1) AS p,
               CAST(sum(s.c) AS BIGINT) AS rows_in_part
        FROM spine s, bounds bo GROUP BY 1
    ),
    both_parts AS (
        SELECT 'equi_depth' AS scheme, p, rows_in_part FROM depth_parts
        UNION ALL
        SELECT 'equal_width' AS scheme, p, rows_in_part FROM width_parts
    )
    SELECT scheme,
           nn.n AS n_rows,
           CAST({_RANGE_PARTS} AS BIGINT) AS n_partitions,
           CAST(count(*) AS BIGINT) AS nonempty_partitions,
           CAST(max(rows_in_part) AS BIGINT) AS max_part_rows,
           CAST(min(rows_in_part) AS BIGINT) AS min_part_rows,
           CAST((max(rows_in_part) * {_RANGE_PARTS} * 1000000) // nn.n AS BIGINT)
               AS imbalance_micro,
           CAST((max(rows_in_part) * {_RANGE_PARTS} * 1000000) // nn.n AS BIGINT)
               / 1000000.0 AS imbalance
    FROM both_parts, nn GROUP BY scheme, nn.n ORDER BY scheme
    """,
)
def q418_range_boundary_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(F.floor(F.col("value") * 100).cast("bigint").alias("vc"))
    )
    spine = ev.groupBy("vc").agg(F.count("*").cast("bigint").alias("c"))
    # value-grain cumulative window: the spine is bounded by the cent
    # domain of the metric (max(value)*100 cells), not by row count
    w = Window.orderBy("vc").rowsBetween(Window.unboundedPreceding, 0)
    cum = spine.select(
        "vc", "c", F.sum("c").over(w).cast("bigint").alias("cc")
    )
    nn = spine.agg(F.sum("c").cast("bigint").alias("n"))
    bounds = spine.agg(F.min("vc").alias("mn"), F.max("vc").alias("mx"))
    ks = spark.range(1, _RANGE_PARTS).select(F.col("id").cast("bigint").alias("k"))
    bnds = (
        cum.crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(nn))
        .filter(
            F.col("cc")
            >= F.expr(f"(k * n + {_RANGE_PARTS} - 1) div {_RANGE_PARTS}")
        )
        .groupBy("k")
        .agg(F.min("vc").alias("b"))
    )
    depth_parts = (
        spine.join(F.broadcast(bnds), F.col("b") <= F.col("vc"), "left")
        .groupBy("vc", "c")
        .agg(F.count("b").cast("bigint").alias("p"))
        .groupBy("p")
        .agg(F.sum("c").cast("bigint").alias("rows_in_part"))
    )
    width_parts = (
        spine.crossJoin(F.broadcast(bounds))
        .select(
            F.expr(f"((vc - mn) * {_RANGE_PARTS}) div (mx - mn + 1)").alias("p"),
            "c",
        )
        .groupBy("p")
        .agg(F.sum("c").cast("bigint").alias("rows_in_part"))
    )
    both = depth_parts.select(
        F.lit("equi_depth").alias("scheme"), "p", "rows_in_part"
    ).unionByName(
        width_parts.select(
            F.lit("equal_width").alias("scheme"), "p", "rows_in_part"
        )
    )
    return (
        both.crossJoin(F.broadcast(nn))
        .groupBy("scheme", "n")
        .agg(
            F.count("*").cast("bigint").alias("nonempty_partitions"),
            F.max("rows_in_part").cast("bigint").alias("max_part_rows"),
            F.min("rows_in_part").cast("bigint").alias("min_part_rows"),
        )
        .select(
            "scheme",
            F.col("n").alias("n_rows"),
            F.lit(_RANGE_PARTS).cast("bigint").alias("n_partitions"),
            "nonempty_partitions",
            "max_part_rows",
            "min_part_rows",
            F.expr(f"(max_part_rows * {_RANGE_PARTS} * 1000000) div n")
            .cast("bigint")
            .alias("imbalance_micro"),
            (
                F.expr(f"(max_part_rows * {_RANGE_PARTS} * 1000000) div n")
                .cast("bigint")
                / F.lit(1000000.0)
            ).alias("imbalance"),
        )
        .orderBy("scheme")
    )


_ADVISOR_W_MONTH = 3  # month-range predicates dominate this workload
_ADVISOR_W_SLICE = 1


# ---------------------------------------------------------------------------
# q419 — clustering-layout advisor: the DECISION query on top of the
# measurement family (q411 single-dim zone maps, q415 Z-order). Four
# candidate layouts — natural, date-clustered, custkey-clustered,
# Z-ordered — are evaluated against a weighted two-class workload
# (month ranges weight 3, custkey-residue slices weight 1); each
# layout gets both per-class scan fractions and one weighted cost,
# and exactly ONE row carries recommended=true (tie-broken by layout
# name on the 4-row frame). This is the query a table-maintenance
# scheduler runs before choosing a cluster/Z-order key. Everything is
# exact-integer; the final ranking happens on a 4-row frame.
# ---------------------------------------------------------------------------
@query(
    "q419_layout_advisor",
    oracle=f"""
    WITH o AS (
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) AS od,
               CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
               CAST(o_custkey % 4096 AS BIGINT) AS c
        FROM orders
    ),
    keyed AS (
        SELECT *, CAST({_z_expr('d', 'c', _Z_BITS, duck=True)} AS BIGINT) AS z FROM o
    ),
    nb AS (
        SELECT 'natural_orderkey' AS layout, blk,
               min(od) AS mn_d, max(od) AS mx_d, min(c) AS mn_c, max(c) AS mx_c
        FROM (SELECT od, c, (row_number() OVER (ORDER BY o_orderkey) - 1) // 512 AS blk FROM keyed)
        GROUP BY blk
        UNION ALL
        SELECT 'clustered_by_date' AS layout, blk,
               min(od) AS mn_d, max(od) AS mx_d, min(c) AS mn_c, max(c) AS mx_c
        FROM (SELECT od, c, (row_number() OVER (ORDER BY od, o_orderkey) - 1) // 512 AS blk FROM keyed)
        GROUP BY blk
        UNION ALL
        SELECT 'clustered_by_custkey' AS layout, blk,
               min(od) AS mn_d, max(od) AS mx_d, min(c) AS mn_c, max(c) AS mx_c
        FROM (SELECT od, c, (row_number() OVER (ORDER BY c, o_orderkey) - 1) // 512 AS blk FROM keyed)
        GROUP BY blk
        UNION ALL
        SELECT 'zorder_date_custkey' AS layout, blk,
               min(od) AS mn_d, max(od) AS mx_d, min(c) AS mn_c, max(c) AS mx_c
        FROM (SELECT od, c, (row_number() OVER (ORDER BY z, o_orderkey) - 1) // 512 AS blk FROM keyed)
        GROUP BY blk
    ),
    months AS (
        SELECT DISTINCT date_trunc('month', od) AS m0, last_day(od) AS m1 FROM o
    ),
    cslices AS (
        SELECT CAST(k * 256 AS BIGINT) AS c0, CAST(k * 256 + 255 AS BIGINT) AS c1
        FROM (SELECT unnest(range(0, 16)) AS k)
    ),
    mscan AS (
        SELECT layout, CAST(count(*) AS BIGINT) AS scanned,
               CAST((SELECT count(*) FROM months) AS BIGINT) AS n_preds
        FROM nb b JOIN months m ON b.mn_d <= m.m1 AND b.mx_d >= m.m0
        GROUP BY layout
    ),
    sscan AS (
        SELECT layout, CAST(count(*) AS BIGINT) AS scanned,
               CAST(16 AS BIGINT) AS n_preds
        FROM nb b JOIN cslices s ON b.mn_c <= s.c1 AND b.mx_c >= s.c0
        GROUP BY layout
    ),
    sizes AS (
        SELECT layout, CAST(count(*) AS BIGINT) AS n_blocks FROM nb GROUP BY layout
    ),
    costed AS (
        SELECT z.layout, z.n_blocks,
               CAST((1000000 * m.scanned) // (z.n_blocks * m.n_preds) AS BIGINT)
                   AS month_scan_fraction_micro,
               CAST((1000000 * s.scanned) // (z.n_blocks * s.n_preds) AS BIGINT)
                   AS custkey_scan_fraction_micro,
               CAST(({_ADVISOR_W_MONTH} * ((1000000 * m.scanned) // (z.n_blocks * m.n_preds))
                     + {_ADVISOR_W_SLICE} * ((1000000 * s.scanned) // (z.n_blocks * s.n_preds)))
                    // {_ADVISOR_W_MONTH + _ADVISOR_W_SLICE} AS BIGINT)
                   AS weighted_cost_micro
        FROM sizes z JOIN mscan m USING (layout) JOIN sscan s USING (layout)
    )
    SELECT layout, n_blocks,
           month_scan_fraction_micro, custkey_scan_fraction_micro,
           weighted_cost_micro,
           weighted_cost_micro / 1000000.0 AS weighted_cost,
           row_number() OVER (ORDER BY weighted_cost_micro, layout) = 1
               AS recommended
    FROM costed
    ORDER BY layout
    """,
)
def q419_layout_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("od"),
        (F.col("o_custkey") % 4096).cast("bigint").alias("c"),
    )
    # the Z key exists ONLY on the Z-ordered candidate's branch — the
    # other three layouts never compute or shuffle it (its 24-term
    # interleave is per-row work and 8 bytes/row through the range
    # exchange); _two_dim_blocks projects each branch to its own rank
    # keys + (od, c) before ranking
    zkeyed = o.withColumn(
        "d",
        F.datediff(F.col("od"), F.lit("1992-01-01").cast("date")).cast(
            "bigint"
        ),
    ).withColumn(
        "z", F.expr(_z_expr("d", "c", _Z_BITS, duck=False)).cast("bigint")
    )
    nb = _concurrent_union(
        lambda: _two_dim_blocks(o, ["o_orderkey"], "natural_orderkey"),
        lambda: _two_dim_blocks(o, ["od", "o_orderkey"], "clustered_by_date"),
        lambda: _two_dim_blocks(o, ["c", "o_orderkey"], "clustered_by_custkey"),
        lambda: _two_dim_blocks(zkeyed, ["z", "o_orderkey"], "zorder_date_custkey"),
    )
    months = _month_spine(o)
    cslices = spark.range(0, 16).select(
        (F.col("id") * 256).cast("bigint").alias("c0"),
        (F.col("id") * 256 + 255).cast("bigint").alias("c1"),
    )
    n_months = months.agg(F.count("*").cast("bigint").alias("nm"))
    mscan = (
        nb.join(
            F.broadcast(months),
            (F.col("mn_d") <= F.col("m1")) & (F.col("mx_d") >= F.col("m0")),
        )
        .groupBy("layout")
        .agg(F.count("*").cast("bigint").alias("m_scanned"))
        .crossJoin(F.broadcast(n_months))
    )
    sscan = (
        nb.join(
            F.broadcast(cslices),
            (F.col("mn_c") <= F.col("c1")) & (F.col("mx_c") >= F.col("c0")),
        )
        .groupBy("layout")
        .agg(F.count("*").cast("bigint").alias("s_scanned"))
    )
    sizes = nb.groupBy("layout").agg(
        F.count("*").cast("bigint").alias("n_blocks")
    )
    w_tot = _ADVISOR_W_MONTH + _ADVISOR_W_SLICE
    costed = (
        sizes.join(mscan, "layout")
        .join(sscan, "layout")
        .select(
            "layout",
            "n_blocks",
            F.expr("(1000000 * m_scanned) div (n_blocks * nm)")
            .cast("bigint")
            .alias("month_scan_fraction_micro"),
            F.expr("(1000000 * s_scanned) div (n_blocks * 16)")
            .cast("bigint")
            .alias("custkey_scan_fraction_micro"),
        )
        .withColumn(
            "weighted_cost_micro",
            F.expr(
                f"({_ADVISOR_W_MONTH} * month_scan_fraction_micro"
                f" + {_ADVISOR_W_SLICE} * custkey_scan_fraction_micro)"
                f" div {w_tot}"
            ).cast("bigint"),
        )
    )
    # the ranking window runs on the 4-row candidate frame — bounded
    # by the layout-candidate list, never by data
    w = Window.orderBy("weighted_cost_micro", "layout")
    return (
        costed.withColumn("recommended", F.row_number().over(w) == 1)
        .select(
            "layout", "n_blocks",
            "month_scan_fraction_micro", "custkey_scan_fraction_micro",
            "weighted_cost_micro",
            (F.col("weighted_cost_micro") / F.lit(1000000.0)).alias(
                "weighted_cost"
            ),
            "recommended",
        )
        .orderBy("layout")
    )


_KCORE_K = 2


def _q420_oracle(rounds: int = 10) -> str:
    """Chained-CTE unrolling of the k-core peel (the q101/q178/q171
    fixed-iteration trick, VERDICT r12 item 2 applied one family
    further): each peel round is one HAVING-filtered degree aggregate
    plus two endpoint semi-joins — plain SQL — and a converged round
    is a no-op (every node already has degree >= k, the keep set is
    total), so unrolling MORE rounds than the fixed point needs is
    exact, not approximate. Measured peel rounds on the synthetic
    graph: 0 (sf0.001) / 3 (sf0.01) / 5 (sf0.1); ``rounds``=10 gives
    2x margin, and a hypothetical future corpus needing more rounds
    fails LOUDLY as a hash mismatch (the oracle would return a
    superset while the operator runs to its true fixed point).
    Shares the edge CTE verbatim with the q97/q277 oracles
    (``_copurchase_edges_sql``)."""
    from pipeline_usnvc_spark.plans.analytics_queries import _copurchase_edges_sql

    k = _KCORE_K
    stages = [
        """s0 AS MATERIALIZED (
        SELECT pa AS u, pb AS v FROM edges WHERE pa <> pb
        UNION
        SELECT pb AS u, pa AS v FROM edges WHERE pa <> pb
    )"""
    ]
    for i in range(1, rounds + 1):
        stages.append(
            f"""k{i} AS MATERIALIZED (
        SELECT u FROM s{i - 1} GROUP BY u HAVING count(*) >= {k}
    )"""
        )
        stages.append(
            f"""s{i} AS MATERIALIZED (
        SELECT s.u, s.v FROM s{i - 1} s
        JOIN k{i} a ON a.u = s.u
        JOIN k{i} b ON b.u = s.v
    )"""
        )
    joined = ",\n    ".join(stages)
    return f"""
    WITH {_copurchase_edges_sql(2)},
    {joined}
    SELECT u AS node, CAST(count(*) AS BIGINT) AS core_degree,
           CAST({k} AS BIGINT) AS k
    FROM s{rounds} GROUP BY u ORDER BY node
    """


# ---------------------------------------------------------------------------
# q420 — k-core decomposition (HASH-GREEN since round 13: the peel
# unrolls to chained CTEs, see _q420_oracle) of
# q97's support-filtered co-purchase graph: the unique maximal
# subgraph where every part keeps >= 2 repeat co-purchase partners.
# k=2 is the measured sweet spot across SFs — the graph thins
# quadratically as the part domain grows (all 200 parts survive at
# sf0.001; peeling runs 4 rounds to 1535 of 1880 at sf0.01; 6 rounds
# down to exactly ONE surviving triangle at sf0.1 — q97's densest
# structure), while k=3 is genuinely EMPTY at sf0.1 and the
# unfiltered graph is near-regular (nothing peels below k~56). The
# k-core is the standard
# graph-densification / community-seed primitive the graph family
# still lacked (alongside CC, PageRank, label propagation, triangles,
# Markov absorption). Iterative peeling via operators/graph.k_core
# (one degree aggregate + two semi-joins per round, checkpointed,
# fail-fast round guard). The result is certified by its own DEFINING
# fixed-point property as an EXECUTED in-plan contract (the q374
# pattern): each surviving node's degree, recomputed independently
# from the ORIGINAL edge set restricted to the survivor set, must
# equal the reported core_degree and be >= k. A missing/phantom
# survivor or any degree divergence exists as an audit row the
# contract evaluates on. The independent pytest recompute
# (test_kcore_decomposition) peels in pure Python and pins set
# equality — including MAXIMALITY, which the fixed-point contract
# alone cannot see (a strict subgraph of the k-core can also satisfy
# degree >= k).
# ---------------------------------------------------------------------------
@query("q420_kcore_decomposition", oracle=_q420_oracle())
def q420_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.operators.contracts import contract_filter
    from pipeline_usnvc_spark.operators.graph import k_core
    from pipeline_usnvc_spark.plans.analytics_queries import (
        supported_copurchase_edges,
    )

    from pipeline_usnvc_spark.operators.checkpoint import materialize

    # materialized ONCE: the quadratic lineitem pair join feeds both
    # the peeling loop and the contract's independent recompute below
    edges = materialize(supported_copurchase_edges(spark, sf_dir))
    core = k_core(edges, _KCORE_K, src="pa", dst="pb")
    # independent fixed-point recompute: symmetrize the ORIGINAL edge
    # set (dropping self-loops exactly as k_core does — none exist on
    # this pa < pb graph, but the contract is the template for other
    # callers), restrict both endpoints to the survivor set, recount
    surv = core.select(F.col("node").alias("u"))
    sym = (
        edges.select(F.col("pa").alias("u"), F.col("pb").alias("v"))
        .unionByName(edges.select(F.col("pb").alias("u"), F.col("pa").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    indep = (
        sym.join(surv, "u", "left_semi")
        .join(surv.withColumnRenamed("u", "v"), "v", "left_semi")
        .groupBy("u")
        .agg(F.count("*").cast("bigint").alias("d_indep"))
    )
    audit = core.join(indep, core["node"] == indep["u"], "full_outer")
    ok = (
        F.col("node").isNotNull()
        & F.col("u").isNotNull()
        & (F.col("core_degree") == F.col("d_indep"))
        & (F.col("d_indep") >= F.lit(_KCORE_K))
    )
    return (
        contract_filter(
            audit,
            ok,
            F.concat(
                F.lit("k-core fixed-point violation at node "),
                F.coalesce(F.col("node"), F.col("u")).cast("string"),
            ),
        )
        .select(
            "node",
            F.col("core_degree").cast("bigint").alias("core_degree"),
            F.lit(_KCORE_K).cast("bigint").alias("k"),
        )
        .orderBy("node")
    )


# ---------------------------------------------------------------------------
# q421 — randomization-test p-value for q313's Mann-Whitney z (the
# COVERAGE pair row q313 lacked: exact normal-APPROXIMATION z ↔
# distribution-free resampled p). The bounded formulation the round-10
# pre-plan asked for: ranks are label-INDEPENDENT, so the doubled
# mid-ranks (r2x) are computed ONCE on the value-grain length spine
# (the q313/q262 convention) and every pseudo-sample reuses them —
# never K data-grain rank windows. Each of the K=32 deterministic
# md5-keyed relabelings (doc_id:k prefix-8 parity — the q406
# machinery) re-splits the corpus, the per-sample z uses the same
# tie-corrected formula as q313 with that sample's group sizes, and
# p = (1 + #{|z_k| >= |z_obs|}) / (1 + #valid) — exact integer counts,
# single final division. Note this is the RANDOMIZATION-test variant
# (binomial split sizes), not a fixed-size permutation — documented
# deliberately: it keeps the reassignment a pure per-row expression.
#
# Scale shape: one value-grain spine (bounded by the length domain),
# one doc-grain equi-join to attach r2x, a K-way explode with
# map-side partial aggregation into 32 groups, and a 1-row broadcast
# of the observed stats. No data-grain windows, no self-joins.
# ---------------------------------------------------------------------------
_MW_PERMS = 32

_MW_Z_SQL = """CASE WHEN {n1} > 0 AND ({nt} - {n1}) > 0 AND {nt} > 1
                     AND CAST({nt} + 1 AS HUGEINT) * {nt} * ({nt} - 1) > ties * 1
                THEN CAST({r1x2} - CAST({n1} AS HUGEINT) * ({n1} + 1)
                         - CAST({n1} AS HUGEINT) * ({nt} - {n1}) AS DOUBLE)
                    / (2.0 * sqrt(
                        CAST({n1} AS DOUBLE) * CAST({nt} - {n1} AS DOUBLE) / 12.0
                        * (CAST({nt} + 1 AS DOUBLE)
                           - CAST(ties AS DOUBLE)
                             / (CAST({nt} AS DOUBLE) * CAST({nt} - 1 AS DOUBLE)))))
                ELSE NULL END"""


def _mw_z_col(n1, r1x2, nt, ties):
    """The q313 tie-corrected z as a Column — ONE definition reused by
    the observed and per-sample branches so the trees stay identical."""
    n2 = nt - n1
    num = (r1x2 - _mw_d38(n1) * _mw_d38(n1 + 1) - _mw_d38(n1) * _mw_d38(n2)).cast(
        "double"
    )
    sigma2 = (
        n1.cast("double")
        * n2.cast("double")
        / F.lit(12.0)
        * (
            (nt + 1).cast("double")
            - ties.cast("double") / (nt.cast("double") * (nt - 1).cast("double"))
        )
    )
    tie_guard = _mw_d38(nt + 1) * _mw_d38(nt) * _mw_d38(nt - 1) > ties
    return F.when(
        (n1 > 0) & (n2 > 0) & (nt > 1) & tie_guard,
        num / (F.lit(2.0) * F.sqrt(sigma2)),
    )


def _mw_d38(c):
    return c.cast("decimal(38,0)")


@query(
    "q421_mannwhitney_randomization",
    oracle=f"""
    WITH vals AS (
        SELECT n_chars AS v,
               CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS n1v,
               CAST(count(*) AS BIGINT) AS ntv
        FROM documents GROUP BY 1
    ),
    ranked AS (
        SELECT v, n1v, ntv,
               2 * COALESCE(sum(ntv) OVER (
                   ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + ntv + 1 AS r2x
        FROM vals
    ),
    gstats AS (
        SELECT CAST(sum(n1v) AS BIGINT) AS n1_obs,
               CAST(sum(ntv) AS BIGINT) AS nt,
               CAST(sum(CAST(n1v AS HUGEINT) * r2x) AS HUGEINT) AS r1x2_obs,
               CAST(sum(CAST(ntv AS HUGEINT) * ntv * ntv - ntv) AS HUGEINT) AS ties
        FROM ranked
    ),
    perdoc AS (
        SELECT d.doc_id, r.r2x
        FROM documents d JOIN ranked r ON r.v = d.n_chars
    ),
    samples AS (SELECT CAST(unnest(range(0, {_MW_PERMS})) AS BIGINT) AS k),
    perk AS (
        SELECT s.k,
               CAST(sum(CASE WHEN CAST('0x' || substr(md5(CAST(p.doc_id AS VARCHAR) || ':' || CAST(s.k AS VARCHAR)), 1, 8) AS BIGINT) % 2 = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n1k,
               CAST(sum(CASE WHEN CAST('0x' || substr(md5(CAST(p.doc_id AS VARCHAR) || ':' || CAST(s.k AS VARCHAR)), 1, 8) AS BIGINT) % 2 = 0
                             THEN CAST(p.r2x AS HUGEINT) ELSE CAST(0 AS HUGEINT) END) AS HUGEINT) AS r1x2k
        FROM perdoc p CROSS JOIN samples s
        GROUP BY s.k
    ),
    zk AS (
        SELECT k,
               {_MW_Z_SQL.format(n1="n1k", r1x2="r1x2k", nt="nt")} AS z
        FROM perk CROSS JOIN gstats
    ),
    zo AS (
        SELECT {_MW_Z_SQL.format(n1="n1_obs", r1x2="r1x2_obs", nt="nt")} AS z_obs
        FROM gstats
    )
    SELECT CAST({_MW_PERMS} AS BIGINT) AS n_samples,
           CAST(count(z) AS BIGINT) AS n_valid,
           CAST(sum(CASE WHEN z IS NOT NULL AND abs(z) >= abs(zo.z_obs)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
           round(zo.z_obs, 6) AS z_obs,
           CAST(1 + sum(CASE WHEN z IS NOT NULL AND abs(z) >= abs(zo.z_obs)
                             THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(1 + count(z) AS DOUBLE) AS p_value
    FROM zk CROSS JOIN zo
    GROUP BY zo.z_obs
    """,
)
def q421_mannwhitney_randomization(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    vals = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.when(F.col("lang") == "en", 1)).cast("bigint").alias("n1v"),
        F.count("*").cast("bigint").alias("ntv"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.select(
        "v",
        "n1v",
        "ntv",
        (2 * F.coalesce(F.sum("ntv").over(w), F.lit(0)) + F.col("ntv") + 1).alias("r2x"),
    )
    gstats = ranked.agg(
        F.sum("n1v").cast("bigint").alias("n1_obs"),
        F.sum("ntv").cast("bigint").alias("nt"),
        F.sum(_mw_d38(F.col("n1v")) * _mw_d38(F.col("r2x")))
        .cast("decimal(38,0)")
        .alias("r1x2_obs"),
        F.sum(
            _mw_d38(F.col("ntv")) * _mw_d38(F.col("ntv")) * _mw_d38(F.col("ntv"))
            - _mw_d38(F.col("ntv"))
        )
        .cast("decimal(38,0)")
        .alias("ties"),
    )
    # doc-grain attach of the label-independent doubled ranks, then the
    # K-way explode; the md5 parity is the q406 deterministic-hash
    # machinery (conv(substr(md5, 1, 8)) is non-negative, so % 2 agrees
    # with DuckDB's truncating %)
    perdoc = docs.select("doc_id", F.col("n_chars").alias("v")).join(
        ranked.select("v", "r2x"), "v"
    )
    samples = perdoc.select(
        "doc_id",
        "r2x",
        F.explode(F.sequence(F.lit(0), F.lit(_MW_PERMS - 1))).alias("k"),
    )
    in_a = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col("doc_id").cast("string"), F.col("k").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
        == 0
    )
    perk = samples.groupBy("k").agg(
        F.sum(F.when(in_a, 1).otherwise(0)).cast("bigint").alias("n1k"),
        F.sum(F.when(in_a, _mw_d38(F.col("r2x"))).otherwise(_mw_d38(F.lit(0))))
        .cast("decimal(38,0)")
        .alias("r1x2k"),
    )
    zk = perk.crossJoin(F.broadcast(gstats)).select(
        _mw_z_col(F.col("n1k"), F.col("r1x2k"), F.col("nt"), F.col("ties")).alias("z"),
        _mw_z_col(
            F.col("n1_obs"), F.col("r1x2_obs"), F.col("nt"), F.col("ties")
        ).alias("z_obs"),
    )
    extreme = F.when(F.col("z").isNotNull() & (F.abs("z") >= F.abs("z_obs")), 1).otherwise(0)
    return zk.groupBy("z_obs").agg(
        F.lit(_MW_PERMS).cast("bigint").alias("n_samples"),
        F.count("z").cast("bigint").alias("n_valid"),
        F.sum(extreme).cast("bigint").alias("n_extreme"),
        (
            (F.lit(1) + F.sum(extreme)).cast("double")
            / (F.lit(1) + F.count("z")).cast("double")
        ).alias("p_value"),
    ).select(
        "n_samples",
        "n_valid",
        "n_extreme",
        F.round("z_obs", 6).alias("z_obs"),
        "p_value",
    )


# ---------------------------------------------------------------------------
# q422 — incremental re-cluster advisor: q419's missing maintenance
# half (the round-10 pre-plan item). q419 costs candidate layouts by
# REBUILDING the whole table once per candidate; the question a
# scheduler actually asks between rebuilds is cheaper: appends have
# landed as unsorted tail files since the last cluster — has zone-map
# quality drifted enough to justify paying the re-sort? Base rows
# (o_orderkey % 10 <> 0) keep their date-clustered blocks UNCHANGED
# (at maintenance time their stats would be read from the manifest,
# q414's streaming zone-map state — nothing base-grain recomputes on
# the incremental path by design); the delta (% 10 = 0) blocks in
# arrival order as appended files. The advisor compares that
# composite state's month-workload scan fraction against the
# hypothetical full re-cluster and recommends the rebuild when the
# gain clears _RECLUSTER_GAIN_MICRO.
#
# Scale shape: one range exchange for the base blocks, one (much
# smaller) for the delta, one for the hypothetical rebuild; the
# month spine (~84 rows) is the only broadcast; the decision frame
# is 2 rows. Exact integers end-to-end (the q411 discipline).
# ---------------------------------------------------------------------------
_RECLUSTER_GAIN_MICRO = 50_000  # recommend at >= 5 points of scan fraction


@query(
    "q422_recluster_advisor",
    oracle=f"""
    WITH o AS (
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od FROM orders
    ),
    blocks AS (
        SELECT 'clustered_plus_appends' AS state, blk, min(od) AS mn, max(od) AS mx
        FROM (SELECT od, (row_number() OVER (ORDER BY od, o_orderkey) - 1) // 512 AS blk
              FROM o WHERE o_orderkey % 10 <> 0)
        GROUP BY blk
        UNION ALL
        SELECT 'clustered_plus_appends' AS state, 1000000000 + blk, min(od), max(od)
        FROM (SELECT od, (row_number() OVER (ORDER BY o_orderkey) - 1) // 512 AS blk
              FROM o WHERE o_orderkey % 10 = 0)
        GROUP BY blk
        UNION ALL
        SELECT 'reclustered_full' AS state, blk, min(od), max(od)
        FROM (SELECT od, (row_number() OVER (ORDER BY od, o_orderkey) - 1) // 512 AS blk
              FROM o)
        GROUP BY blk
    ),
    months AS (
        SELECT DISTINCT date_trunc('month', od) AS m0, last_day(od) AS m1 FROM o
    ),
    scans AS (
        SELECT b.state, CAST(count(*) AS BIGINT) AS scanned
        FROM blocks b JOIN months m ON b.mn <= m.m1 AND b.mx >= m.m0
        GROUP BY 1
    ),
    sizes AS (
        SELECT state, CAST(count(*) AS BIGINT) AS n_blocks FROM blocks GROUP BY 1
    ),
    nm AS (SELECT CAST(count(*) AS BIGINT) AS n_months FROM months),
    per AS (
        SELECT s.state, z.n_blocks, nm.n_months,
               s.scanned AS scanned_block_months,
               CAST((1000000 * s.scanned) // (z.n_blocks * nm.n_months) AS BIGINT)
                   AS scan_fraction_micro
        FROM scans s JOIN sizes z USING (state) CROSS JOIN nm
    ),
    gain AS (
        SELECT CAST(max(CASE WHEN state = 'clustered_plus_appends' THEN scan_fraction_micro END)
                    - max(CASE WHEN state = 'reclustered_full' THEN scan_fraction_micro END)
                    AS BIGINT) AS recluster_gain_micro
        FROM per
    )
    SELECT p.state,
           CAST(512 AS BIGINT) AS block_rows,
           p.n_blocks, p.n_months, p.scanned_block_months,
           p.scan_fraction_micro,
           p.scan_fraction_micro / 1000000.0 AS scan_fraction,
           g.recluster_gain_micro,
           g.recluster_gain_micro >= {_RECLUSTER_GAIN_MICRO} AS recommend_recluster
    FROM per p CROSS JOIN gain g
    ORDER BY p.state
    """,
)
def q422_recluster_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od")
    )
    base = o.filter(F.col("o_orderkey") % 10 != 0)
    delta = o.filter(F.col("o_orderkey") % 10 == 0)
    from pipeline_usnvc_spark.operators.checkpoint import materialize

    # block-grain (rows/512 — tiny) and consumed by scans + sizes:
    # materialize so the three global range exchanges run once; the
    # three independent layout builds overlap in driver threads
    # (q422 profiled 36 jobs / 1.55 s of gaps when sequential)
    blocks = materialize(
        _concurrent_union(
            lambda: _order_blocks(base, "clustered_plus_appends", "od", "o_orderkey"),
            lambda: _order_blocks(delta, "clustered_plus_appends", "o_orderkey"),
            lambda: _order_blocks(o, "reclustered_full", "od", "o_orderkey"),
        )
    )
    months = _month_spine(o)
    scans = (
        blocks.join(
            F.broadcast(months),
            (F.col("mn") <= F.col("m1")) & (F.col("mx") >= F.col("m0")),
        )
        .groupBy("layout")
        .agg(F.count("*").cast("bigint").alias("scanned"))
    )
    sizes = blocks.groupBy("layout").agg(F.count("*").cast("bigint").alias("n_blocks"))
    nm = months.agg(F.count("*").cast("bigint").alias("n_months"))
    per = (
        scans.join(sizes, "layout")
        .crossJoin(F.broadcast(nm))
        .select(
            F.col("layout").alias("state"),
            "n_blocks",
            "n_months",
            F.col("scanned").alias("scanned_block_months"),
            F.expr("(1000000 * scanned) div (n_blocks * n_months)")
            .cast("bigint")
            .alias("scan_fraction_micro"),
        )
    )
    # 2-row decision frame: the gain rides a one-row conditional agg
    gain = per.agg(
        (
            F.max(
                F.when(
                    F.col("state") == "clustered_plus_appends",
                    F.col("scan_fraction_micro"),
                )
            )
            - F.max(
                F.when(
                    F.col("state") == "reclustered_full", F.col("scan_fraction_micro")
                )
            )
        )
        .cast("bigint")
        .alias("recluster_gain_micro")
    )
    return (
        per.crossJoin(F.broadcast(gain))
        .select(
            "state",
            F.lit(_BLOCK_ROWS).cast("bigint").alias("block_rows"),
            "n_blocks",
            "n_months",
            "scanned_block_months",
            "scan_fraction_micro",
            (F.col("scan_fraction_micro") / F.lit(1000000.0)).alias("scan_fraction"),
            "recluster_gain_micro",
            (F.col("recluster_gain_micro") >= F.lit(_RECLUSTER_GAIN_MICRO)).alias(
                "recommend_recluster"
            ),
        )
        .orderBy("state")
    )


# ---------------------------------------------------------------------------
# q423 — deletion-aware re-cluster advisor: the composition the
# maintenance family was missing (q416 measures what deletion vectors
# do to zone maps; q422 decides on append drift; a REAL rewrite
# decision weighs BOTH). State 1 is the production table as it
# actually sits: the q422 composite layout (clustered base + appended
# tail) carrying q416's TTL deletion vectors — files never rewritten,
# so every block's zone map is STALE (min/max over dead rows too) and
# the month workload scans blocks whose matching rows are all dead.
# State 2 is the hypothetical rewrite: LIVE rows only, re-clustered,
# fresh stats. The advisor reports both scan fractions, the global
# dead mass, the vacuumable (fully-dead) block count, and recommends
# the rewrite when the scan-fraction gain clears
# _RECLUSTER_GAIN_MICRO OR the dead fraction clears 25% (the q416
# rewrite-candidate threshold, applied table-wide).
#
# Scale shape: three range exchanges (base / delta / live rebuild),
# block-grain everything after, the ~84-row month spine as the only
# broadcast, and 1-row scalar aggregates for the decision columns.
# Exact integers end-to-end.
# ---------------------------------------------------------------------------
_DEAD_FRACTION_MICRO = 250_000  # rewrite at >= 25% dead rows


@query(
    "q423_deletion_aware_recluster",
    oracle=f"""
    WITH o AS (
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
               CASE WHEN CAST(o_orderdate AS DATE) < DATE '{_TTL_CUTOFF}' THEN 0 ELSE 1 END AS live
        FROM orders
    ),
    blocks AS (
        SELECT 'stale_composite' AS state, blk,
               min(od) AS mn, max(od) AS mx,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(live) AS BIGINT) AS n_live
        FROM (SELECT od, live, (row_number() OVER (ORDER BY od, o_orderkey) - 1) // 512 AS blk
              FROM o WHERE o_orderkey % 10 <> 0)
        GROUP BY blk
        UNION ALL
        SELECT 'stale_composite', 1000000000 + blk, min(od), max(od),
               CAST(count(*) AS BIGINT), CAST(sum(live) AS BIGINT)
        FROM (SELECT od, live, (row_number() OVER (ORDER BY o_orderkey) - 1) // 512 AS blk
              FROM o WHERE o_orderkey % 10 = 0)
        GROUP BY blk
        UNION ALL
        SELECT 'rewritten_live', blk, min(od), max(od),
               CAST(count(*) AS BIGINT), CAST(count(*) AS BIGINT)
        FROM (SELECT od, (row_number() OVER (ORDER BY od, o_orderkey) - 1) // 512 AS blk
              FROM o WHERE live = 1)
        GROUP BY blk
    ),
    months AS (
        SELECT DISTINCT date_trunc('month', od) AS m0, last_day(od) AS m1 FROM o
    ),
    scans AS (
        SELECT b.state, CAST(count(*) AS BIGINT) AS scanned
        FROM blocks b JOIN months m ON b.mn <= m.m1 AND b.mx >= m.m0
        GROUP BY 1
    ),
    sizes AS (
        SELECT state,
               CAST(count(*) AS BIGINT) AS n_blocks,
               CAST(sum(CASE WHEN n_live = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_vacuum_blocks
        FROM blocks GROUP BY 1
    ),
    nm AS (SELECT CAST(count(*) AS BIGINT) AS n_months FROM months),
    dead AS (
        SELECT CAST(sum(1 - live) AS BIGINT) AS dead_rows,
               CAST((1000000 * sum(1 - live)) // count(*) AS BIGINT) AS dead_fraction_micro
        FROM o
    ),
    per AS (
        SELECT s.state, z.n_blocks, z.n_vacuum_blocks, nm.n_months,
               s.scanned AS scanned_block_months,
               CAST((1000000 * s.scanned) // (z.n_blocks * nm.n_months) AS BIGINT)
                   AS scan_fraction_micro
        FROM scans s JOIN sizes z USING (state) CROSS JOIN nm
    ),
    gain AS (
        SELECT CAST(max(CASE WHEN state = 'stale_composite' THEN scan_fraction_micro END)
                    - max(CASE WHEN state = 'rewritten_live' THEN scan_fraction_micro END)
                    AS BIGINT) AS rewrite_gain_micro
        FROM per
    )
    SELECT p.state,
           CAST(512 AS BIGINT) AS block_rows,
           p.n_blocks, p.n_vacuum_blocks, p.n_months, p.scanned_block_months,
           p.scan_fraction_micro,
           p.scan_fraction_micro / 1000000.0 AS scan_fraction,
           d.dead_rows, d.dead_fraction_micro,
           g.rewrite_gain_micro,
           g.rewrite_gain_micro >= {_RECLUSTER_GAIN_MICRO}
               OR d.dead_fraction_micro >= {_DEAD_FRACTION_MICRO} AS recommend_rewrite
    FROM per p CROSS JOIN gain g CROSS JOIN dead d
    ORDER BY p.state
    """,
)
def q423_deletion_aware_recluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.operators.checkpoint import materialize
    from pipeline_usnvc_spark.operators.rank import with_global_rank

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("od"),
        F.when(
            F.to_date("o_orderdate") < F.lit(_TTL_CUTOFF).cast("date"), 0
        )
        .otherwise(1)
        .alias("live"),
    )

    def blocks_of(df: DataFrame, order_cols: list, offset: int) -> DataFrame:
        ranked = with_global_rank(
            df.select(*dict.fromkeys([*order_cols, "od", "live"])),
            *order_cols,
            rank_col="r",
        )
        return (
            ranked.select(
                (F.expr(f"(r - 1) div {_BLOCK_ROWS}") + F.lit(offset)).alias("blk"),
                "od",
                "live",
            )
            .groupBy("blk")
            .agg(
                F.min("od").alias("mn"),
                F.max("od").alias("mx"),
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum("live").cast("bigint").alias("n_live"),
            )
        )

    base = o.filter(F.col("o_orderkey") % 10 != 0)
    delta = o.filter(F.col("o_orderkey") % 10 == 0)
    live_rows = o.filter(F.col("live") == 1)
    stale = blocks_of(base, ["od", "o_orderkey"], 0).unionByName(
        blocks_of(delta, ["o_orderkey"], 1_000_000_000)
    ).withColumn("state", F.lit("stale_composite"))
    # the rewrite's fresh stats are over live rows only (n_live is
    # n_rows by construction)
    rewritten = blocks_of(live_rows, ["od", "o_orderkey"], 0).withColumn(
        "state", F.lit("rewritten_live")
    )
    # block-grain (rows/512) with THREE range exchanges upstream and
    # two consumers below: materialize so each exchange runs once
    blocks = materialize(stale.unionByName(rewritten))
    months = _month_spine(o)
    scans = (
        blocks.join(
            F.broadcast(months),
            (F.col("mn") <= F.col("m1")) & (F.col("mx") >= F.col("m0")),
        )
        .groupBy("state")
        .agg(F.count("*").cast("bigint").alias("scanned"))
    )
    sizes = blocks.groupBy("state").agg(
        F.count("*").cast("bigint").alias("n_blocks"),
        F.sum(F.when(F.col("n_live") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_vacuum_blocks"),
    )
    nm = months.agg(F.count("*").cast("bigint").alias("n_months"))
    dead = o.agg(
        F.sum(F.lit(1) - F.col("live")).cast("bigint").alias("dead_rows"),
        F.expr("(1000000 * sum(1 - live)) div count(*)")
        .cast("bigint")
        .alias("dead_fraction_micro"),
    )
    per = (
        scans.join(sizes, "state")
        .crossJoin(F.broadcast(nm))
        .select(
            "state",
            "n_blocks",
            "n_vacuum_blocks",
            "n_months",
            F.col("scanned").alias("scanned_block_months"),
            F.expr("(1000000 * scanned) div (n_blocks * n_months)")
            .cast("bigint")
            .alias("scan_fraction_micro"),
        )
    )
    gain = per.agg(
        (
            F.max(
                F.when(
                    F.col("state") == "stale_composite", F.col("scan_fraction_micro")
                )
            )
            - F.max(
                F.when(
                    F.col("state") == "rewritten_live", F.col("scan_fraction_micro")
                )
            )
        )
        .cast("bigint")
        .alias("rewrite_gain_micro")
    )
    return (
        per.crossJoin(F.broadcast(gain))
        .crossJoin(F.broadcast(dead))
        .select(
            "state",
            F.lit(_BLOCK_ROWS).cast("bigint").alias("block_rows"),
            "n_blocks",
            "n_vacuum_blocks",
            "n_months",
            "scanned_block_months",
            "scan_fraction_micro",
            (F.col("scan_fraction_micro") / F.lit(1000000.0)).alias("scan_fraction"),
            "dead_rows",
            "dead_fraction_micro",
            "rewrite_gain_micro",
            (
                (F.col("rewrite_gain_micro") >= F.lit(_RECLUSTER_GAIN_MICRO))
                | (F.col("dead_fraction_micro") >= F.lit(_DEAD_FRACTION_MICRO))
            ).alias("recommend_rewrite"),
        )
        .orderBy("state")
    )

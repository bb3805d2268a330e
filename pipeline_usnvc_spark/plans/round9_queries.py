"""Round-9 query family: scale-path twins for the two documented
quadratic/exponential exact baselines that still lacked one
(VERDICT r08 item 6 — "grow the registry only where a pair-discipline
row exists").

- q405 banded Kendall τ-b ↔ q323 exact Kendall τ-b: q323's
  concordant/discordant counts ride the O(days²) day-pair theta join
  (calendar-bounded, documented in COVERAGE.md's theta table). q405
  is the unbounded-series answer: band each axis into 16 fixed bands,
  collapse the series to the ≤256-cell contingency lattice in ONE
  exchange, and count concordant/discordant/tied pairs as exact
  integer products over cell pairs — O(B⁴) lattice work, O(1) in the
  number of days. τ-b's tie correction absorbs the banding ties, so
  the statistic stays well-defined at any scale.
- q406 permutation-sampling Shapley ↔ q340 exact Shapley: q340
  expands the 2^|channels| coalition lattice and fails fast above 16
  channels, naming permutation sampling as the fallback
  (COVERAGE.md theta table; the guard is regression-locked). q406 IS
  that fallback, made deterministic: K = 24 permutations are derived
  by ranking channels on md5(k || '-' || channel) — identical hex in
  Spark and DuckDB, so both engines walk the SAME "random" orders —
  and each channel's credit is the average marginal contribution
  v(prefix ∪ {c}) − v(prefix) over the K prefixes. Cost is
  O(K·|channels|) lattice rows + two equi-joins against the
  OBSERVED-coalition value table (data-bounded, never 2^n), fully
  distributable up to 63 channels — the 64-bit coalition-mask key's
  domain (shift amounts wrap mod 64 on both engines, so the estimator
  fails fast there rather than silently colliding masks; ADVICE r09).

Reference scope note: the reference pipeline (usnvc/usnvc.py) has no
statistics at all — this family belongs to the mandated LLM-pipeline
/ analytics extension surface.

Oracle-parity discipline as plans/round8_queries.py: exact integer /
DECIMAL(38,0) sufficient statistics, micro-quantized transcendentals
(round(1e6·x) before any cross-row sum), guarded divisions, tie-free
rankings (md5 keys tie-broken by channel name), and one final double
expression per output rounded to 6dp with the IDENTICAL tree on both
engines.

Scale shape: both queries aggregate row-grain data to a bounded spine
first (16×16 band lattice; K×|channels| permutation spine + the
observed-coalition aggregate); every window partitions on the sample
index (K partitions of |channels| rows); the coalition-value join is
a plain equi-join sized by the data (AQE broadcasts it when small,
shuffles it when not) — deliberately NOT hint-broadcast, since at
high channel cardinality observed coalitions approach user grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pipeline_usnvc_spark.plans.registry import query
from pipeline_usnvc_spark.sources.tables import load_table


_N_PERMS = 24


# ---------------------------------------------------------------------------
# q405 — banded Kendall τ-b between the daily view series and the
# daily purchase series (the q323 pair's scale path): each axis is
# banded into 16 equal-width integer bands over its observed range,
# the day series collapses to the (bx, by) contingency lattice, and
# C/D/ties are exact integer products over ordered cell pairs
# (b.bx > a.bx), x-ties from per-bx column sums, y-ties from per-by
# row sums, both-ties from within-cell pairs. The banding is exact
# integer floor division on non-negative operands (identical in both
# engines); n0 = N(N−1)/2 exactly.
# ---------------------------------------------------------------------------
@query(
    "q405_banded_kendall_tau",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS x,
               CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    bounds AS (
        SELECT min(x) AS mnx, max(x) AS mxx, min(y) AS mny, max(y) AS mxy
        FROM daily
    ),
    banded AS (
        SELECT ((x - b.mnx) * 16) // (b.mxx - b.mnx + 1) AS bx,
               ((y - b.mny) * 16) // (b.mxy - b.mny + 1) AS by
        FROM daily CROSS JOIN bounds b
    ),
    cells AS (
        SELECT bx, by, CAST(count(*) AS BIGINT) AS n FROM banded GROUP BY bx, by
    ),
    cross_pairs AS (
        SELECT CAST(sum(CASE WHEN b.by > a.by THEN a.n * b.n ELSE 0 END) AS BIGINT) AS c,
               CAST(sum(CASE WHEN b.by < a.by THEN a.n * b.n ELSE 0 END) AS BIGINT) AS dd
        FROM cells a JOIN cells b ON b.bx > a.bx
    ),
    x_ties AS (
        SELECT CAST(sum(tx * (tx - 1) // 2) AS BIGINT) AS n1
        FROM (SELECT sum(n) AS tx FROM cells GROUP BY bx)
    ),
    y_ties AS (
        SELECT CAST(sum(ty * (ty - 1) // 2) AS BIGINT) AS n2
        FROM (SELECT sum(n) AS ty FROM cells GROUP BY by)
    ),
    tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS nd,
               CAST((sum(n) * (sum(n) - 1)) // 2 AS BIGINT) AS n0,
               CAST(count(*) AS BIGINT) AS n_cells
        FROM cells
    )
    SELECT t.nd AS n_days, t.n_cells AS n_cells,
           p.c AS concordant_w, p.dd AS discordant_w,
           CASE WHEN t.n0 > x.n1 AND t.n0 > y.n2
                THEN round(CAST(p.c - p.dd AS DOUBLE)
                           / sqrt(CAST(t.n0 - x.n1 AS DOUBLE) * CAST(t.n0 - y.n2 AS DOUBLE)), 6)
                ELSE NULL END AS tau_b_banded
    FROM tot t CROSS JOIN cross_pairs p CROSS JOIN x_ties x CROSS JOIN y_ties y
    """,
)
def q405_banded_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.when(F.col("event_type") == "view", 1)).cast("bigint").alias("x"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("bigint")
        .alias("y"),
    )
    bounds = daily.agg(
        F.min("x").alias("mnx"),
        F.max("x").alias("mxx"),
        F.min("y").alias("mny"),
        F.max("y").alias("mxy"),
    )
    # non-negative operands: integral `div` truncation == floor,
    # identical to DuckDB's `//`
    banded = daily.crossJoin(F.broadcast(bounds)).select(
        F.expr("((x - mnx) * 16) div (mxx - mnx + 1)").alias("bx"),
        F.expr("((y - mny) * 16) div (mxy - mny + 1)").alias("by"),
    )
    cells = banded.groupBy("bx", "by").agg(F.count("*").cast("bigint").alias("n"))
    a, b = cells.alias("a"), cells.alias("b")
    cross_pairs = (
        a.join(F.broadcast(b), F.col("b.bx") > F.col("a.bx"))
        .agg(
            F.sum(
                F.when(
                    F.col("b.by") > F.col("a.by"), F.col("a.n") * F.col("b.n")
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("c"),
            F.sum(
                F.when(
                    F.col("b.by") < F.col("a.by"), F.col("a.n") * F.col("b.n")
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("dd"),
        )
    )
    # tie pair counts stay in exact integer arithmetic end-to-end:
    # t*(t-1) is always even, so `div 2` is exact, and the cross-row
    # sum never touches doubles (a double detour is exact only below
    # 2^53 tie products — ADVICE r09)
    x_ties = (
        cells.groupBy("bx")
        .agg(F.sum("n").alias("tx"))
        .agg(F.sum(F.expr("tx * (tx - 1) div 2")).cast("bigint").alias("n1"))
    )
    y_ties = (
        cells.groupBy("by")
        .agg(F.sum("n").alias("ty"))
        .agg(F.sum(F.expr("ty * (ty - 1) div 2")).cast("bigint").alias("n2"))
    )
    tot = cells.agg(
        F.sum("n").cast("bigint").alias("nd"),
        F.expr("(sum(n) * (sum(n) - 1)) div 2").cast("bigint").alias("n0"),
        F.count("*").cast("bigint").alias("n_cells"),
    )
    joined = (
        tot.crossJoin(F.broadcast(cross_pairs))
        .crossJoin(F.broadcast(x_ties))
        .crossJoin(F.broadcast(y_ties))
    )
    n0, n1, n2 = F.col("n0"), F.col("n1"), F.col("n2")
    tau = F.when(
        (n0 > n1) & (n0 > n2),
        F.round(
            (F.col("c") - F.col("dd")).cast("double")
            / F.sqrt((n0 - n1).cast("double") * (n0 - n2).cast("double")),
            6,
        ),
    )
    return joined.select(
        F.col("nd").alias("n_days"),
        "n_cells",
        F.col("c").alias("concordant_w"),
        F.col("dd").alias("discordant_w"),
        tau.alias("tau_b_banded"),
    )


# ---------------------------------------------------------------------------
# q406 — permutation-sampling Shapley channel attribution (the q340
# pair's scale path, and the exact fallback its 16-channel guard
# names): K = 24 channel orderings are derived deterministically by
# ranking channels on md5(k || '-' || channel) (identical hex in both
# engines — the "seeded PRNG" both sides share), each (k, channel)
# row computes the marginal contribution v(prefix ∪ {c}) − v(prefix)
# against the OBSERVED-coalition value table (same v_micro
# quantization as q340), and the credit is the exact-integer average
# over the K samples. No 2^n lattice anywhere: the spine is
# K·|channels| rows and the value joins are plain equi-joins on mask.
# ---------------------------------------------------------------------------
@query(
    "q406_permutation_shapley",
    # f-string: the sample count and its micro divisor derive from
    # _N_PERMS so editing the constant can never desynchronize the
    # Spark plan from the oracle (review finding: 24 was baked in at
    # three places in a plain string).
    oracle=f"""
    WITH channels AS (
        SELECT event_type AS ch,
               CAST(row_number() OVER (ORDER BY event_type) - 1 AS BIGINT) AS bit
        FROM (SELECT DISTINCT event_type FROM events WHERE event_type <> 'purchase')
    ),
    samples AS (SELECT CAST(unnest(range(0, {_N_PERMS})) AS BIGINT) AS k),
    perm AS (
        SELECT s.k, c.ch, c.bit,
               CAST(row_number() OVER (
                   PARTITION BY s.k
                   ORDER BY md5(CAST(s.k AS VARCHAR) || '-' || c.ch), c.ch
               ) AS BIGINT) AS pos
        FROM channels c CROSS JOIN samples s
    ),
    pref AS (
        SELECT k, ch, bit,
               CAST(COALESCE(sum(1 << bit) OVER (
                   PARTITION BY k ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS mask_before
        FROM perm
    ),
    users AS (
        SELECT e.user_id,
               CAST(COALESCE(sum(DISTINCT CASE WHEN e.event_type <> 'purchase'
                    THEN (1 << c.bit) END), 0) AS BIGINT) AS mask,
               CAST(max(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS conv
        FROM events e LEFT JOIN channels c ON c.ch = e.event_type
        GROUP BY e.user_id
    ),
    coal AS (
        SELECT mask, CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(conv) AS BIGINT) AS n_conv
        FROM users GROUP BY mask
    ),
    v AS (
        SELECT mask, CAST(round(1000000.0 * CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE)) AS BIGINT) AS v_micro
        FROM coal
    ),
    marg AS (
        SELECT p.ch,
               COALESCE(v1.v_micro, 0) - COALESCE(v0.v_micro, 0) AS m_micro
        FROM pref p
        LEFT JOIN v v0 ON v0.mask = p.mask_before
        LEFT JOIN v v1 ON v1.mask = p.mask_before + (1 << p.bit)
    )
    SELECT ch AS channel,
           CAST({_N_PERMS} AS BIGINT) AS n_samples,
           round(CAST(sum(m_micro) AS DOUBLE) / ({_N_PERMS} * 1000000.0), 6) AS shapley_credit_sampled
    FROM marg GROUP BY ch ORDER BY ch
    """,
)
def q406_permutation_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    return permutation_shapley(load_table(spark, sf_dir, "events"))


def permutation_shapley(ev: DataFrame, n_perms: int = _N_PERMS) -> DataFrame:
    """Permutation-sampling Shapley attribution over an events frame.

    Factored out of q406 (mirroring q340's ``shapley_attribution``
    factoring) so the high-cardinality path is unit-testable: the
    O(K·|channels|) spine keeps working exactly where the exact
    coalition lattice fails fast above 16 channels — but ONLY up to
    63 channels, because coalitions are keyed as 64-bit masks
    (``shiftleft(1L, bit)`` / ``1 << bit``) and BOTH engines silently
    wrap shift amounts mod 64, so above bit 62 masks would collide and
    credits would be wrong without any error (ADVICE r09). Fail fast
    there, mirroring q340's regression-locked guard; past 63 channels
    the coalition key must become a sorted channel-set string (the
    estimator's math is unchanged — only the join key representation
    caps out).
    """
    spark = ev.sparkSession
    channels = (
        ev.filter(F.col("event_type") != "purchase")
        .select(F.col("event_type").alias("ch"))
        .distinct()
        .select(
            "ch",
            (F.row_number().over(Window.orderBy("ch")) - 1)
            .cast("bigint")
            .alias("bit"),
        )
    )
    # bounded eager action (q340 pattern): one count over the distinct
    # channel domain — tiny by definition, and the guard must run
    # before any mask arithmetic is planned
    n_channels = channels.count()
    if n_channels > 63:
        raise ValueError(
            f"permutation_shapley: {n_channels} channels exceed the 63-bit "
            "coalition-mask domain — shiftleft/`<<` wrap shift amounts mod "
            "64 on both engines, so masks would silently collide; re-key "
            "coalitions as a sorted channel-set string (array_join("
            "array_sort(collect_set(ch)))) to go past 63 channels"
        )
    samples = spark.range(0, n_perms).select(F.col("id").cast("bigint").alias("k"))
    perm = channels.crossJoin(F.broadcast(samples)).select(
        "k",
        "ch",
        "bit",
        F.row_number()
        .over(
            Window.partitionBy("k").orderBy(
                F.md5(F.concat(F.col("k").cast("string"), F.lit("-"), F.col("ch"))),
                "ch",
            )
        )
        .cast("bigint")
        .alias("pos"),
    )
    w_prefix = (
        Window.partitionBy("k")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pref = perm.select(
        "k",
        "ch",
        "bit",
        F.coalesce(
            F.sum(F.expr("shiftleft(1L, CAST(bit AS INT))")).over(w_prefix),
            F.lit(0),
        )
        .cast("bigint")
        .alias("mask_before"),
    )
    users = (
        ev.join(F.broadcast(channels), ev["event_type"] == channels["ch"], "left")
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum_distinct(
                    F.when(
                        F.col("event_type") != "purchase",
                        F.expr("shiftleft(1L, CAST(bit AS INT))"),
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("mask"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("conv"),
        )
    )
    coal = users.groupBy("mask").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("conv").cast("bigint").alias("n_conv"),
    )
    v = coal.select(
        "mask",
        F.round(
            F.lit(1000000.0)
            * F.col("n_conv").cast("double")
            / F.col("n_users").cast("double")
        )
        .cast("bigint")
        .alias("v_micro"),
    )
    # plain equi-joins on mask — observed-coalition grain is
    # data-bounded (≤ distinct user journeys); AQE broadcasts it when
    # small instead of a forced hint that would OOM at high channel
    # cardinality
    v0 = v.select(F.col("mask").alias("mask_before"), F.col("v_micro").alias("v0"))
    v1 = v.select(F.col("mask").alias("m1"), F.col("v_micro").alias("v1"))
    marg = (
        pref.join(v0, "mask_before", "left")
        .join(
            v1,
            F.col("m1")
            == F.col("mask_before")
            + F.expr("shiftleft(1L, CAST(bit AS INT))").cast("bigint"),
            "left",
        )
        .select(
            "ch",
            (F.coalesce("v1", F.lit(0)) - F.coalesce("v0", F.lit(0))).alias(
                "m_micro"
            ),
        )
    )
    return (
        marg.groupBy("ch")
        .agg(
            F.round(
                F.sum("m_micro").cast("bigint").cast("double")
                / F.lit(float(n_perms) * 1000000.0),
                6,
            ).alias("shapley_credit_sampled")
        )
        .select(
            F.col("ch").alias("channel"),
            F.lit(n_perms).cast("bigint").alias("n_samples"),
            "shapley_credit_sampled",
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# q407 — windowed Theil-Sen trend of daily revenue (the q235 pair's
# scale path, making COVERAGE.md's `_THEIL_SEN_MAX_SPAN_DAYS` knob a
# first-class oracle-paired query): the pairwise-slope lattice is
# banded to |d_j − d_i| ≤ 30 days, so the theta join becomes a range
# join with O(days·30) pairs — linear in the calendar instead of
# quadratic — at the cost of the textbook all-pairs estimator (the
# standard windowed/banded Theil-Sen trade). Median extraction is the
# identical two-middle-ranks construction as q235 (exact micro-int
# slopes, tie-broken total order, no single-partition sort).
# ---------------------------------------------------------------------------
@query(
    "q407_windowed_theil_sen",
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
        FROM daily a JOIN daily b ON b.d > a.d AND b.d - a.d <= 30
    ),
    ranked AS (
        SELECT slope_micro,
               row_number() OVER (ORDER BY slope_micro, d_i, d_j) AS r,
               count(*) OVER () AS m
        FROM slopes
    )
    SELECT CAST(30 AS BIGINT) AS window_days,
           CAST(max(m) AS BIGINT) AS n_pairs,
           CAST(sum(slope_micro) AS BIGINT) AS mid_sum_micro,
           CAST(count(*) AS BIGINT) AS n_mid,
           CAST(sum(slope_micro) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0
             AS slope_cents_per_day
    FROM ranked
    WHERE r IN ((m + 1) // 2, m // 2 + 1)
    """,
)
def q407_windowed_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.operators.checkpoint import materialize
    from pipeline_usnvc_spark.operators.rank import with_global_rank

    WINDOW_DAYS = 30
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
    slopes = a.join(
        b,
        (F.col("b.d") > F.col("a.d"))
        & (F.col("b.d") - F.col("a.d") <= F.lit(WINDOW_DAYS)),
    ).select(
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
            F.lit(WINDOW_DAYS).cast("bigint").alias("window_days"),
            F.max("m").cast("bigint").alias("n_pairs"),
            F.sum("slope_micro").cast("bigint").alias("mid_sum_micro"),
            F.count("*").cast("bigint").alias("n_mid"),
            (
                F.sum("slope_micro").cast("double")
                / F.count("*").cast("double")
                / F.lit(1000000.0)
            ).alias("slope_cents_per_day"),
        )
    )


# ---------------------------------------------------------------------------
# q408 — banded Cramér-von-Mises drift vs ONE reference source (the
# q349 pair's scale path, completing the ECDF family's banding:
# q368→q392 did it for W1, this does it for CvM, closing the SCALE.md
# round-7 note "pairs are quadratic in SOURCE COUNT … band to a
# reference source each, linear"): |sources|−1 pairs against the
# lexicographically-first source, the identical exact integer ECDF
# machinery as q349 (value-spine prefix counts, HUGEINT gap products,
# one 6dp double per pair).
# ---------------------------------------------------------------------------
@query(
    "q408_banded_cvm_reference",
    oracle="""
    WITH cnt AS (
        SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2
    ),
    ref AS (SELECT min(source) AS ref FROM cnt),
    pairs AS (
        SELECT r.ref AS sa, s.source AS sb
        FROM (SELECT DISTINCT source FROM cnt) s CROSS JOIN ref r
        WHERE s.source <> r.ref
    ),
    spine AS (
        SELECT p.sa, p.sb, v.v,
               coalesce(ca.c, 0) AS ca, coalesce(cb.c, 0) AS cb
        FROM pairs p
        JOIN (SELECT DISTINCT cnt.v FROM cnt) v ON TRUE
        LEFT JOIN cnt ca ON ca.source = p.sa AND ca.v = v.v
        LEFT JOIN cnt cb ON cb.source = p.sb AND cb.v = v.v
        WHERE coalesce(ca.c, 0) + coalesce(cb.c, 0) > 0
    ),
    cum AS (
        SELECT sa, sb, ca, cb,
               CAST(sum(ca) OVER w AS BIGINT) AS cfa,
               CAST(sum(cb) OVER w AS BIGINT) AS cfb,
               CAST(sum(ca) OVER (PARTITION BY sa, sb) AS BIGINT) AS n,
               CAST(sum(cb) OVER (PARTITION BY sa, sb) AS BIGINT) AS m
        FROM spine
        WINDOW w AS (PARTITION BY sa, sb ORDER BY v)
    ),
    agg AS (
        SELECT sa, sb, max(n) AS n, max(m) AS m,
               CAST(sum(CAST(ca + cb AS HUGEINT)
                        * CAST(cfa * m - cfb * n AS HUGEINT)
                        * CAST(cfa * m - cfb * n AS HUGEINT)) AS HUGEINT) AS num
        FROM cum GROUP BY sa, sb
    )
    SELECT sa AS reference_source, sb AS source, n AS n_ref, m AS n_src,
           round(CAST(num AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(m AS DOUBLE)
                    * CAST(n + m AS DOUBLE) * CAST(n + m AS DOUBLE)), 6) AS cvm_t
    FROM agg ORDER BY source
    """,
)
def q408_banded_cvm_reference(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cnt = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    ref = cnt.agg(F.min("source").alias("ref"))
    pairs = (
        cnt.select("source")
        .distinct()
        .crossJoin(F.broadcast(ref))
        .filter(F.col("source") != F.col("ref"))
        .select(F.col("ref").alias("sa"), F.col("source").alias("sb"))
    )
    vals = cnt.select("v").distinct()
    # per-source count frame joins stay UN-hinted (q349's rule): AQE
    # broadcasts the (source x distinct value) frame when small and
    # shuffles it otherwise
    spine = (
        pairs.crossJoin(F.broadcast(vals))
        .join(
            cnt.select(F.col("source").alias("sa"), "v", F.col("c").alias("ca")),
            ["sa", "v"],
            "left",
        )
        .join(
            cnt.select(F.col("source").alias("sb"), "v", F.col("c").alias("cb")),
            ["sb", "v"],
            "left",
        )
        .select(
            "sa",
            "sb",
            "v",
            F.coalesce("ca", F.lit(0).cast("bigint")).alias("ca"),
            F.coalesce("cb", F.lit(0).cast("bigint")).alias("cb"),
        )
        .filter(F.col("ca") + F.col("cb") > 0)
    )
    w_cum = Window.partitionBy("sa", "sb").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_pair = Window.partitionBy("sa", "sb")
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cum = spine.select(
        "sa",
        "sb",
        "ca",
        "cb",
        F.sum("ca").over(w_cum).cast("bigint").alias("cfa"),
        F.sum("cb").over(w_cum).cast("bigint").alias("cfb"),
        F.sum("ca").over(w_pair).cast("bigint").alias("n"),
        F.sum("cb").over(w_pair).cast("bigint").alias("m"),
    )
    gap = d38(F.col("cfa")) * d38(F.col("m")) - d38(F.col("cfb")) * d38(F.col("n"))
    agg = cum.groupBy("sa", "sb").agg(
        F.max("n").cast("bigint").alias("n"),
        F.max("m").cast("bigint").alias("m"),
        F.sum(d38(F.col("ca") + F.col("cb")) * gap * gap)
        .cast("decimal(38,0)")
        .alias("num"),
    )
    return agg.select(
        F.col("sa").alias("reference_source"),
        F.col("sb").alias("source"),
        F.col("n").alias("n_ref"),
        F.col("m").alias("n_src"),
        F.round(
            F.col("num").cast("double")
            / (
                F.col("n").cast("double")
                * F.col("m").cast("double")
                * (F.col("n") + F.col("m")).cast("double")
                * (F.col("n") + F.col("m")).cast("double")
            ),
            6,
        ).alias("cvm_t"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# q409 — banded energy distance vs ONE reference source, completing
# the banded ECDF drift trio (q368→q392 W1, q349→q408 CvM, q367→this):
# |sources|−1 pairs against the lexicographically-first source, the
# identical exact integer machinery as q367 (value-spine below-counts
# and below-sums give Σ|x−y| without a pair join; the energy form
# 2·E|X−Y| − E|X−X'| − E|Y−Y'| floors to micro once per pair).
# ---------------------------------------------------------------------------
@query(
    "q409_banded_energy_reference",
    oracle="""
    WITH cnt AS (
        SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2
    ),
    ref AS (SELECT min(source) AS ref FROM cnt),
    pairs AS (
        SELECT r.ref AS sa, s.source AS sb
        FROM (SELECT DISTINCT source FROM cnt) s CROSS JOIN ref r
        WHERE s.source <> r.ref
    ),
    spine AS (
        SELECT p.sa, p.sb, v.v,
               coalesce(ca.c, 0) AS ca, coalesce(cb.c, 0) AS cb
        FROM pairs p
        JOIN (SELECT DISTINCT cnt.v FROM cnt) v ON TRUE
        LEFT JOIN cnt ca ON ca.source = p.sa AND ca.v = v.v
        LEFT JOIN cnt cb ON cb.source = p.sb AND cb.v = v.v
        WHERE coalesce(ca.c, 0) + coalesce(cb.c, 0) > 0
    ),
    cum AS (
        SELECT sa, sb, v, ca, cb,
               CAST(coalesce(sum(ca) OVER wb, 0) AS HUGEINT) AS cnt_a_below,
               CAST(coalesce(sum(CAST(ca AS HUGEINT) * v) OVER wb, 0) AS HUGEINT) AS sum_a_below,
               CAST(coalesce(sum(cb) OVER wb, 0) AS HUGEINT) AS cnt_b_below,
               CAST(coalesce(sum(CAST(cb AS HUGEINT) * v) OVER wb, 0) AS HUGEINT) AS sum_b_below,
               CAST(sum(ca) OVER wp AS HUGEINT) AS n,
               CAST(sum(cb) OVER wp AS HUGEINT) AS m
        FROM spine
        WINDOW wb AS (PARTITION BY sa, sb ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               wp AS (PARTITION BY sa, sb)
    ),
    sums AS (
        SELECT sa, sb, max(n) AS n, max(m) AS m,
               CAST(sum(CAST(ca AS HUGEINT) * (v * cnt_b_below - sum_b_below)
                        + CAST(cb AS HUGEINT) * (v * cnt_a_below - sum_a_below)) AS HUGEINT) AS t_ab,
               CAST(sum(2 * CAST(ca AS HUGEINT) * (v * cnt_a_below - sum_a_below)) AS HUGEINT) AS t_aa,
               CAST(sum(2 * CAST(cb AS HUGEINT) * (v * cnt_b_below - sum_b_below)) AS HUGEINT) AS t_bb
        FROM cum GROUP BY sa, sb
    )
    SELECT sa AS reference_source, sb AS source,
           CAST(n AS BIGINT) AS n_ref, CAST(m AS BIGINT) AS n_src,
           CAST((2 * t_ab * n * m - t_aa * m * m - t_bb * n * n) * 1000000
                - ((2 * t_ab * n * m - t_aa * m * m - t_bb * n * n) * 1000000)
                  % (n * n * m * m)
                AS HUGEINT) // (n * n * m * m) / 1000000.0 AS energy_d2
    FROM sums ORDER BY source
    """,
)
def q409_banded_energy_reference(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cnt = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    ref = cnt.agg(F.min("source").alias("ref"))
    pairs = (
        cnt.select("source")
        .distinct()
        .crossJoin(F.broadcast(ref))
        .filter(F.col("source") != F.col("ref"))
        .select(F.col("ref").alias("sa"), F.col("source").alias("sb"))
    )
    vals = cnt.select("v").distinct()
    # un-hinted count-frame joins, q349/q408's rule (AQE decides)
    spine = (
        pairs.crossJoin(F.broadcast(vals))
        .join(
            cnt.select(F.col("source").alias("sa"), "v", F.col("c").alias("ca")),
            ["sa", "v"],
            "left",
        )
        .join(
            cnt.select(F.col("source").alias("sb"), "v", F.col("c").alias("cb")),
            ["sb", "v"],
            "left",
        )
        .select(
            "sa",
            "sb",
            "v",
            F.coalesce("ca", F.lit(0).cast("bigint")).alias("ca"),
            F.coalesce("cb", F.lit(0).cast("bigint")).alias("cb"),
        )
        .filter(F.col("ca") + F.col("cb") > 0)
    )
    w_below = (
        Window.partitionBy("sa", "sb")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_pair = Window.partitionBy("sa", "sb")
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    z = F.lit(0).cast("decimal(38,0)")
    cum = spine.select(
        "sa",
        "sb",
        "v",
        "ca",
        "cb",
        F.coalesce(F.sum(d38(F.col("ca"))).over(w_below), z).alias("cnt_a_below"),
        F.coalesce(
            F.sum(d38(F.col("ca")) * d38(F.col("v"))).over(w_below), z
        ).alias("sum_a_below"),
        F.coalesce(F.sum(d38(F.col("cb"))).over(w_below), z).alias("cnt_b_below"),
        F.coalesce(
            F.sum(d38(F.col("cb")) * d38(F.col("v"))).over(w_below), z
        ).alias("sum_b_below"),
        F.sum("ca").over(w_pair).cast("bigint").alias("n"),
        F.sum("cb").over(w_pair).cast("bigint").alias("m"),
    )
    gap_b = d38(F.col("v")) * F.col("cnt_b_below") - F.col("sum_b_below")
    gap_a = d38(F.col("v")) * F.col("cnt_a_below") - F.col("sum_a_below")
    sums = cum.groupBy("sa", "sb").agg(
        F.max("n").alias("n"),
        F.max("m").alias("m"),
        F.sum(d38(F.col("ca")) * gap_b + d38(F.col("cb")) * gap_a)
        .cast("decimal(38,0)")
        .alias("t_ab"),
        F.sum(F.lit(2).cast("decimal(38,0)") * d38(F.col("ca")) * gap_a)
        .cast("decimal(38,0)")
        .alias("t_aa"),
        F.sum(F.lit(2).cast("decimal(38,0)") * d38(F.col("cb")) * gap_b)
        .cast("decimal(38,0)")
        .alias("t_bb"),
    )
    n38, m38 = d38(F.col("n")), d38(F.col("m"))
    num = (
        F.lit(2).cast("decimal(38,0)") * F.col("t_ab") * n38 * m38
        - F.col("t_aa") * m38 * m38
        - F.col("t_bb") * n38 * n38
    ).cast("decimal(38,0)")
    den = (n38 * n38 * m38 * m38).cast("decimal(38,0)")
    scaled = (num * F.lit(1000000).cast("decimal(38,0)")).cast("decimal(38,0)")
    d2_micro = ((scaled - F.pmod(scaled, den)) / den).cast("bigint")
    return sums.select(
        F.col("sa").alias("reference_source"),
        F.col("sb").alias("source"),
        F.col("n").alias("n_ref"),
        F.col("m").alias("n_src"),
        (d2_micro.cast("double") / F.lit(1000000.0)).alias("energy_d2"),
    ).orderBy("source")

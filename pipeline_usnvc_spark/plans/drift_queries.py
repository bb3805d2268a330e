"""Dataset-drift and statistical-monitoring queries over ``events``.

The monitoring layer a production training-data pipeline runs beside
ingestion: distribution drift between time periods (PSI, two-sample
KS), categorical independence (chi-square), changepoint detection
(CUSUM), and autocorrelation of arrival rates. Every query is
oracle-exact against DuckDB: all statistics are derived from EXACT
integer counts (or decimal-exact quantized sums) with the final
float arithmetic written as the identical expression tree on both
sides, so no cross-engine float-summation-order drift is possible —
the registry's standing parity discipline.

Scale notes (100 TB): every query aggregates to a tiny grain first
(per-type × bin / per-type × day / per-cell) with map-side partial
aggregation, so the post-shuffle state is KBs regardless of input
size; windows partition by event_type (bounded cardinality, each
partition is a handful of rows after aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from pipeline_usnvc_spark.plans.registry import query
from pipeline_usnvc_spark.sources.tables import load_table

# Period split for drift queries: first half vs second half of the
# 30-day synthetic window.
_SPLIT = "2024-01-16"


# ---------------------------------------------------------------------------
# q190 — Population Stability Index per event_type: the standard
# model-monitoring drift score between a reference period (days 1-15)
# and a current period (days 16-30), 10 fixed-width bins over the
# GLOBAL value range, Laplace-smoothed (0.5/bin) so empty bins are
# well-defined. Emitted per-bin (no cross-bin float sum → exact
# parity); consumers sum psi_term for the headline score.
# A (type × bin) spine makes zero-count bins explicit on both sides.
# ---------------------------------------------------------------------------
@query(
    "q190_psi_drift",
    oracle=f"""
    WITH bounds AS (
        SELECT min(value) AS mn, max(value) AS mx FROM events
    ),
    binned AS (
        SELECT event_type,
               CAST(least(floor(((value - mn) / (mx - mn)) * 10.0), 9) AS INT) AS bin,
               ts < TIMESTAMP '{_SPLIT}' AS is_ref
        FROM events, bounds
    ),
    counts AS (
        SELECT event_type, bin,
               count(CASE WHEN is_ref THEN 1 END) AS c_ref,
               count(CASE WHEN NOT is_ref THEN 1 END) AS c_cur
        FROM binned GROUP BY event_type, bin
    ),
    totals AS (
        SELECT event_type, sum(c_ref) AS n_ref, sum(c_cur) AS n_cur
        FROM counts GROUP BY event_type
    ),
    spine AS (
        SELECT DISTINCT event_type, bin
        FROM (SELECT DISTINCT event_type FROM events), range(0, 10) t(bin)
    )
    SELECT s.event_type, CAST(s.bin AS INT) AS bin,
           CAST(coalesce(c.c_ref, 0) AS BIGINT) AS c_ref,
           CAST(coalesce(c.c_cur, 0) AS BIGINT) AS c_cur,
           round(((CAST(coalesce(c.c_cur, 0) AS DOUBLE) + 0.5) / (CAST(t.n_cur AS DOUBLE) + 5.0)
            - (CAST(coalesce(c.c_ref, 0) AS DOUBLE) + 0.5) / (CAST(t.n_ref AS DOUBLE) + 5.0))
           * ln(((CAST(coalesce(c.c_cur, 0) AS DOUBLE) + 0.5) / (CAST(t.n_cur AS DOUBLE) + 5.0))
                / ((CAST(coalesce(c.c_ref, 0) AS DOUBLE) + 0.5) / (CAST(t.n_ref AS DOUBLE) + 5.0))), 6)
           AS psi_term
    FROM spine s
    LEFT JOIN counts c ON c.event_type = s.event_type AND c.bin = s.bin
    JOIN totals t ON t.event_type = s.event_type
    ORDER BY s.event_type, s.bin
    """,
)
def q190_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    binned = ev.crossJoin(F.broadcast(b)).select(
        "event_type",
        F.least(
            F.floor(((F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn"))) * F.lit(10.0)),
            F.lit(9).cast("bigint"),
        )
        .cast("int")
        .alias("bin"),
        (F.col("ts") < F.lit(_SPLIT).cast("timestamp")).alias("is_ref"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.count(F.when(F.col("is_ref"), 1)).alias("c_ref"),
        F.count(F.when(~F.col("is_ref"), 1)).alias("c_cur"),
    )
    totals = counts.groupBy("event_type").agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    # spine types come from the tiny totals aggregate (every type in
    # events has a counts row), NOT a second full events scan
    spine = totals.select("event_type").crossJoin(
        spark.range(0, 10).select(F.col("id").cast("int").alias("bin"))
    )
    j = (
        spine.join(counts, ["event_type", "bin"], "left")
        .join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "bin",
            F.coalesce("c_ref", F.lit(0)).cast("bigint").alias("c_ref"),
            F.coalesce("c_cur", F.lit(0)).cast("bigint").alias("c_cur"),
            "n_ref",
            "n_cur",
        )
    )
    p_ref = (F.col("c_ref").cast("double") + F.lit(0.5)) / (
        F.col("n_ref").cast("double") + F.lit(5.0)
    )
    p_cur = (F.col("c_cur").cast("double") + F.lit(0.5)) / (
        F.col("n_cur").cast("double") + F.lit(5.0)
    )
    return j.select(
        "event_type",
        "bin",
        "c_ref",
        "c_cur",
        # round-6dp before compare: ln() differs in the last ulp
        # between the JVM and libm (the repo-standard mitigation —
        # see text_queries.py:159)
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("psi_term"),
    ).orderBy("event_type", "bin")


# ---------------------------------------------------------------------------
# q191 — two-sample Kolmogorov-Smirnov statistic per event_type
# (early-period vs late-period value distributions). Values are
# grouped first so the ECDF step function is evaluated at distinct
# values from EXACT integer cumulative counts — the window runs over
# the per-(type, value) aggregate (tiny), never raw events, and
# D = max|F1 - F2| is an order-free max of deterministic doubles.
# ---------------------------------------------------------------------------
@query(
    "q191_ks_drift",
    oracle=f"""
    WITH per_value AS (
        SELECT event_type, value,
               count(CASE WHEN ts < TIMESTAMP '{_SPLIT}' THEN 1 END) AS c1,
               count(CASE WHEN ts >= TIMESTAMP '{_SPLIT}' THEN 1 END) AS c2
        FROM events GROUP BY event_type, value
    ),
    stepped AS (
        SELECT event_type,
               sum(c1) OVER (PARTITION BY event_type ORDER BY value
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
               sum(c2) OVER (PARTITION BY event_type ORDER BY value
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2,
               sum(c1) OVER (PARTITION BY event_type) AS n1,
               sum(c2) OVER (PARTITION BY event_type) AS n2
        FROM per_value
    )
    SELECT event_type,
           max(abs(CAST(cum1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                   - CAST(cum2 AS DOUBLE) / CAST(n2 AS DOUBLE))) AS ks_d,
           CAST(max(n1) AS BIGINT) AS n_early,
           CAST(max(n2) AS BIGINT) AS n_late
    FROM stepped GROUP BY event_type
    """,
)
def q191_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(_SPLIT).cast("timestamp")
    per_value = ev.groupBy("event_type", "value").agg(
        F.count(F.when(F.col("ts") < split, 1)).alias("c1"),
        F.count(F.when(F.col("ts") >= split, 1)).alias("c2"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    stepped = per_value.select(
        "event_type",
        F.sum("c1").over(w_cum).alias("cum1"),
        F.sum("c2").over(w_cum).alias("cum2"),
        F.sum("c1").over(w_all).alias("n1"),
        F.sum("c2").over(w_all).alias("n2"),
    )
    return stepped.groupBy("event_type").agg(
        F.max(
            F.abs(
                F.col("cum1").cast("double") / F.col("n1").cast("double")
                - F.col("cum2").cast("double") / F.col("n2").cast("double")
            )
        ).alias("ks_d"),
        F.max("n1").cast("bigint").alias("n_early"),
        F.max("n2").cast("bigint").alias("n_late"),
    )


# ---------------------------------------------------------------------------
# q192 — chi-square independence cells for event_type × hour-of-day:
# observed vs expected (= row_total × col_total / N) per cell with the
# per-cell chi2 contribution, over a full 24-hour spine so structural
# zeros are explicit. Everything derives from exact integer counts;
# the float arithmetic is a single identical expression both sides.
# ---------------------------------------------------------------------------
@query(
    "q192_chi2_type_hour",
    oracle="""
    WITH obs AS (
        SELECT event_type, CAST(hour(ts) AS INT) AS hr, count(*) AS n
        FROM events GROUP BY event_type, hour(ts)
    ),
    row_tot AS (SELECT event_type, sum(n) AS rt FROM obs GROUP BY event_type),
    col_tot AS (SELECT hr, sum(n) AS ct FROM obs GROUP BY hr),
    grand AS (SELECT sum(n) AS g FROM obs),
    spine AS (
        SELECT event_type, CAST(hr AS INT) AS hr
        FROM (SELECT DISTINCT event_type FROM events), range(0, 24) t(hr)
    )
    SELECT s.event_type, s.hr,
           CAST(coalesce(o.n, 0) AS BIGINT) AS observed,
           CAST(r.rt AS DOUBLE) * CAST(c.ct AS DOUBLE) / CAST(g.g AS DOUBLE) AS expected,
           (CAST(coalesce(o.n, 0) AS DOUBLE)
            - CAST(r.rt AS DOUBLE) * CAST(c.ct AS DOUBLE) / CAST(g.g AS DOUBLE))
           * (CAST(coalesce(o.n, 0) AS DOUBLE)
              - CAST(r.rt AS DOUBLE) * CAST(c.ct AS DOUBLE) / CAST(g.g AS DOUBLE))
           / (CAST(r.rt AS DOUBLE) * CAST(c.ct AS DOUBLE) / CAST(g.g AS DOUBLE)) AS chi2_term
    FROM spine s
    LEFT JOIN obs o ON o.event_type = s.event_type AND o.hr = s.hr
    JOIN row_tot r ON r.event_type = s.event_type
    JOIN col_tot c ON c.hr = s.hr
    JOIN grand g ON TRUE
    """,
)
def q192_chi2_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hr")
    ).agg(F.count("*").alias("n"))
    row_tot = obs.groupBy("event_type").agg(F.sum("n").alias("rt"))
    col_tot = obs.groupBy("hr").agg(F.sum("n").alias("ct"))
    grand = obs.agg(F.sum("n").alias("g"))
    # spine from the tiny row-totals aggregate — no second events scan
    spine = row_tot.select("event_type").crossJoin(
        spark.range(0, 24).select(F.col("id").cast("int").alias("hr"))
    )
    j = (
        spine.join(obs, ["event_type", "hr"], "left")
        .join(F.broadcast(row_tot), "event_type")
        .join(F.broadcast(col_tot), "hr")
        .crossJoin(F.broadcast(grand))
    )
    expected = (
        F.col("rt").cast("double") * F.col("ct").cast("double") / F.col("g").cast("double")
    )
    o = F.coalesce("n", F.lit(0)).cast("double")
    return j.select(
        "event_type",
        "hr",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("observed"),
        expected.alias("expected"),
        ((o - expected) * (o - expected) / expected).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# q193 — CUSUM changepoint candidate per event_type over the daily
# value series. Deviations are computed from DAILY SUMS (exact ints
# after 1e-7 quantization), the running term is an exact integer
# cumulative sum, and cusum_d = cumS_d - d·(S_total/n_days) touches
# floats exactly once — no running float accumulation whose
# fold order could differ between engines. Output: the day with the
# largest |cusum| per type (day ascending breaks exact-equal ties).
# ---------------------------------------------------------------------------
@query(
    "q193_cusum_changepoint",
    oracle="""
    WITH daily AS (
        SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
               sum(CAST(floor(value * 10000000) AS DECIMAL(38,0))) AS sq
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    cum AS (
        SELECT event_type, day,
               sum(sq) OVER (PARTITION BY event_type ORDER BY day
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_sq,
               row_number() OVER (PARTITION BY event_type ORDER BY day) AS d,
               sum(sq) OVER (PARTITION BY event_type) AS tot_sq,
               count(*) OVER (PARTITION BY event_type) AS n_days
        FROM daily
    ),
    scored AS (
        SELECT event_type, day,
               abs(CAST(cum_sq AS DOUBLE)
                   - CAST(d AS DOUBLE) * (CAST(tot_sq AS DOUBLE) / CAST(n_days AS DOUBLE)))
               / 10000000.0 AS abs_cusum
        FROM cum
    )
    SELECT event_type, day AS changepoint_day, abs_cusum AS max_abs_cusum
    FROM (
        SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY abs_cusum DESC, day) AS rk
        FROM scored
    ) WHERE rk = 1
    """,
)
def q193_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.sum(F.floor(F.col("value") * 10000000).cast("decimal(38,0)")).alias("sq"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type",
        "day",
        F.sum("sq").over(w_cum).alias("cum_sq"),
        F.row_number().over(Window.partitionBy("event_type").orderBy("day")).alias("d"),
        F.sum("sq").over(w_all).alias("tot_sq"),
        F.count("*").over(w_all).alias("n_days"),
    )
    abs_cusum = (
        F.abs(
            F.col("cum_sq").cast("double")
            - F.col("d").cast("double")
            * (F.col("tot_sq").cast("double") / F.col("n_days").cast("double"))
        )
        / F.lit(10000000.0)
    )
    scored = cum.select("event_type", "day", abs_cusum.alias("abs_cusum"))
    w_rk = Window.partitionBy("event_type").orderBy(F.desc("abs_cusum"), "day")
    return (
        scored.withColumn("rk", F.row_number().over(w_rk))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("day").alias("changepoint_day"),
            F.col("abs_cusum").alias("max_abs_cusum"),
        )
    )


# ---------------------------------------------------------------------------
# q194 — autocorrelation (lags 1-3) of the daily event-count series.
# ACF is expanded algebraically so every Σ is over exact integers
# (counts and count-products summed as decimals): acf(L) =
# (Σ x_t·x_{t+L} − m·Σx_t − m·Σx_{t+L} + (n−L)·m²) / Σ(x−m)², with
# the denominator likewise expanded (Σx² − 2mΣx + nm²). One float
# expression per row, identical both sides.
# ---------------------------------------------------------------------------
@query(
    "q194_acf_daily_counts",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS x
        FROM events GROUP BY CAST(ts AS DATE)
    ),
    idx AS (
        SELECT x, row_number() OVER (ORDER BY day) AS t FROM daily
    ),
    base AS (
        SELECT count(*) AS n,
               CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
               CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS DOUBLE) AS sxx
        FROM idx
    ),
    lagged AS (
        SELECT l.lag,
               count(*) AS n_pairs,
               CAST(sum(CAST(a.x AS DECIMAL(19,0)) * CAST(b.x AS DECIMAL(19,0))) AS DOUBLE) AS sxy,
               CAST(sum(CAST(a.x AS DECIMAL(38,0))) AS DOUBLE) AS sa,
               CAST(sum(CAST(b.x AS DECIMAL(38,0))) AS DOUBLE) AS sb
        FROM range(1, 4) l(lag)
        JOIN idx a ON TRUE
        JOIN idx b ON b.t = a.t + l.lag
        GROUP BY l.lag
    )
    SELECT CAST(l.lag AS INT) AS lag, CAST(l.n_pairs AS BIGINT) AS n_pairs,
           (l.sxy - (base.sx / CAST(base.n AS DOUBLE)) * l.sa
                  - (base.sx / CAST(base.n AS DOUBLE)) * l.sb
                  + CAST(l.n_pairs AS DOUBLE)
                    * (base.sx / CAST(base.n AS DOUBLE)) * (base.sx / CAST(base.n AS DOUBLE)))
           / (base.sxx - 2.0 * (base.sx / CAST(base.n AS DOUBLE)) * base.sx
                       + CAST(base.n AS DOUBLE)
                         * (base.sx / CAST(base.n AS DOUBLE)) * (base.sx / CAST(base.n AS DOUBLE)))
           AS acf
    FROM lagged l, base
    """,
)
def q194_acf_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(F.count("*").alias("x"))
    idx = daily.select(
        "x", F.row_number().over(Window.orderBy("day")).alias("t")
    )
    dx19 = F.col("x").cast("decimal(19,0)")
    base = idx.agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).cast("double").alias("sx"),
        F.sum(dx19 * dx19).cast("double").alias("sxx"),
    )
    lags = spark.range(1, 4).select(F.col("id").cast("int").alias("lag"))
    a = idx.alias("a")
    b = idx.alias("b")
    pairs = lags.crossJoin(a).join(
        b, F.col("b.t") == F.col("a.t") + F.col("lag")
    )
    lagged = pairs.groupBy("lag").agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.col("a.x").cast("decimal(19,0)") * F.col("b.x").cast("decimal(19,0)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("a.x").cast("decimal(38,0)")).cast("double").alias("sa"),
        F.sum(F.col("b.x").cast("decimal(38,0)")).cast("double").alias("sb"),
    )
    j = lagged.crossJoin(F.broadcast(base))
    m = F.col("sx") / F.col("n").cast("double")
    np_d = F.col("n_pairs").cast("double")
    acf = (F.col("sxy") - m * F.col("sa") - m * F.col("sb") + np_d * m * m) / (
        F.col("sxx") - F.lit(2.0) * m * F.col("sx") + F.col("n").cast("double") * m * m
    )
    return j.select(
        "lag", F.col("n_pairs").cast("bigint").alias("n_pairs"), acf.alias("acf")
    )


# ---------------------------------------------------------------------------
# q240 — quantile–quantile drift between the first and second half of
# the event window: decile-by-decile comparison of the value
# distribution (the visual QQ-plot, reduced to its 10-point table) —
# catches shape changes PSI's fixed bins smear out. Scale shape: the
# halves are ranked independently through the two-phase range-exchange
# rank (operators/rank.with_global_rank) and bucketed with the exact
# map-side NTILE formula — no single-partition sort anywhere; the
# decile rollup then compares exact milli-sums. Values quantize to
# milli-ints so every aggregate is exact.
# ---------------------------------------------------------------------------
@query(
    "q240_qq_drift",
    oracle="""
    WITH bounds AS (
        SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM events
    ),
    tagged AS (
        SELECT CASE WHEN epoch_us(e.ts) <= (b.mn + b.mx) // 2 THEN 'early' ELSE 'late' END AS half,
               CAST(floor(e.value * 1000) AS BIGINT) AS v_milli,
               e.event_id
        FROM events e, bounds b
    ),
    bucketed AS (
        SELECT half, v_milli,
               ntile(10) OVER (PARTITION BY half ORDER BY v_milli, event_id) AS decile
        FROM tagged
    ),
    per AS (
        SELECT half, CAST(decile AS INT) AS decile,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v_milli) AS BIGINT) AS sum_milli
        FROM bucketed GROUP BY 1, 2
    )
    SELECT e.decile, e.n AS n_early, l.n AS n_late,
           CAST(e.sum_milli AS DOUBLE) / CAST(e.n AS DOUBLE) / 1000.0 AS mean_early,
           CAST(l.sum_milli AS DOUBLE) / CAST(l.n AS DOUBLE) / 1000.0 AS mean_late,
           round(abs(CAST(e.sum_milli AS DOUBLE) / CAST(e.n AS DOUBLE) / 1000.0
                     - CAST(l.sum_milli AS DOUBLE) / CAST(l.n AS DOUBLE) / 1000.0), 6) AS qq_gap
    FROM (SELECT * FROM per WHERE half = 'early') e
    JOIN (SELECT * FROM per WHERE half = 'late') l ON l.decile = e.decile
    """,
)
def q240_qq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.operators.checkpoint import materialize
    from pipeline_usnvc_spark.operators.rank import ntile_from_rank, with_global_rank

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.unix_micros("ts")).alias("mn"), F.max(F.unix_micros("ts")).alias("mx")
    )
    tagged = ev.crossJoin(F.broadcast(bounds)).select(
        # exact integer midpoint: floor((mn+mx)/2) routes the bigint
        # sum through DOUBLE division (off-by-one once mn+mx passes
        # 2^53 us); `div` matches the oracle's // exactly (ADVICE r05)
        F.when(
            F.unix_micros("ts") <= F.expr("(mn + mx) div 2"),
            "early",
        )
        .otherwise("late")
        .alias("half"),
        F.floor(F.col("value") * 1000).cast("bigint").alias("v_milli"),
        "event_id",
    )

    def decile_rollup(half: str):
        part = materialize(tagged.filter(F.col("half") == half))
        n = part.agg(F.count("*").cast("bigint").alias("_n"))
        return (
            with_global_rank(part, "v_milli", "event_id", rank_col="_r")
            .crossJoin(F.broadcast(n))
            .withColumn("decile", ntile_from_rank(F.col("_r"), F.col("_n"), 10))
            .groupBy("decile")
            .agg(
                F.count("*").cast("bigint").alias("n"),
                F.sum("v_milli").cast("bigint").alias("sum_milli"),
            )
        )

    e = decile_rollup("early").select(
        "decile", F.col("n").alias("n_early"), F.col("sum_milli").alias("sm_e")
    )
    l = decile_rollup("late").select(
        "decile", F.col("n").alias("n_late"), F.col("sum_milli").alias("sm_l")
    )
    mean_e = F.col("sm_e").cast("double") / F.col("n_early").cast("double") / F.lit(1000.0)
    mean_l = F.col("sm_l").cast("double") / F.col("n_late").cast("double") / F.lit(1000.0)
    return e.join(l, "decile").select(
        "decile",
        "n_early",
        "n_late",
        mean_e.alias("mean_early"),
        mean_l.alias("mean_late"),
        F.round(F.abs(mean_e - mean_l), 6).alias("qq_gap"),
    )

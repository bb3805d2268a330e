"""Round-8 query family: evaluation tier 2, survival & time-series
diagnostics, banded drift, and corpus-economics measures.

Extends the round-7 inference/eval families with the second tier a
model-eval or data-curation team reaches for next: threshold metrics
(confusion/MCC, macro-F1, log-loss, Brier decomposition,
Hosmer-Lemeshow, weighted kappa), ranking metrics (MRR, MAP@10),
survival comparison (log-rank), classical residual diagnostics
(Durbin-Watson, runs test, Ljung-Box, PACF), control charting (EWMA
limits), the reference-banded drift spine (VERDICT r07 item 9), and
corpus-growth economics (Chao1, Heaps' law, term burstiness,
Atkinson/Lorenz inequality). Reference scope note: the reference
pipeline (usnvc/usnvc.py) has no statistics at all — this family
belongs to the mandated LLM-pipeline/analytics extension surface.

Oracle-parity discipline (memory: oracle-parity rules), same as
plans/stats_queries.py and plans/inference_queries.py:

- sufficient statistics are EXACT integer/decimal sums; no double is
  ever summed across rows — cross-row float work is micro-scaled to
  integers first (round(x*1e6) BIGINT / DECIMAL(38,0));
- integer-ratio outputs floor to micro units BEFORE the final double
  division (the q318/q364 exact-half trap), with the +C shift for
  negative-capable numerators (Spark pmod is non-negative, DuckDB %
  follows the dividend);
- per-row transcendentals (ln/exp/sqrt) round to micro before any
  cross-row sum, or feed one final expression that is the IDENTICAL
  tree on both engines, rounded to 6dp;
- every argmax/rank is tie-free at every sf (unique id folded into
  the ordering);
- divisions are guarded on positive denominators (Spark 0/0 = NaN vs
  DuckDB NULL).

Scale shape: every query aggregates row-grain data to a bounded
spine FIRST (score-value domain, calibration bins, class lattices,
brand partitions, day calendar, frequency ranks, source spines);
windows and joins only ever run on those spines. No data-grain
global window, no unbounded broadcast, no driver-side loop over
data-grain results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pipeline_usnvc_spark.plans.registry import query
from pipeline_usnvc_spark.sources.tables import load_table

_TOKS_SQL = "list_filter(string_split_regex(lower(text), '[^a-zA-Z0-9]+'), t -> t <> '')"

# The shared deterministic document classifier (q345/q356/q358's
# logistic length score, micro-quantized): P(lang='en') ~
# sigmoid((n_chars - 500)/250), stored as an integer in [0, 1e6].
_SCORE_SQL = (
    "CAST(round(1000000.0 / (1.0 + exp(-(CAST(n_chars AS DOUBLE) - 500.0) / 250.0)))"
    " AS BIGINT)"
)


def _d38(c):
    return c.cast("decimal(38,0)")


def _score_micro():
    return F.round(
        F.lit(1000000.0)
        / (
            F.lit(1.0)
            + F.exp(-(F.col("n_chars").cast("double") - F.lit(500.0)) / F.lit(250.0))
        )
    ).cast("bigint")


def _fdiv_micro(num, den):
    """Exact floor(num*1e6/den)/1e6 for NON-NEGATIVE integer ratios:
    floor to micro before the double division so a value landing on
    an exact rounding half cannot flip between engines (q318/q364)."""
    s = (_d38(num) * F.lit(1000000).cast("decimal(38,0)")).cast("decimal(38,0)")
    d = _d38(den)
    return ((s - F.pmod(s, d)) / d).cast("bigint").cast("double") / F.lit(1000000.0)


_FDIV_SQL = (
    "CAST((CAST({num} AS HUGEINT) * 1000000"
    " - (CAST({num} AS HUGEINT) * 1000000) % CAST({den} AS HUGEINT))"
    " // CAST({den} AS HUGEINT) AS BIGINT) / 1000000.0"
)


def _fd(num: str, den: str) -> str:
    return _FDIV_SQL.format(num=num, den=den)


# ---------------------------------------------------------------------------
# q378 — confusion matrix + MCC at the 0.5 operating point of the
# shared logistic length classifier (q356's AUC collapsed to the
# decision a deployed filter actually makes): TP/FP/TN/FN are exact
# counts; precision/recall/F1 are exact integer ratios floored to
# micro; MCC's numerator tp*tn - fp*fn stays an exact DECIMAL(38,0)
# product and meets the sqrt'd denominator in ONE identical final
# expression. One row-grain aggregate, then scalar arithmetic.
# ---------------------------------------------------------------------------
@query(
    "q378_confusion_mcc",
    oracle=f"""
    WITH scored AS (
        SELECT {_SCORE_SQL} AS v,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents
    ),
    cm AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) FILTER (WHERE y = 1 AND v >= 500000) AS BIGINT) AS tp,
               CAST(count(*) FILTER (WHERE y = 0 AND v >= 500000) AS BIGINT) AS fp,
               CAST(count(*) FILTER (WHERE y = 1 AND v < 500000) AS BIGINT) AS fn,
               CAST(count(*) FILTER (WHERE y = 0 AND v < 500000) AS BIGINT) AS tn
        FROM scored
    )
    SELECT n AS n_docs, tp, fp, tn, fn,
           CASE WHEN tp + fp > 0 THEN {_fd("tp", "(tp + fp)")} END AS precision_pos,
           CASE WHEN tp + fn > 0 THEN {_fd("tp", "(tp + fn)")} END AS recall_pos,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN {_fd("(2 * tp)", "(2 * tp + fp + fn)")} END AS f1_pos,
           CASE WHEN (tp+fp) > 0 AND (tp+fn) > 0 AND (tn+fp) > 0 AND (tn+fn) > 0
                THEN round(CAST(CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn AS DOUBLE)
                           / sqrt(CAST(CAST(tp + fp AS HUGEINT) * (tp + fn)
                                       * (tn + fp) * (tn + fn) AS DOUBLE)), 6)
           END AS mcc
    FROM cm
    """,
)
def q378_confusion_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        _score_micro().alias("v"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    pos = F.col("v") >= 500000
    cm = scored.agg(
        F.count("*").cast("bigint").alias("n"),
        F.count(F.when((F.col("y") == 1) & pos, 1)).cast("bigint").alias("tp"),
        F.count(F.when((F.col("y") == 0) & pos, 1)).cast("bigint").alias("fp"),
        F.count(F.when((F.col("y") == 1) & ~pos, 1)).cast("bigint").alias("fn"),
        F.count(F.when((F.col("y") == 0) & ~pos, 1)).cast("bigint").alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    mcc_num = (_d38(tp) * _d38(tn) - _d38(fp) * _d38(fn)).cast("double")
    mcc_den = F.sqrt(
        (_d38(tp + fp) * _d38(tp + fn) * _d38(tn + fp) * _d38(tn + fn)).cast("double")
    )
    return cm.select(
        F.col("n").alias("n_docs"),
        "tp",
        "fp",
        "tn",
        "fn",
        F.when(tp + fp > 0, _fdiv_micro(tp, tp + fp)).alias("precision_pos"),
        F.when(tp + fn > 0, _fdiv_micro(tp, tp + fn)).alias("recall_pos"),
        F.when(
            F.lit(2) * tp + fp + fn > 0,
            _fdiv_micro(F.lit(2) * tp, F.lit(2) * tp + fp + fn),
        ).alias("f1_pos"),
        F.when(
            (tp + fp > 0) & (tp + fn > 0) & (tn + fp > 0) & (tn + fn > 0),
            F.round(mcc_num / mcc_den, 6),
        ).alias("mcc"),
    )


# ---------------------------------------------------------------------------
# q379 — macro-F1 of the majority-class-per-source baseline: predict
# each document's language as the most common language of its source
# (the baseline every real lang-ID eval is judged against), then
# one-vs-rest F1 per class and the macro average. The majority vote
# is tie-free (count desc, lang asc) on the bounded source x lang
# spine (<= 100 rows); the confusion lattice is 25 cells; per-class
# F1 and the macro mean are exact integer ratios floored to micro.
# ---------------------------------------------------------------------------
@query(
    "q379_macro_f1",
    oracle="""
    WITH sl AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2
    ),
    maj AS (
        SELECT source, lang AS pred FROM (
            SELECT source, lang,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY c DESC, lang ASC) AS rk
            FROM sl
        ) WHERE rk = 1
    ),
    conf AS (
        SELECT d.lang AS truth, m.pred, CAST(count(*) AS BIGINT) AS c
        FROM documents d JOIN maj m ON m.source = d.source
        GROUP BY 1, 2
    ),
    classes AS (SELECT DISTINCT truth AS cls FROM conf),
    per_class AS (
        SELECT k.cls,
               CAST(coalesce(sum(CASE WHEN c.truth = k.cls AND c.pred = k.cls THEN c.c END), 0) AS BIGINT) AS tp,
               CAST(coalesce(sum(CASE WHEN c.truth <> k.cls AND c.pred = k.cls THEN c.c END), 0) AS BIGINT) AS fp,
               CAST(coalesce(sum(CASE WHEN c.truth = k.cls AND c.pred <> k.cls THEN c.c END), 0) AS BIGINT) AS fn
        FROM classes k CROSS JOIN conf c GROUP BY 1
    ),
    f1s AS (
        SELECT cls, tp, fp, fn,
               CAST((CAST(2 * tp AS HUGEINT) * 1000000
                     - (CAST(2 * tp AS HUGEINT) * 1000000) % (2 * tp + fp + fn))
                    // (2 * tp + fp + fn) AS BIGINT) AS f1_micro
        FROM per_class
    )
    SELECT cls AS lang, tp, fp, fn,
           CAST(f1_micro AS DOUBLE) / 1000000.0 AS f1,
           CAST((CAST(sum(f1_micro) OVER () AS BIGINT)
                 - CAST(sum(f1_micro) OVER () AS BIGINT) % (count(*) OVER ()))
                // (count(*) OVER ()) AS BIGINT) / 1000000.0 AS macro_f1
    FROM f1s ORDER BY lang
    """,
)
def q379_macro_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sl = docs.groupBy("source", "lang").agg(F.count("*").cast("bigint").alias("c"))
    w_maj = Window.partitionBy("source").orderBy(F.col("c").desc(), F.col("lang").asc())
    maj = (
        sl.withColumn("rk", F.row_number().over(w_maj))
        .filter(F.col("rk") == 1)
        .select("source", F.col("lang").alias("pred"))
    )
    conf = (
        docs.join(F.broadcast(maj), "source")
        .groupBy(F.col("lang").alias("truth"), "pred")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    classes = conf.select(F.col("truth").alias("cls")).distinct()
    per_class = (
        classes.crossJoin(conf)
        .groupBy("cls")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("truth") == F.col("cls"))
                        & (F.col("pred") == F.col("cls")),
                        F.col("c"),
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tp"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("truth") != F.col("cls"))
                        & (F.col("pred") == F.col("cls")),
                        F.col("c"),
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("fp"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("truth") == F.col("cls"))
                        & (F.col("pred") != F.col("cls")),
                        F.col("c"),
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("fn"),
        )
    )
    den = F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn")
    s = _d38(F.lit(2) * F.col("tp")) * F.lit(1000000).cast("decimal(38,0)")
    f1s = per_class.select(
        "cls",
        "tp",
        "fp",
        "fn",
        ((s - F.pmod(s, _d38(den))) / _d38(den)).cast("bigint").alias("f1_micro"),
    )
    w_all = Window.partitionBy()
    msum = F.sum("f1_micro").over(w_all).cast("bigint")
    k = F.count("*").over(w_all).cast("bigint")
    return (
        f1s.select(
            F.col("cls").alias("lang"),
            "tp",
            "fp",
            "fn",
            (F.col("f1_micro").cast("double") / F.lit(1000000.0)).alias("f1"),
            (
                ((msum - F.pmod(msum, k)) / k).cast("bigint").cast("double")
                / F.lit(1000000.0)
            ).alias("macro_f1"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q380 — per-brand reciprocal rank (MRR's per-query term): rank parts
# by retail price (q355's retrieval ranking, tie-broken by partkey),
# relevance = top revenue quartile (grade 3); report the first
# relevant position and its reciprocal. ntile guarantees grade 3 is
# non-empty for every brand, so first_rel_pos never nulls. Brand-
# partitioned windows only (bounded per brand), exact 1/pos floored
# to micro.
# ---------------------------------------------------------------------------
@query(
    "q380_mrr_eval",
    oracle=f"""
    WITH rev AS (
        SELECT l_partkey AS p_partkey,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM lineitem GROUP BY 1
    ),
    graded AS (
        SELECT p.p_brand, p.p_partkey, p.p_retailprice,
               4 - ntile(4) OVER (PARTITION BY p.p_brand
                                  ORDER BY r.rev_cents DESC, p.p_partkey) AS grade
        FROM part p JOIN rev r ON r.p_partkey = p.p_partkey
    ),
    ranked AS (
        SELECT p_brand, grade,
               CAST(row_number() OVER (PARTITION BY p_brand
                    ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS pos
        FROM graded
    ),
    firsts AS (
        SELECT p_brand,
               CAST(min(CASE WHEN grade = 3 THEN pos END) AS BIGINT) AS first_rel_pos,
               CAST(count(*) AS BIGINT) AS n_parts
        FROM ranked GROUP BY p_brand
    )
    SELECT p_brand, n_parts, first_rel_pos,
           {_fd("1", "first_rel_pos")} AS reciprocal_rank
    FROM firsts ORDER BY p_brand
    """,
)
def q380_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = li.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 100
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("rev_cents")
    )
    w_grade = Window.partitionBy("p_brand").orderBy(
        F.col("rev_cents").desc(), F.col("p_partkey")
    )
    graded = part.join(rev, "p_partkey").select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        (F.lit(4) - F.ntile(4).over(w_grade)).alias("grade"),
    )
    w_pos = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    ranked = graded.select(
        "p_brand",
        "grade",
        F.row_number().over(w_pos).cast("bigint").alias("pos"),
    )
    firsts = ranked.groupBy("p_brand").agg(
        F.min(F.when(F.col("grade") == 3, F.col("pos")))
        .cast("bigint")
        .alias("first_rel_pos"),
        F.count("*").cast("bigint").alias("n_parts"),
    )
    return firsts.select(
        "p_brand",
        "n_parts",
        "first_rel_pos",
        _fdiv_micro(F.lit(1), F.col("first_rel_pos")).alias("reciprocal_rank"),
    ).orderBy("p_brand")


# ---------------------------------------------------------------------------
# q381 — per-brand average precision at 10 (MAP's per-query term)
# over the same ranking/relevance as q380: AP@10 = (sum of P@pos at
# each relevant pos <= 10) / min(10, R). Each P@pos is an exact
# rational (cumulative relevant count / position) floored to micro;
# their sum is an exact integer; the final division floors to micro
# again. Brand-partitioned windows only.
# ---------------------------------------------------------------------------
@query(
    "q381_map_eval",
    oracle=f"""
    WITH rev AS (
        SELECT l_partkey AS p_partkey,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM lineitem GROUP BY 1
    ),
    graded AS (
        SELECT p.p_brand, p.p_partkey, p.p_retailprice,
               4 - ntile(4) OVER (PARTITION BY p.p_brand
                                  ORDER BY r.rev_cents DESC, p.p_partkey) AS grade
        FROM part p JOIN rev r ON r.p_partkey = p.p_partkey
    ),
    ranked AS (
        SELECT p_brand, CASE WHEN grade = 3 THEN 1 ELSE 0 END AS rel,
               CAST(row_number() OVER (PARTITION BY p_brand
                    ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS pos
        FROM graded
    ),
    cum AS (
        SELECT p_brand, rel, pos,
               CAST(sum(rel) OVER (PARTITION BY p_brand ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rel_cum,
               CAST(sum(rel) OVER (PARTITION BY p_brand) AS BIGINT) AS n_rel
        FROM ranked
    ),
    terms AS (
        SELECT p_brand, n_rel,
               CASE WHEN rel = 1 AND pos <= 10
                    THEN CAST((CAST(rel_cum AS HUGEINT) * 1000000
                               - (CAST(rel_cum AS HUGEINT) * 1000000) % pos)
                              // pos AS BIGINT)
                    ELSE 0 END AS p_micro
        FROM cum
    ),
    agg AS (
        SELECT p_brand, CAST(max(n_rel) AS BIGINT) AS n_rel,
               CAST(sum(p_micro) AS BIGINT) AS s,
               CAST(least(10, max(n_rel)) AS BIGINT) AS m
        FROM terms GROUP BY p_brand
    )
    SELECT p_brand, n_rel,
           CAST((s - s % m) // m AS BIGINT) / 1000000.0 AS ap_at_10
    FROM agg ORDER BY p_brand
    """,
)
def q381_map_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = li.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 100
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("rev_cents")
    )
    w_grade = Window.partitionBy("p_brand").orderBy(
        F.col("rev_cents").desc(), F.col("p_partkey")
    )
    graded = part.join(rev, "p_partkey").select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        (F.lit(4) - F.ntile(4).over(w_grade)).alias("grade"),
    )
    w_pos = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    ranked = graded.select(
        "p_brand",
        F.when(F.col("grade") == 3, 1).otherwise(0).alias("rel"),
        F.row_number().over(w_pos).cast("bigint").alias("pos"),
    )
    w_cum = (
        Window.partitionBy("p_brand")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_brand = Window.partitionBy("p_brand")
    cum = ranked.select(
        "p_brand",
        "rel",
        "pos",
        F.sum("rel").over(w_cum).cast("bigint").alias("rel_cum"),
        F.sum("rel").over(w_brand).cast("bigint").alias("n_rel"),
    )
    sp = _d38(F.col("rel_cum")) * F.lit(1000000).cast("decimal(38,0)")
    terms = cum.select(
        "p_brand",
        "n_rel",
        F.when(
            (F.col("rel") == 1) & (F.col("pos") <= 10),
            ((sp - F.pmod(sp, _d38(F.col("pos")))) / _d38(F.col("pos"))).cast(
                "bigint"
            ),
        )
        .otherwise(0)
        .alias("p_micro"),
    )
    agg = terms.groupBy("p_brand").agg(
        F.max("n_rel").cast("bigint").alias("n_rel"),
        F.sum("p_micro").cast("bigint").alias("s"),
        F.least(F.lit(10), F.max("n_rel")).cast("bigint").alias("m"),
    )
    return agg.select(
        "p_brand",
        "n_rel",
        (
            ((F.col("s") - F.pmod(F.col("s"), F.col("m"))) / F.col("m"))
            .cast("bigint")
            .cast("double")
            / F.lit(1000000.0)
        ).alias("ap_at_10"),
    ).orderBy("p_brand")


# ---------------------------------------------------------------------------
# q382 — Brier score decomposition (Murphy): overall Brier plus the
# reliability / resolution / uncertainty split over the q345 decile
# calibration bins — the diagnosis that tells you WHY a calibrated-
# looking score is (or isn't) useful. Exactness: the raw Brier sum
# is an exact integer sum of per-row (p_micro - y*1e6)^2; each
# decomposition term is an exact integer rational per bin, floored
# to micro on the bounded 10-bin spine before the final divisions.
# ---------------------------------------------------------------------------
@query(
    "q382_brier_decomposition",
    oracle=f"""
    WITH scored AS (
        SELECT {_SCORE_SQL} AS v,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents
    ),
    binned AS (
        SELECT least(CAST(v // 100000 AS BIGINT), 9) AS bin, v, y FROM scored
    ),
    per_bin AS (
        SELECT bin, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS x,
               CAST(sum(v) AS BIGINT) AS c,
               CAST(sum(CAST(v - y * 1000000 AS HUGEINT)
                        * CAST(v - y * 1000000 AS HUGEINT)) AS HUGEINT) AS sq
        FROM binned GROUP BY bin
    ),
    tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(x) AS BIGINT) AS xx,
               CAST(sum(sq) AS HUGEINT) AS sq_all
        FROM per_bin
    ),
    terms AS (
        SELECT
            CAST(sum(CAST((CAST(c AS HUGEINT) - CAST(x AS HUGEINT) * 1000000)
                          * (CAST(c AS HUGEINT) - CAST(x AS HUGEINT) * 1000000)
                          // n AS HUGEINT)) AS HUGEINT) AS rel_num,
            CAST(sum((CAST(t.nn AS HUGEINT) * x - CAST(n AS HUGEINT) * t.xx)
                     * (CAST(t.nn AS HUGEINT) * x - CAST(n AS HUGEINT) * t.xx)
                     * 1000000
                     // (CAST(n AS HUGEINT) * t.nn * t.nn)) AS HUGEINT) AS res_num,
            CAST(max(t.nn) AS BIGINT) AS nn, CAST(max(t.xx) AS BIGINT) AS xx,
            CAST(max(t.sq_all) AS HUGEINT) AS sq_all
        FROM per_bin CROSS JOIN tot t
    )
    SELECT nn AS n_docs,
           CAST((sq_all // (CAST(nn AS HUGEINT) * 1000000)) AS BIGINT) / 1000000.0 AS brier,
           CAST((rel_num // (CAST(nn AS HUGEINT) * 1000000)) AS BIGINT) / 1000000.0 AS reliability,
           CAST((res_num // nn) AS BIGINT) / 1000000.0 AS resolution,
           CAST((CAST(xx AS HUGEINT) * (nn - xx) * 1000000
                 // (CAST(nn AS HUGEINT) * nn)) AS BIGINT) / 1000000.0 AS uncertainty
    FROM terms
    """,
)
def q382_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        _score_micro().alias("v"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    binned = scored.select(
        F.least(F.floor(F.col("v") / 100000).cast("bigint"), F.lit(9)).alias("bin"),
        "v",
        "y",
    )
    dev = _d38(F.col("v") - F.col("y") * 1000000)
    per_bin = binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("x"),
        F.sum("v").cast("bigint").alias("c"),
        F.sum(dev * dev).cast("decimal(38,0)").alias("sq"),
    )
    tot = per_bin.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("x").cast("bigint").alias("xx"),
        F.sum("sq").cast("decimal(38,0)").alias("sq_all"),
    )
    rel_cell = _d38(F.col("c")) - _d38(F.col("x")) * F.lit(1000000).cast(
        "decimal(38,0)"
    )
    rel_term = rel_cell * rel_cell
    rel_q = (rel_term - F.pmod(rel_term, _d38(F.col("n")))) / _d38(F.col("n"))
    res_cell = _d38(F.col("nn")) * _d38(F.col("x")) - _d38(F.col("n")) * _d38(
        F.col("xx")
    )
    res_den = _d38(F.col("n")) * _d38(F.col("nn")) * _d38(F.col("nn"))
    res_term = res_cell * res_cell * F.lit(1000000).cast("decimal(38,0)")
    res_q = (res_term - F.pmod(res_term, res_den)) / res_den
    terms = per_bin.crossJoin(F.broadcast(tot)).agg(
        F.sum(rel_q.cast("decimal(38,0)")).cast("decimal(38,0)").alias("rel_num"),
        F.sum(res_q.cast("decimal(38,0)")).cast("decimal(38,0)").alias("res_num"),
        F.max("nn").cast("bigint").alias("nn"),
        F.max("xx").cast("bigint").alias("xx"),
        F.max("sq_all").cast("decimal(38,0)").alias("sq_all"),
    )

    def fq(num, den):
        return (
            ((num - F.pmod(num, den)) / den).cast("bigint").cast("double")
            / F.lit(1000000.0)
        )

    nn38 = _d38(F.col("nn"))
    unc_num = _d38(F.col("xx")) * _d38(F.col("nn") - F.col("xx")) * F.lit(
        1000000
    ).cast("decimal(38,0)")
    return terms.select(
        F.col("nn").alias("n_docs"),
        fq(F.col("sq_all"), nn38 * F.lit(1000000).cast("decimal(38,0)")).alias(
            "brier"
        ),
        fq(F.col("rel_num"), nn38 * F.lit(1000000).cast("decimal(38,0)")).alias(
            "reliability"
        ),
        fq(F.col("res_num"), nn38).alias("resolution"),
        fq(unc_num, nn38 * nn38).alias("uncertainty"),
    )


# ---------------------------------------------------------------------------
# q383 — Hosmer-Lemeshow goodness-of-fit over the same decile bins:
# per-bin chi-square contribution (O - E)^2 / (E (1 - E/n)) with
# E = the exact micro-integer sum of predicted probabilities — the
# calibration TEST to q345's calibration CURVE. Each contribution
# reduces to the exact integer rational (1e6*x - c)^2 * n * 1e6 /
# (c * (n*1e6 - c)), floored to micro on the 10-row bin spine; the
# statistic is their exact sum. The logistic score is strictly
# inside (0, 1e6) on this schema (n_chars 44..577), so the
# denominator is never 0 — still guarded for safety.
# ---------------------------------------------------------------------------
@query(
    "q383_hosmer_lemeshow",
    oracle=f"""
    WITH scored AS (
        SELECT {_SCORE_SQL} AS v,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents
    ),
    binned AS (
        SELECT least(CAST(v // 100000 AS BIGINT), 9) AS bin, v, y FROM scored
    ),
    per_bin AS (
        SELECT bin, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS x,
               CAST(sum(v) AS BIGINT) AS c
        FROM binned GROUP BY bin
    ),
    terms AS (
        SELECT bin, n, x, c,
               CASE WHEN c > 0 AND c < n * 1000000
                    THEN CAST(((CAST(x AS HUGEINT) * 1000000 - c)
                               * (CAST(x AS HUGEINT) * 1000000 - c)
                               * n * 1000000)
                              // (CAST(c AS HUGEINT) * (CAST(n AS HUGEINT) * 1000000 - c))
                              AS BIGINT)
                    END AS hl_micro
        FROM per_bin
    )
    SELECT bin, n AS n_docs, x AS observed,
           round(CAST(c AS DOUBLE) / 1000000.0, 6) AS expected,
           CAST(hl_micro AS DOUBLE) / 1000000.0 AS hl_term,
           CAST(sum(hl_micro) OVER () AS BIGINT) / 1000000.0 AS hl_stat,
           CAST(count(*) OVER () - 2 AS BIGINT) AS df
    FROM terms ORDER BY bin
    """,
)
def q383_hosmer_lemeshow(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        _score_micro().alias("v"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    binned = scored.select(
        F.least(F.floor(F.col("v") / 100000).cast("bigint"), F.lit(9)).alias("bin"),
        "v",
        "y",
    )
    per_bin = binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("x"),
        F.sum("v").cast("bigint").alias("c"),
    )
    m = F.lit(1000000).cast("decimal(38,0)")
    diff = _d38(F.col("x")) * m - _d38(F.col("c"))
    num = diff * diff * _d38(F.col("n")) * m
    den = _d38(F.col("c")) * (_d38(F.col("n")) * m - _d38(F.col("c")))
    terms = per_bin.select(
        "bin",
        "n",
        "x",
        "c",
        F.when(
            (F.col("c") > 0) & (_d38(F.col("c")) < _d38(F.col("n")) * m),
            ((num - F.pmod(num, den)) / den).cast("bigint"),
        ).alias("hl_micro"),
    )
    w_all = Window.partitionBy()
    return (
        terms.select(
            "bin",
            F.col("n").alias("n_docs"),
            F.col("x").alias("observed"),
            F.round(F.col("c").cast("double") / F.lit(1000000.0), 6).alias(
                "expected"
            ),
            (F.col("hl_micro").cast("double") / F.lit(1000000.0)).alias("hl_term"),
            (
                F.sum("hl_micro").over(w_all).cast("bigint").cast("double")
                / F.lit(1000000.0)
            ).alias("hl_stat"),
            (F.count("*").over(w_all) - 2).cast("bigint").alias("df"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# q384 — mean log-loss (cross-entropy) of the logistic length score,
# with the base-rate entropy as the skill reference: the metric that
# punishes confident wrong scores the way Brier can't. Per-row losses
# -ln p are micro-rounded integers (the q217/q352 transcendental
# discipline) summed exactly; the mean floors to micro. Scores are
# clamped to [1, 999999] micro so ln never sees 0 (defensive — the
# schema keeps them strictly inside already).
# ---------------------------------------------------------------------------
@query(
    "q384_log_loss",
    oracle=f"""
    WITH scored AS (
        SELECT least(greatest({_SCORE_SQL}, 1), 999999) AS v,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents
    ),
    losses AS (
        SELECT y,
               CAST(round(-1000000.0 * ln(
                   CASE WHEN y = 1 THEN CAST(v AS DOUBLE) / 1000000.0
                        ELSE CAST(1000000 - v AS DOUBLE) / 1000000.0 END))
                   AS BIGINT) AS loss_micro
        FROM scored
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS x,
               CAST(sum(loss_micro) AS BIGINT) AS s
        FROM losses
    )
    SELECT n AS n_docs,
           CAST((s - s % n) // n AS BIGINT) / 1000000.0 AS mean_log_loss,
           round(-(CAST(x AS DOUBLE) / n) * ln(CAST(x AS DOUBLE) / n)
                 - (1.0 - CAST(x AS DOUBLE) / n) * ln(1.0 - CAST(x AS DOUBLE) / n),
                 6) AS base_rate_entropy
    FROM agg
    """,
)
def q384_log_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        F.least(F.greatest(_score_micro(), F.lit(1)), F.lit(999999)).alias("v"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    p = F.when(
        F.col("y") == 1, F.col("v").cast("double") / F.lit(1000000.0)
    ).otherwise((F.lit(1000000) - F.col("v")).cast("double") / F.lit(1000000.0))
    losses = scored.select(
        "y",
        F.round(F.lit(-1000000.0) * F.log(p)).cast("bigint").alias("loss_micro"),
    )
    agg = losses.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("x"),
        F.sum("loss_micro").cast("bigint").alias("s"),
    )
    rate = F.col("x").cast("double") / F.col("n")
    return agg.select(
        F.col("n").alias("n_docs"),
        (
            ((F.col("s") - F.pmod(F.col("s"), F.col("n"))) / F.col("n"))
            .cast("bigint")
            .cast("double")
            / F.lit(1000000.0)
        ).alias("mean_log_loss"),
        F.round(
            -rate * F.log(rate) - (F.lit(1.0) - rate) * F.log(F.lit(1.0) - rate), 6
        ).alias("base_rate_entropy"),
    )


# ---------------------------------------------------------------------------
# q385 — linear-weighted Cohen's kappa between two fixed-threshold
# ordinal raters (length bands 250/350/450 chars vs word-count bands
# 32/55/76): the agreement metric for ordinal label audits where q357
# (unweighted) overcounts near-miss disagreement. FIXED literal
# thresholds deliberately — a global ntile would be a data-grain
# single-partition window (the q217 anti-pattern); fixed bands keep
# the rating fully distributed. The 4x4 agreement lattice is exact
# counts; kappa_w = 1 - n*sum(w*O)/sum(w*Oi.*O.j) is one exact
# integer rational, shift-floored to micro (negative-capable).
# ---------------------------------------------------------------------------
@query(
    "q385_weighted_kappa",
    oracle=f"""
    WITH rated AS (
        SELECT CASE WHEN n_chars < 250 THEN 0 WHEN n_chars < 350 THEN 1
                    WHEN n_chars < 450 THEN 2 ELSE 3 END AS ra,
               CASE WHEN len({_TOKS_SQL}) < 32 THEN 0
                    WHEN len({_TOKS_SQL}) < 55 THEN 1
                    WHEN len({_TOKS_SQL}) < 76 THEN 2 ELSE 3 END AS rb
        FROM documents
    ),
    cells AS (
        SELECT ra, rb, CAST(count(*) AS BIGINT) AS o FROM rated GROUP BY 1, 2
    ),
    margins_a AS (SELECT ra, CAST(sum(o) AS BIGINT) AS na FROM cells GROUP BY ra),
    margins_b AS (SELECT rb, CAST(sum(o) AS BIGINT) AS nb FROM cells GROUP BY rb),
    lattice AS (
        SELECT a.ra, b.rb, abs(a.ra - b.rb) AS w, a.na, b.nb,
               coalesce(c.o, 0) AS o
        FROM margins_a a CROSS JOIN margins_b b
        LEFT JOIN cells c ON c.ra = a.ra AND c.rb = b.rb
    ),
    sums AS (
        SELECT CAST(sum(CAST(w AS HUGEINT) * o) AS HUGEINT) AS wo,
               CAST(sum(CAST(w AS HUGEINT) * na * nb) AS HUGEINT) AS we,
               (SELECT CAST(sum(o) AS BIGINT) FROM cells) AS n
        FROM lattice
    )
    SELECT n AS n_docs,
           CAST(wo AS BIGINT) AS weighted_disagreement,
           CAST(((we - CAST(n AS HUGEINT) * wo) * 1000000
                 + 1000000 * we
                 - ((we - CAST(n AS HUGEINT) * wo) * 1000000 + 1000000 * we) % we)
                // we AS BIGINT) / 1000000.0 - 1.0 AS kappa_w
    FROM sums
    """,
)
def q385_weighted_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    nw = F.size(tokens("text"))
    rated = docs.select(
        F.when(F.col("n_chars") < 250, 0)
        .when(F.col("n_chars") < 350, 1)
        .when(F.col("n_chars") < 450, 2)
        .otherwise(3)
        .alias("ra"),
        F.when(nw < 32, 0).when(nw < 55, 1).when(nw < 76, 2).otherwise(3).alias("rb"),
    )
    cells = rated.groupBy("ra", "rb").agg(F.count("*").cast("bigint").alias("o"))
    margins_a = cells.groupBy("ra").agg(F.sum("o").cast("bigint").alias("na"))
    margins_b = cells.groupBy("rb").agg(F.sum("o").cast("bigint").alias("nb"))
    lattice = (
        margins_a.crossJoin(F.broadcast(margins_b))
        .join(F.broadcast(cells), ["ra", "rb"], "left")
        .select(
            "ra",
            "rb",
            F.abs(F.col("ra") - F.col("rb")).cast("bigint").alias("w"),
            "na",
            "nb",
            F.coalesce("o", F.lit(0).cast("bigint")).alias("o"),
        )
    )
    n_tot = cells.agg(F.sum("o").cast("bigint").alias("n"))
    sums = lattice.crossJoin(F.broadcast(n_tot)).agg(
        F.sum(_d38(F.col("w")) * _d38(F.col("o"))).cast("decimal(38,0)").alias("wo"),
        F.sum(_d38(F.col("w")) * _d38(F.col("na")) * _d38(F.col("nb")))
        .cast("decimal(38,0)")
        .alias("we"),
        F.max("n").cast("bigint").alias("n"),
    )
    # kappa_w = 1 - n*wo/we == (we - n*wo)/we; the numerator can be
    # negative (worse-than-chance agreement), so shift by +we before
    # the floor-mod and subtract 1.0 after — Spark pmod is always
    # non-negative while DuckDB % follows the dividend sign, and the
    # shift makes both see a non-negative dividend.
    num = (F.col("we") - _d38(F.col("n")) * F.col("wo")).cast("decimal(38,0)")
    m = F.lit(1000000).cast("decimal(38,0)")
    shifted = num * m + m * F.col("we")
    return sums.select(
        F.col("n").alias("n_docs"),
        F.col("wo").cast("bigint").alias("weighted_disagreement"),
        (
            ((shifted - F.pmod(shifted, F.col("we"))) / F.col("we"))
            .cast("bigint")
            .cast("double")
            / F.lit(1000000.0)
            - F.lit(1.0)
        ).alias("kappa_w"),
    )

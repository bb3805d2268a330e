"""Window-function surface beyond top-k: sliding frames, first/last,
lag/lead deltas — plus term-statistics (the exact-arithmetic core of
tf-idf) and a materialized hierarchy path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pipeline_usnvc_spark.plans.registry import query
from pipeline_usnvc_spark.plans.hierarchy_queries import _EDGES_SQL, _edges
from pipeline_usnvc_spark.operators.hierarchy import ancestors as ancestor_closure
from pipeline_usnvc_spark.sources.tables import load_table

from pipeline_usnvc_spark.functions.text import TOKENIZE_SQL as _TOKS_SQL


# ---------------------------------------------------------------------------
# q43 — sliding-frame aggregates: 3-row moving sum + cumulative count
# per supplier over ship date. Decimal-exact sums → doubles.
# ---------------------------------------------------------------------------
@query(
    "q43_sliding_window",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_qty,
           CAST(count(*) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_n
    FROM lineitem WHERE l_suppkey <= 3
    """,
)
def q43_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 3)
    order = [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")]
    w3 = W.partitionBy("l_suppkey").orderBy(*order).rowsBetween(-2, 0)
    wcum = W.partitionBy("l_suppkey").orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(w3).cast("double").alias("moving_qty"),
        F.count("*").over(wcum).cast("bigint").alias("running_n"),
    )


# ---------------------------------------------------------------------------
# q44 — first/last value + lag delta per customer order history.
# ---------------------------------------------------------------------------
@query(
    "q44_first_last_lag",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_order,
           lag(o_orderkey) OVER w AS prev_order,
           CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS INT) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q44_first_last_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev_date = F.lag("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.datediff(F.col("o_orderdate").cast("date"), prev_date.cast("date"))
        .cast("int")
        .alias("days_since_prev"),
    )


# ---------------------------------------------------------------------------
# q34 — term statistics (exact-integer tf-idf core): document
# frequency + collection frequency for terms appearing in >= 100 docs.
# ---------------------------------------------------------------------------
@query(
    "q34_term_stats",
    oracle=f"""
    SELECT tok AS term,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq,
           count(*) AS coll_freq
    FROM (SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents)
    GROUP BY tok HAVING count(DISTINCT doc_id) >= 100
    """,
)
def q34_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    return (
        tok.groupBy("term")
        .agg(
            F.countDistinct("doc_id").alias("doc_freq"),
            F.count("*").alias("coll_freq"),
        )
        .filter(F.col("doc_freq") >= 100)
    )


# ---------------------------------------------------------------------------
# q24 — materialized hierarchy path: root→node id path string from the
# same closure the doc pipeline uses (root-first = depth descending).
# ---------------------------------------------------------------------------
@query(
    "q24_hierarchy_path",
    oracle=f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    anc AS (
        SELECT id, parent_id AS ancestor_id, 1 AS depth FROM edges WHERE parent_id IS NOT NULL
        UNION ALL
        SELECT a.id, e.parent_id AS ancestor_id, a.depth + 1
        FROM anc a JOIN edges e ON a.ancestor_id = e.id
        WHERE e.parent_id IS NOT NULL
    )
    SELECT id,
           string_agg(CAST(ancestor_id AS VARCHAR), '/' ORDER BY depth DESC) || '/' || CAST(id AS VARCHAR) AS path
    FROM anc GROUP BY id
    """,
)
def q24_hierarchy_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    clos = ancestor_closure(_edges(spark, sf_dir), "id", "parent_id")
    return (
        clos.groupBy("id")
        .agg(
            F.concat(
                F.concat_ws(
                    "/",
                    F.transform(
                        F.reverse(F.sort_array(F.collect_list(F.struct("depth", "ancestor_id")))),
                        lambda s: s["ancestor_id"].cast("string"),
                    ),
                ),
                F.lit("/"),
                F.col("id").cast("string"),
            ).alias("path")
        )
    )


# ---------------------------------------------------------------------------
# q226 — rolling exact median (trailing 7 events per user): Spark has
# no median window function, so the trailing window materializes as a
# sorted array (collect_list OVER ROWS 6 PRECEDING) and the median is
# the exact middle element (odd count) or the mean of the two middle
# elements (even count) — the IDENTICAL list construction runs in
# DuckDB (list(...) OVER), so the result is hash-exact. Values are
# decimal-quantized cents (exact ints); the even-count mean is the
# same double division on both engines.
#
# Scale note: the trailing-k array is O(k) per row (k=7 here) — this
# is the bounded-frame pattern, NOT an unbounded collect; for large k
# switch to the two-heap/percentile_approx streaming form.
# ---------------------------------------------------------------------------
@query(
    "q226_rolling_median",
    oracle="""
    WITH t AS (
        SELECT user_id, event_id,
               CAST(floor(value * 100) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY user_id ORDER BY floor(epoch(ts)), event_id) AS seq
        FROM events WHERE user_id <= 50
    ),
    w AS (
        SELECT user_id, event_id, seq,
               list_sort(list(cents) OVER (PARTITION BY user_id ORDER BY seq
                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win
        FROM t
    )
    SELECT user_id, event_id, CAST(seq AS INT) AS seq,
           CAST(len(win) AS INT) AS n_win,
           CASE WHEN len(win) % 2 = 1
                THEN CAST(win[(len(win) + 1) // 2] AS DOUBLE)
                ELSE (CAST(win[len(win) // 2] AS DOUBLE)
                      + CAST(win[len(win) // 2 + 1] AS DOUBLE)) / 2.0
           END AS rolling_median_cents
    FROM w
    """,
)
def q226_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 50)
    t = ev.select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        F.floor(F.col("ts").cast("double")).cast("bigint").alias("ep"),
    ).withColumn(
        "seq",
        F.row_number().over(
            W.partitionBy("user_id").orderBy("ep", "event_id")
        ),
    )
    w7 = W.partitionBy("user_id").orderBy("seq").rowsBetween(-6, 0)
    win = F.sort_array(F.collect_list("cents").over(w7))
    t = t.withColumn("win", win)
    n = F.size("win")
    mid_odd = F.element_at("win", ((n + 1) / 2).cast("int"))
    lo = F.element_at("win", (n / 2).cast("int"))
    hi = F.element_at("win", (n / 2).cast("int") + 1)
    return t.select(
        "user_id",
        "event_id",
        F.col("seq").cast("int").alias("seq"),
        n.cast("int").alias("n_win"),
        F.when(n % 2 == 1, mid_odd.cast("double"))
        .otherwise((lo.cast("double") + hi.cast("double")) / F.lit(2.0))
        .alias("rolling_median_cents"),
    )


# ---------------------------------------------------------------------------
# q336 — trailing-interval RANGE window: per user, the running count
# and exact value sum of their events inside a 7-DAY RANGE frame
# (value-based bounds, not row counts — the frame every "activity in
# the last week as-of each event" feature needs). Spark expresses the
# interval bound as rangeBetween over exact epoch microseconds;
# DuckDB uses RANGE BETWEEN INTERVAL — same frame semantics, exact
# integer micro ordering on both. User-keyed window (the established
# q112/q241 exchange); sums are exact DECIMAL cents.
# ---------------------------------------------------------------------------
@query(
    "q336_range_interval_window",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_7d,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_7d
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY epoch_us(ts)
        RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW
    )
    ORDER BY event_id
    """,
)
def q336_range_interval_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-604_800_000_000, 0)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.count("*").over(w).cast("bigint").alias("n_7d"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint"))
            .over(w)
            .cast("bigint")
            .alias("cents_7d"),
        )
        .orderBy("event_id")
    )

"""Change-data-capture / funnel patterns: MERGE-less SCD2 versioning
(anti-join + union + window — the guide's canonical emulation when no
Delta/Iceberg table format is on the classpath) and ordered-sequence
funnel analysis over sessionized events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pipeline_usnvc_spark.plans.registry import query
from pipeline_usnvc_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# q90 — SCD2 history: a deterministic update set (every 10th order
# flips status and gains 100) versioned against the base — version 1
# rows closed by the update, version 2 rows current. No MERGE INTO
# needed: union of (closed old rows) + (updated rows) + (untouched).
# ---------------------------------------------------------------------------
@query(
    "q90_scd2_history",
    oracle="""
    WITH updates AS (
        SELECT o_orderkey, 'X' AS new_status,
               CAST(CAST(o_totalprice + 100 AS DECIMAL(18,2)) AS DOUBLE) AS new_price
        FROM orders WHERE o_orderkey % 10 = 0
    )
    SELECT o.o_orderkey, 1 AS version, o.o_orderstatus AS status,
           CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
           CASE WHEN u.o_orderkey IS NULL THEN true ELSE false END AS is_current
    FROM orders o LEFT JOIN updates u ON o.o_orderkey = u.o_orderkey
    UNION ALL
    SELECT o_orderkey, 2 AS version, new_status AS status, new_price AS price, true AS is_current
    FROM updates
    """,
)
def q90_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    updates = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.lit("X").alias("new_status"),
        (F.col("o_totalprice") + 100).cast("decimal(18,2)").cast("double").alias("new_price"),
    )
    v1 = orders.join(updates.select("o_orderkey", F.lit(True).alias("_upd")), "o_orderkey", "left").select(
        "o_orderkey",
        F.lit(1).alias("version"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("price"),
        F.coalesce(~F.col("_upd"), F.lit(True)).alias("is_current"),
    )
    v2 = updates.select(
        "o_orderkey",
        F.lit(2).alias("version"),
        F.col("new_status").alias("status"),
        F.col("new_price").alias("price"),
        F.lit(True).alias("is_current"),
    )
    return v1.unionByName(v2)


# ---------------------------------------------------------------------------
# q91 — funnel analysis: the ordered event-type path of each session
# (sessionization as in q40) and how many sessions reach a purchase
# after a click.
# ---------------------------------------------------------------------------
@query(
    "q91_session_funnel",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts, event_id, event_type,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        FROM flagged
    ),
    paths AS (
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM sessions GROUP BY user_id, session_idx
    )
    SELECT user_id, session_idx, path,
           CASE WHEN path LIKE '%click%purchase%' THEN true ELSE false END AS converted
    FROM paths
    """,
)
def q91_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.plans.events_queries import with_session_idx

    ev = load_table(spark, sf_dir, "events")
    sess = with_session_idx(ev).withColumn(
        "session_idx", F.col("session_idx").cast("bigint")
    )
    paths = (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.struct("ts", "event_id").alias("_o"), F.col("event_type").alias("_t")))
                    ),
                    lambda s: s["_t"],
                ),
            ).alias("path")
        )
    )
    return paths.select(
        "user_id",
        "session_idx",
        "path",
        F.col("path").rlike("click.*purchase").alias("converted"),
    )


# ---------------------------------------------------------------------------
# q92 — table reconciliation (operators/diff.table_diff): diff the
# orders snapshot against a deterministically perturbed rerun —
# %97 keys dropped (removed), %10 keys repriced (changed), %53 keys
# re-keyed high (added). Unchanged rows are omitted, so the diff
# output stays tiny next to the inputs at 100 TB.
# ---------------------------------------------------------------------------
@query(
    "q92_table_diff",
    oracle="""
    WITH new_snap AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 10 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100.0 ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderkey + 100000000 AS o_orderkey, 'N' AS o_orderstatus, 1.0 AS o_totalprice
        FROM orders WHERE o_orderkey % 53 = 0
    )
    SELECT o_orderkey, change FROM (
        SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    WHEN NOT (o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
                              AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice)
                    THEN 'changed' END AS change
        FROM orders o FULL OUTER JOIN new_snap n ON o.o_orderkey = n.o_orderkey
    ) WHERE change IS NOT NULL
    """,
)
def q92_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.operators.diff import table_diff

    orders = load_table(spark, sf_dir, "orders")
    mutated = orders.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 10 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.when(F.col("o_orderkey") % 10 == 0, F.col("o_totalprice") + 100.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    appended = orders.filter(F.col("o_orderkey") % 53 == 0).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        F.lit(1.0).alias("o_totalprice"),
    )
    new_snap = mutated.unionByName(appended)
    return table_diff(
        orders, new_snap, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    )


# ---------------------------------------------------------------------------
# q93 — MERGE INTO emulation (operators/merge.merge_upsert): a
# deterministic source (every 7th order repriced, plus new high keys)
# upserted into orders; matched keys take the source row, new keys
# insert, the rest carry over. The oracle composes the same anti-join
# + union in SQL.
# ---------------------------------------------------------------------------
@query(
    "q93_merge_upsert",
    oracle="""
    WITH src AS (
        SELECT o_orderkey, 'U' AS o_orderstatus,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 50 AS DOUBLE) AS o_totalprice
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey + 900000000, 'I' AS o_orderstatus, 1.5 AS o_totalprice
        FROM orders WHERE o_orderkey % 101 = 0
    )
    SELECT o_orderkey, o_orderstatus,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
    FROM orders t WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.o_orderkey = t.o_orderkey)
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM src
    """,
)
def q93_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.operators.merge import merge_upsert

    orders = load_table(spark, sf_dir, "orders")
    target = orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("o_totalprice"),
    )
    src = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice").cast("decimal(18,2)") + 50).cast("double").alias("o_totalprice"),
    ).unionByName(
        orders.filter(F.col("o_orderkey") % 101 == 0).select(
            (F.col("o_orderkey") + 900000000).alias("o_orderkey"),
            F.lit("I").alias("o_orderstatus"),
            F.lit(1.5).alias("o_totalprice"),
        )
    )
    return merge_upsert(target, src, ["o_orderkey"])


# ---------------------------------------------------------------------------
# q109 — point-in-time (PIT) join against an SCD2 dimension: each
# event picks the dimension version valid AT its timestamp. The dim
# is derived deterministically (every user upgrades basic -> pro 7
# days after their first event), so the oracle can state the truth as
# a closed-form CASE — while the Spark side runs the REAL machinery:
# a single-shuffle union + last(ignorenulls) window as-of, the same
# pattern q42 uses, with version rows sorting before events at equal
# timestamps so a version effective exactly at the event time wins.
# Completely different formulations agreeing is the strongest kind of
# check.
# ---------------------------------------------------------------------------
@query(
    "q109_scd2_point_in_time",
    oracle="""
    WITH t0 AS (SELECT user_id, min(ts) AS t0 FROM events GROUP BY user_id)
    SELECT e.event_type,
           CASE WHEN e.ts < t0.t0 + INTERVAL 7 DAY THEN 'basic' ELSE 'pro' END AS tier,
           count(*) AS n_events,
           CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e JOIN t0 USING (user_id)
    GROUP BY 1, 2
    """,
)
def q109_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:

    ev = load_table(spark, sf_dir, "events")
    t0 = ev.groupBy("user_id").agg(F.min("ts").alias("_t0"))
    dim = t0.select(
        "user_id",
        F.lit("1970-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.lit(0).alias("_is_event"),
        F.lit("basic").alias("_tier"),
    ).unionByName(
        t0.select(
            "user_id",
            (F.col("_t0") + F.expr("INTERVAL 7 DAYS")).alias("ts"),
            F.lit(0).alias("_is_event"),
            F.lit("pro").alias("_tier"),
        )
    )
    tagged = ev.select(
        "user_id", "ts", F.lit(1).alias("_is_event"), F.lit(None).cast("string").alias("_tier"),
        "event_type", "value",
    ).unionByName(
        dim.select(
            "user_id", "ts", "_is_event", "_tier",
            F.lit(None).cast("string").alias("event_type"),
            F.lit(None).cast("double").alias("value"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "_is_event")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    pit = tagged.withColumn("tier", F.last("_tier", ignorenulls=True).over(w)).filter(
        F.col("_is_event") == 1
    )
    return pit.groupBy("event_type", "tier").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )

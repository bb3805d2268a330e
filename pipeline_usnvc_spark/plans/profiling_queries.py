"""Data-quality and profiling operators — the audit layer a
large-scale ingest pipeline runs before anything else touches the
data: referential-integrity checks across the star schema's FK edges,
distribution histograms, and a one-pass column profile (null counts /
cardinalities / extrema).

All three are single-scan-per-table shapes: the FK audit is one left
join + aggregate per edge (dimension sides broadcast), the histogram
is one groupBy over a derived bucket key, the profile is ONE
aggregate pass producing every per-column metric at once and a
``stack`` to long form (no per-column re-scan — at 100 TB a profile
that scans once per column is 5x the IO of one that scans once).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pipeline_usnvc_spark.plans.registry import query
from pipeline_usnvc_spark.sources.tables import DIM_TABLES, load_table


# ---------------------------------------------------------------------------
# q87 — referential-integrity audit: orphan-FK detection on four
# edges of the star schema. Each edge is fact ⟕ distinct(dim-keys)
# (dims broadcast; fact-to-fact edges shuffle and AQE sizes them) with
# the orphan count and distinct orphan-key count folded into one
# aggregate — the anti-join formulation would need a second pass for
# the total row count.
# ---------------------------------------------------------------------------
_FK_EDGES = [
    ("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part.p_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("orders.o_custkey->customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
]


def _fk_edge_sql(edge: str, fact: str, fk: str, dim: str, dk: str) -> str:
    return f"""
    SELECT '{edge}' AS edge, count(*) AS n_rows,
           CAST(sum(CASE WHEN d.{dk} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
           CAST(count(DISTINCT CASE WHEN d.{dk} IS NULL THEN f.{fk} END) AS BIGINT) AS n_orphan_keys
    FROM {fact} f LEFT JOIN (SELECT DISTINCT {dk} FROM {dim}) d ON f.{fk} = d.{dk}
    """


@query(
    "q87_fk_orphan_audit",
    oracle=" UNION ALL ".join(_fk_edge_sql(*e) for e in _FK_EDGES),
)
def q87_fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def edge_stats(edge: str, fact: str, fk: str, dim: str, dk: str) -> DataFrame:
        f = load_table(spark, sf_dir, fact).select(F.col(fk).alias("_k"))
        keys = load_table(spark, sf_dir, dim).select(F.col(dk).alias("_k")).distinct()
        if dim in DIM_TABLES:
            keys = F.broadcast(keys)
        hit = keys.withColumn("_hit", F.lit(1))
        return (
            f.join(hit, "_k", "left")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_orphans"),
                F.countDistinct(F.when(F.col("_hit").isNull(), F.col("_k")))
                .cast("bigint")
                .alias("n_orphan_keys"),
            )
            .select(F.lit(edge).alias("edge"), "n_rows", "n_orphans", "n_orphan_keys")
        )

    return reduce(DataFrame.unionByName, (edge_stats(*e) for e in _FK_EDGES))


# ---------------------------------------------------------------------------
# q88 — fixed-width histogram of l_extendedprice (width 5000, last
# bucket open-ended at 100k): one groupBy on the derived bucket, then
# a global window for the share-of-total. bucket*5000.0 and the
# count/total division are IEEE-exact in both engines; floor(x/w) on
# identical doubles is engine-portable.
# ---------------------------------------------------------------------------
@query(
    "q88_price_histogram",
    oracle="""
    WITH h AS (
        SELECT CAST(least(floor(l_extendedprice / 5000.0), 20) AS INT) AS bucket,
               count(*) AS n
        FROM lineitem GROUP BY 1
    )
    SELECT bucket, bucket * 5000.0 AS bucket_lo, n,
           CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) AS pct
    FROM h
    """,
)
def q88_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bucket = F.least(F.floor(F.col("l_extendedprice") / F.lit(5000.0)), F.lit(20)).cast("int")
    hist = li.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("n"))
    total = F.sum("n").over(Window.partitionBy())
    return hist.select(
        "bucket",
        (F.col("bucket") * F.lit(5000.0)).alias("bucket_lo"),
        "n",
        (F.col("n").cast("double") / total.cast("double")).alias("pct"),
    )


# ---------------------------------------------------------------------------
# q95 — one-pass column profile of ``orders``: every metric for every
# profiled column computed in a SINGLE aggregate (Catalyst plans the
# multi-countDistinct via one Expand — still one scan), then stacked
# to (column, n_rows, n_null, n_distinct, min_s, max_s) long form.
# Extrema are surfaced as strings — numerics through DECIMAL(18,2) so
# both engines render identically.
# ---------------------------------------------------------------------------
_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice"]


def _profile_col_sql(c: str) -> str:
    val = f"CAST({c} AS DECIMAL(18,2))" if c == "o_totalprice" else c
    return f"""
    SELECT '{c}' AS col_name, count(*) AS n_rows,
           count(*) - count({c}) AS n_null,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(min({val}) AS VARCHAR) AS min_s,
           CAST(max({val}) AS VARCHAR) AS max_s
    FROM orders
    """


@query(
    "q95_column_profile",
    oracle=" UNION ALL ".join(_profile_col_sql(c) for c in _PROFILE_COLS),
)
def q95_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")

    def val(c: str) -> F.Column:
        return F.col(c).cast("decimal(18,2)") if c == "o_totalprice" else F.col(c)

    aggs = [F.count("*").alias("nr")]
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"cnt_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(val(c)).cast("string").alias(f"mn_{c}"),
            F.max(val(c)).cast("string").alias(f"mx_{c}"),
        ]
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nr, nr - cnt_{c}, nd_{c}, mn_{c}, mx_{c}" for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args})"
            " as (col_name, n_rows, n_null, n_distinct, min_s, max_s)"
        )
    )


# ---------------------------------------------------------------------------
# q119 — robust outlier profiling per source: median + MAD (median
# absolute deviation), then a 3-MAD outlier count. Exact percentiles
# shuffle once per aggregation here; the per-source medians are tiny
# and broadcast back. At 100 TB swap the exact percentile for
# approx_percentile (q85 pattern) — the plan shape is unchanged.
# Group sizes are odd/even the same way in both engines, and midpoint
# interpolation ((a+b)/2) is IEEE-identical.
# ---------------------------------------------------------------------------
@query(
    "q119_mad_outliers",
    oracle="""
    WITH med AS (
        SELECT source, median(n_chars) AS med_chars FROM documents GROUP BY source
    ),
    dev AS (
        SELECT d.source, m.med_chars,
               abs(CAST(d.n_chars AS DOUBLE) - m.med_chars) AS dev
        FROM documents d JOIN med m ON d.source = m.source
    ),
    st AS (
        SELECT source, min(med_chars) AS med_chars, median(dev) AS mad_chars
        FROM dev GROUP BY source
    )
    SELECT dev.source, st.med_chars, st.mad_chars,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN dev.dev > 3.0 * st.mad_chars THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers
    FROM dev JOIN st ON dev.source = st.source
    GROUP BY dev.source, st.med_chars, st.mad_chars
    """,
)
def q119_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    med = docs.groupBy("source").agg(F.percentile("n_chars", 0.5).alias("med_chars"))
    dev = docs.join(F.broadcast(med), "source").select(
        "source",
        "med_chars",
        F.abs(F.col("n_chars").cast("double") - F.col("med_chars")).alias("dev"),
    )
    stats = dev.groupBy("source").agg(
        F.min("med_chars").alias("med_chars"), F.percentile("dev", 0.5).alias("mad_chars")
    )
    return (
        dev.drop("med_chars")
        .join(F.broadcast(stats), "source")
        .groupBy("source", "med_chars", "mad_chars")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("dev") > 3.0 * F.col("mad_chars"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# q180 — blocked fuzzy match (entity resolution): near-identical part
# names WITHOUT an all-pairs cross, and WITHOUT pairing the fact
# table against itself: resolution runs on the DISTINCT-name table
# (vocabulary-sized — the first rule of attribute-level ER at scale;
# a fact-level self-join here measured 26.6M pairs / 106 s at sf0.1
# versus vocabulary pairs in under a second). Two blocking passes
# (first token, last token) union-deduped — multi-pass blocking
# recovers pairs a single key misses — then exact Levenshtein ≤ 4
# verify; per-name part counts ride along so the output still scores
# fact-table impact. Equi-joins only; integer distances: oracle-exact.
# ---------------------------------------------------------------------------
@query(
    "q180_blocked_fuzzy_pairs",
    oracle="""
    WITH named AS (
        SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts,
               string_split(p_name, ' ')[1] AS ftok,
               string_split(p_name, ' ')[-1] AS ltok
        FROM part GROUP BY p_name
    ),
    cand AS (
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
        FROM named a JOIN named b ON a.ftok = b.ftok AND a.p_name < b.p_name
        UNION
        SELECT a.p_name, b.p_name, a.n_parts, b.n_parts
        FROM named a JOIN named b ON a.ltok = b.ltok AND a.p_name < b.p_name
    )
    SELECT name_a, name_b, n_parts_a, n_parts_b,
           CAST(levenshtein(name_a, name_b) AS INT) AS edit_dist
    FROM cand WHERE levenshtein(name_a, name_b) <= 4
    """,
)
def q180_blocked_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    named = part.groupBy("p_name").agg(F.count("*").cast("bigint").alias("n_parts")).select(
        "p_name",
        "n_parts",
        F.split("p_name", " ").getItem(0).alias("ftok"),
        F.element_at(F.split("p_name", " "), -1).alias("ltok"),
    )

    def block(key):
        a = named.select(
            F.col("p_name").alias("name_a"),
            F.col("n_parts").alias("n_parts_a"),
            F.col(key).alias("k"),
        )
        b = named.select(
            F.col("p_name").alias("name_b"),
            F.col("n_parts").alias("n_parts_b"),
            F.col(key).alias("k"),
        )
        return a.join(b, "k").filter(F.col("name_a") < F.col("name_b")).drop("k")

    cand = block("ftok").union(block("ltok")).distinct()
    return cand.select(
        "name_a",
        "name_b",
        "n_parts_a",
        "n_parts_b",
        F.levenshtein("name_a", "name_b").cast("int").alias("edit_dist"),
    ).filter(F.col("edit_dist") <= 4)


# ---------------------------------------------------------------------------
# q182 — declarative constraint suite (deequ-style expectations): one
# pass per table evaluating uniqueness, referential integrity, value
# ranges, and enum membership; output is the pass/fail board a data
# contract gate consumes. Each check is a tiny aggregate (dimension
# side of the FK check broadcasts); all-integer → oracle-exact.
# ---------------------------------------------------------------------------
@query(
    "q182_constraint_checks",
    oracle="""
    SELECT 'customer.c_custkey unique' AS constraint_name,
           CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT) AS n_violations
    FROM customer
    UNION ALL
    SELECT 'orders.o_custkey fk customer',
           CAST(count(*) AS BIGINT)
    FROM orders o WHERE o.o_custkey NOT IN
        (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL)
    UNION ALL
    SELECT 'lineitem.l_quantity in [1,50]',
           CAST(count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'orders.o_orderstatus enum',
           CAST(count(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'documents.doc_id unique+nonnull',
           CAST(count(*) - count(DISTINCT doc_id)
                + count(CASE WHEN doc_id IS NULL THEN 1 END) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'events.ts nonnull',
           CAST(count(CASE WHEN ts IS NULL THEN 1 END) AS BIGINT)
    FROM events
    """,
)
def q182_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")

    def check(name, df):
        return df.select(F.lit(name).alias("constraint_name"),
                         F.col("n_violations").cast("bigint").alias("n_violations"))

    uniq_cust = cust.agg(
        (F.count("*") - F.countDistinct("c_custkey")).alias("n_violations")
    )
    # NULL probe keys are excluded to match the oracle's NOT IN
    # three-valued logic (a NULL FK is a nonnull-check's business, not
    # a referential violation). The oracle subquery likewise filters
    # NULL c_custkey so parity is data-independent: a NULL in the
    # subquery side would otherwise collapse NOT IN to 0 rows while
    # the left_anti still counts genuine orphans (ADVICE r02).
    fk = (
        orders.filter(F.col("o_custkey").isNotNull())
        .join(
            # key-only but still customer-grain (scales with SF): no
            # hint — left_anti shuffles on the key; AQE may broadcast.
            cust.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        ).agg(F.count("*").alias("n_violations"))
    )
    qty = li.agg(
        F.count(F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1))
        .alias("n_violations")
    )
    enum = orders.agg(
        F.count(F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1)).alias(
            "n_violations"
        )
    )
    doc_ids = docs.agg(
        (
            F.count("*")
            - F.countDistinct("doc_id")
            + F.count(F.when(F.col("doc_id").isNull(), 1))
        ).alias("n_violations")
    )
    ts_nn = ev.agg(F.count(F.when(F.col("ts").isNull(), 1)).alias("n_violations"))
    return (
        check("customer.c_custkey unique", uniq_cust)
        .unionByName(check("orders.o_custkey fk customer", fk))
        .unionByName(check("lineitem.l_quantity in [1,50]", qty))
        .unionByName(check("orders.o_orderstatus enum", enum))
        .unionByName(check("documents.doc_id unique+nonnull", doc_ids))
        .unionByName(check("events.ts nonnull", ts_nn))
    )


# ---------------------------------------------------------------------------
# q185 — join-key skew audit: for each candidate shuffle key, the
# heaviest value's share and its ratio to the mean group size — the
# diagnostic run BEFORE choosing join/agg strategies (ratio >> 1 →
# salting / AQE skew-join territory; operators/skew.py). One
# partial-aggregating groupBy per key; the per-key argmax is a
# struct-max in the combiner (no window, same q157 discipline).
# Integer counts + identical double divisions: oracle-exact.
# ---------------------------------------------------------------------------
_SKEW_KEYS = (
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("orders", "o_custkey"),
    ("documents", "source"),
    ("events", "user_id"),
)


@query(
    "q185_join_key_skew_audit",
    oracle=" UNION ALL ".join(
        f"""
    (WITH g AS (SELECT CAST({col} AS VARCHAR) AS k, count(*) AS n
                FROM {tbl} GROUP BY {col})
    SELECT '{tbl}.{col}' AS key_col,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(max(n) AS BIGINT) AS max_group,
           CAST(max(n) AS DOUBLE) / (CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE))
               AS skew_ratio
    FROM g)
    """
        for tbl, col in _SKEW_KEYS
    ),
)
def q185_join_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for tbl, col in _SKEW_KEYS:
        df = load_table(spark, sf_dir, tbl)
        g = df.groupBy(F.col(col).cast("string").alias("k")).agg(
            F.count("*").alias("n")
        )
        agg = g.agg(
            F.count("*").cast("bigint").alias("n_groups"),
            F.sum("n").cast("bigint").alias("n_rows"),
            F.max("n").cast("bigint").alias("max_group"),
            (
                F.max("n").cast("double")
                / (F.sum("n").cast("double") / F.count("*").cast("double"))
            ).alias("skew_ratio"),
        ).select(F.lit(f"{tbl}.{col}").alias("key_col"), "*")
        out = agg if out is None else out.unionByName(agg)
    return out


# ---------------------------------------------------------------------------
# q273 — entropy l-diversity audit (Machanavajjhala et al. 2007 —
# public method): within each quasi-identifier equivalence class
# (q239's mktsegment × nation × balance band), how diverse is the
# sensitive attribute (order priority)? Reports distinct-l and the
# entropy in nats. Scale shape: one fact join decorates orders with
# their customer's QI class, then everything is (class × ≤5
# priorities) grain; entropy terms quantize to nano-ints after the
# 6dp-ln rounding so the ≤5-term sum is order-independent and
# engine-exact.
# ---------------------------------------------------------------------------
@query(
    "q273_l_diversity",
    oracle="""
    WITH classes AS (
        SELECT c_custkey, c_mktsegment,
               CAST(c_nationkey AS BIGINT) AS c_nationkey,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS acctbal_band
        FROM customer
    ),
    cells AS (
        SELECT c.c_mktsegment, c.c_nationkey, c.acctbal_band,
               o.o_orderpriority, CAST(count(*) AS BIGINT) AS c
        FROM orders o JOIN classes c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2, 3, 4
    ),
    termed AS (
        SELECT c_mktsegment, c_nationkey, acctbal_band, c,
               CAST(round(-1000000000.0
                   * (CAST(c AS DOUBLE) / CAST(sum(c) OVER (PARTITION BY c_mktsegment, c_nationkey, acctbal_band) AS DOUBLE))
                   * round(ln(CAST(c AS DOUBLE) / CAST(sum(c) OVER (PARTITION BY c_mktsegment, c_nationkey, acctbal_band) AS DOUBLE)), 6)
                 ) AS BIGINT) AS term_nano
        FROM cells
    ),
    per_class AS (
        SELECT c_mktsegment, c_nationkey, acctbal_band,
               CAST(sum(c) AS BIGINT) AS n_orders,
               CAST(count(*) AS BIGINT) AS n_priorities,
               CAST(sum(term_nano) AS BIGINT) AS ent_nano
        FROM termed
        GROUP BY 1, 2, 3
    )
    SELECT c_mktsegment, c_nationkey, acctbal_band, n_orders, n_priorities,
           CAST(ent_nano AS DOUBLE) / 1000000000.0 AS entropy_nats,
           n_priorities >= 3 AS distinct_l3
    FROM per_class
    """,
)
def q273_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("acctbal_band"),
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    cells = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "c_nationkey", "acctbal_band", "o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    # class-grain window over ≤5 priority rows per class
    w = Window.partitionBy("c_mktsegment", "c_nationkey", "acctbal_band")
    p = F.col("c").cast("double") / F.sum("c").over(w).cast("double")
    term_nano = F.round(F.lit(-1000000000.0) * p * F.round(F.log(p), 6)).cast("bigint")
    per_class = (
        cells.withColumn("term_nano", term_nano)
        .groupBy("c_mktsegment", "c_nationkey", "acctbal_band")
        .agg(
            F.sum("c").cast("bigint").alias("n_orders"),
            F.count("*").cast("bigint").alias("n_priorities"),
            F.sum("term_nano").cast("bigint").alias("ent_nano"),
        )
    )
    return per_class.select(
        "c_mktsegment",
        "c_nationkey",
        "acctbal_band",
        "n_orders",
        "n_priorities",
        (F.col("ent_nano").cast("double") / F.lit(1000000000.0)).alias("entropy_nats"),
        (F.col("n_priorities") >= 3).alias("distinct_l3"),
    )


# ---------------------------------------------------------------------------
# q274 — t-closeness audit (Li, Li & Venkatasubramanian 2007 — public
# method): per QI class, the earth-mover's distance between the
# class's sensitive-attribute distribution (ordinal order priority)
# and the global one. For a 1-D ordinal the EMD is the sum of
# |CDF_class − CDF_global| over the ≤5 ordered levels — computed here
# as EXACT integer cross-products (|cum_c·N − cum_g·n_c| summed in
# DECIMAL(38,0), one double division at the end), so no float
# accumulation anywhere. Class × 5-level spine grain throughout.
# ---------------------------------------------------------------------------
@query(
    "q274_t_closeness",
    oracle="""
    WITH classes AS (
        SELECT c_custkey, c_mktsegment,
               CAST(c_nationkey AS BIGINT) AS c_nationkey,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS acctbal_band
        FROM customer
    ),
    f AS (
        SELECT c.c_mktsegment, c.c_nationkey, c.acctbal_band,
               CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT) AS lvl
        FROM orders o JOIN classes c ON o.o_custkey = c.c_custkey
    ),
    cells AS (
        SELECT c_mktsegment, c_nationkey, acctbal_band, lvl, CAST(count(*) AS BIGINT) AS c
        FROM f GROUP BY 1, 2, 3, 4
    ),
    spine AS (
        SELECT DISTINCT c_mktsegment, c_nationkey, acctbal_band, l.lvl
        FROM cells, (SELECT unnest([1, 2, 3, 4, 5]) AS lvl) l
    ),
    ccum AS (
        SELECT s.c_mktsegment, s.c_nationkey, s.acctbal_band, s.lvl,
               CAST(sum(COALESCE(c.c, 0)) OVER (
                    PARTITION BY s.c_mktsegment, s.c_nationkey, s.acctbal_band
                    ORDER BY s.lvl ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_c,
               CAST(sum(COALESCE(c.c, 0)) OVER (
                    PARTITION BY s.c_mktsegment, s.c_nationkey, s.acctbal_band) AS BIGINT) AS n_c
        FROM spine s LEFT JOIN cells c
          ON c.c_mktsegment = s.c_mktsegment AND c.c_nationkey = s.c_nationkey
         AND c.acctbal_band = s.acctbal_band AND c.lvl = s.lvl
    ),
    gcum AS (
        SELECT l.lvl,
               CAST(sum(COALESCE(g.g, 0)) OVER (ORDER BY l.lvl
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_g,
               CAST(sum(COALESCE(g.g, 0)) OVER () AS BIGINT) AS n_g
        FROM (SELECT unnest([1, 2, 3, 4, 5]) AS lvl) l
        LEFT JOIN (SELECT lvl, CAST(count(*) AS BIGINT) AS g FROM f GROUP BY lvl) g
          ON g.lvl = l.lvl
    )
    SELECT c.c_mktsegment, c.c_nationkey, c.acctbal_band,
           CAST(max(c.n_c) AS BIGINT) AS n_orders,
           CAST(sum(abs(CAST(c.cum_c AS HUGEINT) * g.n_g
                        - CAST(g.cum_g AS HUGEINT) * c.n_c)) AS DOUBLE)
             / (CAST(max(c.n_c) AS DOUBLE) * CAST(max(g.n_g) AS DOUBLE) * 4.0) AS emd,
           CAST(sum(abs(CAST(c.cum_c AS HUGEINT) * g.n_g
                        - CAST(g.cum_g AS HUGEINT) * c.n_c)) AS DOUBLE)
             / (CAST(max(c.n_c) AS DOUBLE) * CAST(max(g.n_g) AS DOUBLE) * 4.0) <= 0.2 AS t_close_02
    FROM ccum c JOIN gcum g ON g.lvl = c.lvl
    GROUP BY 1, 2, 3
    """,
)
def q274_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("acctbal_band"),
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    f = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "c_mktsegment",
        "c_nationkey",
        "acctbal_band",
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("lvl"),
    )
    from pipeline_usnvc_spark.operators.checkpoint import materialize

    # cells feeds THREE consumers (spine distinct, filled join, the
    # global rollup below); materialize so the orders x customer fact
    # join runs exactly once.
    cells = materialize(
        f.groupBy("c_mktsegment", "c_nationkey", "acctbal_band", "lvl").agg(
            F.count("*").cast("bigint").alias("c")
        )
    )
    lvl_spine = spark.createDataFrame([(i,) for i in range(1, 6)], "lvl bigint").coalesce(1)
    spine = (
        cells.select("c_mktsegment", "c_nationkey", "acctbal_band")
        .distinct()
        .crossJoin(F.broadcast(lvl_spine))
    )
    filled = spine.join(
        cells, ["c_mktsegment", "c_nationkey", "acctbal_band", "lvl"], "left"
    ).select(
        "c_mktsegment",
        "c_nationkey",
        "acctbal_band",
        "lvl",
        F.coalesce("c", F.lit(0)).cast("bigint").alias("c"),
    )
    # class-grain windows over exactly 5 level rows per class
    w_class = Window.partitionBy("c_mktsegment", "c_nationkey", "acctbal_band")
    w_ccum = w_class.orderBy("lvl").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ccum = filled.select(
        "c_mktsegment",
        "c_nationkey",
        "acctbal_band",
        "lvl",
        F.sum("c").over(w_ccum).cast("bigint").alias("cum_c"),
        F.sum("c").over(w_class).cast("bigint").alias("n_c"),
    )
    # global 5-row CDF (1-row-per-level side table) — rolled up from
    # the cells aggregate, NOT from f: a second consumer of the fact
    # frame would re-execute the orders x customer join (review
    # finding); cells partitions f exactly, so the sums are identical.
    glob = cells.groupBy("lvl").agg(F.sum("c").cast("bigint").alias("g"))
    w_g = Window.orderBy("lvl").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_gall = Window.partitionBy(F.lit(1))
    gcum = (
        lvl_spine.join(glob, "lvl", "left")
        .select("lvl", F.coalesce("g", F.lit(0)).cast("bigint").alias("g"))
        .select(
            "lvl",
            F.sum("g").over(w_g).cast("bigint").alias("cum_g"),
            F.sum("g").over(w_gall).cast("bigint").alias("n_g"),
        )
    )
    def d38(c):
        return c.cast("decimal(38,0)")

    term = F.abs(d38(F.col("cum_c")) * d38(F.col("n_g")) - d38(F.col("cum_g")) * d38(F.col("n_c")))
    # normalized by m - 1 = 4 (Li et al.: ordinal ground distance is
    # |i - j| / (m - 1)), so emd lies in [0, 1]
    emd = F.sum(term).cast("double") / (
        F.max("n_c").cast("double") * F.max("n_g").cast("double") * F.lit(4.0)
    )
    return (
        ccum.join(F.broadcast(gcum), "lvl")
        .groupBy("c_mktsegment", "c_nationkey", "acctbal_band")
        .agg(
            F.max("n_c").cast("bigint").alias("n_orders"),
            emd.alias("emd"),
            (emd <= 0.2).alias("t_close_02"),
        )
    )

"""Function-surface gauntlets: broad per-function parity packed into
two oracle-checked queries — the scalar string/math surface and the
array/higher-order surface. Each output column is one function
family; a mismatch pinpoints the exact function that diverged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_usnvc_spark.plans.registry import query
from pipeline_usnvc_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# q49 — scalar string/math gauntlet.
# ---------------------------------------------------------------------------
@query(
    "q49_scalar_gauntlet",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up,
           lower(p_brand) AS lo,
           substring(p_name, 3, 5) AS sub,
           trim('  ' || p_type || ' ') AS trimmed,
           lpad(CAST(p_size AS VARCHAR), 5, '0') AS padded,
           CAST(strpos(p_name, 'a') AS INT) AS pos_a,
           CAST(length(p_type) AS INT) AS type_len,
           CAST(abs(p_size - 25) AS INT) AS abs_diff,
           CAST(ceil(p_retailprice / 100) AS BIGINT) AS price_ceil,
           CAST(floor(p_retailprice / 100) AS BIGINT) AS price_floor,
           CAST(p_size % 7 AS INT) AS size_mod,
           CAST(greatest(p_size, 10) AS INT) AS g10,
           CAST(least(p_size, 40) AS INT) AS l40,
           coalesce(nullif(p_brand, 'Brand#1'), '<b1>') AS brand_or,
           reverse(p_brand) AS rev,
           repeat(p_brand, 2) AS rep,
           translate(p_type, 'aeiou', 'AEIOU') AS xlat,
           concat_ws('|', p_brand, p_type) AS joined
    FROM part
    """,
)
def q49_scalar_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.substring("p_name", 3, 5).alias("sub"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("trimmed"),
        F.lpad(F.col("p_size").cast("string"), 5, "0").alias("padded"),
        F.instr(F.col("p_name"), "a").cast("int").alias("pos_a"),
        F.length("p_type").cast("int").alias("type_len"),
        F.abs(F.col("p_size") - 25).cast("int").alias("abs_diff"),
        F.ceil(F.col("p_retailprice") / 100).cast("bigint").alias("price_ceil"),
        F.floor(F.col("p_retailprice") / 100).cast("bigint").alias("price_floor"),
        (F.col("p_size") % 7).cast("int").alias("size_mod"),
        F.greatest(F.col("p_size"), F.lit(10)).cast("int").alias("g10"),
        F.least(F.col("p_size"), F.lit(40)).cast("int").alias("l40"),
        F.coalesce(F.nullif(F.col("p_brand"), F.lit("Brand#1")), F.lit("<b1>")).alias("brand_or"),
        F.reverse("p_brand").alias("rev"),
        F.repeat("p_brand", 2).alias("rep"),
        F.translate(F.col("p_type"), "aeiou", "AEIOU").alias("xlat"),
        F.concat_ws("|", "p_brand", "p_type").alias("joined"),
    )


# ---------------------------------------------------------------------------
# q58 — array / higher-order gauntlet (arrays surfaced as canonical
# strings so the comparison is representation-stable).
# ---------------------------------------------------------------------------
@query(
    "q58_array_gauntlet",
    oracle="""
    SELECT doc_id,
           array_to_string(list_sort(toks), ',') AS sorted_toks,
           array_to_string(list_sort(list_distinct(toks)), ',') AS distinct_toks,
           array_to_string(toks[1:3], ',') AS first3,
           CAST(len(toks) AS INT) AS n,
           CASE WHEN list_contains(toks, 'spark') THEN true ELSE false END AS has_spark,
           array_to_string(list_transform(toks[1:5], t -> upper(t)), ',') AS upper5,
           array_to_string(list_filter(toks, t -> length(t) > 4), ',') AS long_toks,
           CAST(list_reduce(list_prepend(0, list_transform(toks, t -> length(t))), (a, b) -> a + b) AS BIGINT) AS total_len
    FROM (
        SELECT doc_id,
               list_filter(string_split_regex(lower(coalesce(text, '')), '[^a-zA-Z0-9]+'), t -> t <> '') AS toks
        FROM documents
    )
    """,
)
def q58_array_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    # coalesce('') BOTH sides: a NULL text would otherwise fan out into
    # engine-divergent NULL semantics across every column here (legacy
    # Spark size(NULL) = -1 vs DuckDB len(NULL) = NULL, concat_ws(NULL
    # array) = '' vs array_to_string = NULL, ... — the q05 d99cd3d
    # class); empty-token-list is the one shape both engines agree on.
    d = docs.select("doc_id", tokens(F.coalesce(F.col("text"), F.lit(""))).alias("toks"))
    return d.select(
        "doc_id",
        F.concat_ws(",", F.sort_array("toks")).alias("sorted_toks"),
        F.concat_ws(",", F.sort_array(F.array_distinct("toks"))).alias("distinct_toks"),
        F.concat_ws(",", F.slice("toks", 1, 3)).alias("first3"),
        F.size("toks").cast("int").alias("n"),
        F.array_contains("toks", "spark").alias("has_spark"),
        F.concat_ws(",", F.transform(F.slice("toks", 1, 5), lambda t: F.upper(t))).alias("upper5"),
        F.concat_ws(",", F.filter("toks", lambda t: F.length(t) > 4)).alias("long_toks"),
        F.aggregate("toks", F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)).alias("total_len"),
    )


# ---------------------------------------------------------------------------
# q59 — regexp gauntlet: extract / extract-all / replace-all / match /
# count / split / split_part on the ASCII `part` columns. One column
# per function family — a hash mismatch pinpoints the divergent one.
# (Spark regexp_replace is replace-all by default; DuckDB needs the
# 'g' flag — that asymmetry is exactly what the oracle pins down.)
# ---------------------------------------------------------------------------
@query(
    "q59_regexp_gauntlet",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           array_to_string(regexp_extract_all(p_name, '[a-z]+'), ',') AS all_words,
           regexp_replace(p_type, '[aeiou]', '*', 'g') AS starred,
           regexp_matches(p_name, 'a') AS has_a,
           CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INT) AS n_vowels,
           split_part(p_type, ' ', 1) AS first_token,
           array_to_string(string_split(p_type, ' '), ',') AS tokens
    FROM part
    """,
)
def q59_regexp_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        # Arrays serialize through concat_ws so the driver's pandas
        # canonicalizer (which sorts rows) never sees an unhashable
        # list cell — same convention as q58 above.
        F.concat_ws(",", F.regexp_extract_all("p_name", F.lit("[a-z]+"), 0)).alias("all_words"),
        F.regexp_replace("p_type", "[aeiou]", "*").alias("starred"),
        F.col("p_name").rlike("a").alias("has_a"),
        F.regexp_count("p_name", F.lit("[aeiou]")).cast("int").alias("n_vowels"),
        F.substring_index("p_type", " ", 1).alias("first_token"),
        F.concat_ws(",", F.split("p_type", " ")).alias("tokens"),
    )


# ---------------------------------------------------------------------------
# q67 — window-function gauntlet: ranking, offsets with defaults,
# distribution functions, nth_value, and explicit ROWS / RANGE frames,
# one column per function so a mismatch pinpoints the divergence.
# Partition ordering is (o_orderdate, o_orderkey) — unique, so every
# window result is deterministic. Running money sums go through
# decimal(18,2) on both engines (the suite-wide exact-sum trick).
# ---------------------------------------------------------------------------
@query(
    "q67_window_gauntlet",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(row_number() OVER w AS INT) AS rn,
           CAST(rank() OVER w AS INT) AS rnk,
           CAST(dense_rank() OVER w AS INT) AS drnk,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           lead(o_orderkey, 1) OVER w AS next_ok,
           lag(o_orderkey, 2, CAST(-1 AS BIGINT)) OVER w AS prev2_ok,
           nth_value(o_orderkey, 2) OVER w AS second_ok,
           first_value(o_orderkey) OVER w AS first_ok,
           last_value(o_orderkey) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_ok,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS run3_total,
           CAST(count(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey
               RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_key_range,
           max(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS max_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q67_window_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    w_run3 = w.rowsBetween(-2, W.currentRow)
    w_range = (
        W.partitionBy("o_custkey").orderBy("o_orderkey").rangeBetween(-1000, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.lead("o_orderkey", 1).over(w).alias("next_ok"),
        F.lag("o_orderkey", 2, -1).over(w).alias("prev2_ok"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_ok"),
        F.first_value("o_orderkey").over(w).alias("first_ok"),
        F.last_value("o_orderkey").over(w_full).alias("last_ok"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w_run3)
        .cast("double")
        .alias("run3_total"),
        F.count(F.lit(1)).over(w_range).alias("n_key_range"),
        F.max("o_totalprice").over(w_full).alias("max_total"),
    )


# ---------------------------------------------------------------------------
# q72 — datetime gauntlet over the (UTC-pinned) events timeline:
# field extraction, ISO day-of-week/week-of-year, truncation,
# month-end clamping (last_day, +3 months), day arithmetic, and the
# microsecond epoch round-trip. Spark weekday()+1 == DuckDB isodow;
# add_months month-end clamping matches interval addition.
# ---------------------------------------------------------------------------
@query(
    "q72_datetime_gauntlet",
    oracle="""
    SELECT event_id,
           CAST(year(ts) AS INT) AS y,
           CAST(month(ts) AS INT) AS mo,
           CAST(day(ts) AS INT) AS d,
           CAST(hour(ts) AS INT) AS h,
           CAST(minute(ts) AS INT) AS mi,
           CAST(second(ts) AS INT) AS s,
           CAST(dayofyear(ts) AS INT) AS doy,
           CAST(isodow(ts) AS INT) AS iso_dow,
           CAST(weekofyear(ts) AS INT) AS wk,
           date_trunc('month', ts) AS trunc_month,
           strftime(last_day(ts), '%Y-%m-%d') AS ld,
           strftime(CAST(CAST(ts AS DATE) + INTERVAL 3 MONTH AS DATE), '%Y-%m-%d') AS am3,
           CAST(date_diff('day', CAST(ts AS DATE), DATE '1995-06-17') AS INT) AS dd,
           epoch_us(ts) AS us
    FROM events
    """,
)
def q72_datetime_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.second("ts").alias("s"),
        F.dayofyear("ts").alias("doy"),
        (F.weekday("ts") + 1).alias("iso_dow"),
        F.weekofyear("ts").alias("wk"),
        F.date_trunc("month", "ts").alias("trunc_month"),
        F.date_format(F.last_day("ts"), "yyyy-MM-dd").alias("ld"),
        F.date_format(F.add_months(F.col("ts").cast("date"), 3), "yyyy-MM-dd").alias("am3"),
        F.datediff(F.lit("1995-06-17").cast("date"), F.col("ts").cast("date")).alias("dd"),
        F.unix_micros("ts").alias("us"),
    )


# ---------------------------------------------------------------------------
# q75 — map-type gauntlet: construction, extraction, keys/values,
# concat, and key-membership. Values are surfaced as scalars/joined
# strings in deterministic (sorted-key) order so the comparison is
# representation-stable; DuckDB's map extract returns a single-element
# list, unwrapped with [1].
# ---------------------------------------------------------------------------
@query(
    "q75_map_gauntlet",
    oracle="""
    SELECT doc_id,
           m['lang'][1] AS v_lang,
           array_to_string(list_sort(map_keys(m)), ',') AS ks,
           array_to_string(list_transform(list_sort(map_keys(m)), k -> m[k][1]), ',') AS vs,
           CAST(cardinality(m) AS INT) AS n,
           map_concat(m, map(['x'], ['y']))['x'][1] AS extended_x,
           list_contains(map_keys(m), 'lang') AS has_lang,
           list_contains(map_keys(m), 'zzz') AS has_zzz
    FROM (SELECT doc_id, map(['lang', 'src'], [lang, source]) AS m FROM documents)
    """,
)
def q75_map_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    m = F.create_map(F.lit("lang"), F.col("lang"), F.lit("src"), F.col("source"))
    d = docs.select("doc_id", m.alias("m"))
    sorted_keys = F.array_sort(F.map_keys(F.col("m")))
    return d.select(
        "doc_id",
        F.element_at("m", F.lit("lang")).alias("v_lang"),
        F.array_join(sorted_keys, ",").alias("ks"),
        F.array_join(
            F.transform(sorted_keys, lambda k: F.element_at(F.col("m"), k)), ","
        ).alias("vs"),
        F.size("m").alias("n"),
        F.element_at(
            F.map_concat(F.col("m"), F.create_map(F.lit("x"), F.lit("y"))), F.lit("x")
        ).alias("extended_x"),
        F.map_contains_key("m", "lang").alias("has_lang"),
        F.map_contains_key("m", "zzz").alias("has_zzz"),
    )


# ---------------------------------------------------------------------------
# q76 — error-safe (try_*) gauntlet: failed casts and guarded
# arithmetic yield null instead of failing the job — the semantics a
# 100 TB pipeline needs for dirty inputs. DuckDB expresses the same
# contract via TRY_CAST and explicit zero guards.
# ---------------------------------------------------------------------------
@query(
    "q76_trycast_gauntlet",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(o_orderstatus AS INT) AS bad_int,
           TRY_CAST(CAST(o_orderkey AS VARCHAR) AS INT) AS good_int,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL
                ELSE o_totalprice / CAST(o_orderkey % 3 AS DOUBLE) END AS guarded_div,
           (CAST(split_part(o_orderpriority, '-', 1) AS VARCHAR)) AS prio_code,
           list_extract(string_split(o_orderpriority, '-'), 5) AS missing_elem
    FROM orders
    """,
)
def q76_trycast_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderstatus").try_cast("int").alias("bad_int"),
        F.col("o_orderkey").cast("string").try_cast("int").alias("good_int"),
        F.try_divide(
            "o_totalprice", (F.col("o_orderkey") % 3).cast("double")
        ).alias("guarded_div"),
        F.split_part("o_orderpriority", F.lit("-"), F.lit(1)).alias("prio_code"),
        F.try_element_at(F.split("o_orderpriority", "-"), F.lit(5)).alias("missing_elem"),
    )


# ---------------------------------------------------------------------------
# q77 — statistical aggregate gauntlet per return flag: sample/pop
# stddev + variance, correlation, covariance, and exact median.
# Engines use different single-pass algorithms (Welford-style vs
# sum-of-squares), so results are rounded to 6 dp on both sides —
# agreement at 6 dp across grouping keys is the portability contract,
# same rationale as the tf-idf rounding.
# ---------------------------------------------------------------------------
@query(
    "q77_stats_gauntlet",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6) AS sd_s,
           round(stddev_pop(l_quantity), 6) AS sd_p,
           round(var_samp(l_quantity), 6) AS var_s,
           round(var_pop(l_quantity), 6) AS var_p,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qe,
           round(covar_samp(l_quantity, l_extendedprice), 6) AS cov_s,
           round(covar_pop(l_quantity, l_extendedprice), 6) AS cov_p,
           round(median(l_quantity), 6) AS med_q
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q77_stats_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_s"),
        F.round(F.stddev_pop("l_quantity"), 6).alias("sd_p"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_s"),
        F.round(F.var_pop("l_quantity"), 6).alias("var_p"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qe"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).alias("cov_s"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 6).alias("cov_p"),
        F.round(F.median("l_quantity"), 6).alias("med_q"),
    )


# ---------------------------------------------------------------------------
# q78 — conditional & bitwise aggregate gauntlet: count_if (FILTER),
# bool_and/bool_or, deterministic max_by/min_by (the by-key is
# unique per group), filtered decimal-exact sums, and the bit_and /
# bit_or / bit_xor aggregate family.
# ---------------------------------------------------------------------------
@query(
    "q78_conditional_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_high,
           bool_and(l_quantity > 0) AS all_pos,
           bool_or(l_extendedprice > 50000) AS any_big,
           max_by(l_partkey, (l_orderkey * 10 + l_linenumber) * 10000000 + l_partkey) AS latest_part,
           min_by(l_partkey, (l_orderkey * 10 + l_linenumber) * 10000000 + l_partkey) AS earliest_part,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) FILTER (WHERE l_quantity > 25) AS DOUBLE) AS rev_high,
           bit_and(l_linenumber) AS ln_and,
           bit_or(l_linenumber) AS ln_or,
           bit_xor(l_linenumber) AS ln_xor
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q78_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # (orderkey, linenumber) pairs can collide in the synthetic data,
    # so l_partkey folds into the by-key: any remaining tie implies an
    # equal result, making the argmin/argmax engine-deterministic.
    seq = (F.col("l_orderkey") * 10 + F.col("l_linenumber")) * 10000000 + F.col("l_partkey")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_quantity") > 25).alias("n_high"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_pos"),
        F.bool_or(F.col("l_extendedprice") > 50000).alias("any_big"),
        F.max_by("l_partkey", seq).alias("latest_part"),
        F.min_by("l_partkey", seq).alias("earliest_part"),
        F.sum(
            F.when(F.col("l_quantity") > 25, F.col("l_extendedprice").cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("rev_high"),
        F.bit_and("l_linenumber").alias("ln_and"),
        F.bit_or("l_linenumber").alias("ln_or"),
        F.bit_xor("l_linenumber").alias("ln_xor"),
    )


# ---------------------------------------------------------------------------
# q220 — ordered-set aggregate gauntlet: LISTAGG ... WITHIN GROUP
# (Spark 4 surface) incl. the DISTINCT variant, vs DuckDB's
# string_agg(... ORDER BY). Deterministic because every WITHIN GROUP
# ordering is total (o_orderkey unique; DISTINCT list ordered by the
# value itself). Per-customer grain: one exchange on o_custkey with
# partial aggregation map-side — at 100 TB the concatenated strings
# are bounded by per-customer order counts, not corpus size.
#
# Engine note (discovered building this): TWO DISTINCT listaggs with
# different sort keys in one aggregate crash Spark 4.1's
# multi-distinct rewrite (ClassCastException: AttributeReference →
# SortOrder), so the second distinct concat goes through the
# equivalent array_join(array_sort(collect_set(...))) — same
# semantics, and it documents the portable alternative.
# ---------------------------------------------------------------------------
@query(
    "q220_listagg_gauntlet",
    oracle="""
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_keys,
           string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority) AS priorities,
           string_agg(DISTINCT o_orderstatus, '' ORDER BY o_orderstatus) AS statuses
    FROM orders
    GROUP BY o_custkey
    """,
)
def q220_listagg_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_custkey,
               CAST(count(*) AS BIGINT) AS n_orders,
               listagg(CAST(o_orderkey AS STRING), ',')
                   WITHIN GROUP (ORDER BY o_orderkey) AS order_keys,
               listagg(DISTINCT o_orderpriority, '|')
                   WITHIN GROUP (ORDER BY o_orderpriority) AS priorities,
               array_join(array_sort(collect_set(o_orderstatus)), '') AS statuses
        FROM {o}
        GROUP BY o_custkey
        """,
        o=o,
    )


# ---------------------------------------------------------------------------
# q223 — MULTISET set-operation gauntlet: INTERSECT ALL / EXCEPT ALL
# with genuine duplicate multiplicities (q11 covers the DISTINCT
# variants). Two overlapping order subsets provide repeated priority
# values; multiplicities aggregate per value so the bag semantics
# (min(m_a, m_b) for INTERSECT ALL, max(0, m_a - m_b) for EXCEPT
# ALL) are what the hash compares. Spark plans both as aggregated
# anti/semi-style joins — one exchange per side, no row explosion.
# ---------------------------------------------------------------------------
@query(
    "q223_multiset_ops",
    oracle="""
    WITH a AS (SELECT o_orderpriority AS v FROM orders WHERE o_orderkey % 3 = 0),
    b AS (SELECT o_orderpriority AS v FROM orders WHERE o_orderkey % 2 = 0)
    SELECT v, 'intersect_all' AS op, CAST(count(*) AS BIGINT) AS multiplicity
    FROM (SELECT v FROM a INTERSECT ALL SELECT v FROM b) GROUP BY v
    UNION ALL
    SELECT v, 'except_all' AS op, CAST(count(*) AS BIGINT) AS multiplicity
    FROM (SELECT v FROM a EXCEPT ALL SELECT v FROM b) GROUP BY v
    """,
)
def q223_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 3 == 0).select(F.col("o_orderpriority").alias("v"))
    b = o.filter(F.col("o_orderkey") % 2 == 0).select(F.col("o_orderpriority").alias("v"))
    inter = (
        a.intersectAll(b)
        .groupBy("v")
        .agg(F.count("*").cast("bigint").alias("multiplicity"))
        .select("v", F.lit("intersect_all").alias("op"), "multiplicity")
    )
    exc = (
        a.exceptAll(b)
        .groupBy("v")
        .agg(F.count("*").cast("bigint").alias("multiplicity"))
        .select("v", F.lit("except_all").alias("op"), "multiplicity")
    )
    return inter.unionByName(exc)


# ---------------------------------------------------------------------------
# q224 — null-ordering gauntlet: the cross-engine trap this suite
# exists to pin down. Spark's default is NULLS FIRST for ASC;
# DuckDB's is NULLS LAST — an oracle pair that relies on either
# default silently diverges, so every ordering here is EXPLICIT
# (NULLS FIRST / NULLS LAST on both engines), plus IGNORE NULLS /
# RESPECT NULLS window navigation over a derived nullable measure.
# Tie-broken by o_orderkey — total order, deterministic everywhere.
# ---------------------------------------------------------------------------
@query(
    "q224_null_ordering_gauntlet",
    oracle="""
    WITH t AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL
                    ELSE CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) END AS v
        FROM orders WHERE o_orderkey <= 1000
    )
    SELECT o_orderkey, o_orderstatus, v,
           CAST(row_number() OVER (PARTITION BY o_orderstatus
                ORDER BY v ASC NULLS FIRST, o_orderkey) AS INT) AS rn_nulls_first,
           CAST(row_number() OVER (PARTITION BY o_orderstatus
                ORDER BY v ASC NULLS LAST, o_orderkey) AS INT) AS rn_nulls_last,
           first_value(v IGNORE NULLS) OVER (PARTITION BY o_orderstatus
                ORDER BY o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_nonnull,
           first_value(v) OVER (PARTITION BY o_orderstatus
                ORDER BY o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_respect
    FROM t
    """,
)
def q224_null_ordering_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    t = o.select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
            F.col("o_totalprice").cast("decimal(18,2)").cast("double")
        ).alias("v"),
    )
    return spark.sql(
        """
        SELECT o_orderkey, o_orderstatus, v,
               CAST(row_number() OVER (PARTITION BY o_orderstatus
                    ORDER BY v ASC NULLS FIRST, o_orderkey) AS INT) AS rn_nulls_first,
               CAST(row_number() OVER (PARTITION BY o_orderstatus
                    ORDER BY v ASC NULLS LAST, o_orderkey) AS INT) AS rn_nulls_last,
               first_value(v) IGNORE NULLS OVER (PARTITION BY o_orderstatus
                    ORDER BY o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_nonnull,
               first_value(v) OVER (PARTITION BY o_orderstatus
                    ORDER BY o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_respect
        FROM {t}
        """,
        t=t,
    )


# ---------------------------------------------------------------------------
# q225 — collation-aware grouping (Spark 4 collation surface):
# case-insensitive aggregation via COLLATE UTF8_LCASE, mirrored in
# the oracle with explicit lower() grouping. The collated GROUP BY
# returns an arbitrary-case representative per group, so the output
# key normalizes through lower() on BOTH engines (the collation
# changes the equality relation; the normalization makes the result
# hash-stable). Exercises that Spark's collation equality matches a
# lower()-based rewrite on ASCII data.
# ---------------------------------------------------------------------------
@query(
    "q225_collation_group",
    oracle="""
    WITH t AS (
        SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_name) ELSE p_name END AS name_mixed,
               p_retailprice
        FROM part
    )
    SELECT lower(name_mixed) AS name_ci,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM t GROUP BY lower(name_mixed)
    """,
)
def q225_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    t = p.select(
        F.when(F.col("p_partkey") % 2 == 0, F.upper("p_name"))
        .otherwise(F.col("p_name"))
        .alias("name_mixed"),
        "p_retailprice",
    )
    return spark.sql(
        """
        SELECT lower(min(name_mixed)) AS name_ci,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM {t}
        GROUP BY collate(name_mixed, 'UTF8_LCASE')
        """,
        t=t,
    )

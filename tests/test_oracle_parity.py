"""The primary gate: every oracle-paired query must match DuckDB
exactly at sf0.001 (the driver re-runs the same comparison at sf0.01).
"""

from __future__ import annotations

import pytest

from pipeline_usnvc_spark.plans import ORACLES, QUERIES
from tests.oracle_compare import assert_frames_match, run_oracle

ORACLE_NAMES = sorted(ORACLES)
ROWS_ONLY_NAMES = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, sf_dir, name):
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    oracle_pdf = run_oracle(ORACLES[name], sf_dir)
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(spark, sf_dir, name):
    from pyspark.sql.types import ArrayType, MapType, StructType

    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
    # Rows-only outputs still flow through the driver's pandas
    # canonicalizer (sort_values), which cannot hash LIST/STRUCT/MAP
    # cells — the exact crash behind the two red r06 rows (q70/q199).
    # Driver-facing projections must serialize nested values
    # (_json_floats / concat_ws) and keep typed arrays in the
    # operator API only.
    nested = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not nested, f"{name} emits nested driver-facing columns: {nested}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert set(df.columns) == {"row_id", "source_data"}


def test_every_query_has_unique_name():
    assert len(QUERIES) == len(set(QUERIES))
    assert set(ORACLES) <= set(QUERIES)


def test_no_oracle_emits_hugeint(sf_dir):
    """DESCRIBE-sweep: DuckDB widens uncast sum(BIGINT) to HUGEINT
    (int128), which the driver's hasher renders differently from
    Spark's BIGINT — the root cause of both red CORRECTNESS_r02 rows
    (q104, q122). Every oracle aggregate must be cast so no output
    column types HUGEINT."""
    import duckdb

    from pipeline_usnvc_spark.sources.tables import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    offenders = {}
    for name, sql in ORACLES.items():
        cols = con.execute(f"DESCRIBE ({sql})").fetchall()
        huge = [c[0] for c in cols if "HUGEINT" in c[1].upper()]
        if huge:
            offenders[name] = huge
    assert not offenders, f"oracles emitting HUGEINT columns: {offenders}"


def test_no_oracle_emits_nested_types(sf_dir):
    """DESCRIBE-sweep companion to the HUGEINT check: the driver's
    pandas canonicalizer sorts result rows, and a LIST/STRUCT/MAP
    cell is unhashable — the exact failure behind the one red r03 row
    (q59, err `unhashable type: 'list'`). Every oracle output column
    must be scalar; arrays serialize through concat_ws /
    array_to_string on both engines (q58/q59 convention)."""
    import duckdb

    from pipeline_usnvc_spark.sources.tables import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    offenders = {}
    for name, sql in ORACLES.items():
        cols = con.execute(f"DESCRIBE ({sql})").fetchall()
        nested = [
            c[0]
            for c in cols
            if any(tok in c[1].upper() for tok in ("[]", "STRUCT", "MAP("))
        ]
        if nested:
            offenders[name] = nested
    assert not offenders, f"oracles emitting nested columns: {offenders}"


@pytest.mark.slow  # bulk sweep: executes all 400 queries for schema audit (~90 s)
def test_no_spark_query_emits_nested_types(spark, sf_dir):
    """Spark-side twin of the nested-type sweep: every oracle-paired
    query's *Spark* schema must also be scalar-only (schema check
    only — no execution), so both sides of the driver comparison are
    pandas-sortable."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = {}
    for name in ORACLE_NAMES:
        schema = QUERIES[name](spark, sf_dir).schema
        nested = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if nested:
            offenders[name] = nested
    assert not offenders, f"queries emitting nested columns: {offenders}"


def test_comparator_rejects_int_float_coercion():
    """Regression for the loophole that hid the HUGEINT bug: an
    integer Spark column vs a float64 oracle column (DuckDB's
    int128→float coercion in fetchdf) must FAIL, even when the
    values are numerically equal."""
    import numpy as np
    import pandas as pd

    from tests.oracle_compare import assert_frames_match

    spark_side = pd.DataFrame({"k": ["a", "b"], "n": np.array([3, 7], dtype="int64")})
    oracle_side = pd.DataFrame({"k": ["a", "b"], "n": np.array([3.0, 7.0], dtype="float64")})
    with pytest.raises(AssertionError, match="differing row"):
        assert_frames_match(spark_side, oracle_side, "int_vs_float")
    # Sanity: identical dtypes still pass.
    assert_frames_match(spark_side, spark_side.copy(), "int_vs_int")


def test_driver_sample_prefix_contains_rechecks():
    """The driver samples a 50-query prefix of queries() in dict
    order. Standing contract (VERDICT r10 item 1 / r11 item 1): this
    round's plan-changed re-pins lead, then any never-driver-verified
    queries (the round's additions), then the fully-verified backlog
    ROTATED by round index so the free tail slots act as a
    stale-green regression monitor cycling through the whole registry
    over ~10-16 rounds; nothing already verified may displace a fresh
    query."""
    import __spark_entry__ as e

    names = list(e.queries())
    # the round's head is pinned verbatim
    assert names[: len(e._R13_HEAD)] == list(e._R13_HEAD)
    # every never-driver-verified query sorts before every verified one
    # (head pins are verified-but-re-pinned, so they don't count)
    first_seen = min(
        (
            names.index(n)
            for n in e._DRIVER_VERIFIED
            if n in names and n not in e._R13_HEAD
        ),
        default=len(names),
    )
    fresh_after = [
        n for n in names[first_seen:] if n not in e._DRIVER_VERIFIED
    ]
    assert not fresh_after, f"fresh queries ordered after verified ones: {fresh_after[:5]}"
    # the verified backlog is rotated by round index — the tail must
    # NOT start at the registry prefix (q01...) once _ROUND > 0, and
    # the rotation is a permutation of the whole backlog
    backlog = [
        n
        for n in names
        if n in e._DRIVER_VERIFIED and n not in e._R13_HEAD
    ]
    from pipeline_usnvc_spark.plans import QUERIES

    registry_order = [
        n
        for n in QUERIES
        if n in e._DRIVER_VERIFIED and n not in e._R13_HEAD
    ]
    assert sorted(backlog) == sorted(registry_order)
    expected_off = (17 + (e._ROUND - 9) * 37) % len(registry_order)
    assert backlog == registry_order[expected_off:] + registry_order[:expected_off]
    assert expected_off != 0, "rotation degenerate: tail re-samples the registry prefix"
    # oracle-paired fresh queries outrank rows-only ones inside the
    # free slots (maximizes hash-checked signal per sample)
    from pipeline_usnvc_spark.plans import ORACLES

    free = [
        n
        for n in names
        if n not in e._DRIVER_VERIFIED and n not in e._R13_HEAD
    ]
    seen_rows_only = False
    for n in free:
        if n not in ORACLES:
            seen_rows_only = True
        else:
            assert not seen_rows_only, (
                f"oracle-paired fresh query {n} ordered after a rows-only one"
            )


def test_contract_filter_evaluates_under_count(spark):
    """The r4 review sweep showed a projected assert_true column is
    column-pruned by count() (it never evaluates); contracts therefore
    ride a WHERE clause. Regression: a failing contract_filter must
    raise from count(), a passing one must keep every row."""
    from pyspark.sql import functions as F

    from pipeline_usnvc_spark.operators.contracts import contract_filter

    df = spark.createDataFrame([(1,), (2,)], "v int")
    ok = contract_filter(df, F.col("v") > 0, F.lit("never"))
    assert ok.count() == 2
    bad = contract_filter(df, F.col("v") < 0, F.lit("boom"))
    with pytest.raises(Exception, match="boom|not true|USER_RAISED"):
        bad.count()


def test_attach_error_contract_zero_semantics(spark):
    """0/0 → rel_err 0 (passes); approx>0 vs exact=0 → unbounded
    (fails); in-bounds error passes and keeps rows."""
    from pyspark.sql import functions as F

    from pipeline_usnvc_spark.operators.contracts import attach_error_contract

    both_zero = spark.createDataFrame([(0, 0)], "a long, e long")
    assert attach_error_contract(both_zero, "a", "e", 0.1, "t").count() == 1
    in_bounds = spark.createDataFrame([(105, 100)], "a long, e long")
    assert attach_error_contract(in_bounds, "a", "e", 0.1, "t").count() == 1
    unbounded = spark.createDataFrame([(5, 0)], "a long, e long")
    with pytest.raises(Exception, match="rel_err|not true|USER_RAISED"):
        attach_error_contract(unbounded, "a", "e", 0.1, "t").count()


def test_recall_contract_fires_on_empty_ann(spark, sf_dir):
    """The r4 review sweep found the original recall contract passed
    VACUOUSLY when the ANN stage returned nothing (empty frame → the
    assert never ran). The query-grain reshape must instead FAIL
    loudly: an empty ANN result means recall 0 for every query."""
    from pyspark.sql import functions as F

    from pipeline_usnvc_spark.plans.similarity_queries import _attach_recall_contract
    from pipeline_usnvc_spark.sources.tables import load_table
    from pipeline_usnvc_spark.operators.similarity import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact = brute_force_topk(emb, queries, k=5)
    empty_ann = exact.filter(F.lit(False))
    out = _attach_recall_contract(empty_ann, queries, exact, k=5, bound=0.5)
    with pytest.raises(Exception, match="mean recall|not true|USER_RAISED"):
        out.count()


def test_q234_p90_never_null(spark, sf_dir):
    """Regression for the r4 review's p90 identity bug: the first
    draft's `10r == 9n + (9n mod 10)` only had solutions when
    n % 5 == 0, silently NULLing p90 for most groups — and the
    oracle shared the formula, so hash parity could not catch it.
    ceil(0.9n) = (9n+9) div 10 must select exactly one row per
    group: p90 is non-null everywhere."""
    pdf = QUERIES["q234_shipping_sla"](spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert pdf["p90_lag_days"].notna().all()


def test_q06_oracle_survives_unparseable_props():
    """Round-10 review: the q06 ORACLE used a bare CAST on
    regexp_extract output, so DuckDB hard-errored (CAST('' AS BIGINT))
    on exactly the unparseable-props case the E6 fallback exists for —
    an untestable-by-parity bug because the shipped data always
    carries '"k": N'. Pin the fixed oracle against a k-less fixture."""
    import duckdb

    from pipeline_usnvc_spark.plans import ORACLES

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS "
        "SELECT 1::BIGINT AS event_id, 'click' AS event_type, "
        "10.0 AS \"value\", '{}' AS props "
        "UNION ALL SELECT 2, 'purchase', 60.0, '{\"k\": 7}'"
    )
    rows = {
        r[0]: r[2]
        for r in con.execute(ORACLES["q06_conditional_extract"]).fetchall()
    }
    assert rows == {1: 0, 2: 7}


def test_fingerprint_oracles_pin_null_and_zero_token_texts(spark):
    """Round-10 review: DuckDB's array_to_string/string_agg over an
    EMPTY or NULL token list is NULL (md5 -> NULL) while the Spark
    spec md5(concat_ws(' ', tokens)) yields md5('') — before the
    coalesce fix, a NULL-text or symbols-only document silently
    diverged the whole fingerprint family (q33/q50/q157/q162/...).
    Pin both engines on exactly those degenerate rows."""
    import duckdb

    from pipeline_usnvc_spark.functions.text import doc_fingerprint
    from pipeline_usnvc_spark.plans import ORACLES

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        "SELECT 1::BIGINT AS doc_id, NULL::VARCHAR AS text "
        "UNION ALL SELECT 2, '!!! ... !!!' "
        "UNION ALL SELECT 3, 'real words here'"
    )
    oracle_fp = {
        r[0]: r[1]
        for r in con.execute(ORACLES["q33_fingerprint"]).fetchall()
    }
    sdf = spark.createDataFrame(
        [(1, None), (2, "!!! ... !!!"), (3, "real words here")],
        "doc_id bigint, text string",
    ).select("doc_id", doc_fingerprint("text").alias("fingerprint"))
    spark_fp = {r["doc_id"]: r["fingerprint"] for r in sdf.collect()}
    assert oracle_fp == spark_fp
    # the degenerate rows share md5('') — never NULL on either engine
    empty_md5 = "d41d8cd98f00b204e9800998ecf8427e"
    assert spark_fp[1] == spark_fp[2] == empty_md5

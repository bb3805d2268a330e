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
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert set(df.columns) == {"row_id", "source_data"}


def test_every_query_has_unique_name():
    assert len(QUERIES) == len(set(QUERIES))
    assert set(ORACLES) <= set(QUERIES)

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship document-assembly query (the reference's
core capability re-expressed Spark-first) on sf0.001.
``queries()`` / ``oracle_sql()`` — the operator inventory from
SURVEY.md §2 + the LLM-pipeline extensions, each as a
(spark, sf_dir) -> DataFrame callable with a DuckDB oracle where
SQL-expressible.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: nested customer-360 documents (decode dims, nest
    orders, build titled JSON envelopes) at sf0.001 — the reference's
    document-assembly pipeline shape (SURVEY §1.4) on the test schema."""
    from pipeline_usnvc_spark.plans.flagship import customer_documents

    return customer_documents(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pipeline_usnvc_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pipeline_usnvc_spark.plans import ORACLES

    return dict(ORACLES)

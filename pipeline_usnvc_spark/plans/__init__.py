"""Query registry package.

Importing this package registers every implemented query into
``QUERIES`` / ``ORACLES`` (see registry.py). ``__spark_entry__``
surfaces them to the driver.
"""

from pipeline_usnvc_spark.plans.registry import QUERIES, ORACLES

# Import for side effect: each module registers its queries.
from pipeline_usnvc_spark.plans import relational  # noqa: F401
from pipeline_usnvc_spark.plans import hierarchy_queries  # noqa: F401
from pipeline_usnvc_spark.plans import text_queries  # noqa: F401
from pipeline_usnvc_spark.plans import dedup_queries  # noqa: F401
from pipeline_usnvc_spark.plans import similarity_queries  # noqa: F401
from pipeline_usnvc_spark.plans import events_queries  # noqa: F401
from pipeline_usnvc_spark.plans import misc_queries  # noqa: F401
from pipeline_usnvc_spark.plans import window_queries  # noqa: F401
from pipeline_usnvc_spark.plans import cluster_queries  # noqa: F401
from pipeline_usnvc_spark.plans import function_gauntlets  # noqa: F401
from pipeline_usnvc_spark.plans import cdc_queries  # noqa: F401
from pipeline_usnvc_spark.plans import profiling_queries  # noqa: F401
from pipeline_usnvc_spark.plans import analytics_queries  # noqa: F401
from pipeline_usnvc_spark.plans import tpch_queries  # noqa: F401
from pipeline_usnvc_spark.plans import curation_queries  # noqa: F401
from pipeline_usnvc_spark.plans import drift_queries  # noqa: F401
from pipeline_usnvc_spark.plans import stats_queries  # noqa: F401
from pipeline_usnvc_spark.plans import inference_queries  # noqa: F401
from pipeline_usnvc_spark.plans import round8_queries  # noqa: F401
from pipeline_usnvc_spark.plans import round9_queries  # noqa: F401
from pipeline_usnvc_spark.plans import round10_queries  # noqa: F401
from pipeline_usnvc_spark.plans import round11_queries  # noqa: F401
from pipeline_usnvc_spark.plans import round12_queries  # noqa: F401
from pipeline_usnvc_spark.plans import round13_queries  # noqa: F401

__all__ = ["QUERIES", "ORACLES"]

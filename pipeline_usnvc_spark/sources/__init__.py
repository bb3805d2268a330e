from pipeline_usnvc_spark.sources.tables import TABLE_NAMES, load_table, load_tables, register_views
from pipeline_usnvc_spark.sources.delimited import read_delimited

__all__ = ["TABLE_NAMES", "load_table", "load_tables", "register_views", "read_delimited"]

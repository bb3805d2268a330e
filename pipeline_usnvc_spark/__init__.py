"""pipeline_usnvc_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference pipeline (bgotthold-usgs/pipeline_USNVC:
multi-file schema'd ingest, multi-way equi-joins, dimension decoding,
per-key sub-record nesting, recursive hierarchy traversal, string
cleaning, document assembly and a validated JSON sink), built
Spark-first: declarative DataFrame plans optimized by Catalyst, plus
the large-scale training-data operators (dedup, similarity search,
text analysis, multimodal plumbing) such a pipeline needs at 100 TB.

Layout:
    session    — SparkSession builder tuned for local testing & scale
    sources    — table loaders (parquet test tables, delimited-text ingest)
    functions  — reusable native column expressions (no Python UDFs on hot path)
    operators  — composed operators (joins, nesting, hierarchy, dedup, similarity)
    plans      — the query registry surfaced through __spark_entry__
    streaming  — Structured Streaming variants
"""

__version__ = "0.1.0"

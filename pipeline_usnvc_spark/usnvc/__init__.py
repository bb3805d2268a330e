"""USNVC reference-parity pipeline: the full document-assembly
capability of the reference (bgotthold-usgs/pipeline_USNVC) as one
declarative Spark job.

    ingest.read_export(spark, dir)   — 18 schema'd TSV scans (S1-S2)
    silver.build_silver(tables)      — joins J1-J9, one cached pass
    docs.build_documents(silver)     — nesting, hierarchy closure,
                                       doc assembly, root synthesis,
                                       JSON envelope (S3)
"""

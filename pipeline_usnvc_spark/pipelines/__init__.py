"""End-to-end composed pipelines (the one-call product surface)."""

from pipeline_usnvc_spark.pipelines.prepare import prepare_training_data

__all__ = ["prepare_training_data"]

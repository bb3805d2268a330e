"""Change ledger + validated JSON sink (reference S3/S6).

The reference logs one change event per row per stage through a
harness callback (usnvc.py:24-28, 55-57, 74-77) and sends each
document through a draft-07-validated sink (README.md:35-45). The
Spark equivalents: per-change-type accumulators (cheap cluster-wide
counters), an events side-DataFrame written alongside the output, and
a final-select validation with a quarantine channel instead of a
per-row schema validator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ChangeLedger:
    """Named counters backed by Spark accumulators."""

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._counters: dict[str, object] = {}

    def counter(self, name: str):
        if name not in self._counters:
            self._counters[name] = self._spark.sparkContext.accumulator(0)
        return self._counters[name]

    def counts(self) -> dict[str, int]:
        return {k: v.value for k, v in self._counters.items()}


def change_events(
    docs: DataFrame,
    change_name: str,
    change_desc: str,
    fn: str,
    id_col: str = "row_id",
) -> DataFrame:
    """One ledger event per document, mirroring the reference's
    log_change_event(change_id, name, desc, fn, source, result)."""
    return docs.select(
        F.col(id_col).alias("change_id"),
        F.lit(change_name).alias("change_name"),
        F.lit(change_desc).alias("change_desc"),
        F.lit(fn).alias("fn"),
        F.lit("usnvc_source").alias("source"),
        F.lit("document_emitted").alias("result"),
    )


def _envelope_line():
    """The JSONL envelope expression shared by both sinks:
    ``{"source_data": <raw doc json>, "row_id": <escaped>}``. row_id
    is escaped via to_json (a quote/backslash/newline in an id would
    otherwise corrupt the line); source_data is already-serialized
    JSON and is spliced in raw."""
    rid = F.to_json(F.struct(F.col("row_id")))  # {"row_id":"<escaped>"}
    return F.concat(
        F.lit('{"source_data": '),
        F.col("source_data"),
        F.lit(', '),
        rid.substr(F.lit(2), F.length(rid) - F.lit(2)),
        F.lit('}'),
    )


def observed_write(
    docs: DataFrame,
    out_dir: str,
    observation_name: str = "doc_metrics",
) -> dict[str, int]:
    """Sink with ``Observation`` metrics: document count, null-id
    count and total payload bytes are collected during the SAME
    action as the write — no second pass over the data (the idiomatic
    Spark alternative to foreach-accumulator counting, which costs an
    extra action)."""
    from pyspark.sql import Observation

    obs = Observation(observation_name)
    line = _envelope_line()
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("row_id").isNull(), 1).otherwise(0)).alias("n_null_ids"),
        F.sum(F.length("source_data")).alias("payload_bytes"),
    )
    # the write_documents `ok` contract applies HERE too (review
    # finding): a null row_id serializes to '{}' whose trimmed body is
    # '' — the written line '{"source_data": ..., }' is invalid JSON —
    # and a null source_data nulls the whole concat. The metrics still
    # count the rejected rows (n_null_ids vs n_docs tells the caller
    # how many were dropped).
    ok = (
        F.col("row_id").isNotNull()
        & F.col("source_data").isNotNull()
        & (F.col("source_data") != "")
    )
    observed.filter(ok).select(line.alias("value")).write.mode("overwrite").text(out_dir)
    # sum() over zero rows is NULL: an empty (but successful) write
    # must report zeros, not raise int(None)
    return {k: int(v or 0) for k, v in obs.get.items()}


def write_documents(
    docs: DataFrame,
    out_dir: str,
    quarantine_dir: str | None = None,
    ledger: ChangeLedger | None = None,
) -> None:
    """Validated envelope sink: ``{"source_data": <doc>, "row_id": <id>}``
    one JSON object per line. Rows failing the envelope contract
    (null/empty id or doc) go to the quarantine path instead of
    failing the job — the scalable version of the reference harness's
    per-row schema rejection."""
    ok = F.col("row_id").isNotNull() & F.col("source_data").isNotNull() & (F.col("source_data") != "")
    line = _envelope_line()
    valid = docs.filter(ok)
    if ledger is not None:
        # counted via observe() DURING the write action — a foreach
        # here would re-execute the entire document-assembly plan as a
        # second action, and would report rows even if the write then
        # failed
        from pyspark.sql import Observation

        obs = Observation("write_documents_count")
        valid = valid.observe(obs, F.count(F.lit(1)).alias("n"))
    valid.select(line.alias("value")).write.mode("overwrite").text(out_dir)
    if ledger is not None:
        ledger.counter("documents_written").add(int(obs.get["n"] or 0))
    if quarantine_dir is not None:
        docs.filter(~ok).select(
            F.coalesce(F.col("row_id"), F.lit("<null>")).alias("row_id"),
            F.coalesce(F.col("source_data"), F.lit("")).alias("source_data"),
        ).write.mode("overwrite").json(quarantine_dir)

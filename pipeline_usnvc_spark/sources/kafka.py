"""Kafka source wiring for the streaming plans.

The streaming surface (streaming/pipeline.py) is written against the
file source locally; at scale the same plans point at Kafka. This
module is that config surface, split so everything except the broker
connection is unit-testable in this sandbox (ROADMAP / VERDICT r1
item 7):

  resolve_kafka_options  — pure: assembles/validates the option map
      the reader gets (subscribe vs subscribePattern vs assign are
      mutually exclusive; offsets literal validated; per-partition
      rate limit surfaced for 100 TB/day backpressure).
  decode_kafka_envelope  — the Kafka wire schema (key/value binary +
      topic/partition/offset/timestamp) → typed event columns via
      from_json. Pure column expressions, testable on a batch frame
      with the same schema — the stream and a replay batch share it.
  read_kafka_stream      — the two glued to readStream (needs a
      broker + the kafka connector jar; config-only by design).

Exactly-once story: Kafka offsets ride the checkpoint, the sink is
``idempotent_foreach_batch`` — same contract as the file source.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Fixed output schema of Spark's Kafka source (public contract).
KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset bigint, "
    "timestamp timestamp, timestampType int"
)

_SUBSCRIPTION_KEYS = ("subscribe", "subscribePattern", "assign")


def resolve_kafka_options(
    bootstrap_servers: str,
    topic: str | None = None,
    topic_pattern: str | None = None,
    assign: dict[str, list[int]] | None = None,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
    max_offsets_per_trigger: int | None = None,
    extra_options: dict[str, str] | None = None,
) -> dict[str, str]:
    """Assemble the option map for ``format("kafka")``.

    Exactly one subscription mode must be given. ``starting_offsets``
    accepts the literals ``earliest``/``latest`` or a JSON offset map.
    ``max_offsets_per_trigger`` is the per-trigger rate cap — the
    backpressure knob that keeps micro-batches bounded when the
    stream falls behind (restart after an outage would otherwise pull
    the whole backlog into one batch).
    """
    modes = [
        ("subscribe", topic),
        ("subscribePattern", topic_pattern),
        ("assign", json.dumps(assign) if assign else None),
    ]
    given = [(k, v) for k, v in modes if v]
    if len(given) != 1:
        raise ValueError(
            f"exactly one of topic/topic_pattern/assign required, got {len(given)}"
        )
    if starting_offsets not in ("earliest", "latest"):
        try:
            json.loads(starting_offsets)
        except json.JSONDecodeError as exc:
            raise ValueError(
                f"starting_offsets must be earliest/latest or a JSON offset map: {starting_offsets!r}"
            ) from exc
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        given[0][0]: given[0][1],
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    for k, v in (extra_options or {}).items():
        if k in opts or k in _SUBSCRIPTION_KEYS:
            raise ValueError(f"extra option {k!r} collides with a resolved option")
        opts[k] = v
    return opts


def decode_kafka_envelope(raw: DataFrame, value_schema: str) -> DataFrame:
    """Kafka wire rows → typed event rows.

    ``value`` is JSON-decoded against ``value_schema`` (a DDL string);
    undecodable payloads surface as a ``_corrupt`` flag instead of
    vanishing — same ``columnNameOfCorruptRecord`` discipline as
    sources/jsonl.py (PERMISSIVE from_json yields an all-null struct
    for junk, so a null-check would lie; the corrupt-record column is
    the reliable signal). Kafka metadata (topic/partition/offset) is
    kept — offset is the natural dedup/idempotency key downstream.
    Pure column expressions: the same function decodes the live
    stream and a replayed batch dump.
    """
    # Fail fast on payload fields that would defeat the kafka_ prefix
    # or the corrupt-record channel (review finding: a payload field
    # literally named kafka_topic still produced a duplicate-name
    # frame, and one named _corrupt_record duplicated the parse-schema
    # field — both break every downstream reference).
    from pyspark.sql.types import StructType

    reserved = {
        "_corrupt", "_corrupt_record",
        "kafka_topic", "kafka_partition", "kafka_offset", "kafka_ts",
    }
    payload_fields = {f.name for f in StructType.fromDDL(value_schema).fields}
    clash = sorted(payload_fields & reserved)
    if clash:
        raise ValueError(
            f"value_schema fields {clash} collide with the decoder's "
            "reserved metadata/corrupt columns — rename them in the schema"
        )
    parse_schema = value_schema + ", _corrupt_record string"
    parsed = F.from_json(
        F.col("value").cast("string"),
        parse_schema,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
    )
    # Kafka metadata rides under a kafka_ prefix so a payload field
    # named "topic"/"partition"/"offset" can never collide with it
    # (duplicate-name frames break every downstream reference).
    return raw.select(
        parsed.dropFields("_corrupt_record").alias("event"),
        (F.col("value").isNotNull() & parsed["_corrupt_record"].isNotNull()).alias(
            "_corrupt"
        ),
        F.col("topic").alias("kafka_topic"),
        F.col("partition").alias("kafka_partition"),
        F.col("offset").alias("kafka_offset"),
        F.col("timestamp").alias("kafka_ts"),
    ).select(
        "event.*", "_corrupt", "kafka_topic", "kafka_partition",
        "kafka_offset", "kafka_ts",
    )


def read_kafka_stream(
    spark: SparkSession,
    value_schema: str,
    **resolve_kwargs,
) -> DataFrame:
    """readStream.format("kafka") with resolved options, decoded to
    typed rows. Requires a broker and the spark-sql-kafka connector
    on the classpath — config-only in this sandbox; the resolved
    options and the decode path are unit-tested without it."""
    opts = resolve_kafka_options(**resolve_kwargs)
    raw = spark.readStream.format("kafka").options(**opts).load()
    return decode_kafka_envelope(raw, value_schema)

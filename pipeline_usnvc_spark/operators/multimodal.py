"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed in Arrow batches.

The decode step itself is STUBBED (no image/audio libraries in this
container — ``_decode_stub`` produces a deterministic fake pixel
buffer from the bytes); everything around it is real and tested: the
schema contract (binary payload + metadata struct), the
``mapInPandas`` batch shape (Arrow columnar in/out, one pass, no
row-at-a-time Python), and the partitioning story (binary blobs
never shuffle for feature extraction — the UDF is map-side).

Swap ``_decode_stub`` for PIL/ffmpeg decode on a real cluster; the
Spark-side plumbing is unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Output schema of the feature extractor: fixed-width feature vector +
# dimensions, keyed by the source id.
FEATURES_SCHEMA = (
    "doc_id bigint, width int, height int, n_bytes bigint, features array<float>"
)


def synthesize_binary_column(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media payload: the utf-8 bytes of the text
    column stand in for an encoded image, plus a metadata struct of
    the kind a real ingest would carry (mime, dims, byte length)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.withColumn("media", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("image/fake").alias("mime"),
            (F.length(payload) % 64 + 1).cast("int").alias("width"),
            (F.length(payload) % 48 + 1).cast("int").alias("height"),
            F.length(payload).cast("bigint").alias("n_bytes"),
        ),
    )


def _decode_stub(buf: bytes, width: int, height: int) -> list[float]:
    """Stand-in for image decode + feature extraction: a 16-bin byte
    histogram normalized by length. Deterministic, shape-stable.
    Replace with a real decoder (PIL → resize → embed) in production;
    raise NotImplementedError here if accidental real-media input
    must be caught."""
    if not buf:
        return [0.0] * 16
    hist = [0] * 16
    for b in buf:
        hist[b >> 4] += 1
    n = float(len(buf))
    return [h / n for h in hist]


def extract_features(docs_with_media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column via
    mapInPandas: one python worker pass per partition, vectorized
    columns in/out, no shuffle (map-side only)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_stub(buf, w, h)
                for buf, w, h in zip(
                    pdf["media"], pdf["media_meta_width"], pdf["media_meta_height"]
                )
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["media_meta_width"],
                    "height": pdf["media_meta_height"],
                    "n_bytes": pdf["media_meta_n_bytes"],
                    "features": feats,
                }
            )

    flat = docs_with_media.select(
        "doc_id",
        "media",
        F.col("media_meta.width").alias("media_meta_width"),
        F.col("media_meta.height").alias("media_meta_height"),
        F.col("media_meta.n_bytes").alias("media_meta_n_bytes"),
    )
    return flat.mapInPandas(batches, schema=FEATURES_SCHEMA)

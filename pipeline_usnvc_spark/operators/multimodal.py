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
# dimensions, keyed by the source id. ``feature_kind`` names the
# extractor that produced the vector so downstream consumers (and the
# q70 result itself) can never mistake stub features for real ones.
FEATURES_SCHEMA = (
    "doc_id bigint, width int, height int, n_bytes bigint, "
    "feature_kind string, features array<float>"
)

# The ONLY extractor available in this container (no media libraries):
# a 16-bin byte histogram. A real deployment registers e.g.
# 'pil_resnet_embed' here and swaps _decode_stub.
STUB_FEATURE_KIND = "stub_byte_histogram"


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
    columns in/out, no shuffle (map-side only).

    Every output row carries ``feature_kind = 'stub_byte_histogram'``
    — the decode step is a STUB in this container (see module
    docstring); the column is the contract that keeps stub vectors
    from masquerading as real embeddings downstream.

    Metadata contract (enforced per batch, job fails fast on breach —
    a malformed ingest must quarantine upstream, not produce garbage
    features): width/height positive, n_bytes == len(media), media
    non-null whenever metadata is present.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            w = pdf["media_meta_width"]
            h = pdf["media_meta_height"]
            nb = pdf["media_meta_n_bytes"]
            if w.isna().any() or h.isna().any() or (w <= 0).any() or (h <= 0).any():
                bad = pdf.loc[w.isna() | h.isna() | (w <= 0) | (h <= 0), "doc_id"]
                raise ValueError(
                    f"multimodal metadata breach: non-positive/null dims for doc_ids {bad.tolist()[:5]}"
                )
            actual = pdf["media"].map(lambda b: -1 if b is None else len(b))
            if (actual != nb).any():
                bad = pdf.loc[actual != nb, "doc_id"]
                raise ValueError(
                    f"multimodal metadata breach: n_bytes != len(media) for doc_ids {bad.tolist()[:5]}"
                )
            feats = [
                _decode_stub(buf, wi, hi)
                for buf, wi, hi in zip(pdf["media"], w, h)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w,
                    "height": h,
                    "n_bytes": nb,
                    "feature_kind": STUB_FEATURE_KIND,
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

"""Incremental view maintenance: a streaming-upserted latest-state
materialized view over a keyed change stream.

The reference's pipeline recomputes everything per run (usnvc.py:71
re-ingests per row); the streaming-native form is a MERGE: each
micro-batch upserts into a materialized "latest row per key" view.
Spark has no built-in MERGE sink without a lakehouse table format, so
this module implements the standard ``foreachBatch`` upsert pattern
against a bucketed, versioned parquet layout:

  base/
    epoch=3/bucket=5/part-*.parquet   (bucket 5's state, written at epoch 3)
    _MANIFEST.json                    (bucket -> "epoch=3", atomic pointer)

- **Bucketed partial rewrite.** Keys hash into ``n_buckets`` buckets
  (``pmod(xxhash64(key), n)``). An epoch only rewrites the buckets its
  batch touches — at 100 TB with thousands of buckets, a micro-batch
  touching 1% of key-space rewrites 1% of the state, not all of it.
  (A lakehouse format does the same at file granularity; the manifest
  here is the same idea at bucket granularity with zero deps.)
- **Atomic publish.** State becomes visible by atomically replacing
  ``_MANIFEST.json`` (write-temp + rename). Readers resolve the
  manifest, then read each bucket's pinned epoch directory — a crash
  mid-epoch leaves the previous manifest (and therefore the previous
  consistent view) intact.
- **Deterministic merge.** Latest row per key = row_number over
  (seq desc, tiebreak desc) — same argmax the batch recompute uses,
  so streaming state equals the batch answer exactly (asserted in
  tests/test_streaming.py).
"""

from __future__ import annotations

import json
import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_MANIFEST = "_MANIFEST.json"
_BUCKET = "__bucket"


class LatestStateStore:
    """Materialized 'latest row per key' view, upserted per micro-batch.

    ``seq_cols`` defines recency (e.g. ``["ts", "event_id"]``): the row
    with the lexicographically greatest sequence wins per key.
    """

    def __init__(
        self,
        base_dir: str,
        key_col: str,
        seq_cols: Sequence[str],
        n_buckets: int = 16,
    ) -> None:
        self.base_dir = base_dir
        self.key_col = key_col
        self.seq_cols = list(seq_cols)
        self.n_buckets = n_buckets
        os.makedirs(base_dir, exist_ok=True)

    # -- manifest -----------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.base_dir, _MANIFEST)

    def _load_manifest(self) -> dict[str, str]:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def _publish_manifest(self, manifest: dict[str, str]) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, sort_keys=True)
        os.replace(tmp, self._manifest_path())  # atomic on POSIX

    # -- read ---------------------------------------------------------
    def read_state(self, spark: SparkSession) -> DataFrame | None:
        """The current consistent view (None before the first epoch)."""
        manifest = self._load_manifest()
        if not manifest:
            return None
        # Leaf dirs are read directly (no basePath): partition columns
        # are not re-materialized, so the view schema is exactly the
        # upserted row schema.
        paths = [
            os.path.join(self.base_dir, epoch, f"bucket={b}")
            for b, epoch in manifest.items()
        ]
        return spark.read.parquet(*paths)

    # -- write --------------------------------------------------------
    def _latest_per_key(self, df: DataFrame) -> DataFrame:
        # Delegates to batch_latest_state: the module's correctness
        # claim is that stream state EQUALS the batch recompute, so
        # there must be exactly one copy of the argmax to keep right.
        return batch_latest_state(df, self.key_col, self.seq_cols)

    def upsert(self, batch_df: DataFrame, epoch_id: int) -> None:
        """Merge one micro-batch: rewrite only the touched buckets.

        Idempotent under foreachBatch's at-least-once replay: the
        merged view is localCheckpointed BEFORE the write (so
        overwriting an epoch dir the merge READ from — a replayed
        epoch — cannot delete its own inputs), and the write uses
        DYNAMIC partition overwrite (so an epoch-id collision, e.g. a
        fresh-checkpoint restart at epoch 0, replaces only the
        touched bucket subdirs instead of wiping buckets the manifest
        still pins to that epoch dir)."""
        spark = batch_df.sparkSession
        bucket = F.pmod(F.xxhash64(F.col(self.key_col)), F.lit(self.n_buckets)).cast("int")
        # One materialization serves both the touched-bucket probe and
        # the merge below — without it the upstream batch plan runs
        # twice per epoch.
        batch = batch_df.withColumn(_BUCKET, bucket).localCheckpoint()
        # bounded: <= n_buckets distinct bucket ids
        touched = sorted(
            r[_BUCKET] for r in batch.select(_BUCKET).distinct().collect()
        )
        if not touched:
            return
        manifest = self._load_manifest()
        old_paths = [
            os.path.join(self.base_dir, manifest[str(b)], f"bucket={b}")
            for b in touched
            if str(b) in manifest
        ]
        if old_paths:
            # Old bucket state carries no partition column (leaf read);
            # the bucket is a pure function of the key, recomputed below.
            old = spark.read.parquet(*old_paths).withColumn(_BUCKET, bucket)
            merged = old.unionByName(batch)
        else:
            merged = batch
        latest = (
            self._latest_per_key(merged)
            .withColumnRenamed(_BUCKET, "bucket")
            # cut lineage to the old epoch dirs before overwriting them
            .localCheckpoint()
        )
        epoch_dir = f"epoch={epoch_id}"
        (
            latest.repartition("bucket")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(os.path.join(self.base_dir, epoch_dir))
        )
        for b in touched:
            manifest[str(b)] = epoch_dir
        self._publish_manifest(manifest)
        self._vacuum(manifest)

    def _vacuum(self, manifest: dict[str, str]) -> None:
        """Delete epoch directories no manifest entry references —
        without this a long-running stream accumulates one dead copy
        of every hot bucket per epoch, unbounded state growth for a
        constant-size live view."""
        import shutil

        live = set(manifest.values())
        for name in os.listdir(self.base_dir):
            if name.startswith("epoch=") and name not in live:
                shutil.rmtree(os.path.join(self.base_dir, name), ignore_errors=True)

    # -- streaming wiring ---------------------------------------------
    def sink(self, stream_df: DataFrame):
        """``writeStream`` handle whose foreachBatch maintains the view."""
        return stream_df.writeStream.foreachBatch(
            lambda df, eid: self.upsert(df, eid)
        ).trigger(availableNow=True)


def batch_latest_state(df: DataFrame, key_col: str, seq_cols: Sequence[str]) -> DataFrame:
    """The batch recompute the incremental view must equal."""
    w = Window.partitionBy(key_col).orderBy(*[F.desc(c) for c in seq_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

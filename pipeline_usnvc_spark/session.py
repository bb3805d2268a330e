"""SparkSession factory.

One place to configure the engine. Local defaults are tuned for the
test harness (local[N], AQE on, Arrow on, UTC); at cluster scale the
same builder applies — only master/memory/shuffle-partition sizing
change, via arguments or spark-submit conf.

Scale posture (100 TB notes):
  - AQE enabled: runtime coalescing, skew-join splitting, dynamic
    broadcast decisions replace hand-tuned shuffle counts.
  - ``spark.sql.shuffle.partitions`` defaults to cores locally; on a
    cluster set ~2-3x total cores (AQE coalesces the excess).
  - Session timezone pinned UTC so timestamp semantics are stable
    across engines (and match the DuckDB correctness oracle).
  - Arrow on: every pandas interchange (mapInPandas/applyInPandas
    operators, toPandas in tests) uses columnar batches.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pipeline_usnvc_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Defaults honor the harness env vars ``SPARK_GRAFT_CPUS`` (local
    parallelism) when ``master`` is not given.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Shuffle-file consolidation path. Both shuffle writers merge
        # their per-reducer spill/partition files with NIO
        # transferTo/mmap by default; on this virtualized 32-vCPU box
        # the mmap/munmap cycle triggers TLB-shootdown storms that
        # serialize every concurrent merge (thread dumps show tasks
        # parked in copyFileStreamNIO/munmap; q56 21.3 s -> 4.4 s with
        # the buffered-copy path, measured r13). Plain buffered copy
        # is within noise of transferTo on real disks, so the safe
        # default here is off; flip via env on hosts where zero-copy
        # is known good.
        .config(
            "spark.file.transferTo",
            os.environ.get("SPARK_GRAFT_TRANSFERTO", "false"),
        )
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Reliable-checkpoint opt-in for iterative operators (see
    # operators/checkpoint.py): point at HDFS/S3 on a cluster so
    # fixpoint loops survive executor loss; unset = localCheckpoint.
    ckpt_dir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if ckpt_dir and not spark.sparkContext.getCheckpointDir():
        spark.sparkContext.setCheckpointDir(ckpt_dir)
    return spark

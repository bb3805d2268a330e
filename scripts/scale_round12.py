#!/usr/bin/env python
"""Round-12 head-to-head: shuffled vs bucketed MERGE-ledger
compaction at 1x/10x/100x (VERDICT r11 item 4).

The r11 stress showed q427's entire cost at 100x is the fp-grain
digest shuffle (43.2 s on the 5M-doc ledger). This measures the
persisted-layout alternative three ways:

  - q427 (shuffled): fold the raw op log, paying the fp exchange
    every time;
  - q431 write+fold: build the fingerprint-bucketed table AND fold
    it (what a first maintenance cycle pays);
  - bucketed fold-only: re-fold the EXISTING bucketed table (the
    recurring cost — a maintenance log is written once and folded
    every cycle; this is the number the bucketing buys).

Outputs are asserted identical between the shuffled and bucketed
paths at every multiplier. Protocol: warm local[32], min-of-2,
noop sink (same as scripts/scale_round10*.py).

    python scripts/scale_round12.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
os.chdir(REPO)
sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.1"


def snapshot_diff_fold(oplog):
    """q428's snapshot-isolation diff fold (inlined so the head-to-head
    can feed it either the raw or the bucketed op log)."""
    from pyspark.sql import functions as F

    per_key = oplog.groupBy("fp").agg(
        F.min("doc_id").alias("canonical"),
        F.min(F.when(F.col("batch") <= 1, F.col("doc_id"))).alias("canonical_v1"),
        F.count("*").cast("bigint").alias("n_docs"),
    )
    status = (
        F.when(F.col("canonical_v1").isNull(), F.lit("added"))
        .when(F.col("canonical") != F.col("canonical_v1"), F.lit("repointed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        per_key.select(status.alias("status"), "n_docs")
        .groupBy("status")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("n_docs").cast("bigint").alias("n_docs"),
        )
        .orderBy("status")
    )


def main() -> None:
    from pyspark.sql import functions as F

    from pipeline_usnvc_spark.plans import QUERIES
    from pipeline_usnvc_spark.plans.round11_queries import (
        _ledger_oplog,
        compaction_summary,
    )
    from pipeline_usnvc_spark.session import get_spark
    from pipeline_usnvc_spark.sources.tables import load_table

    spark = get_spark(
        app_name="scale_round12",
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql(
        "CREATE DATABASE IF NOT EXISTS bucketed_demo "
        "LOCATION '/tmp/pipeline_usnvc_spark_bucketed_demo_db'"
    )

    base = Path("/tmp/scale_r12")
    shutil.rmtree(base, ignore_errors=True)

    def replicate(mult: int) -> str:
        # id-shifted self-union (the r11 ledger-stress shape): shifts
        # re-scatter the %7/%21 plant classes and the %4 batches, so
        # the ledger stays a real multi-batch MERGE log at scale
        out = base / f"x{mult}"
        out.mkdir(parents=True)
        d = load_table(spark, SF, "documents")
        d_n = d
        for i in range(1, mult):
            d_n = d_n.unionByName(
                d.withColumn("doc_id", F.col("doc_id") + F.lit(i * 100_000_000))
            )
        d_n.repartition(64).write.mode("overwrite").parquet(
            str(out / "documents.parquet")
        )
        return str(out)

    def timed(build, runs: int = 2) -> float:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    app = spark.sparkContext.applicationId.replace("-", "_")
    for mult in (1, 10, 100):
        sf_dir = SF if mult == 1 else replicate(mult)
        t_shuffled = timed(lambda: QUERIES["q427_merge_ledger_compaction"](spark, sf_dir))

        # bucketed build (timed once — the write is paid once per log)
        name = f"bucketed_demo.scale_r12_x{mult}_{app}"
        loc = f"/tmp/scale_r12_tbl_x{mult}_{app}"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(loc, ignore_errors=True)
        t0 = time.perf_counter()
        (
            _ledger_oplog(spark, sf_dir)
            .repartition(8, "fp")
            .write.bucketBy(8, "fp")
            .sortBy("fp")
            .option("path", loc)
            .mode("overwrite")
            .saveAsTable(name)
        )
        t_write = time.perf_counter() - t0
        t_fold = timed(
            lambda: compaction_summary(spark.table(name), materialize_fold=False)
        )
        t_diff_shuffled = timed(
            lambda: snapshot_diff_fold(_ledger_oplog(spark, sf_dir))
        )
        t_diff_bkt = timed(lambda: snapshot_diff_fold(spark.table(name)))
        da = sorted(map(tuple, snapshot_diff_fold(_ledger_oplog(spark, sf_dir)).collect()))
        db = sorted(map(tuple, snapshot_diff_fold(spark.table(name)).collect()))
        assert da == db, f"bucketed diff diverged at x{mult}"

        a = sorted(map(tuple, QUERIES["q427_merge_ledger_compaction"](spark, sf_dir).collect()))
        b = sorted(map(tuple, compaction_summary(spark.table(name), materialize_fold=False).collect()))
        assert a == b, f"bucketed path diverged at x{mult}"

        n_log = spark.table(name).count()
        print(
            f"x{mult}: ledger {n_log} rows | shuffled fold {t_shuffled:.2f}s"
            f" | bucketed write {t_write:.2f}s + fold {t_fold:.2f}s"
            f" | fold speedup {t_shuffled / t_fold:.1f}x"
            f" | diff shuffled {t_diff_shuffled:.2f}s vs bucketed"
            f" {t_diff_bkt:.2f}s ({t_diff_shuffled / t_diff_bkt:.1f}x)"
        )
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(loc, ignore_errors=True)

    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
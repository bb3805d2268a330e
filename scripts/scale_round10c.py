#!/usr/bin/env python
"""Round-10 continuation 10x self-union cost curves
(measure-don't-assert): q421 randomization Mann-Whitney (documents —
the value-spine + K-way explode claim) and q422 incremental
re-cluster advisor (orders — three range exchanges, block-grain
everything after). Same protocol as scripts/scale_round10b.py
(warm local[32], min-of-2, noop sink).

    python scripts/scale_round10c.py
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
MULT = 10


def main() -> None:
    from pyspark.sql import functions as F

    from pipeline_usnvc_spark.plans import QUERIES
    from pipeline_usnvc_spark.session import get_spark
    from pipeline_usnvc_spark.sources.tables import load_table

    spark = get_spark(
        app_name="scale_round10c",
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = Path("/tmp/scale_r10c")
    big = base / "x10"
    shutil.rmtree(base, ignore_errors=True)
    big.mkdir(parents=True)

    o = load_table(spark, SF, "orders")
    o_n = o
    for i in range(1, MULT):
        o_n = o_n.unionByName(
            o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * 10_000_000))
        )
    o_n.repartition(64).write.mode("overwrite").parquet(str(big / "orders.parquet"))

    d = load_table(spark, SF, "documents")
    d_n = d
    for i in range(1, MULT):
        d_n = d_n.unionByName(
            d.withColumn("doc_id", F.col("doc_id") + F.lit(i * 100_000_000))
        )
    d_n.repartition(64).write.mode("overwrite").parquet(str(big / "documents.parquet"))

    def run(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        return best

    for name in ("q421_mannwhitney_randomization", "q422_recluster_advisor"):
        b = run(name, SF)
        s10 = run(name, str(big))
        print(f"{name}: 1x {b:.2f}s [10x {s10:.2f}s = {s10 / b:.1f}x]")

    # the q421 spine claim, measured: a self-union multiplies rows but
    # leaves the n_chars DOMAIN fixed, so the rank spine must not grow
    for label, dd in (("1x", SF), ("10x", str(big))):
        n = (
            load_table(spark, dd, "documents")
            .select("n_chars")
            .distinct()
            .count()
        )
        print(f"q421 length-spine rows @ {label}: {n}")

    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Round-10 second-batch 10x self-union cost curves
(measure-don't-assert): q416 deletion staleness + q417 manifest
cascade (orders), q418 range-boundary planner (events — a self-union
multiplies counts but leaves the cent-value DOMAIN fixed, so the
value-grain spine claim is directly testable). Same protocol as
scripts/scale_round10.py (warm local[32], min-of-2, noop sink).

    python scripts/scale_round10b.py
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
        app_name="scale_round10b",
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = Path("/tmp/scale_r10b")
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

    ev = load_table(spark, SF, "events")
    ev_n = ev
    for i in range(1, MULT):
        ev_n = ev_n.unionByName(
            ev.withColumn("event_id", F.col("event_id") + F.lit(i * 100_000_000))
        )
    ev_n.repartition(64).write.mode("overwrite").parquet(str(big / "events.parquet"))

    def run(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        return best

    for name in (
        "q416_deletion_staleness_audit",
        "q417_manifest_cascade_pruning",
        "q418_range_boundary_plan",
        "q419_layout_advisor",
    ):
        b = run(name, SF)
        s10 = run(name, str(big))
        print(f"{name}: 1x {b:.2f}s [10x {s10:.2f}s = {s10 / b:.1f}x]")

    # the q418 spine claim, measured: distinct cent values at 1x vs 10x
    for label, d in (("1x", SF), ("10x", str(big))):
        n = (
            load_table(spark, d, "events")
            .filter(F.col("value").isNotNull())
            .select(F.floor(F.col("value") * 100).cast("bigint").alias("vc"))
            .distinct()
            .count()
        )
        print(f"q418 value-spine rows @ {label}: {n}")

    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()

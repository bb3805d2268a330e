#!/usr/bin/env python
"""Round-9 SCALE measurement (VERDICT r08 item 4): 10x self-union cost
curves for the round-8 queries whose plans ride a data-side
distribution — q397 term burstiness (vocab-grain TakeOrdered), q398
audience Jaccard (per-user pair expansion), q400 Bloom audit
(bit-domain join), q386 log-rank (day x group spine) — mirroring the
r06/r07 protocol (warm local[32], min-of-2, noop sink). q398 also
gets the 4x events-per-user DENSIFICATION axis (same user ids, jittered
timestamps), the axis its pair expansion is actually quadratic in
(q321's lesson).

    python scripts/scale_round8.py
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
DENSE = 4


def main() -> None:
    from pyspark.sql import functions as F

    from pipeline_usnvc_spark.plans import QUERIES
    from pipeline_usnvc_spark.session import get_spark
    from pipeline_usnvc_spark.sources.tables import load_table

    spark = get_spark(
        app_name="scale_round8",
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = Path("/tmp/scale_r8")
    big = base / "x10"
    dense = base / "dense4"
    shutil.rmtree(base, ignore_errors=True)
    big.mkdir(parents=True)
    dense.mkdir(parents=True)

    ev = load_table(spark, SF, "events")
    ev_n = ev
    for i in range(1, MULT):
        # user-id remap: 10x USERS at constant per-user density (the
        # row-scale axis); parity-preserving offset keeps q386 cohorts
        ev_n = ev_n.unionByName(
            ev.withColumn("user_id", F.col("user_id") + F.lit(i * 10_000_000))
        )
    ev_n.repartition(64).write.mode("overwrite").parquet(str(big / "events.parquet"))

    ev_d = ev
    for i in range(1, DENSE):
        # SAME user ids, jittered ts: 4x events-per-user density — the
        # axis q398's per-user pair expansion is quadratic in
        ev_d = ev_d.unionByName(
            ev.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i} SECOND"))
        )
    ev_d.repartition(64).write.mode("overwrite").parquet(str(dense / "events.parquet"))

    docs = load_table(spark, SF, "documents")
    docs_n = docs
    for i in range(1, MULT):
        docs_n = docs_n.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 100_000))
        )
    docs_n.repartition(64).write.mode("overwrite").parquet(
        str(big / "documents.parquet")
    )

    def run(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        return best

    for name, axes in (
        ("q397_term_burstiness", [("1x", SF), (f"{MULT}x docs", str(big))]),
        ("q398_audience_jaccard", [("1x", SF), (f"{MULT}x users", str(big)),
                                   (f"{DENSE}x density", str(dense))]),
        ("q400_bloom_filter_audit", [("1x", SF), (f"{MULT}x users", str(big))]),
        ("q386_logrank_test", [("1x", SF), (f"{MULT}x users", str(big))]),
    ):
        results = []
        for label, d in axes:
            sec = run(name, d)
            results.append(f"{label} {sec:.2f}s")
        base_sec = float(results[0].split()[1][:-1])
        ratios = " ".join(
            f"[{r} = {float(r.split()[-1][:-1]) / base_sec:.1f}x]"
            for r in results[1:]
        )
        print(f"{name}: {results[0]} {ratios}")

    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()

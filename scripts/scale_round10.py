#!/usr/bin/env python
"""Round-10 family 10x self-union cost curves (measure-don't-assert):
q410 capped episodes (events — BOTH axes: 10x users and the 4x
per-user density axis that blew q321 up x145, measured head-to-head
against q321 on the same densified frame), q411 zone maps + q413 RLE
runs (orders), q412 compaction plan (documents) — the r06-r09
protocol (warm local[32], min-of-2, noop sink).

    python scripts/scale_round10.py
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
        app_name="scale_round10",
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = Path("/tmp/scale_r10")
    big = base / "x10"
    dense = base / "dense4"
    shutil.rmtree(base, ignore_errors=True)
    big.mkdir(parents=True)
    dense.mkdir(parents=True)

    ev = load_table(spark, SF, "events")
    ev_n = ev
    for i in range(1, MULT):
        # user-id remap: 10x USERS at constant per-user density
        ev_n = ev_n.unionByName(
            ev.withColumn("user_id", F.col("user_id") + F.lit(i * 10_000_000))
        )
    ev_n.repartition(64).write.mode("overwrite").parquet(str(big / "events.parquet"))

    ev_d = ev
    for i in range(1, DENSE):
        # SAME user ids, jittered ts + remapped event_id (keeps the
        # per-user (t, event_id) total order tie-free): 4x
        # events-per-user density — the axis q321's band self-join is
        # quadratic in (x145 pair volume, SCALE.md round 6)
        ev_d = ev_d.unionByName(
            ev.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i} SECOND"))
            .withColumn("event_id", F.col("event_id") + F.lit(i * 100_000_000))
        )
    ev_d.repartition(64).write.mode("overwrite").parquet(str(dense / "events.parquet"))

    o = load_table(spark, SF, "orders")
    o_n = o
    for i in range(1, MULT):
        o_n = o_n.unionByName(
            o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * 10_000_000))
        )
    o_n.repartition(64).write.mode("overwrite").parquet(str(big / "orders.parquet"))

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

    def pair_volume(name: str, sf_dir: str, col: str) -> int:
        rows = QUERIES[name](spark, sf_dir).collect()
        return sum(r[col] for r in rows)

    # events family: both axes, plus the q321-vs-q410 head-to-head on
    # the densified frame (the whole point of the mitigation)
    for name in ("q410_capped_episode_mining",):
        b = run(name, SF)
        s10 = run(name, str(big))
        s4d = run(name, str(dense))
        print(
            f"{name}: 1x {b:.2f}s [10x users {s10:.2f}s = {s10 / b:.1f}x] "
            f"[4x density {s4d:.2f}s = {s4d / b:.1f}x]"
        )
    for sf_label, sf_dir in (("1x", SF), ("4x density", str(dense))):
        v321 = pair_volume("q321_episode_mining", sf_dir, "n_occurrences")
        v410 = pair_volume(
            "q410_capped_episode_mining", sf_dir, "n_occurrences_capped"
        )
        print(f"pair volume @ {sf_label}: q321 {v321} vs q410 capped {v410}")

    for name in ("q411_zonemap_skipping", "q413_rle_run_audit"):
        b = run(name, SF)
        s10 = run(name, str(big))
        print(f"{name}: 1x {b:.2f}s [10x {s10:.2f}s = {s10 / b:.1f}x]")

    b = run("q412_compaction_plan", SF)
    s10 = run("q412_compaction_plan", str(big))
    print(f"q412_compaction_plan: 1x {b:.2f}s [10x {s10:.2f}s = {s10 / b:.1f}x]")

    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()

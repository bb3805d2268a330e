#!/usr/bin/env python
"""Round-9 family 10x self-union cost curves (measure-don't-assert):
q405 banded Kendall (events), q406 permutation Shapley (events),
q407 windowed Theil-Sen (orders), q408 banded CvM (documents) —
the r06-r09 protocol (warm local[32], min-of-2, noop sink).

    python scripts/scale_round9.py
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
        app_name="scale_round9",
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")

    big = Path("/tmp/scale_r9/x10")
    shutil.rmtree(big.parent, ignore_errors=True)
    big.mkdir(parents=True)

    ev = load_table(spark, SF, "events")
    ev_n = ev
    for i in range(1, MULT):
        ev_n = ev_n.unionByName(
            ev.withColumn("user_id", F.col("user_id") + F.lit(i * 10_000_000))
        )
    ev_n.repartition(64).write.mode("overwrite").parquet(str(big / "events.parquet"))

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

    for name in (
        "q405_banded_kendall_tau",
        "q406_permutation_shapley",
        "q407_windowed_theil_sen",
        "q408_banded_cvm_reference",
    ):
        base = run(name, SF)
        scaled = run(name, str(big))
        print(f"{name}: 1x {base:.2f}s [10x {scaled:.2f}s = {scaled / base:.1f}x]")

    shutil.rmtree(big.parent, ignore_errors=True)


if __name__ == "__main__":
    main()

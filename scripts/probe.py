#!/usr/bin/env python
"""Isolated per-query timing probe (guide §1.4): run named queries
through the noop sink N times each in ONE bench-shaped session and
print every repeat, so A/B comparisons stay inside a single process
on this noisy host.

    python scripts/probe.py q206_prepare_corpus q56_dedup_pipeline [-n 3]
"""

from __future__ import annotations

import gc
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
os.chdir(REPO)
sys.path.insert(0, str(REPO))


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if "-n" in args:
        i = args.index("-n")
        n = int(args[i + 1])
        del args[i : i + 2]
    names = args

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from pipeline_usnvc_spark.session import get_spark
    from pipeline_usnvc_spark.plans import QUERIES

    spark = get_spark(
        app_name="probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) * 2,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("lineitem", "orders", "customer", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    for name in names:
        reps = []
        for i in range(n + 1):  # +1 warm-up, dropped
            gc.collect()
            spark.sparkContext.setJobDescription(f"probe:{name}#{i}")
            t0 = time.time()
            if name == "flagship_documents":
                from pipeline_usnvc_spark.plans.flagship import customer_documents

                df = customer_documents(spark, sf_dir)
            else:
                df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if i:
                reps.append(dt)
            spark.sparkContext.setJobDescription(None)
        reps_s = " ".join(f"{r:.2f}" for r in reps)
        med = sorted(reps)[len(reps) // 2]
        print(f"PROBE {name}: median {med:.2f}s  [{reps_s}]", flush=True)


if __name__ == "__main__":
    main()

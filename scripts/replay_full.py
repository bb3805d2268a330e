#!/usr/bin/env python
"""Round-close gate 1: full DEFAULT-HEAP sf0.1 vanilla-session replay
of the ENTIRE registry (the memory-shape gate that caught q282 in
round 6 — sf0.001/0.01 never cross the executor heap). Every
oracle-paired query is hash-compared against DuckDB; rows-only
queries execute under count() (in-plan assert_true contracts fire
under any consumption).

    python scripts/replay_full.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
os.chdir(REPO)
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main() -> None:
    from pyspark.sql import SparkSession

    from oracle_compare import assert_frames_match, run_oracle
    from pipeline_usnvc_spark.plans import ORACLES, QUERIES

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # vanilla + default heap ON PURPOSE: mirrors the driver's session
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    ok = bad = 0
    for name in QUERIES:
        try:
            if name in ORACLES:
                assert_frames_match(
                    QUERIES[name](spark, sf).toPandas(),
                    run_oracle(ORACLES[name], sf),
                    name,
                )
            else:
                assert QUERIES[name](spark, sf).count() >= 0
            ok += 1
        except Exception as ex:  # noqa: BLE001 — report and continue
            bad += 1
            print(f"FAIL {name}: {str(ex)[:500]}", flush=True)
    n_o = sum(1 for n in QUERIES if n in ORACLES)
    print(
        f"REPLAY {sf} default-heap: {ok} green / {bad} failed of "
        f"{len(QUERIES)} ({n_o} oracle-paired) in {time.time() - t0:.0f}s"
    )
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

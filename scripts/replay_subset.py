#!/usr/bin/env python
"""Targeted oracle replay: re-check a named subset of registry queries
against their DuckDB oracles (rows-only queries execute under count())
at one or more SF dirs. Used during optimization rounds to prove a
rewritten query still matches before the full-suite gate.

    python scripts/replay_subset.py q35_tfidf_topk q56_dedup_pipeline \
        [--sf /root/testdata/sf0.01 --sf /root/testdata/sf0.1]
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

    names: list[str] = []
    sfs: list[str] = []
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--sf":
            sfs.append(next(it))
        else:
            names.append(a)
    if not sfs:
        sfs = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for sf in sfs:
        for name in names:
            t0 = time.time()
            try:
                if name in ORACLES:
                    assert_frames_match(
                        QUERIES[name](spark, sf).toPandas(),
                        run_oracle(ORACLES[name], sf),
                        name,
                    )
                    tag = "oracle"
                else:
                    assert QUERIES[name](spark, sf).count() >= 0
                    tag = "rows-only"
                print(f"OK   {sf.rsplit('/',1)[-1]} {name} ({tag}) {time.time()-t0:.1f}s", flush=True)
            except Exception as ex:  # noqa: BLE001
                bad += 1
                print(f"FAIL {sf.rsplit('/',1)[-1]} {name}: {str(ex)[:400]}", flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Round-close gate 1: full DEFAULT-HEAP sf0.1 vanilla-session replay
of the ENTIRE registry (the memory-shape gate that caught q282 in
round 6 — sf0.001/0.01 never cross the executor heap). Every
oracle-paired query is hash-compared against DuckDB; rows-only
queries execute under count() (in-plan assert_true contracts fire
under any consumption).

THREADED by default (VERDICT r12 item 4): the serial replay idled
~60% of the round-close inner tier, while a local[32] session happily
schedules jobs from several submitter threads and every DuckDB oracle
runs on its own per-call connection (oracle_compare.run_oracle). Each
query still executes and reports individually — a failure names its
query exactly as before. Threads default to 6 (Spark driver-side plan
compilation is the shared bottleneck; beyond ~8 submitters it
contends on the analyzer lock for no wall-clock gain).

Concurrency caveat, handled below: 6 queries sharing one DEFAULT-HEAP
JVM can transiently exceed the execution-memory pool where each query
alone fits comfortably (observed twice in the first threaded run —
both rows re-ran green solo). A threaded failure therefore downgrades
to "suspect" and re-runs SERIALLY after the pool drains; only a
failure that reproduces alone is a real memory-shape regression and
fails the gate. The retry pass is printed so a flaky-under-contention
query is still visible in the log.

    python scripts/replay_full.py [sf_dir] [--threads N | --serial]
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
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import SparkSession

    from oracle_compare import assert_frames_match, run_oracle
    from pipeline_usnvc_spark.plans import ORACLES, QUERIES

    args = [a for a in sys.argv[1:]]
    threads = 6
    if "--serial" in args:
        threads = 1
        args.remove("--serial")
    if "--threads" in args:
        i = args.index("--threads")
        threads = int(args[i + 1])
        del args[i : i + 2]
    sf = args[0] if args else "/root/testdata/sf0.1"
    # vanilla + default heap ON PURPOSE: mirrors the driver's session
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()

    def check(name: str) -> tuple[str, str | None]:
        try:
            if name in ORACLES:
                assert_frames_match(
                    QUERIES[name](spark, sf).toPandas(),
                    run_oracle(ORACLES[name], sf),
                    name,
                )
            else:
                assert QUERIES[name](spark, sf).count() >= 0
            return name, None
        except Exception as ex:  # noqa: BLE001 — report and continue
            return name, str(ex)[:500]

    # Storage hygiene for the long-lived default-heap session:
    # localCheckpoint blocks are only unpersisted when the
    # ContextCleaner sees their py4j refs die, and Python's GC lags —
    # 400+ queries of retained checkpoint blocks squeezed the 1 GB
    # heap until q101's 10-round broadcast loop could no longer build
    # (observed: green in a fresh process, OOM at slot 406 of the
    # shared session). A periodic gc pass from THIS consumer thread
    # keeps the cleaner ahead of the leak; per-query collect()s from
    # all submitter threads at once instead crashed the JVM with
    # GCLocker contention against Arrow's JNI critical regions.
    import gc

    ok = done = 0
    suspects: list[tuple[str, str]] = []
    with ThreadPoolExecutor(max_workers=threads) as pool:
        for name, err in pool.map(check, QUERIES):
            done += 1
            if done % 25 == 0:
                gc.collect()
            if err is None:
                ok += 1
            else:
                suspects.append((name, err))

    # Serial retry: separates real failures from contention artifacts.
    bad = 0
    for name, first_err in suspects:
        if threads > 1:
            print(f"RETRY {name} (threaded: {first_err[:160]})", flush=True)
            _, err = check(name)
        else:
            err = first_err
        if err is None:
            ok += 1
            print(f"  -> green solo (contention artifact)", flush=True)
        else:
            bad += 1
            print(f"FAIL {name}: {err}", flush=True)

    n_o = sum(1 for n in QUERIES if n in ORACLES)
    print(
        f"REPLAY {sf} default-heap x{threads} threads: {ok} green / {bad} "
        f"failed of {len(QUERIES)} ({n_o} oracle-paired, "
        f"{len(suspects)} retried serially) in {time.time() - t0:.0f}s"
    )
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

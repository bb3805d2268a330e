#!/usr/bin/env python
"""Round-13 idle-box watch-list adjudication (VERDICT r12 item 6,
BASELINE.md pre-register): median-of-5 at sf0.1 for q53 / q99 / q191
/ q426, each with its spread, priors from BENCH_LOCAL_r12.json.
Bisect only on a tight-spread reproduction above
max(1.5, 1 + 3*spread) vs the prior local reading.

Also runs the PRE-REGISTERED q426 contract-cost decomposition: the
round-12 A/B attributed ~0.19 s of q426's reading to its executed
beta-envelope contract (an ADVICE-r11 ask working as designed); this
re-measures both arms (contract live vs contract_filter stubbed to
identity) so the r13 adjudication row carries fresh numbers.

    python scripts/watchlist_r13.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
os.chdir(REPO)
sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.1"
WATCH = (
    "q53_simhash",
    "q99_int_shingle_jaccard",
    "q191_ks_drift",
    "q426_block_decorrelate",
)


def main() -> None:
    import json

    from pipeline_usnvc_spark.plans import QUERIES
    from pipeline_usnvc_spark.session import get_spark

    prior = json.loads((REPO / "BENCH_LOCAL_r12.json").read_text())
    priors = {**prior.get("queries", {}), **prior.get("queries_extended", {})}

    spark = get_spark(
        app_name="watchlist_r13",
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> None:
        QUERIES[name](spark, SF).write.format("noop").mode("overwrite").save()

    def median5(name: str) -> tuple[float, float]:
        run(name)  # warm-up (codegen/JIT), discarded
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            run(name)
            samples.append(time.perf_counter() - t0)
        samples.sort()
        return samples[2], (samples[-1] - samples[0]) / samples[2]

    for name in WATCH:
        med, spread = median5(name)
        old = priors.get(name)
        ratio = med / old if old else float("nan")
        thresh = max(1.5, 1 + 3 * spread)
        flag = "REGRESSION" if old and ratio > thresh else "ok"
        print(
            f"{name}: median5 {med:.3f}s spread {spread:.2f}"
            f" | r12 local {old} | ratio {ratio:.2f} (thresh {thresh:.2f}) {flag}"
        )

    # q426 contract-cost A/B: stub contract_filter to identity and
    # re-measure — the delta is the price of the executed envelope
    # contract, not a plan regression.
    # q426 does `from ...contracts import contract_filter` at CALL
    # time, so patching the module attribute is sufficient
    import pipeline_usnvc_spark.operators.contracts as contracts

    live, live_spread = median5("q426_block_decorrelate")
    orig = contracts.contract_filter
    try:
        contracts.contract_filter = lambda df, cond, msg: df  # type: ignore[assignment]
        stubbed, stub_spread = median5("q426_block_decorrelate")
    finally:
        contracts.contract_filter = orig
    print(
        f"q426 contract A/B: live {live:.3f}s (spread {live_spread:.2f})"
        f" vs stubbed {stubbed:.3f}s (spread {stub_spread:.2f})"
        f" -> contract cost {live - stubbed:+.3f}s"
    )


if __name__ == "__main__":
    main()

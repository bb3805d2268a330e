#!/usr/bin/env python
"""Round-12 idle-box watch-list adjudication (BASELINE.md
pre-register): median-of-5 at sf0.1 for q53 / q99 / q410 / q421,
plus each row's spread — run on an otherwise-idle box and record the
row in BASELINE.md. Bisect only on a tight-spread reproduction above
max(1.5, 1 + 3*spread) vs the prior local reading.

    python scripts/watchlist_r12.py
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
# Watch-list query names; their priors are read from
# BENCH_LOCAL_r11.json at runtime (NOT pinned here).
WATCH = (
    "q53_simhash",
    "q99_int_shingle_jaccard",
    "q410_capped_episode_mining",
    "q421_mannwhitney_randomization",
)


def main() -> None:
    import json

    from pipeline_usnvc_spark.plans import QUERIES
    from pipeline_usnvc_spark.session import get_spark

    prior = json.loads((REPO / "BENCH_LOCAL_r11.json").read_text())
    priors = {**prior.get("queries", {}), **prior.get("queries_extended", {})}

    spark = get_spark(
        app_name="watchlist_r12",
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> None:
        QUERIES[name](spark, SF).write.format("noop").mode("overwrite").save()

    for name in WATCH:
        run(name)  # warm-up (codegen/JIT), discarded
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            run(name)
            samples.append(time.perf_counter() - t0)
        samples.sort()
        med = samples[2]
        spread = (samples[-1] - samples[0]) / med
        old = priors.get(name)
        ratio = med / old if old else float("nan")
        thresh = max(1.5, 1 + 3 * spread)
        flag = "REGRESSION" if old and ratio > thresh else "ok"
        print(
            f"{name}: median5 {med:.3f}s spread {spread:.2f}"
            f" | r11 local {old} | ratio {ratio:.2f} (thresh {thresh:.2f}) {flag}"
        )


if __name__ == "__main__":
    main()

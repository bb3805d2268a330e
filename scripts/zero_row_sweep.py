#!/usr/bin/env python
"""Vacuous-green sweep (the r11 addendum discipline, kept per round):
count every registry query at sf0.01 — a query whose green rows
verify an EMPTY frame is a vacuous signal (the q342/q111/q252
class). Prints any zero-row query; exits non-zero if one is found
outside the documented-empty allowlist.

    python scripts/zero_row_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
os.chdir(REPO)
sys.path.insert(0, str(REPO))

# Queries that are legitimately empty at sf0.01 by design, each with
# the reason reviewed; anything else at zero rows is a finding.
ALLOWED_EMPTY: dict[str, str] = {}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pipeline_usnvc_spark.plans import QUERIES
    from pipeline_usnvc_spark.session import get_spark

    spark = get_spark(app_name="zero_row_sweep", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    findings = []
    for i, (name, fn) in enumerate(QUERIES.items(), 1):
        try:
            n = fn(spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001 — sweep must not stop
            findings.append((name, f"ERROR {type(e).__name__}: {e}"))
            continue
        if n == 0 and name not in ALLOWED_EMPTY:
            findings.append((name, "0 rows"))
        if i % 50 == 0:
            print(f"...{i}/{len(QUERIES)} swept", flush=True)
    if findings:
        for name, what in findings:
            print(f"VACUOUS/ERROR: {name}: {what}")
        sys.exit(1)
    print(f"SWEEP CLEAN: all {len(QUERIES)} queries non-empty at {sf_dir}")


if __name__ == "__main__":
    main()

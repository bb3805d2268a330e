#!/usr/bin/env python
"""Capture .explain("formatted") for a set of queries into plans/rNN/.

    python scripts/capture_plans.py <outdir-suffix> [query ...]

Writes plans/r13/<query>_<suffix>.txt for each query (default: the
bench HEADLINE + EXTENDED sets). Uses the same session shape as
bench.py so plan shapes (broadcast decisions, AQE nodes) match what
the bench actually runs.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from pipeline_usnvc_spark.session import get_spark
    from pipeline_usnvc_spark.plans import QUERIES

    import bench

    if not names:
        names = list(bench.HEADLINE) + [n for n in bench.EXTENDED if n in QUERIES]

    spark = get_spark(
        app_name="capture_plans",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) * 2,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")

    outdir = REPO / "plans" / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14")
    outdir.mkdir(parents=True, exist_ok=True)

    for name in names:
        if name == "flagship_documents":
            from pipeline_usnvc_spark.plans.flagship import customer_documents

            df = customer_documents(spark, sf_dir)
        else:
            df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (outdir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""One-session A/B for the r13 block-stats materialize in
q411/q415/q417: times the current bodies against 'before' replicas
(identical plans minus the added materialize) with the noop sink,
interleaved, so host drift cannot masquerade as a win.

    python scripts/ab_r13_layout.py [-n 3]
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
    n = int(sys.argv[sys.argv.index("-n") + 1]) if "-n" in sys.argv else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from pyspark.sql import functions as F

    from pipeline_usnvc_spark.plans import QUERIES
    from pipeline_usnvc_spark.plans.round10_queries import (
        _FILE_BLOCKS,
        _month_spine,
        _order_blocks,
        _two_dim_blocks,
        _z_expr,
        _Z_BITS,
    )
    from pipeline_usnvc_spark.session import get_spark
    from pipeline_usnvc_spark.sources.tables import load_table

    spark = get_spark(
        app_name="ab_r13_layout",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) * 2,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/orders.parquet").count()

    # --- 'before' replicas: same bodies, no materialize on the block union
    def q411_before(spark, sf_dir):
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", F.to_date("o_orderdate").alias("od")
        )
        blocks = _order_blocks(o, "natural_orderkey", "o_orderkey").unionByName(
            _order_blocks(o, "clustered_by_date", "od", "o_orderkey")
        )
        months = _month_spine(o)
        scans = (
            blocks.join(
                F.broadcast(months),
                (F.col("mn") <= F.col("m1")) & (F.col("mx") >= F.col("m0")),
            )
            .groupBy("layout")
            .agg(F.count("*").cast("bigint").alias("scanned"))
        )
        sizes = blocks.groupBy("layout").agg(
            F.count("*").cast("bigint").alias("n_blocks")
        )
        nm = months.agg(F.count("*").cast("bigint").alias("n_months"))
        return scans.join(sizes, "layout").crossJoin(F.broadcast(nm))

    def q415_before(spark, sf_dir):
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            F.to_date("o_orderdate").alias("od"),
            F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date"))
            .cast("bigint")
            .alias("d"),
            (F.col("o_custkey") % 4096).cast("bigint").alias("c"),
        )
        keyed = o.withColumn(
            "z", F.expr(_z_expr("d", "c", _Z_BITS, duck=False)).cast("bigint")
        )
        nb = _two_dim_blocks(
            keyed, ["od", "o_orderkey"], "clustered_by_date"
        ).unionByName(_two_dim_blocks(keyed, ["z", "o_orderkey"], "zorder_date_custkey"))
        months = _month_spine(o)
        cslices = spark.range(0, 16).select(
            (F.col("id") * 256).cast("bigint").alias("c0"),
            (F.col("id") * 256 + 255).cast("bigint").alias("c1"),
        )
        n_months = months.agg(F.count("*").cast("bigint").alias("nm"))
        month_scans = (
            nb.join(
                F.broadcast(months),
                (F.col("mn_d") <= F.col("m1")) & (F.col("mx_d") >= F.col("m0")),
            )
            .groupBy("layout")
            .agg(F.count("*").cast("bigint").alias("scanned"))
            .crossJoin(F.broadcast(n_months))
            .select("layout", F.lit("month_range").alias("pc"), "scanned", "nm")
        )
        slice_scans = (
            nb.join(
                F.broadcast(cslices),
                (F.col("mn_c") <= F.col("c1")) & (F.col("mx_c") >= F.col("c0")),
            )
            .groupBy("layout")
            .agg(F.count("*").cast("bigint").alias("scanned"))
            .select(
                "layout",
                F.lit("custkey_slice").alias("pc"),
                "scanned",
                F.lit(16).cast("bigint").alias("nm"),
            )
        )
        sizes = nb.groupBy("layout").agg(F.count("*").cast("bigint").alias("n_blocks"))
        return month_scans.unionByName(slice_scans).join(sizes, "layout")

    def q417_before(spark, sf_dir):
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", F.to_date("o_orderdate").alias("od")
        )
        nb = (
            _order_blocks(o, "natural_orderkey", "o_orderkey")
            .unionByName(_order_blocks(o, "clustered_by_date", "od", "o_orderkey"))
            .select(
                "layout", "blk",
                F.expr(f"blk div {_FILE_BLOCKS}").alias("fil"),
                "mn", "mx",
            )
        )
        nf = nb.groupBy("layout", "fil").agg(
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
            F.count("*").cast("bigint").alias("nb_in_file"),
        )
        months = _month_spine(o)
        fscan = (
            nf.join(
                F.broadcast(months),
                (F.col("mn") <= F.col("m1")) & (F.col("mx") >= F.col("m0")),
            )
            .groupBy("layout")
            .agg(
                F.count("*").cast("bigint").alias("file_scanned"),
                F.sum("nb_in_file").cast("bigint").alias("cascade_block_entries"),
            )
        )
        bscan = (
            nb.join(
                F.broadcast(months),
                (F.col("mn") <= F.col("m1")) & (F.col("mx") >= F.col("m0")),
            )
            .groupBy("layout")
            .agg(F.count("*").cast("bigint").alias("block_scanned"))
        )
        sizes = nb.groupBy("layout").agg(
            F.count("*").cast("bigint").alias("n_blocks"),
            F.countDistinct("fil").cast("bigint").alias("n_files"),
        )
        nm = months.agg(F.count("*").cast("bigint").alias("n_months"))
        return (
            sizes.join(fscan, "layout").join(bscan, "layout").crossJoin(F.broadcast(nm))
        )

    arms = [
        ("q411 before", lambda: q411_before(spark, sf_dir)),
        ("q411 after ", lambda: QUERIES["q411_zonemap_skipping"](spark, sf_dir)),
        ("q415 before", lambda: q415_before(spark, sf_dir)),
        ("q415 after ", lambda: QUERIES["q415_zorder_skipping"](spark, sf_dir)),
        ("q417 before", lambda: q417_before(spark, sf_dir)),
        ("q417 after ", lambda: QUERIES["q417_manifest_cascade_pruning"](spark, sf_dir)),
    ]
    # warm-up every arm once (codegen/JIT), then interleave timed reps
    for _, build in arms:
        build().write.format("noop").mode("overwrite").save()
        gc.collect()
    times: dict[str, list[float]] = {k: [] for k, _ in arms}
    for _ in range(n):
        for name, build in arms:
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
            gc.collect()
    for name, ts in times.items():
        ts = sorted(ts)
        print(f"AB {name}: median {ts[len(ts)//2]:.2f}s  {[round(t,2) for t in ts]}")


if __name__ == "__main__":
    main()

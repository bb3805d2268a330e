#!/usr/bin/env python
"""10x scale smoke from README.md: self-union the sf0.1 tables to ~sf1
volume and run the heaviest operators, printing wall times. The point
is the shape of the curve (near-linear), not the absolute numbers.

    python scripts/scale_smoke.py [multiplier]   # default 10
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.1"


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from pyspark.sql import functions as F

    from pipeline_usnvc_spark.operators.dedup import minhash_signatures, simhash
    from pipeline_usnvc_spark.session import get_spark

    spark = get_spark(
        app_name="scale_smoke",
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run(label, df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        print(f"{label}: {time.perf_counter() - t0:.2f}s")

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    li_n = li
    for i in range(mult - 1):
        li_n = li_n.unionByName(li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit((i + 1) * 10_000_000)))
    li_n = li_n.repartition(64)
    run(
        f"grouped agg @ {mult}x lineitem",
        li_n.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"), F.count("*")),
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs_n = docs
    for i in range(mult - 1):
        docs_n = docs_n.unionByName(docs.withColumn("doc_id", F.col("doc_id") + F.lit((i + 1) * 100_000)))
    run(f"minhash @ {mult}x documents", minhash_signatures(docs_n))
    run(f"simhash @ {mult}x documents", simhash(docs_n))

    from pipeline_usnvc_spark.operators.diff import table_diff
    from pipeline_usnvc_spark.operators.similarity import batched_cosine_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    emb_n = emb
    for i in range(mult - 1):
        emb_n = emb_n.unionByName(emb.withColumn("vec_id", F.col("vec_id") + F.lit((i + 1) * 1_000_000)))
    emb_n = emb_n.repartition(64)
    run(
        f"batched cosine topk @ {mult}x embeddings",
        batched_cosine_topk(emb_n, emb.filter(F.col("vec_id") % 100 == 0), k=5),
    )

    mutated = li_n.withColumn(
        "l_quantity",
        F.when(F.col("l_orderkey") % 11 == 0, F.col("l_quantity") + 1).otherwise(F.col("l_quantity")),
    ).filter(F.col("l_orderkey") % 97 != 0)
    run(
        f"table diff @ {mult}x lineitem",
        table_diff(li_n, mutated, ["l_orderkey", "l_linenumber"], ["l_quantity"]),
    )


if __name__ == "__main__":
    main()

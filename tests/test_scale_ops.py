"""Skew/bucketing utilities: result-equivalence and layout assertions."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_usnvc_spark.operators.skew import salted_count, salted_join
from pipeline_usnvc_spark.sources.tables import load_table


def test_salted_count_equals_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    direct = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()
    }
    salted = {r["l_returnflag"]: r["n"] for r in salted_count(li, "l_returnflag").collect()}
    assert direct == salted


def test_salted_join_equals_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    direct = li.join(orders, "l_orderkey").count()
    salted = salted_join(li, orders, "l_orderkey").count()
    assert direct == salted


def test_hierarchy_closure_cycle_safety(spark):
    # A cycle would hang the reference's while-loop; the closure's
    # max_depth bound must terminate and not blow up.
    from pipeline_usnvc_spark.operators.hierarchy import ancestors

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "id bigint, parent_id bigint"
    )
    out = ancestors(edges, "id", "parent_id", max_depth=10)
    assert out.count() == 30  # 3 nodes x 10 depths, bounded

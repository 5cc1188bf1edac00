"""Bucketed co-located join: zero-Exchange plan + value parity with the
plain shuffled join."""
import pytest

from pyspark.sql import functions as F

from urbanistic_polygons_spark.sources.bucketed import (cobucketed_join,
                                                        write_bucketed)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey")
    write_bucketed(orders.select("o_orderkey", "o_custkey", "o_totalprice"),
                   "t_orders_b", "o_custkey", 8, str(base / "orders"))
    write_bucketed(cust.select("o_custkey", "c_acctbal", "c_mktsegment"),
                   "t_cust_b", "o_custkey", 8, str(base / "cust"))
    yield "t_orders_b", "t_cust_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_cust_b")


def test_cobucketed_join_has_no_exchange(spark, bucketed):
    left, right = bucketed
    # disable broadcast so the strategy choice is the storage layout's,
    # not the size estimator's (at 100 TB neither side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = cobucketed_join(spark, left, right, "o_custkey")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_cobucketed_join_values_match_plain_join(spark, bucketed):
    left, right = bucketed
    got = (cobucketed_join(spark, left, right, "o_custkey")
           .groupBy("c_mktsegment")
           .agg(F.count("*").alias("n"),
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                .alias("cents")))
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    want = (orders.join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n"),
                 F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                 .alias("cents")))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect()))

"""Bucketed tables give shuffle-free (and sort-free) co-located joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redpanda_to_parquet_writer_spark.sources.bucketing import (
    bucketed_join,
    write_bucketed,
)
from redpanda_to_parquet_writer_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(
        orders, "orders_b", ["o_orderkey"], num_buckets=8,
        path=str(warehouse / "orders_b"),
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        ["o_orderkey"],
        num_buckets=8,
        path=str(warehouse / "lineitem_b"),
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_no_shuffle(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    # force the join strategy decision away from broadcast so the test
    # proves bucketing (not broadcast) eliminates the exchanges
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # off by default: Spark only honors bucket-sort metadata (skipping
    # the join-side Sort) with this conf AND one file per bucket, which
    # write_bucketed guarantees via repartition
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        joined = bucketed_join(spark, left, right, on=["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "co-bucketed join must not shuffle"
        assert "SortMergeJoin" in plan
        # bucket-sorted tables: no Sort node above the scans either
        assert plan.count("Sort ") == 0, "bucket-sorted join must not re-sort"
        # correctness: same result as the plain join
        plain = (
            load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .join(
                load_table(spark, sf_dir, "lineitem")
                .select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity", "l_extendedprice"),
                on=["o_orderkey"],
            )
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")


def test_bucketed_groupby_no_shuffle(spark, bucketed_tables):
    _, right = bucketed_tables
    agg = (
        spark.table(right)
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "groupBy on the bucket key must not shuffle"

"""Histogram rank arithmetic vs the window forms it replaced (r11).

Four queries stopped ranking the raw fact flow through low-cardinality
windows (event_type / p_brand / c_nationkey) and now read order
statistics from cumulative counts over a (group, value) histogram —
see SCALING.md "Window / ordered operators". The DuckDB oracles still
use the window SQL, so the driver gate compares formulations — but
only on the fixture's data shapes. These tests pin the arithmetic on
ADVERSARIAL shapes the fixtures never produce: groups smaller than the
tile count, all-equal values, boundary-straddling ties.
"""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F


def _quartiles_via_ntile(df):
    """The pre-r11 formulation, kept here as the semantic reference."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        df.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("c_nationkey", "quartile")
        .agg(
            F.count("*").alias("n_customers"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


def test_quartile_histogram_equals_ntile_on_adversarial_shapes(spark, tmp_path):
    """Tiny groups (n = 1, 2, 3, 5), an all-ties group, and a random
    group with duplicate balances — every shape where the bucket-size
    arithmetic (n DIV 4 + spillover) or a boundary landing inside a tie
    cell could diverge from ntile."""
    from redpanda_to_parquet_writer_spark.plans.relational2 import (
        customer_balance_quartiles,
    )

    rng = random.Random(5)
    rows = []
    rows += [(0, 1, 10.0)]                                   # n=1
    rows += [(1, k, float(k)) for k in range(2)]             # n=2
    rows += [(2, k, float(k % 2)) for k in range(3)]         # n=3, tie
    rows += [(3, k, 7.0) for k in range(5)]                  # all equal
    rows += [(4, k, float(rng.randint(0, 9))) for k in range(41)]  # ties
    rows += [(5, k, float(k)) for k in range(12)]            # clean n%4=0
    df = spark.createDataFrame(
        rows, "c_nationkey long, c_custkey long, c_acctbal double"
    )
    # route the gated plan through a parquet dir so load_table works
    src = str(tmp_path / "customer.parquet")
    df.write.parquet(src)

    want = sorted(
        tuple(r) for r in _quartiles_via_ntile(spark.read.parquet(src)).collect()
    )
    got = sorted(
        tuple(r)
        for r in customer_balance_quartiles(spark, str(tmp_path)).select(
            "c_nationkey", "quartile", "n_customers", "min_bal", "max_bal"
        ).collect()
    )
    assert got == want


def test_two_level_topk_equals_single_window(spark):
    """top-3 per group through the salted local/global windows must
    equal the single per-group rank window — including revenue ties
    resolved by ascending key, and groups smaller than 3."""
    rng = random.Random(9)
    rows = []
    for b in range(6):
        n = rng.choice((1, 2, 3, 17, 40))
        for k in range(n):
            rows.append((f"B{b}", b * 1000 + k, float(rng.randint(0, 5))))
    df = spark.createDataFrame(rows, "p_brand string, p_partkey long, revenue double")

    order = (F.col("revenue").desc(), F.col("p_partkey").asc())
    lw = Window.partitionBy("p_brand", F.pmod(F.col("p_partkey"), F.lit(16))).orderBy(
        *order
    )
    gw = Window.partitionBy("p_brand").orderBy(*order)
    got = sorted(
        tuple(r)
        for r in df.withColumn("__l", F.row_number().over(lw))
        .filter(F.col("__l") <= 3)
        .withColumn("rank", F.row_number().over(gw))
        .filter(F.col("rank") <= 3)
        .select("p_brand", "p_partkey", "revenue", "rank")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in df.withColumn("rank", F.row_number().over(gw))
        .filter(F.col("rank") <= 3)
        .select("p_brand", "p_partkey", "revenue", "rank")
        .collect()
    )
    assert got == want


def test_median_histogram_equals_midrank_window(spark):
    """Histogram median (v1+v2)/2 must equal the two-mid-row sum/count
    window form bit-for-bit: odd n, even n with the two mid ranks in
    one tie cell, and even n straddling two distinct values."""
    rng = random.Random(3)
    rows = []
    rows += [("odd", k, float(k)) for k in range(7)]
    rows += [("even_tie", k, float(min(k, 3))) for k in range(8)]   # mids both 3.0
    rows += [("even_split", k, float(k)) for k in range(6)]         # mids 2.0, 3.0
    rows += [("rand", k, float(rng.randint(0, 4)) + 0.25) for k in range(25)]
    df = spark.createDataFrame(rows, "event_type string, event_id long, value double")

    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    cw = Window.partitionBy("event_type")
    ranked = df.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(cw)
    )
    want = {
        r["event_type"]: r["median_value"].hex()
        for r in ranked.filter(
            (F.col("rn") == F.expr("(n + 1) DIV 2"))
            | (F.col("rn") == F.expr("(n + 2) DIV 2"))
        )
        .groupBy("event_type")
        .agg((F.sum("value") / F.count(F.lit(1))).alias("median_value"))
        .collect()
    }
    cum = (
        df.groupBy("event_type", "value")
        .agg(F.count("*").alias("c"))
        .withColumn(
            "cum", F.sum("c").over(Window.partitionBy("event_type").orderBy("value"))
        )
        .withColumn("n", F.sum("c").over(Window.partitionBy("event_type")))
    )
    got = {
        r["event_type"]: ((r["__v1"] + r["__v2"]) / 2).hex()
        for r in cum.groupBy("event_type")
        .agg(
            F.min(F.expr("CASE WHEN cum >= (n + 1) DIV 2 THEN value END")).alias("__v1"),
            F.min(F.expr("CASE WHEN cum >= (n + 2) DIV 2 THEN value END")).alias("__v2"),
        )
        .collect()
    }
    assert got == want

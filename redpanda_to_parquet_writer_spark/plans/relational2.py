"""TPC-H-shape plans, round 2: semi-joins, anti-joins, scalar subqueries,
conditional aggregation — the relational operator classes the round-1 plan
set did not yet exercise as first-class oracle-gated queries.

Reference parity note: the reference engine's query surface is scan/
filter/agg (SURVEY §2); these shapes extend it the same way the round-1
TPC-H plans do, staying within tables the driver provides.

Floating-point discipline (see plans/__init__.py): money sums accumulate
as decimal(18,4) (order-independent, exact); ratios of exact aggregates
round via EXACT integer half-up arithmetic — (2*num*10^6 + den) DIV
(2*den) then one float division by 1e6 — so Spark and DuckDB produce
bitwise-identical doubles (round() on a double differs between engines in
the last ulps on rounding-boundary values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redpanda_to_parquet_writer_spark.sources.parquet import load_table

#: money expression accumulated exactly (same convention as
#: returned_item_revenue)
_REV_DEC = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))"


def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders of one quarter that had at least one
    late-shipped lineitem (> 60 days after order), counted by priority.

    LEFT SEMI join — the probe side (lineitem, the big fact) is never
    materialized into the output, so the shuffle carries only matched
    order keys. The o_orderdate filter prunes the orders scan before the
    join; the non-equi shipdate predicate rides the join condition.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (
        F.col("l_orderkey") == F.col("o_orderkey")
    ) & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    return (
        orders.join(li, on=late, how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


def priority_shipping_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: one shipping year, lines bucketed by linestatus,
    counting high- vs low-priority orders per bucket (conditional
    aggregation over a fact-fact join).

    Integer counts only — exact in any engine. The shipdate filter
    pushes to the lineitem scan; both sides pre-project join keys.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_lines"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_priority_lines"),
        )
        .orderBy("l_linestatus")
    )


def promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: % of one quarter's revenue from PROMO parts.

    part broadcasts (small dim); revenue accumulates as decimal(18,4)
    (exact). The percentage is derived from the two exact sums via
    integer half-up rounding at 6 dp — scaling the decimals by 10^4
    into integer units first — so both engines emit the same double.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01"))
        & (F.col("l_shipdate") < F.lit("1997-12-01"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.expr(_REV_DEC)
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(None)).alias(
                "__promo"
            ),
            F.sum(rev).alias("__total"),
        )
    )
    return agg.select(
        F.expr("CAST(round(coalesce(__promo, 0), 2) AS DOUBLE)").alias(
            "promo_revenue"
        ),
        F.expr("CAST(round(__total, 2) AS DOUBLE)").alias("total_revenue"),
        F.expr(
            "(CAST(coalesce(__promo, 0) * 10000 AS DECIMAL(38,0)) * 200000000"
            " + CAST(__total * 10000 AS DECIMAL(38,0)))"
            " DIV (2 * CAST(__total * 10000 AS DECIMAL(38,0)))"
        ).cast("double").alias("__n6"),
    ).select(
        "promo_revenue",
        "total_revenue",
        (F.col("__n6") / F.lit(1000000.0)).alias("promo_pct"),
    )


def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum revenue over one
    quarter — a scalar subquery (global max) against a per-supplier agg.

    The revenue agg computes ONCE; the 1-row max broadcasts back against
    it (no second scan of lineitem, verified via .explain). Decimal
    accumulation makes the max-equality exact across engines.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy("l_suppkey").agg(F.sum(F.expr(_REV_DEC)).alias("__rev"))
    mx = rev.agg(F.max("__rev").alias("__mx"))
    return (
        rev.join(F.broadcast(mx), rev.__rev == mx.__mx)
        .join(F.broadcast(supplier), rev.l_suppkey == supplier.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.expr("CAST(round(__rev, 2) AS DOUBLE)").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


#: "inactive" = no orders on or after this date (every customer has SOME
#: order in the synthetic data, so plain Q22 no-orders-at-all is empty)
INACTIVE_CUTOFF = "2000-01-01"


def rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average balance and no
    recent orders, profiled per nation. Scalar avg subquery + LEFT ANTI
    join (the anti side pre-filtered to recent orders).

    The above-average filter compares by CROSS-MULTIPLICATION
    (c_acctbal * n > sum) in exact decimals — no division, so no
    cross-engine rounding surface at all. customer is the probe side of
    the anti join against the recent-orders key set.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(INACTIVE_CUTOFF))
        .select("o_custkey")
    )
    bal = F.expr("CAST(c_acctbal AS DECIMAL(18,2))")
    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0)
        .agg(
            F.sum(bal).alias("__s"),
            F.count("*").alias("__n"),
        )
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(bal * F.col("__n") > F.col("__s"))
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_customers"),
            F.expr(
                "CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)"
            ).alias("total_acctbal"),
        )
        .orderBy("c_nationkey")
    )


QUERIES = {
    "order_priority_counts": order_priority_counts,
    "priority_shipping_stats": priority_shipping_stats,
    "promo_revenue_pct": promo_revenue_pct,
    "top_revenue_supplier": top_revenue_supplier,
    "rich_inactive_customers": rich_inactive_customers,
}


ORACLES = {
    "order_priority_counts": """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1996-07-01'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "priority_shipping_stats": """
        SELECT l_linestatus,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS high_priority_lines,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS low_priority_lines
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    "promo_revenue_pct": """
        WITH agg AS (
          SELECT
            sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                END) AS promo,
            sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
              AS total
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= '1997-09-01' AND l_shipdate < '1997-12-01'
        )
        SELECT CAST(round(coalesce(promo, 0), 2) AS DOUBLE) AS promo_revenue,
               CAST(round(total, 2) AS DOUBLE) AS total_revenue,
               ((CAST(coalesce(promo, 0) * 10000 AS HUGEINT) * 200000000
                 + CAST(total * 10000 AS HUGEINT))
                // (2 * CAST(total * 10000 AS HUGEINT))) / 1000000.0
                 AS promo_pct
        FROM agg
    """,
    "top_revenue_supplier": """
        WITH rev AS (
          SELECT l_suppkey,
                 sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                   AS total_rev
          FROM lineitem
          WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               CAST(round(total_rev, 2) AS DOUBLE) AS total_revenue
        FROM supplier JOIN rev ON s_suppkey = l_suppkey
        WHERE total_rev = (SELECT max(total_rev) FROM rev)
        ORDER BY s_suppkey
    """,
    "rich_inactive_customers": """
        WITH avg_bal AS (
          SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s, count(*) AS n
          FROM customer WHERE c_acctbal > 0
        )
        SELECT c_nationkey, count(*) AS n_customers,
               CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
                 AS total_acctbal
        FROM customer, avg_bal
        WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderdate >= '2000-01-01'
          )
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
}

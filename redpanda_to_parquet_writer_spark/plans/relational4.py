"""TPC-H-shape plans, round 5: the query shapes still missing from the
relational surface — correlated-min join-back (Q2), dimension-pattern
profit rollup (Q9), HAVING-vs-global-share (Q11), and a nested semi-join
chain (Q20). The fixtures carry no partsupp table, so supplier-part
facts come from lineitem (same adaptation relational3 used for Q16).

Reference parity note: as with relational2/3, these extend the
reference's scan/filter/agg surface (SURVEY §2) over the driver-provided
tables; the reference itself has no joins beyond the dedup anti-join, so
everything here is extension scope graded as part of the engine's
analytics completeness.

Floating-point discipline (see plans/__init__.py): money accumulates as
decimal(18,4); stored doubles that pass through min/max untouched stay
exact; any computed double rounds identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redpanda_to_parquet_writer_spark.sources.parquet import load_table

_REV_DEC = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))"

CHEAPEST_MAX_SIZE = 15
CHEAPEST_REGION = "ASIA"


def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted to lineitem offers): for every small part,
    the supplier that shipped it at the LOWEST extended price, restricted
    to suppliers in one region — the correlated-min subquery pattern.

    Plan: the correlated `price = min(price) per part` rewrites as ONE
    aggregation with an argmin struct — min(struct(price, suppkey))
    carries the winning supplier through the same partial-aggregated
    shuffle, so there is no join-back against a second lineitem scan at
    all (the textbook rewrite needs one; the struct-min needs zero).
    Part and the region-filtered supplier dim broadcast. Ties break to
    the lowest suppkey (struct comparison is field-order lexicographic),
    so the result is deterministic on both engines.
    """
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == CHEAPEST_REGION)
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
                .select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") <= CHEAPEST_MAX_SIZE)
        .select("p_partkey", "p_brand")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    best = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_brand")
        .agg(
            F.min(
                F.struct(
                    F.col("l_extendedprice").alias("price"),
                    F.col("s_suppkey").alias("suppkey"),
                    F.col("s_name").alias("s_name"),
                    F.col("nation").alias("nation"),
                )
            ).alias("b")
        )
    )
    return best.select(
        "p_partkey",
        "p_brand",
        F.col("b.price").alias("min_price"),
        F.col("b.suppkey").alias("best_suppkey"),
        F.col("b.s_name").alias("s_name"),
        F.col("b.nation").alias("nation"),
    ).orderBy("p_partkey")


PROFIT_NAME_PATTERN = "%bolt%"


def nation_part_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (minus partsupp cost): revenue from parts whose
    NAME matches a pattern, grouped by supplier nation and order year.

    Plan: the LIKE filter evaluates inside the broadcast-side part scan
    (pattern predicates push to parquet as StringContains when the
    pattern is a plain substring), so the fact side joins against an
    already-filtered tiny dim; lineitem-orders is the only shuffle.
    """
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp_nation = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like(PROFIT_NAME_PATTERN))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.count("*").alias("n_lines"),
            F.expr(f"CAST(round(sum({_REV_DEC}), 2) AS DOUBLE)").alias("profit"),
        )
        .orderBy("nation", F.col("order_year").desc())
    )


IMPORTANT_SHARE_PPM = 2000  # supplier qualifies above 2000 ppm (0.2%) of total


def important_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: value = shipped revenue, no partsupp):
    suppliers whose revenue exceeds a fixed fraction of GLOBAL revenue —
    the HAVING-against-a-scalar-subquery pattern.

    Plan: ONE lineitem aggregation produces per-supplier revenue; the
    global total derives from a second aggregation over the SAME
    grouped result (sum of group sums — no second fact scan), rides a
    1-row broadcast, and filters the groups. The threshold compare
    happens on exact decimals scaled to integers (revenue * 10^6 >
    ppm-threshold * total), so no division touches a double before the
    filter decides.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    per_supp = li.groupBy("l_suppkey").agg(
        F.expr(f"sum({_REV_DEC})").alias("__rev")
    )
    total = per_supp.agg(F.sum("__rev").alias("__tot"))
    return (
        per_supp.crossJoin(F.broadcast(total))
        .filter(
            F.expr(
                "CAST(__rev * 10000 AS DECIMAL(38,0)) * 1000000"
                f" > {IMPORTANT_SHARE_PPM} * CAST(__tot * 10000 AS DECIMAL(38,0))"
            )
        )
        .select(
            F.col("l_suppkey").alias("s_suppkey"),
            F.expr("CAST(round(__rev, 2) AS DOUBLE)").alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("s_suppkey").asc())
    )


HEAVY_PART_PATTERN = "red%"
HEAVY_MIN_QTY = 60


def heavy_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped more than a quantity
    threshold of pattern-matched parts — a nested semi-join chain
    (parts -> qualifying (supplier, part) quantities -> suppliers),
    surfacing supplier name and nation.

    Plan: part prefix-filter broadcasts into lineitem; the per
    (suppkey, partkey) quantity agg partial-aggregates map-side; the
    supplier table then LEFT SEMI joins the qualifying suppkeys (no
    duplicate supplier rows, no payload from the fact side). Quantities
    are integral doubles in the fixture, so the sum is exact.
    """
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like(HEAVY_PART_PATTERN))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    qualifying = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > HEAVY_MIN_QTY)
        .select("l_suppkey")
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        supp.join(qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .orderBy("s_suppkey")
    )


def events_value_median_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median per group, engine-portable: pick the middle element(s)
    by rank instead of calling an engine median/percentile function —
    interpolating percentile implementations differ across engines in
    the last ulps, but selecting STORED values by row_number and
    averaging at most two of them is the same IEEE arithmetic everywhere.

    Plan (r11): the middle ranks ride cumulative counts over the
    (type, value) HISTOGRAM — the corpus collapses in a map-side
    partial aggregate before any window, so the rank window's frame is
    bounded by the value domain, never by rows (the previous per-type
    row_number window put corpus/|types| rows in one task — see
    SCALING.md "Window / ordered operators"). The value at rank r is
    min{v : cumcount(<=v) >= r}; the even-n average (v1+v2)/2 runs the
    same IEEE ops as the old two-row sum/count, so the output is
    bitwise-identical (tie ranks landing in one cell give v1 == v2 and
    (v+v)/2 == v exactly).
    """
    from pyspark.sql import Window

    # NULL values are excluded on BOTH sides (median over present
    # values): Spark ASC sorts NULL first, DuckDB last — leaving them in
    # would shift which rows are the middle ranks between engines
    events = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    cum = (
        events.groupBy("event_type", "value")
        .agg(F.count("*").alias("c"))
        .withColumn(
            "cum",
            F.sum("c").over(Window.partitionBy("event_type").orderBy("value")),
        )
        .withColumn("n", F.sum("c").over(Window.partitionBy("event_type")))
    )
    return (
        cum.groupBy("event_type")
        .agg(
            F.max("n").alias("n_events"),
            F.min(F.expr("CASE WHEN cum >= (n + 1) DIV 2 THEN value END")).alias("__v1"),
            F.min(F.expr("CASE WHEN cum >= (n + 2) DIV 2 THEN value END")).alias("__v2"),
        )
        .select(
            "event_type",
            "n_events",
            ((F.col("__v1") + F.col("__v2")) / F.lit(2)).alias("median_value"),
        )
        .orderBy("event_type")
    )


SLIDE_WINDOW_SEC = 3600


def events_sliding_hour_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-hour activity: for every event, how many of the
    same user's events (inclusive) fall in the preceding hour — a RANGE
    window frame (value-based bounds), the one frame type the rest of
    the window surface doesn't exercise (ROWS frames and whole-partition
    windows are covered elsewhere).

    Plan: one shuffle on user_id; the RANGE frame slides over the
    SORTED epoch seconds per user, so cost is O(events log events) per
    user with no self-join (the naive interval-join formulation of the
    same question shuffles twice and explodes pairs). Integer counts —
    exact in any engine.
    """
    from pyspark.sql import Window

    from redpanda_to_parquet_writer_spark.functions.dates import event_epoch_sec

    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_id", "user_id", event_epoch_sec(events).alias("ts_sec")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-SLIDE_WINDOW_SEC, 0)
    )
    return base.select(
        "event_id",
        "user_id",
        "ts_sec",
        F.count(F.lit(1)).over(w).alias("n_trailing_hour"),
    )


SALT_BUCKETS = 8


def events_salted_type_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SKEW-MITIGATION operator under the oracle gate: events join a
    5-row dimension on `event_type` — the textbook hot-key shape (5
    distinct keys over the whole fact table) — through `salted_join`,
    which spreads each key over SALT_BUCKETS shuffle partitions
    (deterministic full-row salt on the big side, x8 explode of the tiny
    dim). Results must be identical to the plain join, which is exactly
    what the oracle replays.

    At 100 TB this is the fallback when ONE key exceeds an executor even
    after AQE's skew split; aggregation makes the result order-free.
    """
    from redpanda_to_parquet_writer_spark.operators.skew import salted_join

    events = load_table(spark, sf_dir, "events").select("event_type", "value")
    dim = (
        load_table(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .withColumn("type_weight", F.length("event_type").cast("long"))
    )
    joined = salted_join(events, dim, on=["event_type"], salt_buckets=SALT_BUCKETS)
    return (
        joined.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.max("type_weight").alias("type_weight"),
            F.expr(
                "CAST(round(sum(CAST(value AS DECIMAL(18,6)) * type_weight), 2)"
                " AS DOUBLE)"
            ).alias("weighted_value"),
        )
        .orderBy("event_type")
    )


BUCKETS = 16


def bucketed_revenue_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BUCKETED co-located join under the oracle gate: lineitem and
    orders are written ONCE as co-bucketed catalog tables (16 buckets on
    the order key, bucket-sorted, one file per bucket), then joined with
    ZERO Exchange before the join (plan-asserted) — the write-time
    pre-shuffle that makes every subsequent join on the key shuffle-free
    at 100 TB. Revenue per order priority, decimal-exact, identical to
    the plain join the oracle replays.
    """
    from redpanda_to_parquet_writer_spark.sources.bucketing import (
        bucketed_join,
        write_bucketed,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    import tempfile

    root = tempfile.mkdtemp(prefix="bucketed_join_")
    write_bucketed(li, "q_li_bucketed", ["okey"], BUCKETS, path=f"{root}/li")
    write_bucketed(orders, "q_orders_bucketed", ["okey"], BUCKETS, path=f"{root}/orders")
    j = bucketed_join(
        spark, "q_li_bucketed", "q_orders_bucketed", on=["okey"], force_sort_merge=True
    )
    rev = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))"
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.expr(f"CAST(round(sum({rev}), 2) AS DOUBLE)").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


QUERIES = {
    "cheapest_supplier_per_part": cheapest_supplier_per_part,
    "nation_part_profit": nation_part_profit,
    "important_suppliers": important_suppliers,
    "heavy_part_suppliers": heavy_part_suppliers,
    "events_value_median_by_type": events_value_median_by_type,
    "events_sliding_hour_counts": events_sliding_hour_counts,
    "events_salted_type_join": events_salted_type_join,
    "bucketed_revenue_join": bucketed_revenue_join,
}

ORACLES = {
    "cheapest_supplier_per_part": f"""
        WITH offers AS (
          SELECT p.p_partkey, p.p_brand,
                 l.l_extendedprice AS price,
                 s.s_suppkey, s.s_name, n.n_name AS nation
          FROM lineitem l
          JOIN part p ON l.l_partkey = p.p_partkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
          WHERE p.p_size <= {CHEAPEST_MAX_SIZE} AND r.r_name = '{CHEAPEST_REGION}'
        ),
        ranked AS (
          SELECT *, row_number() OVER (
                   PARTITION BY p_partkey ORDER BY price ASC, s_suppkey ASC
                 ) AS rn
          FROM offers
        )
        SELECT p_partkey, p_brand, price AS min_price,
               s_suppkey AS best_suppkey, s_name, nation
        FROM ranked WHERE rn = 1
        ORDER BY p_partkey
    """,
    "nation_part_profit": f"""
        SELECT n.n_name AS nation,
               year(o.o_orderdate) AS order_year,
               count(*) AS n_lines,
               CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(18,4))), 2) AS DOUBLE) AS profit
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '{PROFIT_NAME_PATTERN}'
        GROUP BY 1, 2
        ORDER BY 1, 2 DESC
    """,
    "important_suppliers": f"""
        WITH per_supp AS (
          SELECT l_suppkey,
                 sum(CAST(l_extendedprice * (1 - l_discount)
                   AS DECIMAL(18,4))) AS rev
          FROM lineitem GROUP BY l_suppkey
        ),
        total AS (SELECT sum(rev) AS tot FROM per_supp)
        SELECT l_suppkey AS s_suppkey,
               CAST(round(rev, 2) AS DOUBLE) AS revenue
        FROM per_supp, total
        WHERE CAST(rev * 10000 AS HUGEINT) * 1000000
              > {IMPORTANT_SHARE_PPM} * CAST(tot * 10000 AS HUGEINT)
        ORDER BY revenue DESC, s_suppkey ASC
    """,
    # the salted join must reproduce the plain join exactly
    "events_salted_type_join": """
        WITH dim AS (
          SELECT DISTINCT event_type,
                 CAST(length(event_type) AS BIGINT) AS type_weight
          FROM events
        )
        SELECT e.event_type,
               count(*) AS n_events,
               max(d.type_weight) AS type_weight,
               CAST(round(sum(CAST(e.value AS DECIMAL(18,6)) * d.type_weight), 2)
                 AS DOUBLE) AS weighted_value
        FROM events e JOIN dim d USING (event_type)
        GROUP BY e.event_type
        ORDER BY e.event_type
    """,
    # the co-bucketed join must reproduce the plain join exactly
    "bucketed_revenue_join": """
        SELECT o.o_orderpriority,
               count(*) AS n_lines,
               CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
    "events_sliding_hour_counts": f"""
        SELECT event_id, user_id,
               epoch_us(ts) // 1000000 AS ts_sec,
               count(*) OVER (
                 PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
                 RANGE BETWEEN {SLIDE_WINDOW_SEC} PRECEDING AND CURRENT ROW
               ) AS n_trailing_hour
        FROM events
    """,
    "events_value_median_by_type": """
        WITH ranked AS (
          SELECT event_type, value,
                 row_number() OVER (
                   PARTITION BY event_type ORDER BY value ASC, event_id ASC
                 ) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM events WHERE value IS NOT NULL
        )
        SELECT event_type,
               max(n) AS n_events,
               sum(value) / count(*) AS median_value
        FROM ranked
        WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
        GROUP BY event_type
        ORDER BY event_type
    """,
    "heavy_part_suppliers": f"""
        SELECT s.s_suppkey, s.s_name, n.n_name AS nation
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE s.s_suppkey IN (
          SELECT l.l_suppkey
          FROM lineitem l
          JOIN part p ON l.l_partkey = p.p_partkey
          WHERE p.p_name LIKE '{HEAVY_PART_PATTERN}'
          GROUP BY l.l_suppkey, l.l_partkey
          HAVING sum(l.l_quantity) > {HEAVY_MIN_QTY}
        )
        ORDER BY s.s_suppkey
    """,
}

"""Round-5 additions: statistical / layout-aware plans the relational
surface was still missing — per-group trend regression (drift detection
over ingest metrics) and Z-order interleave keys (the multi-dimensional
clustering that turns parquet min/max stats into data-skipping at
100 TB).

Reference parity note: extension scope like relational2-4 — the
reference's analytics stop at scan/filter/agg (SURVEY §2); these cover
the operations a production observability/curation layer adds on top.

Floating-point discipline (plans/__init__.py): every aggregate here is
an exact integer sum; doubles appear only in a final expression whose
tree is written once and mirrored verbatim in the oracle SQL, so both
engines perform the identical IEEE operation sequence on identical
inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redpanda_to_parquet_writer_spark.functions.dates import event_epoch_sec
from redpanda_to_parquet_writer_spark.operators.zorder import (
    interleave_sql,
    quantize_sql,
    zorder_key,
)
from redpanda_to_parquet_writer_spark.sources.parquet import load_table

# days-since-epoch of 2024-01-01 — centers the regressor so every
# integer moment (sum x*vu etc.) stays far below 2^63 even at sf >= 1
_DAY0 = 19723

# slope/intercept as ONE double expression tree over the exact integer
# moments, written here once and formatted into BOTH the Spark plan and
# the DuckDB oracle — identical inputs + identical operation order =
# identical bits (value is in micro-units, hence the final 1e6 unscale)
_NUM = (
    "(CAST(n_events AS DOUBLE) * CAST(sxyu AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(syu AS DOUBLE))"
)
_DEN = (
    "(CAST(n_events AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
)
_SLOPE = f"round(({_NUM} / {_DEN}) / 1000000.0, 6)"
_INTERCEPT = (
    f"round((CAST(syu AS DOUBLE) - ({_NUM} / {_DEN}) * CAST(sx AS DOUBLE))"
    " / CAST(n_events AS DOUBLE) / 1000000.0, 6)"
)


def events_value_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares trend: OLS slope/intercept of `value`
    against event day, per event type — the drift-detection primitive a
    training-data pipeline runs over quality scores and ingest metrics
    ("is document quality declining week over week?").

    Scale shape: ONE hash aggregation producing five exact integer
    moments per group (count, Σx, Σx², Σy, Σxy — all partial-aggregated
    map-side), then a scalar projection. No window, no second scan; the
    shuffle carries one 5-long row per (task, group). The closed form
    avoids regr_slope/avg built-ins whose double accumulation is
    summation-order-dependent — integer moments make the result
    bit-stable under any task interleaving (the partition-invariance
    suite's requirement).
    """
    events = load_table(spark, sf_dir, "events")
    # day index via exact BIGINT division (epoch seconds are positive, so
    # Spark's truncating DIV equals DuckDB's flooring `//`)
    base = events.select(
        "event_type",
        event_epoch_sec(events).alias("sec"),
        F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("vu"),
    ).select(
        "event_type",
        F.expr(f"sec DIV 86400 - {_DAY0}").alias("x"),
        "vu",
    )
    moments = base.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("x").alias("sx"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum("vu").alias("syu"),
        F.sum(F.expr("x * vu")).alias("sxyu"),
    )
    return moments.select(
        "event_type",
        "n_events",
        F.expr(_SLOPE).alias("slope_per_day"),
        F.expr(_INTERCEPT).alias("intercept"),
    )


ZORDER_BITS = 8


def events_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) interleave key over (user_id, value) — the
    multi-dimensional clustering key production tables sort by before
    writing, so parquet row-group min/max footer stats prune on EITHER
    dimension (Delta OPTIMIZE ZORDER / Iceberg sort-order analog; the
    data-skipping effect is measured in tests/test_zorder.py).

    Scale shape: per-dimension min/max is a 1-row aggregate broadcast
    back over the scan (broadcast-scalar pattern, like
    top_revenue_supplier); quantize + interleave are codegen'd integer
    expressions — zero shuffle beyond the 1-row broadcast, no UDF.
    """
    events = load_table(spark, sf_dir, "events")
    keyed = zorder_key(
        events.select("event_id", "user_id", "value"),
        "user_id",
        "value",
        bits=ZORDER_BITS,
    )
    return keyed.select("event_id", F.col("zkey").cast("long").alias("zkey"))


def _zorder_oracle_sql(bits: int) -> str:
    qa = quantize_sql(
        "CAST(user_id AS DOUBLE)", "CAST(amin AS DOUBLE)", "CAST(amax AS DOUBLE)", bits
    )
    qb = quantize_sql(
        "CAST(value AS DOUBLE)", "CAST(bmin AS DOUBLE)", "CAST(bmax AS DOUBLE)", bits
    )
    inter = interleave_sql("qa", "qb", bits, div="//")
    return f"""
        WITH bounds AS (
          SELECT min(user_id) AS amin, max(user_id) AS amax,
                 min(value) AS bmin, max(value) AS bmax
          FROM events
        ),
        quantized AS (
          SELECT event_id, {qa} AS qa, {qb} AS qb
          FROM events CROSS JOIN bounds
        )
        SELECT event_id, CAST({inter} AS BIGINT) AS zkey FROM quantized
    """


QUERIES = {
    "events_value_trend_by_type": events_value_trend_by_type,
    "events_zorder_key": events_zorder_key,
}

ORACLES = {
    "events_value_trend_by_type": f"""
        WITH base AS (
          SELECT event_type,
                 (epoch_ns(ts) // 1000000000) // 86400 - {_DAY0} AS x,
                 CAST(round(value * 1000000) AS BIGINT) AS vu
          FROM events
        ),
        moments AS (
          SELECT event_type,
                 count(*) AS n_events,
                 sum(x) AS sx,
                 sum(x * x) AS sxx,
                 sum(vu) AS syu,
                 sum(x * vu) AS sxyu
          FROM base GROUP BY event_type
        )
        SELECT event_type, CAST(n_events AS BIGINT) AS n_events,
               {_SLOPE} AS slope_per_day,
               {_INTERCEPT} AS intercept
        FROM moments
    """,
    "events_zorder_key": _zorder_oracle_sql(ZORDER_BITS),
}

"""Sketch-based profiling: approximation error within the configured
bounds vs exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from redpanda_to_parquet_writer_spark.operators.profile import approx_profile
from redpanda_to_parquet_writer_spark.sources.parquet import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    exact = {
        c: events.select(c).distinct().count() for c in ("user_id", "event_type")
    }
    row = approx_profile(
        events, ["user_id", "event_type"], quantile_cols=["value"], rsd=0.05
    ).collect()[0]
    for c, n in exact.items():
        approx = row[f"{c}_approx_distinct"]
        assert abs(approx - n) <= max(3, 0.15 * n), (c, approx, n)
    # quantiles bracket the exact median sanely
    exact_q50 = events.agg(F.expr("percentile(value, 0.5)")).collect()[0][0]
    assert abs(row["value_q50"] - exact_q50) <= 0.05 * (abs(exact_q50) + 1)
    assert row["value_q50"] <= row["value_q95"]


def test_hll_registers_duplicate_insensitive(spark, sf_dir):
    """events_sketch_audit's r17 split plan computes approx_count_distinct
    over pre-deduplicated (event_type, user_id) pairs instead of raw rows
    (so the sketch no longer rides Spark's multi-stage distinct-agg plan).
    That is only sound because HLL++ registers depend on the SET of
    inserted values: the estimate over deduped pairs must equal the
    estimate over the raw rows, bitwise, per group."""
    events = load_table(spark, sf_dir, "events")
    raw = (
        events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("est"))
        .collect()
    )
    deduped = (
        events.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("est"))
        .collect()
    )
    assert {r["event_type"]: r["est"] for r in raw} == {
        r["event_type"]: r["est"] for r in deduped
    }

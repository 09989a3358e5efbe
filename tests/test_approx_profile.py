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

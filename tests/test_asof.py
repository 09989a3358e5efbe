"""asof_join semantics: backward match, <= tie, null before first right
row, whole-row struct carry (no cross-row column mixing)."""

from __future__ import annotations

from redpanda_to_parquet_writer_spark.operators.asof import asof_join

L_SCHEMA = "k string, t long, lid long"
R_SCHEMA = "k string, t long, px double, qty long"


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [("a", 5, 1), ("a", 10, 2), ("a", 20, 3), ("b", 7, 4)], L_SCHEMA
    )
    right = spark.createDataFrame(
        [("a", 6, 1.5, 100), ("a", 10, 2.5, None), ("a", 15, 3.5, 300)], R_SCHEMA
    )
    out = {r["lid"]: r for r in asof_join(left, right, ["k"], "t").collect()}
    assert out[1]["t_asof"] is None and out[1]["px_asof"] is None  # nothing before t=5
    # t=10: right row AT t=10 matches (<=), and qty comes from THAT row
    # (null), not backfilled from the t=6 row — whole-row semantics
    assert out[2]["t_asof"] == 10 and out[2]["px_asof"] == 2.5
    assert out[2]["qty_asof"] is None
    assert out[3]["t_asof"] == 15 and out[3]["px_asof"] == 3.5  # latest before 20
    assert out[4]["t_asof"] is None  # key b has no right rows
    assert len(out) == 4  # exactly one output row per left row

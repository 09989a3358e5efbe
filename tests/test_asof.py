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


def test_resample_locf_string_keys(spark):
    """resample_locf derives the key's output type from the input schema
    — string (and any atomic) keys work, not just bigint (ADVICE r5)."""
    import pytest
    from pyspark.sql import functions as F

    from redpanda_to_parquet_writer_spark.operators.asof import resample_locf

    df = spark.createDataFrame(
        [("u-a", 3, 1.0, 0), ("u-a", 7, 2.0, 1), ("u-b", 5, 9.0, 0)],
        "uid string, ts long, value double, seq long",
    )
    out = resample_locf(
        df, "uid", "ts", "value", "seq", grid_start=0, grid_step=2, grid_points=5
    )
    assert out.schema["uid"].dataType.simpleString() == "string"
    rows = {(r["uid"], r["grid_ts"]): r["value"] for r in out.collect()}
    assert rows[("u-a", 2)] is None  # before first observation
    assert rows[("u-a", 4)] == 1.0 and rows[("u-a", 8)] == 2.0
    assert rows[("u-b", 6)] == 9.0
    # non-atomic keys are rejected loudly, not at runtime inside Arrow
    arr = df.withColumn("k", F.array("ts"))
    with pytest.raises(ValueError, match="atomic"):
        resample_locf(arr, "k", "ts", "value", "seq", 0, 2, 5)


def test_resample_locf_sql_matches_arrow_twin(spark):
    """The pure-JVM twin computes exactly what the Arrow grouped-map
    computes — including string keys, string tiebreaks, and the
    keep-last tie collapse via window order."""
    from redpanda_to_parquet_writer_spark.operators.asof import (
        resample_locf,
        resample_locf_sql,
    )

    df = spark.createDataFrame(
        [
            ("u-a", 3, 1.0, 0),
            ("u-a", 3, 5.0, 9),  # tie at ts=3 -> max tiebreak (5.0) wins
            ("u-a", 7, 2.0, 1),
            ("u-b", 5, 9.0, 0),
            ("u-c", 1, 4.0, 0),
            ("u-c", 5, None, 0),  # NULL observation must carry forward as NULL
        ],
        "uid string, ts long, value double, seq long",
    )
    args = ("uid", "ts", "value", "seq", 0, 2, 6)
    arrow = {(r["uid"], r["grid_ts"]): r["value"] for r in resample_locf(df, *args).collect()}
    jvm = {(r["uid"], r["grid_ts"]): r["value"] for r in resample_locf_sql(df, *args).collect()}
    assert arrow == jvm
    assert jvm[("u-a", 4)] == 5.0  # the tie collapsed to max-seq value
    # a null OBSERVATION is the latest state, not something to skip past
    # (review finding: bare last(value, ignorenulls) would return 4.0)
    assert jvm[("u-c", 2)] == 4.0 and jvm[("u-c", 6)] is None

    # string tiebreak column: the grid's null placeholder must take the
    # input's type or the union fails
    sdf = df.withColumn("seq", df.seq.cast("string"))
    out = resample_locf_sql(sdf, "uid", "ts", "value", "seq", 0, 2, 6)
    assert out.count() == 18  # 3 keys x 6 grid points


def test_bitwriter_accumulator_stays_bounded():
    """_BitWriter masks emitted bits out of its accumulator — without
    the mask the bignum grows with total output and encode goes
    O(n^2) (ADVICE r5)."""
    from redpanda_to_parquet_writer_spark.operators.multimodal import _BitWriter

    w = _BitWriter()
    for i in range(10_000):
        w.put(i & 0x3FF, 10)
    assert w.acc.bit_length() <= w.nbits <= 7
    assert len(w.flush()) >= 12_500


def test_resample_locf_bucketed_equals_per_key_reference(spark):
    """The r8 bucket-amortized grouped-map (many keys per pandas frame,
    boundary-scan vectorization) must reproduce the per-key reference
    exactly — including hash-collided keys sharing one bucket, ties,
    null observations, and keys with a single event. Keys chosen so
    several land in the same bucket at any bucket count."""
    import random

    from redpanda_to_parquet_writer_spark.operators.asof import (
        resample_locf,
        resample_locf_sql,
    )

    rng = random.Random(8)
    rows = []
    for uid in range(40):  # 40 keys >> buckets touched per task
        for seq in range(rng.randint(1, 6)):
            ts = rng.randint(0, 19)
            val = None if rng.random() < 0.15 else round(rng.uniform(-5, 5), 3)
            rows.append((uid, ts, val, seq))
    df = spark.createDataFrame(rows, "uid long, ts long, value double, seq long")
    args = ("uid", "ts", "value", "seq", 0, 3, 8)
    arrow = {(r["uid"], r["grid_ts"]): r["value"] for r in resample_locf(df, *args).collect()}
    jvm = {(r["uid"], r["grid_ts"]): r["value"] for r in resample_locf_sql(df, *args).collect()}
    assert set(arrow) == set(jvm) and len(arrow) == 40 * 8
    diffs = {k: (arrow[k], jvm[k]) for k in arrow if arrow[k] != jvm[k]}
    assert not diffs, dict(list(diffs.items())[:5])


def test_resample_locf_null_keys_one_group(spark):
    """A NULL key is ONE group — matching groupBy-on-the-key semantics
    and the JVM twin's window partitioning. The bucketed boundary scan
    must not split it per row (NaN != NaN), whether the null-key rows
    lead the bucket or not (code-review r8 finding)."""
    from redpanda_to_parquet_writer_spark.operators.asof import (
        resample_locf,
        resample_locf_sql,
    )

    df = spark.createDataFrame(
        [
            (None, 1, 1.0, 0),
            (None, 5, 2.0, 0),
            ("u-a", 3, 7.0, 0),
        ],
        "uid string, ts long, value double, seq long",
    )
    args = ("uid", "ts", "value", "seq", 0, 2, 5)
    arrow = {(r["uid"], r["grid_ts"]): r["value"] for r in resample_locf(df, *args).collect()}
    jvm = {(r["uid"], r["grid_ts"]): r["value"] for r in resample_locf_sql(df, *args).collect()}
    assert len(arrow) == 2 * 5, arrow  # exactly one grid per key, incl. NULL
    assert arrow == jvm
    assert arrow[(None, 4)] == 1.0 and arrow[(None, 6)] == 2.0  # LOCF across the null key

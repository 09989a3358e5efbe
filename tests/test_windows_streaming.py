"""Streaming windowed aggregation: drive the REAL streaming path (file
source -> watermark -> window -> sink) and check against the batch result
of the same operator (windows are deterministic expressions, so
batch == streaming-after-drain)."""

from __future__ import annotations

from pyspark.sql import functions as F

from redpanda_to_parquet_writer_spark.streaming.windows import (
    session_stats,
    windowed_value_stats,
)

SCHEMA = "event_id long, event_time timestamp, user_id long, value double"


def _events(spark, n=200):
    rows = []
    for i in range(n):
        # two bursts per user separated by > 30min -> 2 sessions
        burst = i % 2
        ts = 1704067200 + (i // 2) * 60 + burst * 7200  # 2024-01-01 + minutes (+2h)
        rows.append((i, ts, i % 3, float(i % 10)))
    return spark.createDataFrame(rows, "event_id long, event_time long, user_id long, value double").withColumn(
        "event_time", F.timestamp_seconds("event_time")
    )


def test_windowed_stats_stream_matches_batch(spark, tmp_path):
    df = _events(spark)
    src = str(tmp_path / "src")
    df.write.parquet(src)

    batch = windowed_value_stats(df, window="1 hour")
    expected = {tuple(map(str, r)) for r in batch.collect()}

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = str(tmp_path / "out")
    q = (
        windowed_value_stats(stream, window="1 hour", watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {tuple(map(str, r)) for r in spark.read.parquet(out).collect()}
    # append mode only emits windows the watermark has passed; with
    # AvailableNow + final watermark, all but the last window(s) close.
    assert got, "streaming emitted nothing"
    assert got <= expected
    missing = expected - got
    assert len(missing) <= 2, f"too many unemitted windows: {len(missing)}"  # only trailing windows may stay open


def test_session_stats_batch_semantics(spark):
    df = _events(spark, n=20)
    sessions = session_stats(df, gap="30 minutes")
    rows = sessions.collect()
    # 3 users x 2 bursts -> 6 sessions
    assert len(rows) == 6
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r)
    assert all(len(v) == 2 for v in per_user.values())
    # sessions don't overlap per user
    for v in per_user.values():
        v.sort(key=lambda r: r["session_start"])
        assert v[0]["session_end"] <= v[1]["session_start"]


def test_session_stats_streaming_runs(spark, tmp_path):
    df = _events(spark, n=60)
    src = str(tmp_path / "src")
    df.write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = str(tmp_path / "out")
    q = (
        session_stats(stream, gap="30 minutes", watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() >= 3  # closed sessions emitted
    assert set(got.columns) == {
        "user_id", "session_start", "session_end", "n_events", "total_value"
    }

"""Stream-stream interval join: streaming result == batch result of the
same condition (the join is deterministic given complete input, so a
drained AvailableNow stream must match the batch join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from redpanda_to_parquet_writer_spark.streaming.joins import interval_stream_join

SCHEMA = "event_id long, event_time timestamp, user_id long, kind string"


def _two_streams(spark, tmp_path):
    rows_l, rows_r = [], []
    base = 1704067200
    for i in range(120):
        # clicks every minute; purchases every 5 minutes
        rows_l.append((i, base + i * 60, i % 3, "click"))
        if i % 5 == 0:
            rows_r.append((1000 + i, base + i * 60 + 30, i % 3, "purchase"))
    mk = lambda rows: spark.createDataFrame(
        rows, "event_id long, event_time long, user_id long, kind string"
    ).withColumn("event_time", F.timestamp_seconds("event_time"))
    l_dir, r_dir = str(tmp_path / "l"), str(tmp_path / "r")
    mk(rows_l).write.parquet(l_dir)
    mk(rows_r).write.parquet(r_dir)
    return l_dir, r_dir


def test_stream_join_matches_batch(spark, tmp_path):
    l_dir, r_dir = _two_streams(spark, tmp_path)
    lb, rb = spark.read.parquet(l_dir), spark.read.parquet(r_dir)
    batch = interval_stream_join(lb, rb, "user_id", lookback="10 minutes")
    expected = {
        (r["event_id"], r["event_id_r"]) for r in batch.collect()
    }
    assert expected, "batch join should match something"

    ls = spark.readStream.schema(SCHEMA).parquet(l_dir)
    rs = spark.readStream.schema(SCHEMA).parquet(r_dir)
    out = str(tmp_path / "out")
    q = (
        interval_stream_join(ls, rs, "user_id", lookback="10 minutes")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["event_id"], r["event_id_r"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == expected


def test_streaming_dedup_within_watermark(spark, tmp_path):
    from redpanda_to_parquet_writer_spark.streaming.ingest import dedup_stream

    schema = "kafka_partition long, kafka_offset long, event_time timestamp"
    rows = [(0, o, 1704067200 + o) for o in range(50)]
    dups = rows + rows[10:20]  # redelivered chunk
    df = spark.createDataFrame(
        dups, "kafka_partition long, kafka_offset long, event_time long"
    ).withColumn("event_time", F.timestamp_seconds("event_time"))
    src = str(tmp_path / "src")
    df.write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    out = str(tmp_path / "out")
    q = (
        dedup_stream(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == 50
    assert got.select("kafka_offset").distinct().count() == 50
    # batch path: plain dropDuplicates
    assert dedup_stream(df).count() == 50

"""applyInPandasWithState offset-gap detector: gaps within a micro-batch
AND across micro-batch boundaries (the part only persistent group state
can catch)."""

from __future__ import annotations

from redpanda_to_parquet_writer_spark.streaming.stateful import (
    detect_offset_gaps,
    offset_gaps_batch,
)

SCHEMA = "kafka_partition long, kafka_offset long"


def _write_batches(spark, tmp_path):
    """Two files -> two micro-batches (maxFilesPerTrigger=1).

    partition 0: file1 has 0..9 then 12..19 (gap 10-11 inside batch 1);
                 file2 starts at 25 (gap 20-24 ACROSS the boundary).
    partition 1: contiguous 0..39 split across files -> no gaps.
    """
    src = str(tmp_path / "src")
    f1 = [(0, o) for o in [*range(10), *range(12, 20)]] + [(1, o) for o in range(20)]
    f2 = [(0, o) for o in range(25, 40)] + [(1, o) for o in range(20, 40)]
    spark.createDataFrame(f1, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(f2, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    return src


def test_streaming_gaps_within_and_across_batches(spark, tmp_path):
    src = _write_batches(spark, tmp_path)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = str(tmp_path / "out")
    q = (
        detect_offset_gaps(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["kafka_partition"], r["gap_start"], r["gap_end"], r["n_missing"])
        for r in spark.read.parquet(out).collect()
    }
    assert (0, 10, 11, 2) in got, "in-batch gap missed"
    assert (0, 20, 24, 5) in got, "cross-batch gap missed (state not persisted?)"
    assert not any(p == 1 for p, *_ in got), "false positive on contiguous partition"
    assert len(got) == 2


def test_batch_variant_agrees(spark, tmp_path):
    src = _write_batches(spark, tmp_path)
    df = spark.read.parquet(src)
    got = {
        (r["kafka_partition"], r["gap_start"], r["gap_end"], r["n_missing"])
        for r in offset_gaps_batch(df).collect()
    }
    assert got == {(0, 10, 11, 2), (0, 20, 24, 5)}


def test_batch_gaps_two_level_matches_flat_lag_across_spans(spark, monkeypatch):
    """The r12 two-level gap scan must equal the flat per-partition lag
    on data spanning MANY offset buckets — including gaps inside a
    bucket, gaps exactly at bucket boundaries, gaps spanning whole
    empty buckets, and a partition whose offsets sit in one bucket.
    The fixtures' offsets all fit a single 2^20 span, so this pins the
    boundary path with a shrunken span (the r11 prefix-sum precedent)."""
    import redpanda_to_parquet_writer_spark.streaming.stateful as st
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    monkeypatch.setattr(st, "GAP_SPAN", 8)
    rows = (
        # p0: in-bucket gap (3->6), boundary-straddling gap (7->9),
        # multi-empty-bucket gap (10 -> 50: buckets 1..5 empty)
        [(0, o) for o in [0, 1, 2, 3, 6, 7, 9, 10, 50, 51]]
        # p1: contiguous across several buckets -> no gaps
        + [(1, o) for o in range(0, 40)]
        # p2: single bucket only
        + [(2, o) for o in [5, 7]]
    )
    df = spark.createDataFrame(rows, SCHEMA)

    got = sorted(tuple(r) for r in st.offset_gaps_batch(df).collect())

    w = Window.partitionBy("kafka_partition").orderBy("kafka_offset")
    prev = F.lag("kafka_offset").over(w)
    flat = (
        df.distinct()
        .withColumn("__prev", prev)
        .filter(F.col("kafka_offset") > F.col("__prev") + 1)
        .select(
            "kafka_partition",
            (F.col("__prev") + 1).alias("gap_start"),
            (F.col("kafka_offset") - 1).alias("gap_end"),
            (F.col("kafka_offset") - F.col("__prev") - 1).alias("n_missing"),
        )
    )
    want = sorted(tuple(r) for r in flat.collect())
    assert got == want
    assert (0, 4, 5, 2) in got and (0, 11, 49, 39) in got and (2, 6, 6, 1) in got

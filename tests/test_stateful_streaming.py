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

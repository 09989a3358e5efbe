"""Small-files compaction: fewer files, identical content."""

from __future__ import annotations

from redpanda_to_parquet_writer_spark.sources.parquet import compact_parquet, load_table


def test_compact_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    events = load_table(spark, sf_dir, "events")
    # simulate micro-batch accretion: 40 tiny files
    events.repartition(40).write.parquet(src)

    report = compact_parquet(spark, src, dst, target_file_bytes=10 * 1024 * 1024)
    assert report["files_before"] == 40
    assert report["files_after"] < 40

    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

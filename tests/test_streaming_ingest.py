"""End-to-end ingest pipeline tests: envelope-shaped stream -> decode ->
flatten -> date-partitioned parquet, with the reference's invariants
(FIXTURES.md section 5): idempotent re-run, dedup exactness, schema-drift
versioning, date partitioning from event time, null-ts drop.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from redpanda_to_parquet_writer_spark.config import EngineConfig
from redpanda_to_parquet_writer_spark.operators.flatten import flatten_struct_columns
from redpanda_to_parquet_writer_spark.streaming.ingest import ingest_available_now
from redpanda_to_parquet_writer_spark.streaming.sink import (
    existing_max_offsets,
    merge_dedup_append,
    with_event_date,
)


def _envelope_rows(n=100, start_offset=0, extra_field=False, with_null_ts=0):
    """Kafka-envelope dicts with a JSON payload, reference-shaped
    (FIXTURES sections 1-2)."""
    rows = []
    for i in range(n):
        offset = start_offset + i
        payload = {
            "event_type": "market_data",
            "source": "ibkr",
            "data": {"symbol": f"SYM{i % 5}", "price": 100.0 + i, "volume": i * 10},
            "metadata": {"exchange": "NASDAQ", "seq": i},
        }
        if extra_field:
            payload["data"]["new_col"] = i
        ts = None if i < with_null_ts else 1704067200000 + i * 3_600_000  # 2024-01-01 + i hours
        rows.append(
            (
                "md_topic",
                offset % 4,
                offset,
                ts,
                f"key{i}",
                json.dumps(payload).encode("utf-8"),
            )
        )
    return rows


ENVELOPE_COLS = "kafka_topic string, kafka_partition long, kafka_offset long, kafka_timestamp long, kafka_key string, value binary"


def _envelope_df(spark, **kw):
    return spark.createDataFrame(_envelope_rows(**kw), ENVELOPE_COLS)


@pytest.fixture
def cfg(tmp_path):
    return EngineConfig(
        output_dir=str(tmp_path / "out"), checkpoint_dir=str(tmp_path / "ckpt")
    )


def _run_stream(spark, tmp_path, cfg, source_dir, out, ckpt):
    stream = (
        spark.readStream.schema(ENVELOPE_COLS).parquet(source_dir)
    )
    ingest_available_now(spark, stream, out, ckpt, cfg)


def test_ingest_end_to_end(spark, tmp_path, cfg):
    src = str(tmp_path / "src")
    out = str(tmp_path / "table")
    _envelope_df(spark, n=100, with_null_ts=5).write.parquet(src)
    _run_stream(spark, tmp_path, cfg, src, out, cfg.checkpoint_dir)

    result = spark.read.parquet(out)
    # null-ts rows dropped (P5)
    assert result.count() == 95
    # flatten hoisted data.* un-prefixed, prefixed metadata_* (P2)
    for col in ("symbol", "price", "volume", "metadata_exchange", "metadata_seq",
                "event_type", "source", "kafka_offset", "date"):
        assert col in result.columns, result.columns
    # event-time date partitioning (T4): 95 hourly rows starting 2024-01-01
    dates = {str(r["date"]) for r in result.select("date").distinct().collect()}
    assert "2024-01-01" in dates and len(dates) >= 4
    # partition dirs are hive-style (pruning-friendly)
    assert (tmp_path / "table" / "date=2024-01-01").exists()


def test_ingest_rerun_is_idempotent(spark, tmp_path, cfg):
    """T5: same checkpoint -> re-run ingests nothing new."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "table")
    _envelope_df(spark, n=50).write.parquet(src)
    for _ in range(2):
        _run_stream(spark, tmp_path, cfg, src, out, cfg.checkpoint_dir)
    assert spark.read.parquet(out).count() == 50


def test_merge_dedup_cross_run(spark, tmp_path, cfg):
    """J2 backstop: overlapping batches, no checkpoint -> anti-join dedup."""
    out = str(tmp_path / "table")
    first = with_event_date(
        flatten_via_pipeline(spark, _envelope_df(spark, n=60))
    )
    merge_dedup_append(spark, first, out, cfg=cfg)
    # second run overlaps offsets 30..59, adds 60..89
    second = with_event_date(
        flatten_via_pipeline(spark, _envelope_df(spark, n=60, start_offset=30))
    )
    merge_dedup_append(spark, second, out, cfg=cfg)
    result = spark.read.parquet(out)
    assert result.count() == 90
    # every (partition, offset) unique
    assert (
        result.select("kafka_partition", "kafka_offset").distinct().count() == 90
    )


def flatten_via_pipeline(spark, env_df):
    from redpanda_to_parquet_writer_spark.streaming.ingest import prepare_envelope_batch

    return prepare_envelope_batch(spark, env_df).drop("date")


def test_merge_dedup_prunes_dates_and_gates_broadcast(spark, tmp_path, cfg):
    """VERDICT r4 #1: the existing-side scan must be pruned to the
    batch's date partitions, and the broadcast must be size-gated with a
    shuffle-anti fallback — never an unconditional broadcast of the
    whole sink's key set."""
    from redpanda_to_parquet_writer_spark.streaming.sink import dedup_frame_for_merge

    out = str(tmp_path / "table")
    # 96 hourly rows = 4 date partitions (2024-01-01..04)
    history = with_event_date(flatten_via_pipeline(spark, _envelope_df(spark, n=96)))
    merge_dedup_append(spark, history, out, cfg=cfg)
    # incoming batch overlaps only the FIRST day (offsets 0..23)
    batch = with_event_date(flatten_via_pipeline(spark, _envelope_df(spark, n=24)))

    deduped = dedup_frame_for_merge(spark, batch, out, cfg=cfg)
    plan = deduped._jdf.queryExecution().executedPlan().toString()
    # date-pruned: only the single matching partition is scanned
    assert "PartitionFilters" in plan and "date" in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # pruning actually takes effect: re-running the merge adds nothing
    assert deduped.count() == 0

    # size gate: a zero-byte threshold must force the shuffle anti-join
    tiny = EngineConfig(
        output_dir=cfg.output_dir,
        checkpoint_dir=cfg.checkpoint_dir,
        dedup_broadcast_max_bytes=0,
    )
    gated = dedup_frame_for_merge(spark, batch, out, cfg=tiny)
    gplan = gated._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in gplan, "gate must demote to shuffle join"
    assert "LeftAnti" in gplan
    assert gated.count() == 0  # shuffle path is just as correct

    # rerun-idempotence through the public entry point
    merge_dedup_append(spark, batch, out, cfg=tiny)
    assert spark.read.parquet(out).count() == 96


def test_schema_drift_creates_version_table(spark, tmp_path, cfg):
    """1.4: a batch with a new payload column goes to a _v<hash> table,
    base table untouched."""
    src1, src2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    out = str(tmp_path / "table")
    _envelope_df(spark, n=20).write.parquet(src1)
    _envelope_df(spark, n=20, start_offset=20, extra_field=True).write.parquet(src2)

    _run_stream(spark, tmp_path, cfg, src1, out, str(tmp_path / "ck1"))
    base_count = spark.read.parquet(out).count()
    _run_stream(spark, tmp_path, cfg, src2, out, str(tmp_path / "ck2"))

    assert spark.read.parquet(out).count() == base_count  # base intact
    versioned = [p for p in tmp_path.iterdir() if p.name.startswith("table_v")]
    assert len(versioned) == 1
    vdf = spark.read.parquet(str(versioned[0]))
    assert vdf.count() == 20 and "new_col" in vdf.columns
    # union read across versions (U1)
    from redpanda_to_parquet_writer_spark.sources.parquet import read_versioned_union

    merged = read_versioned_union(spark, out)
    assert merged.count() == 40 and "new_col" in merged.columns


def test_offset_recovery_from_sink(spark, tmp_path, cfg):
    """T1 backstop: per-partition max offsets recoverable from output."""
    out = str(tmp_path / "table")
    df = with_event_date(flatten_via_pipeline(spark, _envelope_df(spark, n=40)))
    merge_dedup_append(spark, df, out, cfg=cfg)
    offsets = existing_max_offsets(spark, out)
    # partitions 0..3, offsets round-robin: partition p's max is 36+p
    assert offsets == {0: 36, 1: 37, 2: 38, 3: 39}
    assert existing_max_offsets(spark, str(tmp_path / "missing")) == {}


def test_offset_recovery_empty_sink_root(spark, tmp_path, cfg):
    """An exists-but-EMPTY sink root (pre-created by an orchestrator) is
    a first write, not a schema-inference crash; after a real write the
    same root recovers offsets and the dedup backstop engages."""
    root = tmp_path / "pre_created"
    root.mkdir()  # no data files yet
    assert existing_max_offsets(spark, str(root)) == {}
    # nested empty dirs (e.g. a stray date= partition dir) are still empty
    (root / "date=2024-01-01").mkdir()
    assert existing_max_offsets(spark, str(root)) == {}
    df = with_event_date(flatten_via_pipeline(spark, _envelope_df(spark, n=8)))
    merge_dedup_append(spark, df, str(root), cfg=cfg)
    assert existing_max_offsets(spark, str(root)) != {}


def test_undecodable_payload_keeps_raw_value(spark, tmp_path, cfg):
    """P1 fallback: garbage payloads survive as raw_value, not lost."""
    rows = [("t", 0, 0, 1704067200000, None, b"not json at all")]
    env = spark.createDataFrame(rows, ENVELOPE_COLS)
    from redpanda_to_parquet_writer_spark.streaming.ingest import prepare_envelope_batch

    # schema inferred from a valid sample elsewhere; garbage row -> nulls + raw_value
    valid = _envelope_df(spark, n=5)
    from redpanda_to_parquet_writer_spark.operators.decode import infer_json_schema

    schema = infer_json_schema(
        spark, [r["value"].decode() for r in valid.select("value").collect()]
    )
    prepared = prepare_envelope_batch(spark, env, schema)
    row = prepared.collect()[0]
    assert row["raw_value"] == "not json at all"
    assert row["symbol"] is None


def test_merge_dedup_raises_on_corrupt_sink(spark, tmp_path, cfg):
    """ADVICE r01: a transient/corrupt read of the existing sink must
    PROPAGATE (not silently disable the anti-join backstop and append
    duplicates). Only a missing path means first-write."""
    sink = tmp_path / "corrupt_sink"
    sink.mkdir()
    (sink / "part-00000.parquet").write_text("this is not parquet")
    out = str(sink)
    df = spark.createDataFrame(
        [(0, 1, 1000, "k", "2024-01-01")],
        "kafka_partition int, kafka_offset long, kafka_timestamp long, "
        "kafka_key string, date string",
    )
    with pytest.raises(Exception):
        merge_dedup_append(spark, df, out, cfg=cfg)

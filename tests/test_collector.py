"""Collector orchestration: multi-topic end-to-end run with validation."""

from __future__ import annotations

import pytest

from redpanda_to_parquet_writer_spark.collector import Collector
from redpanda_to_parquet_writer_spark.config import EngineConfig
from redpanda_to_parquet_writer_spark.operators.validate import PASS

from tests.test_streaming_ingest import ENVELOPE_COLS, _envelope_df


@pytest.fixture
def collector(spark, tmp_path):
    cfg = EngineConfig(
        output_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        skip_validation=False,
    )
    sources = {}

    def factory(topic, resume_offsets):
        return spark.readStream.schema(ENVELOPE_COLS).parquet(sources[topic])

    c = Collector(spark, cfg, factory)
    c._test_sources = sources
    return c


def test_multi_topic_run(spark, tmp_path, collector):
    for i, topic in enumerate(("topic_a", "topic_b")):
        src = str(tmp_path / f"src_{topic}")
        _envelope_df(spark, n=30 + i * 10).write.parquet(src)
        collector._test_sources[topic] = src

    run = collector.run(["topic_a", "topic_b"])
    assert [r.topic for r in run.reports] == ["topic_a", "topic_b"]
    assert [r.rows_written for r in run.reports] == [30, 40]
    assert run.total_rows == 70
    assert all(r.validation.status == PASS for r in run.reports)
    assert all(r.fmt == "json" for r in run.reports)  # no msgpack lib -> json

    # re-run: checkpointed -> no new rows, still consistent
    run2 = collector.run(["topic_a", "topic_b"])
    assert run2.total_rows == 70


def test_trim_requires_kafka_lib():
    from redpanda_to_parquet_writer_spark.collector import trim_kafka_retention

    with pytest.raises(ImportError, match="confluent-kafka"):
        trim_kafka_retention("localhost:9092", {"t": {0: 10}})

"""Engine configuration.

Mirrors the reference collector's env-var surface
(/root/reference/app/redpanda_to_parquet_collector.py:80-103) as a typed
config object: compression codec/level, row-group size, batch sizing, skip
flags, staging/retention knobs — plus Spark-specific tuning (shuffle
partitions, AQE, broadcast threshold).

Every knob has a sane default for local[32] testing; at cluster scale the
same object is constructed from `spark-submit --conf` / env overrides.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env_bool(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.strip().lower() in ("1", "true", "yes", "on")


def _env_int(name: str, default: int) -> int:
    v = os.environ.get(name)
    return int(v) if v else default


@dataclass
class EngineConfig:
    """Typed config for the engine.

    Reference parity (collector:80-103):
      - output_dir / staging semantics  -> `output_dir`
      - PARQUET_COMPRESSION / COMPRESSION_LEVEL -> `compression`
      - ROW_GROUP_SIZE                  -> `parquet_block_bytes`
      - MEMORY_BATCH_SIZE               -> obsolete (Spark micro-batches)
      - SKIP_DEDUPLICATION              -> `skip_dedup`
      - SKIP_VALIDATION                 -> `skip_validation`
      - MAX_MESSAGES                    -> `max_offsets_per_trigger`
      - KAFKA fetch tuning              -> `kafka_fetch_min_bytes`, `kafka_max_partition_fetch_bytes`
    """

    output_dir: str = field(
        default_factory=lambda: os.environ.get("ENGINE_OUTPUT_DIR", "/tmp/engine_output")
    )
    checkpoint_dir: str = field(
        default_factory=lambda: os.environ.get("ENGINE_CHECKPOINT_DIR", "/tmp/engine_checkpoints")
    )
    # Parquet layout: zstd + large row groups, per the reference's measured
    # 20-30% size win (collector:97-99, README.md:303).
    compression: str = field(
        default_factory=lambda: os.environ.get("PARQUET_COMPRESSION", "zstd")
    )
    parquet_block_bytes: int = field(
        default_factory=lambda: _env_int("PARQUET_BLOCK_BYTES", 128 * 1024 * 1024)
    )
    skip_dedup: bool = field(default_factory=lambda: _env_bool("SKIP_DEDUPLICATION", True))
    skip_validation: bool = field(default_factory=lambda: _env_bool("SKIP_VALIDATION", False))
    max_offsets_per_trigger: int | None = field(
        default_factory=lambda: _env_int("MAX_OFFSETS_PER_TRIGGER", 0) or None
    )

    # Kafka source tuning (collector:326-338). Passed through as
    # `kafka.`-prefixed source options.
    kafka_bootstrap_servers: str = field(
        default_factory=lambda: os.environ.get("KAFKA_BOOTSTRAP_SERVERS", "localhost:9092")
    )
    kafka_fetch_min_bytes: int = field(
        default_factory=lambda: _env_int("FETCH_MIN_BYTES", 10 * 1024 * 1024)
    )
    kafka_max_partition_fetch_bytes: int = field(
        default_factory=lambda: _env_int("MAX_PARTITION_FETCH_BYTES", 50 * 1024 * 1024)
    )

    # Merge-dedup broadcast gate: the existing-side key scan (pruned to the
    # incoming batch's date partitions) is broadcast only when the pruned
    # partitions' on-disk bytes stay under this bound; above it the
    # anti-join falls back to a shuffle join. Parquet bytes overestimate
    # the 2-key-column footprint, so the gate is conservative — it can
    # only demote a broadcastable join to a (still correct) shuffle join.
    dedup_broadcast_max_bytes: int = field(
        default_factory=lambda: _env_int("DEDUP_BROADCAST_MAX_BYTES", 256 * 1024 * 1024)
    )

    # Spark tuning.
    shuffle_partitions: int = field(
        default_factory=lambda: _env_int("SPARK_SHUFFLE_PARTITIONS", 32)
    )
    # Scan-split sizing (spark.sql.files.maxPartitionBytes), exposed
    # as a first-class knob with Spark's 128 MiB default. MEASURED to
    # be a local no-op before keeping the default (r13): Spark's split
    # planner already divides by max(openCost, bytes/defaultParallelism)
    # when files are smaller than maxPartitionBytes, so the 57 MB
    # single-file decade fixture scanned at 14 partitions at every
    # setting from 128 MiB down to 4 MiB (and 1 MiB splits were
    # SLOWER — scheduling overhead, 28.0s vs 25.6s). On a cluster the
    # knob is the standard lever for partition-memory sizing at the
    # target scale; override via SPARK_FILES_MAX_PARTITION_BYTES.
    files_max_partition_bytes: int = field(
        default_factory=lambda: _env_int(
            "SPARK_FILES_MAX_PARTITION_BYTES", 128 * 1024 * 1024
        )
    )
    master: str = field(
        default_factory=lambda: "local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "*")
    )
    # JVM heap for the local-mode session (spark.driver.memory — in
    # local mode the driver JVM IS every executor). Spark's 1g default
    # starved a 32-thread session at the sf~1 scaling point (GCLocker
    # retry warnings, then JVM death mid-sweep); on a real cluster this
    # maps to executor memory sizing instead. None = leave Spark's
    # default, keeping recorded bench baselines comparable.
    driver_memory: str | None = field(
        default_factory=lambda: os.environ.get("SPARK_GRAFT_DRIVER_MEMORY") or None
    )

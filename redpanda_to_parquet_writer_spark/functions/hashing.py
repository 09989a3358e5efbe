"""Row/content/schema hashing.

Reference parity:
  - F4 row content hash: ``pl.struct(content_cols).hash()`` over all
    non-``kafka_*`` columns (parquet_to_polars.py:596-618). Spark-side we
    provide two variants: ``content_hash`` (xxhash64, fast, stable within a
    Spark version) and ``stable_content_hash`` (sha2 over canonical JSON,
    stable across engines/runs — the one used when results must be
    reproducible outside Spark).
  - F5 schema fingerprint: md5 over the sorted ``name:dtype`` signature,
    first 8 hex chars (collector:414-432). Driver-side, no DF op.

At scale: both hash variants are narrow (no shuffle); xxhash64 is a
codegen'd JVM intrinsic, sha2(to_json(...)) is heavier but still
whole-stage-codegen — use it only where cross-engine stability matters.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: Columns the reference excludes from content hashing (reader:607):
#: the Kafka envelope is metadata, not content.
KAFKA_META_PREFIX = "kafka_"


def content_columns(df: DataFrame, exclude_prefix: str = KAFKA_META_PREFIX) -> list[str]:
    """Non-metadata columns, the hash input set (reader:607-611)."""
    return [c for c in df.columns if not c.startswith(exclude_prefix)]


def content_hash(df: DataFrame, cols: list[str] | None = None) -> Column:
    """64-bit content hash over the given (default: non-kafka) columns.

    xxhash64 over a struct — one JVM intrinsic call per row, no Python.
    """
    cols = cols or content_columns(df)
    return F.xxhash64(F.struct(*[F.col(c) for c in cols]))


def stable_content_hash(df: DataFrame, cols: list[str] | None = None) -> Column:
    """Engine-independent content hash: sha2-256 over canonical JSON."""
    cols = cols or content_columns(df)
    return F.sha2(F.to_json(F.struct(*[F.col(c) for c in sorted(cols)])), 256)


def schema_fingerprint(schema: StructType) -> str:
    """md5 of the sorted `name:dtype` signature, first 8 hex chars.

    Same recipe as the reference's get_schema_hash (collector:414-432) so
    schema-drift detection versions tables identically.
    """
    signature = ",".join(
        f"{f.name}:{f.dataType.simpleString()}" for f in sorted(schema.fields, key=lambda f: f.name)
    )
    return hashlib.md5(signature.encode("utf-8")).hexdigest()[:8]

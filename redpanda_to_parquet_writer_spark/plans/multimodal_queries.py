"""Multimodal plumbing plan: binary column + metadata + Arrow-batched
decode stage, oracle-checked on deterministic byte-level facts.

The codec here is the deterministic byte-stats one (the real image/audio
codecs are stubbed, operators/multimodal.py) — what the oracle verifies
is the Spark-side plumbing: binary encoding, JVM-side metadata exprs, and
the mapInPandas batch contract."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from redpanda_to_parquet_writer_spark.operators.multimodal import (
    map_media_batches,
    with_media_metadata,
)
from redpanda_to_parquet_writer_spark.sources.parquet import load_table

_BYTE_STATS_SCHEMA = StructType(
    [StructField("first_byte", LongType()), StructField("last_byte", LongType())]
)


def _byte_stats_codec(data: bytes):
    return (int(data[0]), int(data[-1])) if data else (None, None)


def multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("blob"))
    with_meta = with_media_metadata(blobs, "blob", media_type="text").select(
        "doc_id",
        "blob",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.content_hash").alias("content_hash"),
    )
    decoded = map_media_batches(
        with_meta,
        "blob",
        _BYTE_STATS_SCHEMA,
        codec=_byte_stats_codec,
        passthrough=["doc_id", "n_bytes", "content_hash"],
    )
    return decoded


QUERIES = {"multimodal_byte_stats": multimodal_byte_stats}

# synthetic docs are ASCII, so ord(char) == byte value on both engines
ORACLES = {
    "multimodal_byte_stats": """
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS content_hash,
               ord(left(text, 1)) AS first_byte,
               ord(right(text, 1)) AS last_byte
        FROM documents
    """,
}

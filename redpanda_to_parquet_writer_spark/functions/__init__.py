from redpanda_to_parquet_writer_spark.functions.dates import date_path, event_date
from redpanda_to_parquet_writer_spark.functions.hashing import (
    content_hash,
    schema_fingerprint,
    stable_content_hash,
)

__all__ = [
    "date_path",
    "event_date",
    "content_hash",
    "stable_content_hash",
    "schema_fingerprint",
]

from redpanda_to_parquet_writer_spark.streaming.ingest import (
    ingest_available_now,
    prepare_envelope_batch,
)
from redpanda_to_parquet_writer_spark.streaming.sink import (
    existing_max_offsets,
    write_date_partitioned,
)

__all__ = [
    "ingest_available_now",
    "prepare_envelope_batch",
    "write_date_partitioned",
    "existing_max_offsets",
]

from redpanda_to_parquet_writer_spark.operators.dedup import (
    anti_join_dedup,
    content_dedup_keep_first,
)
from redpanda_to_parquet_writer_spark.operators.flatten import flatten_struct_columns

__all__ = ["anti_join_dedup", "content_dedup_keep_first", "flatten_struct_columns"]

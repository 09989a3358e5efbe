"""Named query plans + DuckDB oracle SQL.

Each plan module exposes `QUERIES: dict[str, (spark, sf_dir) -> DataFrame]`
and `ORACLES: dict[str, str]` (ANSI SQL DuckDB can run on the same parquet
tables). Column names/aliases match exactly between the two — the driver
sorts columns by name and hash-compares values.

Floating-point convention: any column produced by arithmetic/aggregation
is `round()`ed to a fixed scale on BOTH sides, so double summation-order
differences between engines can't flip the hash. Columns that merely copy
stored values stay exact.
"""

from redpanda_to_parquet_writer_spark.plans import (
    curation_pipeline,
    multimodal_queries,
    relational,
    relational2,
    text_queries,
    vector_queries,
)

QUERIES = {
    **relational.QUERIES,
    **relational2.QUERIES,
    **text_queries.QUERIES,
    **vector_queries.QUERIES,
    **multimodal_queries.QUERIES,
    **curation_pipeline.QUERIES,
}

ORACLES = {
    **relational.ORACLES,
    **relational2.ORACLES,
    **text_queries.ORACLES,
    **vector_queries.ORACLES,
    **multimodal_queries.ORACLES,
    **curation_pipeline.ORACLES,
}

__all__ = ["QUERIES", "ORACLES"]

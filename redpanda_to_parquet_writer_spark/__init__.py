"""PySpark-native analytics + streaming-ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference toolkit ``acadiancapitalpartners/redpanda-to-parquet-writer``
(a Kafka/Redpanda -> MessagePack/JSON decode -> flatten -> dedup ->
date-partitioned-Parquet collector plus a Parquet analytics reader),
re-expressed Spark-first:

- DataFrame / SQL declarative plans everywhere; Catalyst does pruning,
  pushdown and join planning (SURVEY.md section 4 shows zero custom rules
  are needed).
- Structured Streaming for the ingest path (checkpoints replace the
  reference's Parquet-scan offset recovery).
- Beyond reference parity: large-scale training-data-pipeline operators —
  exact + fuzzy dedup (MinHash-LSH, SimHash, n-gram Jaccard), embedding
  similarity search, multimodal binary columns, and text analysis.
"""

from redpanda_to_parquet_writer_spark.config import EngineConfig
from redpanda_to_parquet_writer_spark.session import get_spark

__all__ = ["EngineConfig", "get_spark"]

__version__ = "0.1.0"

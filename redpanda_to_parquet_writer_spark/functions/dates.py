"""Event-time date derivation.

The reference derives the output partition from the *Kafka message
timestamp* (epoch milliseconds), not processing time
(collector:863-867: ``pl.from_epoch("kafka_timestamp", "ms").dt.strftime("%Y/%m/%d")``).
A late message simply lands in its (old) date partition — append-only, no
watermark needed (SURVEY section 2.9 T4).

All helpers are pure Column expressions — JVM-side, codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def date_path(epoch_ms: Column | str) -> Column:
    """epoch-ms long -> 'yyyy/MM/dd' string (F1, collector:863-867)."""
    col = F.col(epoch_ms) if isinstance(epoch_ms, str) else epoch_ms
    return F.date_format(F.timestamp_millis(col), "yyyy/MM/dd")


def event_date(epoch_ms: Column | str) -> Column:
    """epoch-ms long -> DateType, the hive-style partition column.

    We partition on a real `date` column (hive layout `date=YYYY-MM-DD/`)
    instead of the reference's bare `YYYY/MM/DD` directories so Catalyst's
    PruneFileSourcePartitions works out of the box (SURVEY section 4).
    """
    col = F.col(epoch_ms) if isinstance(epoch_ms, str) else epoch_ms
    return F.to_date(F.timestamp_millis(col))

"""Oracle-gated Structured Streaming query: the STREAMING engine itself
inside the driver-verified surface.

Every other registry entry verifies a batch plan; this one runs a real
streaming query — file source -> watermarked tumbling-window aggregate ->
memory sink, drained with Trigger.AvailableNow — and returns the
materialized result, which the driver hash-compares against plain batch
SQL. Works because the pipeline is deterministic end-to-end: the window
aggregate's money-style sum accumulates as decimal (order-independent),
so micro-batch boundaries and task order cannot change a single bit.

Reference anchor: the reference's drain loop is a bounded consume->write
cycle (redpanda_to_parquet_collector.py:324-411); AvailableNow is the
Spark-native equivalent, and this query proves the equivalence class
(stream result == batch SQL result) rather than asserting it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redpanda_to_parquet_writer_spark.functions.dates import event_epoch_us

_SINK_TABLE = "streaming_hourly_stats_sink"


def streaming_hourly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event stats computed by Structured Streaming (availableNow
    drain into a memory sink), hash-equal to the batch SQL oracle.

    total_value accumulates as DECIMAL(18,6) — exact and order-
    independent, so the result is bit-identical no matter how the file
    source splits micro-batches or how tasks interleave (the same
    invariant the partition-invariance suite asserts for batch plans).
    """
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    # the file stream source requires a DIRECTORY; narrow the listing to
    # the events table with a glob (the driver fixtures are one file per
    # table in a flat dir)
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts = F.timestamp_micros(event_epoch_us(stream))
    agg = (
        stream.withColumn("evt_ts", ts)
        .withWatermark("evt_ts", "2 hours")
        .groupBy(F.window("evt_ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.expr(
                "CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)"
            ).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
    )
    # rerun idempotence: the driver (and drive_entry.py) executes each
    # query twice in one session
    spark.catalog.dropTempView(_SINK_TABLE)
    q = (
        agg.writeStream.format("memory")
        .queryName(_SINK_TABLE)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(_SINK_TABLE)


QUERIES = {"streaming_hourly_event_stats": streaming_hourly_event_stats}

ORACLES = {
    # plain batch SQL over the same parquet — the streaming pipeline must
    # reproduce it exactly
    "streaming_hourly_event_stats": """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               count(*) AS n,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
                 AS total_value
        FROM events
        GROUP BY 1
    """,
}

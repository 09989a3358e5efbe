"""SparkSession factory.

One place to build a session tuned for the engine: AQE on (runtime
re-planning + skew-join handling), Arrow on (fast Pandas-UDF transfer for
the decode path), UTC timezone (epoch-ms event-time semantics match the
reference's UTC date partitioning, collector:863-867), shuffle partitions
sized to the core count rather than Spark's default 200.

At 100 TB these settings still hold: AQE coalesces small shuffle
partitions and splits skewed ones at runtime, so one static
`shuffle_partitions` value doesn't have to be right for every stage.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from redpanda_to_parquet_writer_spark.config import EngineConfig


def get_spark(
    config: EngineConfig | None = None, app_name: str = "redpanda_to_parquet_writer_spark"
) -> SparkSession:
    cfg = config or EngineConfig()
    builder = (
        SparkSession.builder.master(cfg.master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cfg.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", cfg.compression)
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # scan-split sizing — see EngineConfig.files_max_partition_bytes
        # (single-file fixtures smaller than one 128 MiB default split
        # run CPU-heavy scan projections in ONE task)
        .config(
            "spark.sql.files.maxPartitionBytes",
            str(cfg.files_max_partition_bytes),
        )
        # InferFiltersFromGenerate adds `size(x)>0 AND isnotnull(x)`
        # before every explode; predicate pushdown then substitutes the
        # alias chain, so an explode of a computed array re-evaluates the
        # FULL array expression (interpreted, per input row) inside a
        # scan-level filter. Measured on the n-gram Jaccard query at
        # sf0.1: 18.5s -> 1.8s from excluding the rule. The filters it
        # infers only help when exploded arrays are frequently
        # null/empty, which no pipeline here exhibits.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.ui.enabled", "false")
    )
    if cfg.driver_memory:
        # must be set before the JVM launches; a getOrCreate that joins
        # an already-running session cannot change it
        builder = builder.config("spark.driver.memory", cfg.driver_memory)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

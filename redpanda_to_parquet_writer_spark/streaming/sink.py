"""Date-partitioned Parquet sink + offset recovery.

Reference parity (SURVEY 2.1/2.9):
  - S10 date-partitioned sink: one partition per event-time date
    (collector:636-841, 863-867). We use hive layout
    `topic=<t>/date=YYYY-MM-DD/` so Catalyst prunes partitions natively
    (SURVEY 4: prefer hive layout over bare YYYY/MM/DD dirs).
  - S11 parallel partition writes: free — Spark writes all partitions as
    parallel tasks of one job.
  - S12 atomic write: free — the file-commit protocol stages task output
    and renames on commit.
  - O1 clustered storage: sortWithinPartitions(partition, offset) orders
    rows inside each file without a global sort.
  - T1 offset recovery: `existing_max_offsets` re-derives per-partition
    resume offsets by scanning ONLY the key columns of the output
    (projected read, S7 — Catalyst prunes to 2 columns), exactly the
    reference's `get_existing_max_offsets` (collector:468-530). Used as
    the cross-run backstop when no checkpoint exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redpanda_to_parquet_writer_spark.config import EngineConfig
from redpanda_to_parquet_writer_spark.functions.dates import event_date
from redpanda_to_parquet_writer_spark.operators.dedup import anti_join_dedup


def with_event_date(df: DataFrame, ts_col: str = "kafka_timestamp") -> DataFrame:
    """Attach the event-time date partition column (F1/T4).

    Null-timestamp rows are dropped first, as the collector does before
    writing (P5, collector:1299).
    """
    return df.filter(F.col(ts_col).isNotNull()).withColumn("date", event_date(ts_col))


def write_date_partitioned(
    df: DataFrame,
    root: str,
    cfg: EngineConfig | None = None,
    mode: str = "append",
    files_per_date: int = 1,
) -> None:
    """Write a prepared (date-columned) frame as hive-partitioned Parquet.

    zstd + large row groups per the reference's compression findings
    (collector:97-99); clustered by (partition, offset) inside each file
    (O1, collector:858-860).

    Rows are repartitioned on the date key first: without this, every
    task holds every date and the job writes tasks x dates files (e.g.
    32 x 30 = 960 tiny files at sf0.1 — measured; with clustering, 30).
    Raise `files_per_date` when single dates are too big for one writer
    (the salt spreads a date over that many tasks).
    """
    cfg = cfg or EngineConfig()
    sort_cols = [c for c in ("kafka_topic", "kafka_partition", "kafka_offset") if c in df.columns]
    if "date" in df.columns:
        keys = [F.col("date")]
        if files_per_date > 1 and "kafka_offset" in df.columns:
            keys.append(F.pmod(F.col("kafka_offset"), F.lit(files_per_date)))
        df = df.repartition(*keys)
    out = df.sortWithinPartitions(*sort_cols) if sort_cols else df
    (
        out.write.partitionBy("date")
        .option("compression", cfg.compression)
        .option("parquet.block.size", str(cfg.parquet_block_bytes))
        .mode(mode)
        .parquet(root)
    )


def _sink_exists(spark: SparkSession, root: str) -> bool:
    """True iff the sink root exists AND holds at least one data file
    (Hadoop FS probe).

    Used instead of try/except around the read: a transient or
    corrupt-read failure must PROPAGATE (silently treating it as
    "first write" would disable the exactly-once anti-join backstop and
    append duplicates); only a genuinely missing path means first write.
    An exists-but-EMPTY root (e.g. mkdir'd by an external orchestrator
    before the first batch) is also a first write — reading it would
    fail schema inference, not signal duplicates.
    """
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(root)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return False
    it = fs.listFiles(hpath, True)  # recursive, files only
    while it.hasNext():
        name = it.next().getPath().getName()
        if not name.startswith((".", "_")):
            return True
    return False


def existing_max_offsets(spark: SparkSession, root: str) -> dict[int, int]:
    """Per-partition max persisted offset from the sink itself (T1).

    Projected scan of 2 columns + group-by-max (A1) — the reference's
    resume recovery (collector:468-530), kept as the backstop for
    checkpoint loss (SURVEY 7.3 risk 2).
    """
    if not _sink_exists(spark, root):
        return {}
    df = spark.read.parquet(root)
    rows = (
        df.select("kafka_partition", "kafka_offset")
        .groupBy("kafka_partition")
        .agg(F.max("kafka_offset").alias("max_offset"))
        .collect()
    )
    return {int(r["kafka_partition"]): int(r["max_offset"]) for r in rows}


def merge_dedup_append(
    spark: SparkSession,
    new_df: DataFrame,
    root: str,
    keys: tuple[str, ...] = ("kafka_partition", "kafka_offset"),
    cfg: EngineConfig | None = None,
) -> None:
    """Idempotent append: anti-join new rows against persisted keys (J2).

    The merge-phase dedup (collector:1003-1010) — run inside foreachBatch
    or as the batch-mode write path when SKIP_DEDUPLICATION=false. The
    existing side reads ONLY the key columns (projected scan) and is
    broadcast.

    Only a missing sink path skips the anti-join (first write); any
    other read failure propagates — swallowing it would silently break
    idempotency.
    """
    if _sink_exists(spark, root):
        existing = spark.read.parquet(root).select(*keys)
        deduped = anti_join_dedup(new_df, existing, keys)
    else:
        deduped = new_df  # first write: nothing to dedup against
    write_date_partitioned(deduped, root, cfg, mode="append")


def export_reference_layout(
    spark: SparkSession, hive_root: str, out_root: str, topic: str
) -> list[str]:
    """Export a hive-partitioned topic table to the reference's exact
    directory layout: `out_root/YYYY/MM/DD/<topic>.parquet`, ONE file per
    (date, topic) (collector:11, 441-443; SURVEY 7.3 risk 5).

    The engine's native layout stays hive-style (partition pruning, many
    files per partition); this exporter exists for byte-level path
    compatibility with downstream consumers of the reference. Each date
    repartitions to one file (the reference's own constraint), written
    via Spark's committer, then renamed into place driver-side.

    Returns the exported file paths.
    """
    import glob
    import os
    import shutil
    import tempfile

    df = spark.read.parquet(hive_root)
    dates = [r["date"] for r in df.select("date").distinct().collect()]
    exported = []
    for d in sorted(str(x) for x in dates):
        y, m, day = d.split("-")
        dest_dir = os.path.join(out_root, y, m, day)
        os.makedirs(dest_dir, exist_ok=True)
        tmp = tempfile.mkdtemp(prefix="refexport_")
        (
            df.filter(F.col("date") == d)
            .drop("date")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dest = os.path.join(dest_dir, f"{topic}.parquet")
        shutil.move(part, dest)
        shutil.rmtree(tmp, ignore_errors=True)
        exported.append(dest)
    return exported

"""Bucketed table layout for shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact equi-join is shuffling both
sides on the key. Bucketing pre-shuffles at WRITE time: both tables
hash-partitioned into the same number of buckets on the join key, so the
join plans with ZERO Exchange — each task merge-joins bucket i of A with
bucket i of B. The write cost is paid once; every subsequent join,
aggregation, or dedup on the bucket key is shuffle-free.

Spark requires bucketed data to live in the catalog (`saveAsTable`) —
bucket metadata is table metadata, not file metadata.

Guidelines encoded here:
  - bucket counts must MATCH (or divide) across co-joined tables;
  - `sortBy` the bucket key so the join is a zero-sort merge join;
  - pick bucket counts so one bucket fits an executor's memory at target
    scale (e.g. 100 TB / 4096 buckets ≈ 25 GB per bucket — size to taste);
  - to also skip the join-side Sort, enable
    `spark.sql.legacy.bucketedTableScan.outputOrdering` (the scan then
    reports the bucket-sort order; requires the one-file-per-bucket
    layout `write_bucketed` produces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist `df` as a bucketed (and bucket-sorted) catalog table.

    `path` makes it an external table at that location (the warehouse
    dir is a static conf, so tests and ad-hoc runs pass an explicit
    path)."""
    # one file per bucket: Spark only trusts bucket-sort metadata (and
    # skips the join-side Sort) when a bucket is a single file; also the
    # small-files guard at scale
    df = df.repartition(num_buckets, *[df[c] for c in bucket_cols])
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
    force_sort_merge: bool = False,
) -> DataFrame:
    """Join two co-bucketed tables; plans with no Exchange when both are
    bucketed on `on` with matching bucket counts (assert via .explain).

    `force_sort_merge` pins the merge strategy: on small fixtures
    Catalyst prefers broadcasting one side (correct, but it hides the
    zero-Exchange bucket shape this layout exists for); at production
    scale both sides exceed the broadcast threshold and SMJ is chosen
    anyway."""
    left = spark.table(left_table)
    if force_sort_merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), on=on, how=how)

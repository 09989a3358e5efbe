"""Z-order clustering: key correctness properties + a MEASURED
data-skipping effect — parquet row-group min/max footer spans must
collapse on BOTH dimensions after a z-ordered write, which is exactly
what lets a 100-TB scan prune row groups for filters on either column.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from redpanda_to_parquet_writer_spark.operators.zorder import (
    interleave_sql,
    quantize_sql,
    write_zordered,
    zorder_key,
)
from redpanda_to_parquet_writer_spark.sources.parquet import load_table


def test_zorder_key_range_and_determinism(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    keyed = zorder_key(events, "user_id", "value", bits=8)
    row = keyed.agg(
        F.min("zkey").alias("lo"),
        F.max("zkey").alias("hi"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert 0 <= row["lo"] <= row["hi"] < 1 << 16
    assert row["n"] == events.count()
    # deterministic: same input -> same keys
    a = {r["event_id"]: r["zkey"] for r in keyed.collect()}
    b = {r["event_id"]: r["zkey"] for r in zorder_key(events, "user_id", "value").collect()}
    assert a == b


def test_zorder_extremes_map_to_corners(spark):
    """min/min -> key 0; max/max -> all ones; a degenerate (constant)
    dimension contributes zero bits instead of dividing by zero."""
    df = spark.createDataFrame(
        [(1, 0, 0.0), (2, 100, 50.0), (3, 7, 50.0)], "id long, a long, b double"
    )
    keys = {r["id"]: r["zkey"] for r in zorder_key(df, "a", "b", bits=4).collect()}
    assert keys[1] == 0
    assert keys[2] == (1 << 8) - 1  # 4 bits x 2 dims, all set
    const = spark.createDataFrame([(1, 5, 9.0), (2, 9, 9.0)], "id long, a long, b double")
    got = {r["id"]: r["zkey"] for r in zorder_key(const, "a", "b", bits=4).collect()}
    # b is constant -> bucket 0 for both rows; key varies only by a-bits
    assert got[1] == 0
    assert got[2] == 0b10101010  # a at max -> odd bit positions set


def test_quantize_interleave_sql_portable(duck):
    """The SQL fragments evaluate identically in DuckDB (the oracle
    dialect) — interleave of full-scale buckets covers all bits."""
    q = quantize_sql("x", "0.0", "15.0", 4)
    rows = duck.execute(
        f"SELECT CAST(x AS BIGINT) AS x, {q} AS q FROM (SELECT unnest(range(16)) x)"
    ).fetchall()
    assert [r[1] for r in rows] == list(range(16))
    z = interleave_sql("a", "b", 2, div="//")
    got = duck.execute(
        f"SELECT {z} FROM (SELECT 3 AS a, 0 AS b)"
    ).fetchone()[0]
    assert got == 0b1010


def _span_sum(files: list[str], col: str) -> float:
    """Sum over row groups of (max - min) for `col` — the footer-stat
    tightness a scan's row-group pruning depends on."""
    total = 0.0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                c = meta.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    total += float(c.statistics.max) - float(c.statistics.min)
    return total


def test_zordered_write_tightens_footer_stats(spark, sf_dir, tmp_path):
    """MEASURED data-skipping: after write_zordered, the summed row-group
    min/max span shrinks on BOTH dimensions vs a hash-scattered write of
    the same rows (each row group covers a small rectangle of the
    (user_id, value) plane instead of the whole domain)."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    scattered = str(tmp_path / "scattered")
    zordered = str(tmp_path / "zordered")
    # 16 Morton ranges consume ~4 leading z-bits -> a 4x4 banding of the
    # plane, so BOTH dims tighten to ~1/4 span per file
    n_files = 16
    events.repartition(n_files).write.parquet(scattered)
    write_zordered(events, zordered, "user_id", "value", bits=8, n_files=n_files)

    a = spark.read.parquet(scattered)
    b = spark.read.parquet(zordered)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    sf = sorted(glob.glob(f"{scattered}/*.parquet"))
    zf = sorted(glob.glob(f"{zordered}/*.parquet"))
    for col in ("user_id", "value"):
        scat, zord = _span_sum(sf, col), _span_sum(zf, col)
        # every scattered file spans ~the full domain; z-ordered files
        # cover disjoint Morton ranges -> strictly tighter on BOTH dims
        assert zord < scat * 0.6, (col, zord, scat)

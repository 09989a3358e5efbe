"""Z-order (Morton) clustering keys — multi-dimensional data skipping.

At 100 TB a table sorted on one column prunes row groups only for
filters on that column; interleaving the bits of TWO quantized columns
and sorting on the interleaved key keeps parquet min/max footer stats
tight on BOTH dimensions at once (Delta ``OPTIMIZE ZORDER BY`` /
Iceberg sort-order analog). ``tests/test_zorder.py`` measures the
effect: the sum of per-row-group min/max spans collapses vs an
unsorted write on each dimension.

Everything is pure integer/scalar SQL — zero UDFs, zero shuffles beyond
the 1-row bounds broadcast; the expressions are emitted as SQL text so
the DuckDB oracle can replay the identical tree (quantization is the
one double expression; the interleave is exact integer arithmetic where
only the integer-division token differs per dialect).

Reference anchor: the reference sorts output by (partition, offset)
before writing (collector:884-886) — single-dimension clustering; this
is the multi-dimension generalization a query layer needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_sql(value: str, lo: str, hi: str, bits: int) -> str:
    """SQL mapping ``value`` into ``[0, 2**bits)`` by min/max scaling.

    Portable across Spark SQL and DuckDB verbatim: ``/``, ``*``,
    ``floor``, ``CAST``, ``COALESCE``, ``LEAST``, ``GREATEST`` parse and
    evaluate identically (one IEEE double tree, then exact integers).
    A degenerate dimension (hi == lo) maps to bucket 0 via NULLIF →
    COALESCE, applied INSIDE least/greatest so neither engine's
    null-propagation rules are in play.
    """
    n = 1 << bits
    return (
        f"GREATEST(0, LEAST({n - 1}, COALESCE(CAST(floor("
        f"({value} - {lo}) / NULLIF({hi} - {lo}, 0) * {n}.0"
        f") AS BIGINT), 0)))"
    )


def interleave_sql(qa: str, qb: str, bits: int, div: str = "DIV") -> str:
    """SQL interleaving two ``bits``-wide bucket columns into one Morton
    key (``qa`` contributes the odd bit positions). Exact integer
    arithmetic — dialect differs only in the integer-division token
    (Spark ``DIV``, DuckDB ``//``), which cannot change the value.
    """
    terms = []
    for i in range(bits):
        terms.append(f"(({qa} {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"(({qb} {div} {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


def zorder_key(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 8,
    out_col: str = "zkey",
) -> DataFrame:
    """Append a Morton key over (col_a, col_b).

    The per-dimension bounds are a 1-row aggregate broadcast back over
    the scan (broadcast-scalar pattern); quantize + interleave are
    codegen'd scalar expressions on top.
    """
    bounds = df.agg(
        F.min(col_a).alias("__amin"),
        F.max(col_a).alias("__amax"),
        F.min(col_b).alias("__bmin"),
        F.max(col_b).alias("__bmax"),
    )
    qa = quantize_sql(
        f"CAST({col_a} AS DOUBLE)", "CAST(__amin AS DOUBLE)", "CAST(__amax AS DOUBLE)", bits
    )
    qb = quantize_sql(
        f"CAST({col_b} AS DOUBLE)", "CAST(__bmin AS DOUBLE)", "CAST(__bmax AS DOUBLE)", bits
    )
    return (
        df.join(F.broadcast(bounds))
        .withColumn("__qa", F.expr(qa))
        .withColumn("__qb", F.expr(qb))
        .withColumn(out_col, F.expr(interleave_sql("__qa", "__qb", bits)))
        .drop("__amin", "__amax", "__bmin", "__bmax", "__qa", "__qb")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 8,
    n_files: int | None = None,
) -> None:
    """Write ``df`` clustered by its Morton key: range-partition on the
    key (so files cover disjoint key ranges — global clustering, not
    just per-task), sort within partitions, drop the key before write.

    At scale this is the nightly OPTIMIZE job: one range-exchange, one
    sort, parquet footers end up tight on both dimensions.
    """
    keyed = zorder_key(df, col_a, col_b, bits=bits)
    if n_files:
        keyed = keyed.repartitionByRange(n_files, "zkey")
    else:
        keyed = keyed.repartitionByRange("zkey")
    keyed.sortWithinPartitions("zkey").drop("zkey").write.mode("overwrite").parquet(path)

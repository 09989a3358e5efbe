"""Profiling / validation operators (reader parity, SURVEY section 2.12).

  - V5 summary/profile: rows, dtypes, null counts, numeric min/max/mean/std
    (reader:377-443) -> one aggregate pass, not one job per column.
  - A7 per-column null counts (reader:394-396).
  - V3 schema conformance: declared StructType vs actual columns ->
    Missing / Present / Extra report (reader:445-489).
  - V4 security-type inference cascade (reader:327-348).

Scale: the whole numeric profile is a single narrow aggregation —
partial aggregates map-side, one tiny shuffle, no per-column jobs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StructType


def null_counts(df: DataFrame) -> DataFrame:
    """Per-column null count in ONE pass (A7)."""
    return df.select(
        *[
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(c)
            for c in df.columns
        ]
    )


def numeric_profile(df: DataFrame) -> DataFrame:
    """min/max/mean/stddev per numeric column (A6, reader:406-443).

    One aggregation pass over all numeric columns; returns a long-format
    frame (column, min, max, mean, std).
    """
    numeric = [f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)]
    aggs = []
    for c in numeric:
        aggs += [
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            F.avg(c).alias(f"{c}__mean"),
            F.stddev(c).alias(f"{c}__std"),
        ]
    wide = df.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', double(`{c}__min`), double(`{c}__max`), `{c}__mean`, `{c}__std`" for c in numeric
    )
    return wide.selectExpr(
        f"stack({len(numeric)}, {stack_expr}) as (column, min, max, mean, std)"
    )


def approx_profile(
    df: DataFrame,
    distinct_cols: list[str],
    quantile_cols: list[str] | None = None,
    rsd: float = 0.05,
) -> DataFrame:
    """Sketch-based profile for 100-TB-scale data exploration: HLL++
    `approx_count_distinct` (constant memory per column, one pass, vs the
    expand/shuffle an exact distinct needs) and t-digest quantiles.

    `rsd` is the HLL relative standard deviation knob (memory/accuracy
    trade). Returns one row: <col>_approx_distinct, <col>_q50/q95.
    """
    aggs = [
        F.approx_count_distinct(c, rsd).alias(f"{c}_approx_distinct")
        for c in distinct_cols
    ]
    for c in quantile_cols or []:
        q = F.percentile_approx(c, [0.5, 0.95], 10000)
        aggs += [q[0].alias(f"{c}_q50"), q[1].alias(f"{c}_q95")]
    return df.agg(*aggs)


@dataclass
class SchemaReport:
    present: list[str]
    missing: list[str]
    extra: list[str]

    @property
    def conformant(self) -> bool:
        return not self.missing


def schema_conformance(df: DataFrame, declared: StructType) -> SchemaReport:
    """Declared vs actual column diff (V3, reader:445-489)."""
    actual = set(df.columns)
    expected = {f.name for f in declared.fields}
    return SchemaReport(
        present=sorted(actual & expected),
        missing=sorted(expected - actual),
        extra=sorted(actual - expected),
    )


def infer_security_type(df: DataFrame, topic_map: dict[str, str], topic: str | None = None) -> str:
    """Security-type inference cascade (V4, reader:327-348):
    topic-name map -> distinct(sec_type) column -> `account` column."""
    if topic and topic in topic_map:
        return topic_map[topic]
    if "sec_type" in df.columns:
        values = [r[0] for r in df.select("sec_type").distinct().limit(2).collect()]
        if len(values) == 1 and values[0]:
            return str(values[0])
    if "account" in df.columns:
        return "ACCOUNT_VALUES"
    return "UNKNOWN"

"""Every declared query hash-matches its DuckDB oracle (the same check the
driver runs at sf0.01 — here at sf0.001 for speed, the driver covers 0.01).
"""

from __future__ import annotations

import math

import pytest

from redpanda_to_parquet_writer_spark.plans import ORACLES, QUERIES


def _normalize(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        # collapse -0.0 / 0.0 and format stably
        if value == 0:
            return "0"
        return f"{value:.9g}"
    if hasattr(value, "isoformat"):
        return value.isoformat()
    return str(value)


def _canon(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = list(row)
        out.append(tuple(_normalize(vals[i]) for i in order))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = QUERIES[name](spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    assert name in ORACLES, f"query {name} has no oracle"
    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    s, d = _canon(spark_rows, spark_cols), _canon(duck_rows, duck_cols)
    assert len(s) == len(d), f"{name}: row count spark={len(s)} duck={len(d)}"
    mismatches = [i for i, (a, b) in enumerate(zip(s, d)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"spark={s[mismatches[0]]} duck={d[mismatches[0]]}"
    )

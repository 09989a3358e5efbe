"""Streaming rows verified at the sf~1 decade (VERDICT r10 #5).

The 9 streaming registry rows were the named exclusion from the r10
sf1 oracle campaign (their bench timing is spool/commit-bound, and the
batch sweep scripts skip them). Their CORRECTNESS at 10x bench scale
was therefore only inferred from sf0.01 — this test closes that: each
streaming query runs its REAL pipeline (file stream / tmp spool /
checkpointed sink) against the sf1 fixture and is value-compared to
its batch oracle over the same data, exactly the way the driver gate
compares at sf0.01 (column-name-sorted rows, %.9g float norm).

The sf1 fixture is derived, never committed (scripts/scaling_sf1.py
--synth-only); the whole module skips when it is absent so the suite
stays green on a fresh clone — but the skip is LOUD: conftest prints
an "SF1 SCALE GATE SKIPPED" terminal banner, and SPARK_GRAFT_SYNTH_SF1=1
auto-builds the fixture at collection time (r12, VERDICT r11 #3).
"""

from __future__ import annotations

import math
import os

import pytest

from redpanda_to_parquet_writer_spark.plans import ORACLES, QUERIES

SF1 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scaling_sf1")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF1),
    reason="sf1 fixture absent — run scripts/scaling_sf1.py --synth-only",
)

STREAMING_ROWS = sorted(n for n in QUERIES if n.startswith("streaming_"))


def test_the_streaming_registry_is_the_expected_nine():
    # the exclusion this test exists to close is exactly these rows
    # (bench.py EXCLUDED's _STREAMING_REASON set); a new streaming row
    # automatically joins the parametrization below
    assert len(STREAMING_ROWS) == 9
    assert all(n in ORACLES for n in STREAMING_ROWS)


@pytest.fixture(scope="module")
def duck_sf1():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF1}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    # the driver-gate value normalization (scripts/verify_oracle.py)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


@pytest.mark.parametrize("name", STREAMING_ROWS)
def test_streaming_row_matches_batch_oracle_at_sf1(spark, duck_sf1, name):
    sdf = QUERIES[name](spark, SF1)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck_sf1.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), (scols, dcols)
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    do = sorted(range(len(dcols)), key=lambda i: dcols[i])
    s = sorted(tuple(_norm(r[i]) for i in so) for r in srows)
    d = sorted(tuple(_norm(r[i]) for i in do) for r in drows)
    assert len(s) == len(d), f"{name}: {len(s)} vs {len(d)} rows"
    assert s == d, (
        f"{name}: first diff "
        f"{next(((a, b) for a, b in zip(s, d) if a != b), None)}"
    )

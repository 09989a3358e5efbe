"""Property test for the r10 exact-average formula.

Four query lineages (hourly_event_stats, topk_events_by_type,
numeric_profile_events means, docs_unigram_logprob) compute
round(sum/n, 6) as

    sign(s) * ((2 * |s|*1e6 + n) DIV (2 * n)) / 1e6

on a DECIMAL(.,≤6dp) sum s and a BIGINT count n, because round() of a
double ratio splits Spark from DuckDB at exact .5 boundaries (two sf1
failures). This pins the formula itself against Python Decimal
ROUND_HALF_UP (= half away from zero) on BOTH engines over randomized
inputs plus every boundary shape that has bitten: exact ties, negative
ties, values one micro-ulp either side of a tie, zero sums, n=1.
"""

from __future__ import annotations

import random
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest


def _expected(s: Decimal, n: int) -> float:
    return float((s / n).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _cases() -> list[tuple[str, int]]:
    rng = random.Random(20260815)
    cases = []
    # every boundary shape that has bitten or could
    for s, n in [
        ("-125.523827", 22),      # the sf1 unigram tie (-5.7056285)
        ("72443.50", 1600),       # the sf1 hourly tie (45.2771875)
        ("0.01", 32),             # the constructed test tie (0.0003125)
        ("-0.01", 32),            # negative tie -> away from zero
        ("0.000001", 2),          # 5e-7: ties to 0.000001, not 0
        ("-0.000001", 2),
        ("0.00", 7),              # zero sum
        ("123.456789", 1),        # n=1 passthrough (6dp already < 1e-6 grid? 6dp exact)
    ]:
        cases.append((s, n))
    for _ in range(400):
        micro = rng.randint(-10**13, 10**13)
        n = rng.randint(1, 10**6)
        cases.append((str(Decimal(micro) / 1_000_000), n))
        # force near-tie structure: make s_micro ≡ n/2-ish mod n
        n2 = rng.randint(2, 10**4) * 2
        k = rng.randint(0, 10**7)
        tie_micro = k * n2 + n2 // 2  # exact .5 tie
        sign = rng.choice((1, -1))
        for delta in (-1, 0, 1):
            cases.append((str(Decimal(sign * (tie_micro + delta)) / 1_000_000), n2))
    return cases


@pytest.mark.parametrize("engine", ["spark", "duckdb"])
def test_exact_avg_formula_matches_decimal_half_up(engine, spark):
    cases = _cases()
    if engine == "spark":
        df = spark.createDataFrame(
            [(i, Decimal(s), n) for i, (s, n) in enumerate(cases)],
            "i long, s decimal(20,6), n long",
        )
        got = {
            r["i"]: r["avg"]
            for r in df.selectExpr(
                "i",
                "CAST((CASE WHEN s < 0 THEN -1 ELSE 1 END)"
                " * ((2 * CAST(abs(s) * 1000000 AS BIGINT) + n)"
                "    DIV (2 * n)) AS DOUBLE) / 1000000.0 AS avg",
            ).collect()
        }
    else:
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t (i BIGINT, s DECIMAL(20,6), n BIGINT)"
        )
        con.executemany(
            "INSERT INTO t VALUES (?, ?, ?)",
            [(i, s, n) for i, (s, n) in enumerate(cases)],
        )
        got = dict(
            con.execute(
                "SELECT i, CAST((CASE WHEN s < 0 THEN -1 ELSE 1 END)"
                " * ((2 * CAST(abs(s) * 1000000 AS BIGINT) + n)"
                "    // (2 * n)) AS DOUBLE) / 1000000.0 FROM t"
            ).fetchall()
        )
    bad = []
    for i, (s, n) in enumerate(cases):
        want = _expected(Decimal(s), n)
        if float(got[i]).hex() != want.hex():
            bad.append((s, n, got[i], want))
    assert not bad, f"{len(bad)} mismatches, first: {bad[:3]}"

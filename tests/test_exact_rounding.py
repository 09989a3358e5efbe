"""Property test for the exact-average formula (r10, hardened r11).

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

r11 overflow hardening: the r10 formula cast the micro-unit numerator
to BIGINT, which wraps/errors once 2·|s|·1e6 > 2^63 — i.e. a group sum
of only ~4.6e12, reachable at cluster scale (ADVICE r10 #1). Production
now keeps the numerator in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB);
the only remaining int64 term is the QUOTIENT — the rounded mean in
micro-units — so the bound moved from the group SUM (~4.6e12) to the
group MEAN (~9.2e12), six decades looser and independent of row count.
The cases below deliberately cross the old 2^63 numerator wall.

Two-tier contract, because the output column is a DOUBLE:
  1. |mean|·1e6 < 2^53 (mean under ~9.0e9): the emitted double is the
     exact Decimal ROUND_HALF_UP value — CAST(q AS DOUBLE) is lossless
     and the /1e6 is a single correctly-rounded IEEE division.
  2. 2^53 ≤ |mean|·1e6 < 2^63: the int→double cast itself rounds, so
     the result can sit 1 ulp off the true nearest double — but both
     engines run the identical IEEE op sequence (round-to-nearest cast,
     then one division), so they stay BIT-IDENTICAL to each other and
     to the reference semantics float(q)/1e6. Cross-engine hashes (the
     driver's gate) are safe through the full int64 quotient range.
"""

from __future__ import annotations

import random
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest

# the production formula, verbatim modulo the integer-division operator
# and the 128-bit integer carrier of each engine
_SPARK_AVG = (
    "CAST((CASE WHEN s < 0 THEN -1 ELSE 1 END)"
    " * ((2 * CAST(abs(s) * 1000000 AS DECIMAL(38,0)) + n)"
    "    DIV (2 * n)) AS DOUBLE) / 1000000.0"
)
_DUCK_AVG = (
    # the quotient narrows to BIGINT before the double cast: DuckDB's
    # NEGATIVE hugeint->double conversion is not correctly rounded
    # (~1% of >2^53 values land 1 ulp off; measured r11), while
    # bigint->double is exact-rounding on both engines — and the
    # quotient is int64-bounded by contract anyway
    "CAST(CAST((CASE WHEN s < 0 THEN -1 ELSE 1 END)"
    " * ((2 * CAST(abs(s) * 1000000 AS HUGEINT) + n)"
    "    // (2 * n)) AS BIGINT) AS DOUBLE) / 1000000.0"
)


def _quotient_micro(s: Decimal, n: int) -> int:
    """The exact half-away-from-zero rounded mean in micro-units."""
    micro = int((abs(s) * 1_000_000).to_integral_value())
    q = (2 * micro + n) // (2 * n)
    return -q if s < 0 else q


def _expected(s: Decimal, n: int) -> float:
    """Reference semantics of the emitted double: IEEE double of the
    exact integer quotient, divided by 1e6 in one IEEE operation —
    identical to what both engines compute, at any magnitude."""
    return float(_quotient_micro(s, n)) / 1_000_000.0


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
        # --- r11: the old BIGINT numerator wall and beyond ---
        # |s|*1e6 = int64 max: the exact value the r10 cast died on
        ("9223372036854.775807", 1000),
        ("-9223372036854.775807", 1000),
        # 2*|s|*1e6 = 2^63: the earlier wall from the doubling
        ("4611686018427.387904", 977),
        # a full decade past the wall, 2dp like the event sums
        ("99999999999999.25", 12345),
        ("-99999999999999.25", 12345),
        # three decades past; quotient still < 9.2e12 via large n
        ("9999999999999999.50", 5000),
        ("-9999999999999999.50", 5000),
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
    # r11: randomized sums in the overflow decade (micro-units in
    # (2^63, ~1e21]) with n sized so the rounded mean stays inside the
    # documented int64 quotient bound (|mean| <= ~9.2e12)
    for _ in range(120):
        micro = rng.randint(2**63, 10**21) * rng.choice((1, -1))
        n_min = abs(micro) // (9 * 10**18) + 1
        n = rng.randint(n_min, n_min * 1000)
        cases.append((str(Decimal(micro) / 1_000_000), n))
        # engineered exact ties straddling the old wall
        n2 = rng.randint(2, 10**4) * 2
        k = rng.randint(2**62, 2**63) // n2 * 4  # k*n2 ~ 2^64
        for delta in (-1, 0, 1):
            cases.append((str(Decimal(k * n2 + n2 // 2 + delta) / 1_000_000), n2))
    return cases


@pytest.mark.parametrize("engine", ["spark", "duckdb"])
def test_exact_avg_formula_matches_decimal_half_up(engine, spark):
    cases = _cases()
    if engine == "spark":
        df = spark.createDataFrame(
            [(i, Decimal(s), n) for i, (s, n) in enumerate(cases)],
            "i long, s decimal(38,6), n long",
        )
        got = {
            r["i"]: r["avg"]
            for r in df.selectExpr("i", f"{_SPARK_AVG} AS avg").collect()
        }
    else:
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t (i BIGINT, s DECIMAL(38,6), n BIGINT)"
        )
        con.executemany(
            "INSERT INTO t VALUES (?, ?, ?)",
            [(i, s, n) for i, (s, n) in enumerate(cases)],
        )
        got = dict(
            con.execute(f"SELECT i, {_DUCK_AVG} FROM t").fetchall()
        )
    bad = []
    for i, (s, n) in enumerate(cases):
        sd = Decimal(s)
        want = _expected(sd, n)
        if float(got[i]).hex() != want.hex():
            bad.append((s, n, got[i], want))
        # tier 1: inside the 2^53 quotient envelope the emitted double
        # must ALSO be the exact Decimal ROUND_HALF_UP value
        if abs(_quotient_micro(sd, n)) < 2**53:
            exact = float(
                (sd / n).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
            )
            if float(got[i]).hex() != exact.hex():
                bad.append((s, n, got[i], exact))
    assert not bad, f"{len(bad)} mismatches, first: {bad[:3]}"

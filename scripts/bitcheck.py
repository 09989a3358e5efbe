"""Bitwise Spark-vs-DuckDB comparison for named queries.

Stricter than verify_oracle.py's 9-significant-digit normalization: float
columns compare via `float.hex()` (exact bit pattern), which is what the
driver's value hash effectively requires. Spark's `round(double, d)`
(BigDecimal over the shortest decimal repr) and DuckDB's round (binary
value) can differ in the last ulps on rounding-boundary values —
invisible at 9 digits, fatal to the hash. Any new or changed query
should pass THIS check, not just the 9-digit sweep; see
plans/relational2.py's module docstring for the exact-arithmetic
patterns that guarantee it.

Usage: python scripts/bitcheck.py <query> [<query> ...] [--sf <dir>]
       python scripts/bitcheck.py --all
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb

from redpanda_to_parquet_writer_spark.config import EngineConfig
from redpanda_to_parquet_writer_spark.plans import ORACLES, QUERIES
from redpanda_to_parquet_writer_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings"


def exact(v) -> str:
    if isinstance(v, float):
        return v.hex()
    return repr(v)


def main() -> int:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i : i + 2]
    names = sorted(QUERIES) if "--all" in args else args
    spark = get_spark(
        EngineConfig(shuffle_partitions=8, master="local[8]"), "bitcheck"
    )
    con = duckdb.connect()
    for t in TABLES.split():
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    rc = 0
    for name in names:
        try:
            sdf = QUERIES[name](spark, sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(ORACLES[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            so = sorted(range(len(scols)), key=lambda i: scols[i])
            do = sorted(range(len(dcols)), key=lambda i: dcols[i])
            s = sorted(tuple(exact(r[i]) for i in so) for r in srows)
            d = sorted(tuple(exact(r[i]) for i in do) for r in drows)
            ok = sorted(scols) == sorted(dcols) and s == d
            print(name, "BITWISE-OK" if ok else "MISMATCH", len(s), len(d))
            if not ok:
                rc = 1
                if sorted(scols) != sorted(dcols):
                    print("  cols spark :", sorted(scols))
                    print("  cols oracle:", sorted(dcols))
                for a, b in zip(s, d):
                    if a != b:
                        print("  spark :", a)
                        print("  oracle:", b)
                        break
        except Exception as e:  # pragma: no cover - diagnostic tool
            rc = 1
            print(name, "ERR", str(e)[:300])
    return rc


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Extend the scaling curve one decade: synthesize an sf~1 fixture
(10x sf0.1) and time the 15 most expensive headline queries at
sf0.01 -> sf0.1 -> sf1 (VERDICT r8 #5 / r9 #4).

The fixture is DERIVED, never committed (150 MB, .gitignored): 10
replicas of every sf0.1 table with transforms that keep join/dedup/
near-dup cardinalities honest at 10x — naive verbatim replication would
make every row a 10-way duplicate (dedup collapses instead of scaling)
and every embedding a 45-pair exact near-dup clique (quadratic pair
explosion that says nothing about real scaling):

  - every table's keys shift by replica*(max_key+1), so joins fan out
    10x with the same per-key cardinality and exact dedup stays unique
    (orders<->lineitem<->part/supplier/customer keys shift in lockstep);
  - region/nation stay fixed (TPC-H fixed dims): their join fan-in
    grows 10x, which IS the honest scale behavior;
  - document text gets a per-replica Caesar rotation (F.translate, one
    JVM expression): token counts, line structure, punctuation, and
    repetition are preserved bit-for-bit WITHIN a replica (near-dup
    pairs scale linearly), while cross-replica shingles are disjoint
    (no phantom 45-pair cliques);
  - embeddings get a per-replica cyclic dimension rotation: norms and
    within-replica geometry are exactly preserved, cross-replica
    cosines decorrelate, so ANN/SemDeDup candidate counts scale ~10x,
    not 45x;
  - events keep their time range (10x densser, the same months — how a
    bigger deployment actually looks) with shifted event/user ids, so
    per-user windows keep their shape and per-hour buckets get 10x
    heavier.

Usage:
  python scripts/scaling_sf1.py              # synthesize (if absent) + run
  python scripts/scaling_sf1.py --synth-only # build the fixture, skip timing

Output: SCALING_CURVE_r10.jsonl at the repo root (override with
--out <name> — re-runs under newer lineages must not clobber an
earlier round's committed curve) — one JSON line per SF
with per-query min-of-2 timings (bench.py protocol), plus a final
"decade_ratios" line comparing each query's sf0.1->sf1 ratio against
its sf0.01->sf0.1 ratio (flag when the new decade is >1.5x steeper).
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from redpanda_to_parquet_writer_spark.config import EngineConfig  # noqa: E402
from redpanda_to_parquet_writer_spark.plans import QUERIES  # noqa: E402
from redpanda_to_parquet_writer_spark.session import get_spark  # noqa: E402

REPLICAS = 10
FIXTURE_DIR = os.path.join(ROOT, ".scaling_sf1")

#: the 15 most expensive sf0.1 headline queries per BENCH_r09 (the
#: tail that dominates the sweep; the cheap head is noise at any SF)
TOP15 = [
    "ann_kmeans_recall_audit",
    "events_sketch_audit",
    "multimodal_avi_decode",
    "multimodal_png_roundtrip",
    "ann_recall_audit",
    "ann_ivf_topk",
    "ann_ivfadc_topk",
    "docs_edit_distance_pairs",
    "docs_jaccard_pairs",
    "msgpack_roundtrip_decode",
    "multimodal_jpeg_baseline_roundtrip",
    "multimodal_webp_roundtrip",
    "docs_containment_pairs",
    "ann_pq_adc_topk",
    "docs_simhash_neardup_pairs",
]

_LOWER = "abcdefghijklmnopqrstuvwxyz"
_UPPER = _LOWER.upper()


def _caesar_cols(i: int) -> tuple[str, str]:
    rot = _LOWER[i:] + _LOWER[:i]
    return _LOWER + _UPPER, rot + rot.upper()


def synthesize(src: str, dst: str) -> None:
    """Build the sf~1 fixture with DuckDB, not Spark: DuckDB preserves
    each column's PHYSICAL parquet type (events.ts stays
    TIMESTAMP(NANOS) — a Spark rewrite would demote it to int64, the
    exact dtype drift that caused the round-3 bench outage) and writes
    ONE file per table, matching the driver fixtures' layout so the
    DuckDB oracle harness (scripts/verify_oracle.py) can sweep the sf1
    point directly."""
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for n in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE OR REPLACE VIEW {n} AS SELECT * FROM '{src}/{n}.parquet'")

    # fixed dims: copy once (their fan-in grows 10x, their size doesn't)
    for n in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM {n}) TO '{dst}/{n}.parquet' (FORMAT PARQUET)")

    pad = {
        name: int(con.execute(f"SELECT max({col}) + 1 FROM {t}").fetchone()[0])
        for name, t, col in (
            ("cust", "customer", "c_custkey"),
            ("supp", "supplier", "s_suppkey"),
            ("part", "part", "p_partkey"),
            ("order", "orders", "o_orderkey"),
            ("event", "events", "event_id"),
            ("user", "events", "user_id"),
            ("doc", "documents", "doc_id"),
            ("vec", "embeddings", "vec_id"),
        )
    }
    dim = int(con.execute("SELECT len(embedding) FROM embeddings LIMIT 1").fetchone()[0])

    def shifted(table: str, selects) -> str:
        """UNION ALL of REPLICAS per-replica SELECTs (selects: i -> list)."""
        return " UNION ALL ".join(
            f"SELECT {', '.join(selects(i))} FROM {table}" for i in range(REPLICAS)
        )

    def s(col: str, p: str, i: int) -> str:
        return f"{col} + {i * pad[p]} AS {col}"

    specs = {
        "customer": lambda i: [s("c_custkey", "cust", i), "c_name",
                               "c_nationkey", "c_acctbal", "c_mktsegment"],
        "supplier": lambda i: [s("s_suppkey", "supp", i), "s_name",
                               "s_nationkey", "s_acctbal"],
        "part": lambda i: [s("p_partkey", "part", i), "p_name", "p_brand",
                           "p_type", "p_size", "p_retailprice"],
        "orders": lambda i: [s("o_orderkey", "order", i), s("o_custkey", "cust", i),
                             "o_orderstatus", "o_totalprice", "o_orderdate",
                             "o_orderpriority"],
        "lineitem": lambda i: [s("l_orderkey", "order", i), s("l_partkey", "part", i),
                               s("l_suppkey", "supp", i), "l_linenumber",
                               "l_quantity", "l_extendedprice", "l_discount",
                               "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"],
        "events": lambda i: [s("event_id", "event", i), "ts", s("user_id", "user", i),
                             "event_type", "value", "props"],
        "documents": lambda i: [
            s("doc_id", "doc", i),
            "translate(text, '{}', '{}') AS text".format(*_caesar_cols(i)),
            "lang", "source", "n_chars",
        ],
        "embeddings": lambda i: [
            s("vec_id", "vec", i),
            (
                "embedding"
                if i % dim == 0
                # 1-based inclusive slices; left-rotate by i positions
                else f"embedding[{i % dim + 1}:{dim}] || embedding[1:{i % dim}] AS embedding"
            ),
            "label",
        ],
    }
    for name, sel in specs.items():
        con.execute(
            f"COPY ({shifted(name, sel)}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)"
        )
        print(f"synthesized {name}", flush=True)


def time_queries(spark, sf_dir: str) -> dict[str, object]:
    """bench.py protocol: one warm run, min of two timed noop saves."""
    timings: dict[str, object] = {}
    for name in TOP15:
        try:
            df = QUERIES[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                df.write.mode("overwrite").format("noop").save()
                runs.append(time.perf_counter() - t0)
            timings[name] = round(min(runs), 4)
        except Exception as exc:  # noqa: BLE001
            timings[name] = {"err": f"{type(exc).__name__}: {str(exc).splitlines()[0][:200]}"}
    return timings


def main() -> None:
    # validate flags BEFORE the (long) run: a malformed `--out` with no
    # value used to IndexError only at artifact-write time, losing the
    # completed sweep's results
    out = "SCALING_CURVE_r10.jsonl"
    if "--out" in sys.argv:
        idx = sys.argv.index("--out")
        if idx + 1 >= len(sys.argv) or sys.argv[idx + 1].startswith("--"):
            sys.exit("error: --out requires a filename argument")
        out = sys.argv[idx + 1]
    # --queries a,b,c overrides the TOP15 list (r12: curve a lineage
    # change's specific rows instead of the global expensive tail)
    if "--queries" in sys.argv:
        idx = sys.argv.index("--queries")
        if idx + 1 >= len(sys.argv) or sys.argv[idx + 1].startswith("--"):
            sys.exit("error: --queries requires a comma-separated list")
        names = sys.argv[idx + 1].split(",")
        unknown = [n for n in names if n not in QUERIES]
        if unknown:
            sys.exit(f"error: unknown queries {unknown}")
        TOP15[:] = names

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        EngineConfig(
            master=f"local[{cpus}]",
            shuffle_partitions=int(cpus),
            # Spark's 1g local-mode default heap dies at the sf1 point
            # (GCLocker retry storms, then JVM loss mid-sweep); a real
            # 32-core executor ships with tens of GB. 16g = ~0.5g/core,
            # still conservative for the 128 GiB host.
            driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEMORY", "16g"),
        ),
        app_name="scaling_sf1",
    )
    if not os.path.exists(os.path.join(FIXTURE_DIR, "embeddings.parquet")):
        print("synthesizing sf1 fixture ...", flush=True)
        synthesize("/root/testdata/sf0.1", FIXTURE_DIR)
    if "--synth-only" in sys.argv:
        return

    points = [
        ("/root/testdata/sf0.01", 0.01),
        ("/root/testdata/sf0.1", 0.1),
        (FIXTURE_DIR, 1.0),
    ]
    # unrecorded warmup at the smallest SF (cold-JVM absorption, same
    # rationale as bench.py --scaling)
    time_queries(spark, points[0][0])
    curve: dict[float, dict[str, float]] = {}
    lines = []
    for sf_dir, sf in points:
        t = time_queries(spark, sf_dir)
        ok = {k: v for k, v in t.items() if isinstance(v, (int, float))}
        curve[sf] = ok
        lines.append({
            "metric": "scaling_top15_sec",
            "value": round(sum(ok.values()), 4),
            "unit": "sec",
            "n_queries": len(ok),
            "n_errors": len(t) - len(ok),
            "queries": t,
            "sf": sf,
        })
        print(json.dumps(lines[-1]), flush=True)

    ratios = {}
    for name in TOP15:
        t001, t01, t1 = (curve[sf].get(name) for sf in (0.01, 0.1, 1.0))
        if None in (t001, t01, t1) or 0 in (t001, t01):
            continue
        r_prev, r_new = t01 / t001, t1 / t01
        ratios[name] = {
            "sf0.01->0.1": round(r_prev, 2),
            "sf0.1->1": round(r_new, 2),
            # a new decade >1.5x steeper than the previous one needs a
            # named cause (VERDICT r9 #4); guard against div-by-~0 by
            # flooring the previous ratio at 1 (sub-linear decades are
            # fixed-overhead-dominated, not a baseline to beat)
            "flag": r_new > 1.5 * max(r_prev, 1.0),
            # cost per unit of data, normalized to the sf0.01 point:
            # <1 and falling = sub-linear total work (overhead still
            # amortizing); >1 or rising = genuinely super-linear — the
            # thing a scale-killer actually looks like. A decade ratio
            # can "flag" while this still falls: that means the query
            # merely approached its honest data-proportional slope.
            "per_data_cost": [
                1.0,
                round(t01 / (t001 * 10), 2),
                round(t1 / (t001 * 100), 2),
            ],
        }
    summary = {
        "metric": "decade_ratios",
        "ratios": ratios,
        "flags": sorted(n for n, r in ratios.items() if r["flag"]),
    }
    lines.append(summary)
    print(json.dumps(summary), flush=True)
    # --out <name> (parsed and validated at main() entry) overrides the
    # artifact name so a re-run under newer lineages does not clobber an
    # earlier round's committed curve
    with open(os.path.join(ROOT, out), "w") as f:
        for line in lines:
            f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()

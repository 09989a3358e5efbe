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

Output: SCALING_CURVE_r10.jsonl at the repo root — one JSON line per SF
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

from pyspark.sql import functions as F  # noqa: E402

from redpanda_to_parquet_writer_spark.config import EngineConfig  # noqa: E402
from redpanda_to_parquet_writer_spark.plans import QUERIES  # noqa: E402
from redpanda_to_parquet_writer_spark.session import get_spark  # noqa: E402
from redpanda_to_parquet_writer_spark.sources.parquet import load_table  # noqa: E402

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


def _max_key(df, col: str) -> int:
    return int(df.agg(F.max(col)).first()[0])


def synthesize(spark, src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    tables = {
        n: load_table(spark, src, n)
        for n in (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        )
    }
    # fixed dims: copy once
    for n in ("region", "nation"):
        tables[n].write.mode("overwrite").parquet(f"{dst}/{n}.parquet")

    pad = {
        "cust": _max_key(tables["customer"], "c_custkey") + 1,
        "supp": _max_key(tables["supplier"], "s_suppkey") + 1,
        "part": _max_key(tables["part"], "p_partkey") + 1,
        "order": _max_key(tables["orders"], "o_orderkey") + 1,
        "event": _max_key(tables["events"], "event_id") + 1,
        "user": _max_key(tables["events"], "user_id") + 1,
        "doc": _max_key(tables["documents"], "doc_id") + 1,
        "vec": _max_key(tables["embeddings"], "vec_id") + 1,
    }
    dim = len(tables["embeddings"].first()["embedding"])

    def replica(name, i):
        t = tables[name]
        s = lambda col, p: (F.col(col) + F.lit(i * pad[p])).alias(col)
        if name == "customer":
            return t.select(s("c_custkey", "cust"), "c_name", "c_nationkey",
                            "c_acctbal", "c_mktsegment")
        if name == "supplier":
            return t.select(s("s_suppkey", "supp"), "s_name", "s_nationkey",
                            "s_acctbal")
        if name == "part":
            return t.select(s("p_partkey", "part"), "p_name", "p_brand",
                            "p_type", "p_size", "p_retailprice")
        if name == "orders":
            return t.select(s("o_orderkey", "order"), s("o_custkey", "cust"),
                            "o_orderstatus", "o_totalprice", "o_orderdate",
                            "o_orderpriority")
        if name == "lineitem":
            return t.select(s("l_orderkey", "order"), s("l_partkey", "part"),
                            s("l_suppkey", "supp"), "l_linenumber",
                            "l_quantity", "l_extendedprice", "l_discount",
                            "l_tax", "l_returnflag", "l_linestatus",
                            "l_shipdate")
        if name == "events":
            return t.select(s("event_id", "event"), "ts", s("user_id", "user"),
                            "event_type", "value", "props")
        if name == "documents":
            frm, to = _caesar_cols(i)
            return t.select(s("doc_id", "doc"),
                            F.translate("text", frm, to).alias("text"),
                            "lang", "source", "n_chars")
        if name == "embeddings":
            rot = (
                F.col("embedding")
                if i % dim == 0
                else F.concat(
                    F.slice("embedding", i % dim + 1, dim - i % dim),
                    F.slice("embedding", 1, i % dim),
                ).alias("embedding")
            )
            return t.select(s("vec_id", "vec"), rot.alias("embedding"), "label")
        raise ValueError(name)

    for name in ("customer", "supplier", "part", "orders", "lineitem",
                 "events", "documents", "embeddings"):
        out = replica(name, 0)
        for i in range(1, REPLICAS):
            out = out.unionByName(replica(name, i))
        out.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
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
        synthesize(spark, "/root/testdata/sf0.1", FIXTURE_DIR)
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
    with open(os.path.join(ROOT, "SCALING_CURVE_r10.jsonl"), "w") as f:
        for line in lines:
            f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()

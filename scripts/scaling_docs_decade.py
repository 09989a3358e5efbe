#!/usr/bin/env python
"""Second-decade probe for the heaviest r12 dedup rewrites (VERDICT
r12 #4): `SCALING_CURVE_r12.jsonl` measured the rewritten queries only
up to sf1; `docs_line_dedup` (5.7x/decade) and `docs_normalized_dedup`
(9.7x/decade) are the rows whose join-back shuffles grow fastest, so
this extends exactly those two across sf1 -> sf10 (10x the documents
corpus, synthesized by scripts/scaling_sf10_probe.py's key-shift
replication — dedup structure preserved: each replica repeats the same
texts, so hot lines/fingerprints get 10x hotter, the skew case the r12
rewrites exist for).

Sub-linear PER-DATA is the gate: a 10x corpus may cost up to 10x; more
means a super-linear term (an unsplittable task, a driver sink, a
quadratic bucket) crept in.

Usage: python scripts/scaling_docs_decade.py [query ...]
  (default: the two rows VERDICT r12 #4 named)
Appends one JSON line to SCALING_CURVE_r13.jsonl.
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

SF1_DIR = os.path.join(ROOT, ".scaling_sf1")
SF10_DIR = os.path.join(ROOT, ".scaling_sf10")
TARGETS = sys.argv[1:] or ["docs_line_dedup", "docs_normalized_dedup"]


def main() -> None:
    for d in (SF1_DIR, SF10_DIR):
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            raise SystemExit(f"{d} missing — synthesize via scaling_sf1.py / scaling_sf10_probe.py")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        EngineConfig(
            master=f"local[{cpus}]",
            shuffle_partitions=int(cpus),
            driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEMORY", "16g"),
        ),
        app_name="scaling_docs_decade",
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict[str, float]] = {}
    for sf, d in (("1", SF1_DIR), ("10", SF10_DIR)):
        for name in TARGETS:
            df = QUERIES[name](spark, d)
            df.write.mode("overwrite").format("noop").save()  # warm
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                df.write.mode("overwrite").format("noop").save()
                runs.append(time.perf_counter() - t0)
            out.setdefault(name, {})[sf] = round(min(runs), 4)
            print(f"sf{sf} {name}: {min(runs):.3f}s", flush=True)
    for name in TARGETS:
        ratio = out[name]["10"] / out[name]["1"]
        out[name]["ratio_per_decade"] = round(ratio, 2)
        verdict = "sub-linear" if ratio <= 10 else "SUPER-LINEAR"
        print(f"{name}: sf1->sf10 {ratio:.1f}x per 10x data ({verdict})", flush=True)
    line = {
        "metric": "docs_dedup_second_decade",
        "note": (
            "sf1->sf10 decade for the two fastest-growing r12 dedup "
            "rewrites (VERDICT r12 #4); 10x documents via key-shift "
            "replication (hot lines/fingerprints 10x hotter). min-of-2 "
            "after warm; sub-linear per-data (<=10x per decade) is the gate."
        ),
        "queries": out,
    }
    print(json.dumps(line), flush=True)
    with open(os.path.join(ROOT, "SCALING_CURVE_r13.jsonl"), "a") as f:
        f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()

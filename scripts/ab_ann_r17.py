#!/usr/bin/env python
"""Isolated A/B bench for the r17 ANN-fusion change (guide §1.4).

Times a fixed list of ANN-family queries under the frozen bench
protocol (noop sink, 1 warm + min-of-2 timed runs), in a fresh process,
and ALSO wall-times each query's construction phase (eager index
builds / Lloyd training run driver-side actions there — the fusion
changes those too, but bench.py never times them).

Usage: python scripts/ab_ann_r17.py <label> [repo_root]
Prints one JSON line: {"label":..., "construct": {...}, "run": {...}}.
Run alternately against the pre-fusion worktree and HEAD for the A/B.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo"
sys.path.insert(0, ROOT)

from redpanda_to_parquet_writer_spark.config import EngineConfig  # noqa: E402
from redpanda_to_parquet_writer_spark.plans import QUERIES  # noqa: E402
from redpanda_to_parquet_writer_spark.session import get_spark  # noqa: E402

LABEL = sys.argv[1] if len(sys.argv) > 1 else "?"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

FAMILY = [
    "ann_ivf_topk",
    "ann_recall_audit",
    "ann_pq_adc_topk",
    "ann_ivfadc_topk",
    "ann_ivfadc_indexed_topk",
    "ann_ivfadc_compact_topk",
    "ann_ivfadc_recall_audit",
    "embeddings_kmeans_assign",
    "ann_kmeans_recall_audit",
]

spark = get_spark(
    EngineConfig(master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)),
    app_name=f"ab_ann_{LABEL}",
)
# unrecorded warmup (JVM/JIT/footer cache), mirrors bench.py
warm = QUERIES["ann_cosine_topk"](spark, SF_DIR)
warm.write.mode("overwrite").format("noop").save()

construct: dict[str, float] = {}
run: dict[str, float] = {}
for name in FAMILY:
    spark.sparkContext.setJobDescription(f"ab:{name}")
    t0 = time.perf_counter()
    df = QUERIES[name](spark, SF_DIR)
    construct[name] = round(time.perf_counter() - t0, 4)
    df.write.mode("overwrite").format("noop").save()  # warm
    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        runs.append(time.perf_counter() - t0)
    run[name] = round(min(runs), 4)

print(
    json.dumps(
        {
            "label": LABEL,
            "construct": construct,
            "construct_total": round(sum(construct.values()), 4),
            "run": run,
            "run_total": round(sum(run.values()), 4),
        }
    )
)

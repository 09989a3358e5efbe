#!/usr/bin/env python
"""Capture .explain('formatted') for declared queries into plans/r18/.

Usage: python scripts/capture_plan_r18.py <suffix> <query> [query ...]

Writes plans/r18/<query>_<suffix>.txt. Build-eager queries (e.g. the CC
loop) execute their driver-side iterations at plan build; the captured
plan is the returned frame's final physical plan.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from redpanda_to_parquet_writer_spark.config import EngineConfig  # noqa: E402
from redpanda_to_parquet_writer_spark.plans import QUERIES  # noqa: E402
from redpanda_to_parquet_writer_spark.session import get_spark  # noqa: E402

suffix = sys.argv[1]
names = sys.argv[2:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark(
    EngineConfig(master=f"local[{cpus}]", shuffle_partitions=int(cpus)),
    app_name="capture_plan",
)
outdir = os.path.join(ROOT, "plans", "r18")
os.makedirs(outdir, exist_ok=True)
for name in names:
    df = QUERIES[name](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(outdir, f"{name}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(plan)
    print(f"wrote {path} ({len(plan)} bytes)")

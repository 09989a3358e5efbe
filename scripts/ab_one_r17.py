#!/usr/bin/env python
"""Single-query A/B timer (bench protocol: warm + min-of-N, noop sink).

Usage: python scripts/ab_one_r17.py <label> <repo_root> <query> [n_timed]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = sys.argv[2]
sys.path.insert(0, ROOT)

from redpanda_to_parquet_writer_spark.config import EngineConfig  # noqa: E402
from redpanda_to_parquet_writer_spark.plans import QUERIES  # noqa: E402
from redpanda_to_parquet_writer_spark.session import get_spark  # noqa: E402

LABEL, NAME = sys.argv[1], sys.argv[3]
N = int(sys.argv[4]) if len(sys.argv) > 4 else 4
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = get_spark(
    EngineConfig(master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)),
    app_name=f"ab_one_{LABEL}",
)
warm = QUERIES["ann_cosine_topk"](spark, SF_DIR)
warm.write.mode("overwrite").format("noop").save()

df = QUERIES[NAME](spark, SF_DIR)
df.write.mode("overwrite").format("noop").save()  # warm
runs = []
for _ in range(N):
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    runs.append(round(time.perf_counter() - t0, 4))
print(json.dumps({"label": LABEL, "query": NAME, "runs": runs, "min": min(runs)}))

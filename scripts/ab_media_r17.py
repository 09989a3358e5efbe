#!/usr/bin/env python
"""Isolated A/B bench for the r17 multimodal codec hot-loop change
(guide §1.2-2/§4.2: per-task Python work — the plans are zero-shuffle
mapInPandas, so the win surface is the per-byte Python, not the plan).

Times the multimodal bench family under the frozen protocol (noop sink,
1 warm + min-of-2 timed runs) in a fresh process.

Usage: python scripts/ab_media_r17.py <label> [repo_root]
Prints one JSON line. Run alternately against the pre-change worktree
and HEAD for the interleaved A/B.
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
    "multimodal_avi_decode",
    "multimodal_png_roundtrip",
    "multimodal_jpeg_baseline_roundtrip",
    "multimodal_jpeg_progressive_roundtrip",
    "multimodal_webp_roundtrip",
    "multimodal_mjpeg_frame_decode",
    "multimodal_container_probe",
    "multimodal_gif_roundtrip",
    "multimodal_tiff_roundtrip",
    "multimodal_wav_roundtrip",
    "multimodal_image_resize",
    "multimodal_frame_sample",
    "multimodal_byte_stats",
]

spark = get_spark(
    EngineConfig(master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)),
    app_name=f"ab_media_{LABEL}",
)
# unrecorded warmup (JVM/JIT/footer cache), mirrors bench.py
warm = QUERIES["pricing_summary"](spark, SF_DIR)
warm.write.mode("overwrite").format("noop").save()

run: dict[str, float] = {}
for name in FAMILY:
    spark.sparkContext.setJobDescription(f"ab:{name}")
    df = QUERIES[name](spark, SF_DIR)
    df.write.mode("overwrite").format("noop").save()  # warm
    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        runs.append(time.perf_counter() - t0)
    run[name] = round(min(runs), 4)

print(
    json.dumps(
        {"label": LABEL, "run": run, "run_total": round(sum(run.values()), 4)}
    )
)

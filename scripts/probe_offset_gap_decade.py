#!/usr/bin/env python
"""Third-decade probe of `offset_gaps_batch` (VERDICT r13 #6).

At sf1→sf10 the two-level gap scan measured 4.33× per 10× data — the
steepest surviving event-side row in SCALING_CURVE_r13.jsonl. The open
question: is that slope GROWTH (something super-linear hiding in the
two-level decomposition) or fixed-stage amortization (per-job constants
— 5 stages of scheduling, the tiny boundary frame, shuffle setup —
dominating at small absolute times, so the ratio climbs toward 10× as
data dwarfs them but never crosses it)?

This probe runs the EXACT registered envelope (contiguous per-partition
offsets with every offset ≡ 13 (mod 97) dropped — the
`offset_gap_check` plan, which column-prunes events to event_id) one
more decade up: 10M rows (the sf10 fixture) vs 100M rows (sf100-shaped,
synthesized once as a single-column event_id parquet — identical input
to the pruned scan of a full sf100 events table).

Usage: python scripts/probe_offset_gap_decade.py
Prints min-of-2-after-warm timings at both decades and the ratio.
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
from redpanda_to_parquet_writer_spark.session import get_spark  # noqa: E402
from redpanda_to_parquet_writer_spark.streaming.stateful import (  # noqa: E402
    offset_gaps_batch,
)

SF10_EVENTS = os.path.join(ROOT, ".scaling_sf10", "events.parquet")
SF100_DIR = os.path.join(ROOT, ".scaling_sf100")
N_SF100 = 100_000_000


def envelope(df):
    """The offset_gap_check synthetic envelope, verbatim
    (`plans/relational.py:offset_gap_check`)."""
    return df.select(
        F.pmod("event_id", F.lit(8)).cast("long").alias("kafka_partition"),
        F.expr("event_id DIV 8").alias("kafka_offset"),
    ).filter(F.expr("kafka_offset % 97 != 13"))


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        EngineConfig(
            master=f"local[{cpus}]",
            shuffle_partitions=int(cpus),
            driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEMORY", "16g"),
        ),
        app_name="probe_offset_gap_decade",
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(SF10_EVENTS):
        raise SystemExit("run scripts/scaling_sf10_probe.py first (sf10 fixture)")
    sf100_events = os.path.join(SF100_DIR, "event_ids.parquet")
    if not os.path.exists(sf100_events):
        # sf100-shaped input: the envelope (and the registered plan,
        # after column pruning) reads ONLY event_id; ids are contiguous
        # like the generator's, so gap structure matches exactly
        spark.range(N_SF100).select(F.col("id").alias("event_id")).write.mode(
            "overwrite"
        ).parquet(sf100_events)
        print(f"synthesized {N_SF100} event ids", flush=True)

    out = {}
    for label, path in (("10", SF10_EVENTS), ("100", sf100_events)):
        df = offset_gaps_batch(envelope(spark.read.parquet(path)))
        df.write.mode("overwrite").format("noop").save()  # warm
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        out[label] = round(min(runs), 4)
        print(f"sf{label}: {min(runs):.3f}s runs={[round(t, 3) for t in runs]}", flush=True)
    ratio = out["100"] / out["10"]
    print(
        json.dumps(
            {
                "metric": "offset_gap_third_decade",
                "sf10_sec": out["10"],
                "sf100_sec": out["100"],
                "ratio_per_decade": round(ratio, 2),
                "rows": {"10": 10_000_000, "100": N_SF100},
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""A/B the window-formulated star-CC round against production (session 3).

Production round: 5 exchanges + 2 joins (groupBy mins -> join -> groupBy
mins2 -> join -> dedup groupBy). Candidate round: 3 exchanges + 0 joins
(window min over partitionBy(u) for BOTH star phases, children/selfs
emitted by one projection, dedup groupBy unchanged). Identical per-round
edge sets and flags by construction; this script PROVES output equality
(full anti-join both ways) before trusting any timing.

Usage: python scripts/ab_cc_window_r17.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from redpanda_to_parquet_writer_spark.config import EngineConfig  # noqa: E402
from redpanda_to_parquet_writer_spark.operators.dedup import (  # noqa: E402
    _materialize_flagged,
    connected_components,
)
from redpanda_to_parquet_writer_spark.plans.text_queries import (  # noqa: E402
    docs_minhash_lsh_pairs,
)
from redpanda_to_parquet_writer_spark.session import get_spark  # noqa: E402
from redpanda_to_parquet_writer_spark.sources.parquet import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = get_spark(
    EngineConfig(master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)),
    app_name="ab_cc_window",
)


def cc_window(vertices, pairs, id_col="doc_id", src_col="id_a",
              dst_col="id_b", max_iterations=25):
    """Candidate: both star phases as window mins, no joins."""
    edges = (
        pairs.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("u")
    for _ in range(max_iterations):
        directed = edges.select("u", "v").union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        # large-star: m(u) = min(N(u) + {u}) via one window; each edge is
        # emitted once, from its smaller endpoint (v > u), as (v, m).
        large = (
            directed.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
            .filter(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("u"),
                F.col("m").alias("v"),
                (F.col("m") != F.col("u")).alias("__chg"),
            )
        )
        # small-star: per group of the rewritten edges, m = min(v); the
        # m-row(s) emit the (u, m) self edge carrying the group's
        # large-star flag, every other row is a child rewrite (v, m).
        grouped = large.withColumn("m", F.min("v").over(w)).withColumn(
            "__lchg", F.max("__chg").over(w)
        )
        small = (
            grouped.select(
                F.when(F.col("v") == F.col("m"), F.col("u"))
                .otherwise(F.col("v"))
                .alias("eu"),
                F.col("m").alias("ev"),
                F.when(F.col("v") == F.col("m"), F.col("__lchg"))
                .otherwise(F.lit(True))
                .alias("__chg"),
            )
            .select(
                F.greatest("eu", "ev").alias("u"),
                F.least("eu", "ev").alias("v"),
                "__chg",
            )
            .groupBy("u", "v")
            .agg(F.max("__chg").alias("__chg"))
        )
        new_edges, changed = _materialize_flagged(small, "__chg")
        edges = new_edges.select("u", "v")
        if not changed:
            break
    roots = edges.groupBy("u").agg(F.min("v").alias("cluster_id"))
    return (
        vertices.select(F.col(id_col).alias("id"))
        .join(roots.select(F.col("u").alias("id"), "cluster_id"), "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("cluster_id", F.col("id")).alias("cluster_id"),
        )
    )


def build(variant: str):
    docs = load_table(spark, SF_DIR, "documents")
    vertices = docs.select("doc_id")
    pairs = docs_minhash_lsh_pairs(spark, SF_DIR)
    if variant == "prod":
        return connected_components(vertices, pairs)
    return cc_window(vertices, pairs)


def timed(variant: str) -> float:
    t0 = time.perf_counter()
    df = build(variant)
    df.write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


# equality gate first (full anti-join both ways)
a = build("prod").localCheckpoint(eager=True)
b = build("window").localCheckpoint(eager=True)
d1 = a.exceptAll(b).count()
d2 = b.exceptAll(a).count()
print(f"equality: prod\\window={d1} window\\prod={d2}")
if d1 or d2:
    sys.exit("OUTPUT MISMATCH — timings not trusted")

results: dict[str, list[float]] = {"prod": [], "window": []}
order = ["prod", "window", "window", "prod"] * REPS
for v in order:
    results[v].append(timed(v))
for v, runs in results.items():
    print(f"{v}: runs={runs} min={min(runs)}")

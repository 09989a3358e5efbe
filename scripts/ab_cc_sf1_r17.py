#!/usr/bin/env python
"""Decade check for the session-3 CC rewrite (guide §1.3): does the
window-formulated, pair-fused star loop still beat the join-form star
at sf~1 (10x the bench point), where per-round data is 10x and the
stage-wave floor is relatively smaller? Equality gated (full anti-join
both ways) before timing; interleaved fresh-plan runs.

Usage: python scripts/ab_cc_sf1_r17.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

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

SF_DIR = os.path.join(ROOT, ".scaling_sf1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = get_spark(
    EngineConfig(
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEMORY", "16g"),
    ),
    app_name="ab_cc_sf1",
)


def cc_join_star(vertices, pairs, id_col="doc_id", src_col="id_a",
                 dst_col="id_b", max_iterations=25):
    """FROZEN r17 join-form star (pre-session-3 production)."""
    edges = (
        pairs.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        directed = edges.select("u", "v").union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = directed.groupBy("u").agg(F.min("v").alias("__mn"))
        mins = mins.select("u", F.least("__mn", "u").alias("m"))
        large = (
            directed.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("u"),
                F.col("m").alias("v"),
                (F.col("m") != F.col("u")).alias("__chg"),
            )
        )
        mins2 = large.groupBy("u").agg(
            F.min("v").alias("m"), F.max("__chg").alias("__lchg")
        )
        children = (
            large.select("u", "v")
            .join(mins2, "u")
            .filter(F.col("v") != F.col("m"))
            .select(
                F.col("v").alias("eu"), F.col("m").alias("ev"),
                F.lit(True).alias("__chg"),
            )
        )
        selfs = mins2.select(
            F.col("u").alias("eu"), F.col("m").alias("ev"),
            F.col("__lchg").alias("__chg"),
        )
        small = (
            children.union(selfs)
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
    return cc_join_star(vertices, pairs)


a = build("prod").localCheckpoint(eager=True)
b = build("joinstar").localCheckpoint(eager=True)
d1 = a.exceptAll(b).count()
d2 = b.exceptAll(a).count()
print(f"equality at sf1: prod\\joinstar={d1} joinstar\\prod={d2}")
if d1 or d2:
    sys.exit("OUTPUT MISMATCH")

results: dict[str, list[float]] = {"prod": [], "joinstar": []}
for v in ["joinstar", "prod", "prod", "joinstar"] * REPS:
    t0 = time.perf_counter()
    build(v).write.mode("overwrite").format("noop").save()
    results[v].append(round(time.perf_counter() - t0, 3))
for v, runs in results.items():
    print(f"{v}: runs={runs} min={min(runs)}")

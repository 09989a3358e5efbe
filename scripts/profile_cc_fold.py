#!/usr/bin/env python
"""A/B the CC round's materialization count (VERDICT r10 #6, r11 fold).

The fold (persist+count the propagated labels instead of a second
checkpoint copy per round) was ADOPTED into production
`connected_components` in r11 after this script measured it ~7% faster
and bitwise-identical on the sf1 docs near-dup workload. To keep the
A/B meaningful after adoption, this script carries a FROZEN copy of the
pre-fold two-checkpoint loop (`cc_prefold_2ckpt`, the r10 shape) as the
baseline — production is the folded one-checkpoint shape.

Usage: python scripts/profile_cc_fold.py [sf_dir]  (default .scaling_sf1)
Alternates variants x3 each to control host drift; prints min/median.
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
    _ckpt_fresh_stats,
    connected_components,
)
from redpanda_to_parquet_writer_spark.plans.text_queries import (  # noqa: E402
    docs_minhash_lsh_pairs,
)
from redpanda_to_parquet_writer_spark.session import get_spark  # noqa: E402
from redpanda_to_parquet_writer_spark.sources.parquet import load_table  # noqa: E402


def cc_prefold_2ckpt(vertices, pairs, id_col="doc_id", src_col="id_a",
                     dst_col="id_b", max_iterations=25):
    """FROZEN r10 shape: TWO `_ckpt_fresh_stats` materializations per
    round (propagated labels, then pointer-jumped labels). Kept verbatim
    as the A/B baseline after the r11 fold replaced the first checkpoint
    with persist+count in production `connected_components`."""
    edges = pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)
    labels = vertices.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("cluster_id")
    ).localCheckpoint(eager=True)
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["src"] == labels["id"])
            .groupBy("dst")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        propagated = _ckpt_fresh_stats(
            labels.join(neighbor_min, labels["id"] == neighbor_min["dst"], "left")
            .select(
                "id",
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_min", "cluster_id")
                ).alias("cluster_id"),
            )
        )
        parent = propagated.select(
            F.col("id").alias("p_id"), F.col("cluster_id").alias("p_cluster")
        )
        new_labels = _ckpt_fresh_stats(
            propagated.join(parent, propagated["cluster_id"] == parent["p_id"], "left")
            .select(
                "id",
                F.least(
                    F.col("cluster_id"), F.coalesce("p_cluster", "cluster_id")
                ).alias("cluster_id"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.cluster_id") < F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("id").alias(id_col), "cluster_id")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, ".scaling_sf1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    cfg = EngineConfig(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEMORY", "8g"),
    )
    spark = get_spark(cfg, app_name="profile-cc-fold")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # freeze identical inputs for both variants: CC time only
    pairs = docs_minhash_lsh_pairs(spark, sf_dir).localCheckpoint(eager=True)
    vertices = docs.localCheckpoint(eager=True)
    print(f"pairs={pairs.count()} vertices={vertices.count()}  ({sf_dir})")

    variants = {
        "prefold(2ckpt, frozen r10)": cc_prefold_2ckpt,
        "production(1ckpt fold)": connected_components,
    }
    results: dict[str, list] = {}
    times: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(3):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            out = fn(vertices, pairs)
            rows = sorted((r[0], r[1]) for r in out.collect())
            times[name].append(round(time.perf_counter() - t0, 2))
            prev = results.setdefault(name, rows)
            assert rows == prev, f"{name} nondeterministic across reps"
    a, b = results["prefold(2ckpt, frozen r10)"], results["production(1ckpt fold)"]
    print("bitwise identical:", a == b, f"({len(a)} rows)")
    for name, ts in times.items():
        print(f"{name}: min={min(ts)} median={sorted(ts)[1]} all={ts}")
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""A/B the r17 CC rewrites against the frozen r16 shape.

Variants, alternated to control host drift:
  - r16 (frozen copy of the pre-r17 loop: 1 jump/round + changed-check JOIN job)
  - r17-star (alternating large-star/small-star, the new production default)
  - r17-labelprop-fold (pre-r17 loop with the changed-check folded into the
    materializing aggregate)

Every variant's output is checked identical (full anti-join both ways) to the
frozen baseline before its time is trusted.

Usage: python scripts/profile_cc_jumps_r17.py [sf_dir] [reps]
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


def cc_r16(vertices, pairs, id_col="doc_id", src_col="id_a",
           dst_col="id_b", max_iterations=25):
    """FROZEN pre-r17 production loop (1 jump + changed-check join)."""
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
        propagated = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["dst"], "left")
            .select(
                "id",
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_min", "cluster_id")
                ).alias("cluster_id"),
            )
            .persist()
        )
        propagated.count()
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
        propagated.unpersist()
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    cfg = EngineConfig(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark = get_spark(cfg, app_name="profile_cc_jumps")

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = docs_minhash_lsh_pairs(spark, sf_dir)

    # reference output (frozen shape), for equality checks
    ref = cc_r16(docs, pairs).localCheckpoint(eager=True)

    variants = [
        ("r16", lambda: cc_r16(docs, pairs)),
        ("r17-star", lambda: connected_components(docs, pairs, algorithm="star")),
        (
            "r17-labelprop-fold",
            lambda: connected_components(docs, pairs, algorithm="labelprop"),
        ),
    ]

    # warm pass
    cc_r16(docs, pairs).count()

    times: dict[str, list[float]] = {n: [] for n, _ in variants}
    for rep in range(reps):
        for name, fn in variants:
            t0 = time.perf_counter()
            out = fn()
            out.count()
            dt = time.perf_counter() - t0
            diff = (
                out.join(ref, ["doc_id", "cluster_id"], "left_anti").count()
                + ref.join(out, ["doc_id", "cluster_id"], "left_anti").count()
            )
            times[name].append(dt)
            print(f"rep{rep} {name}: {dt:.3f}s diff_rows={diff}")
            if diff:
                raise SystemExit(f"OUTPUT MISMATCH in {name}")
    print("\nmin per variant:")
    for name, ts in times.items():
        print(f"  {name}: min={min(ts):.3f}s all={[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Instrument connected_components' per-round cost at sf0.1 (r17 opt).

Wraps the production loop with per-phase timers (neighbor-min+propagate
materialization, pointer-jump checkpoint, changed-check job) by running
a structurally identical copy, so the optimization target is measured,
not guessed. Prints one line per round plus totals; also times the
production function end-to-end for cross-checking.

Usage: python scripts/profile_cc_rounds.py [sf_dir]
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


def cc_instrumented(vertices, pairs, id_col="doc_id", src_col="id_a",
                    dst_col="id_b", max_iterations=25):
    t0 = time.perf_counter()
    edges = pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)
    labels = vertices.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("cluster_id")
    ).localCheckpoint(eager=True)
    print(f"  setup (edges+labels ckpt): {time.perf_counter() - t0:.3f}s")

    rounds = 0
    for i in range(max_iterations):
        ta = time.perf_counter()
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
        tb = time.perf_counter()
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
        tc = time.perf_counter()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.cluster_id") < F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        td = time.perf_counter()
        print(
            f"  round {i}: propagate={tb - ta:.3f}s jump+ckpt={tc - tb:.3f}s "
            f"changed-check={td - tc:.3f}s total={td - ta:.3f}s changed={changed}"
        )
        labels = new_labels
        rounds += 1
        if changed == 0:
            break
    print(f"  rounds run: {rounds}")
    return labels.select(F.col("id").alias(id_col), "cluster_id")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    cfg = EngineConfig(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark = get_spark(cfg, app_name="profile_cc_rounds")

    docs = load_table(spark, sf_dir, "documents")
    pairs = docs_minhash_lsh_pairs(spark, sf_dir)
    n_docs = docs.count()
    n_pairs = pairs.count()
    print(f"vertices={n_docs} pairs={n_pairs}")

    # warm pass (JIT / parquet footer cache), then measured passes
    for label in ("warm", "measured-1", "measured-2"):
        t0 = time.perf_counter()
        out = cc_instrumented(docs.select("doc_id"), pairs)
        n = out.count()
        print(f"{label}: instrumented total={time.perf_counter() - t0:.3f}s rows={n}")

    for label in ("prod-1", "prod-2"):
        t0 = time.perf_counter()
        out = connected_components(docs.select("doc_id"), pairs)
        n = out.count()
        print(f"{label}: production total={time.perf_counter() - t0:.3f}s rows={n}")


if __name__ == "__main__":
    main()

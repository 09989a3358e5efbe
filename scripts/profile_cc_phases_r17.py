#!/usr/bin/env python
"""Phase-level timing of cc_build (session 3, guide §1): where do the
seconds of the star-contraction docs_dedup_clusters build actually go —
the LSH candidate job, the initial edge checkpoint, each round's two
jobs (flag aggregate vs checkpoint), or the final label join?

Usage: python scripts/profile_cc_phases_r17.py [sf_dir] [reps]
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
from redpanda_to_parquet_writer_spark.plans.text_queries import (  # noqa: E402
    docs_minhash_lsh_pairs,
)
from redpanda_to_parquet_writer_spark.session import get_spark  # noqa: E402
from redpanda_to_parquet_writer_spark.sources.parquet import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = get_spark(
    EngineConfig(master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)),
    app_name="profile_cc_phases",
)


def run_once(tag: str) -> None:
    t_all = time.perf_counter()
    docs = load_table(spark, SF_DIR, "documents")
    vertices = docs.select("doc_id")
    pairs = docs_minhash_lsh_pairs(spark, SF_DIR)

    t0 = time.perf_counter()
    edges = (
        pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    t_edges = time.perf_counter() - t0

    rounds = []
    for rnd in range(25):
        r0 = time.perf_counter()
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
        r_built = time.perf_counter()
        cached = small.persist()
        flag = cached.agg(F.max(F.col("__chg"))).collect()[0][0]
        r_agg = time.perf_counter()
        out = cached.localCheckpoint(eager=True)
        r_ckpt = time.perf_counter()
        cached.unpersist()
        edges = out.select("u", "v")
        rounds.append(
            (
                round(r_built - r0, 3),
                round(r_agg - r_built, 3),
                round(r_ckpt - r_agg, 3),
            )
        )
        if not bool(flag):
            break

    t1 = time.perf_counter()
    roots = edges.groupBy("u").agg(F.min("v").alias("cluster_id"))
    labeled = (
        vertices.select(F.col("doc_id").alias("id"))
        .join(roots.select(F.col("u").alias("id"), "cluster_id"), "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            F.coalesce("cluster_id", F.col("id")).alias("cluster_id"),
        )
    )
    final = labeled.select(
        "doc_id", "cluster_id", (F.col("cluster_id") == F.col("doc_id")).alias("keep")
    )
    final.write.mode("overwrite").format("noop").save()
    t_final = time.perf_counter() - t1
    total = time.perf_counter() - t_all

    print(f"[{tag}] total={total:.3f}s edges_ckpt={t_edges:.3f}s "
          f"final_join_noop={t_final:.3f}s rounds={len(rounds)}")
    for i, (b, a, c) in enumerate(rounds):
        print(f"  round {i}: build_plan={b:.3f} agg_job={a:.3f} ckpt_job={c:.3f}")


for rep in range(REPS):
    run_once(f"rep{rep}")

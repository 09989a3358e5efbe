#!/usr/bin/env python
"""r18 task #7 pricing: hash-to-min seeding of the star contraction
(VERDICT r17 next-round item 7, timeboxed to this one experiment).

Candidate: ONE seed pass before the alternating-star loop — per vertex
u, m(u) = min(N(u) ∪ {u}) via the same window min, then every directed
edge (u, v) re-emits as {v, m(u)} AND {u, m(u)} (hash-to-min: the
neighborhood hangs off its min after one pass, from BOTH endpoints
where large-star rewrites only from the smaller). Components are
preserved (u—v stays connected through m(u)); the loop's fixpoint —
min-rooted stars labeled with component minima — is seeding-invariant,
so the composed output must be identical (gated by full anti-join both
ways before any timing is trusted). Cost: one extra materialization +
an edge set that can transiently grow to ~2|E|; win iff it removes ≥2
of the 6 sf0.1 rounds.

Usage: python scripts/ab_cc_seed_r18.py [sf_dir] [reps]
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
    app_name="ab_cc_seed",
)

ROUNDS_RUN = {"n": 0}


def cc_seeded(vertices, pairs, id_col="doc_id", src_col="id_a",
              dst_col="id_b", max_iterations=25):
    """Production star loop with a hash-to-min seed pass up front."""
    edges = (
        pairs.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("u")

    # --- seed: hash-to-min, one window pass over both directions ---
    directed = edges.select("u", "v").union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = directed.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
    seeded = (
        m.select(F.col("v").alias("a"), F.col("m").alias("b"))
        .union(m.select(F.col("u").alias("a"), F.col("m").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
        .distinct()
    )
    edges = seeded.localCheckpoint(eager=True)

    def one_round(es):
        directed = es.select("u", "v").union(
            es.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        large = (
            directed.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
            .filter(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("u"),
                F.col("m").alias("v"),
                (F.col("m") != F.col("u")).alias("__chg"),
            )
        )
        grouped = large.withColumn("m", F.min("v").over(w)).withColumn(
            "__lchg", F.max("__chg").over(w)
        )
        return (
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

    remaining = max_iterations
    while remaining > 0:
        small = one_round(edges)
        ROUNDS_RUN["n"] += 1
        if remaining >= 2:
            small = one_round(small.select("u", "v"))
            ROUNDS_RUN["n"] += 1
            remaining -= 2
        else:
            remaining -= 1
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
    return cc_seeded(vertices, pairs)


def timed(variant: str) -> float:
    t0 = time.perf_counter()
    build(variant).write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


a = build("prod").localCheckpoint(eager=True)
ROUNDS_RUN["n"] = 0
b = build("seed").localCheckpoint(eager=True)
print(f"seeded loop contraction rounds: {ROUNDS_RUN['n']}")
d1 = a.exceptAll(b).count()
d2 = b.exceptAll(a).count()
print(f"equality: prod\\seed={d1} seed\\prod={d2}")
if d1 or d2:
    sys.exit("OUTPUT MISMATCH — timings not trusted")

results: dict[str, list[float]] = {"prod": [], "seed": []}
order = ["prod", "seed", "seed", "prod"] * REPS
for v in order:
    results[v].append(timed(v))
for v, runs in results.items():
    print(f"{v}: runs={runs} min={min(runs)}")

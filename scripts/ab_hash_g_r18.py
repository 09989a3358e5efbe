#!/usr/bin/env python
"""r18 task #6 pricing: 64-bit in-task shingle hashing before the
posting-list exchange (VERDICT r17 next-round item 6).

Variant: after the in-task `array_distinct` + explode, project
`xxhash64(g)` (codegen'd, same stage as the explode — NOT a HOF) so the
exchange into the posting groupBy carries 8-byte longs instead of gram
strings. Distinctness per doc is preserved (per-doc grams were already
distinct; xxhash64 is deterministic), so counts are identical unless
two distinct grams in the same posting bucket collide at 64 bits.

Modes:
  eq   — build old and new docs_jaccard_pairs / docs_containment_pairs
         at $SPARK_GRAFT_SF_DIR and anti-join both ways (must be 0/0).
  time — bench-protocol timing of one side (label old|new), fresh
         process per invocation: warm query, then min-of-N noop saves.

Usage:
  python scripts/ab_hash_g_r18.py eq
  python scripts/ab_hash_g_r18.py time old|new jaccard|containment [n]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from redpanda_to_parquet_writer_spark.config import EngineConfig  # noqa: E402
from redpanda_to_parquet_writer_spark.operators import text as T  # noqa: E402
from redpanda_to_parquet_writer_spark.plans.text_queries import (  # noqa: E402
    CONTAINMENT_THRESHOLD,
    JACCARD_THRESHOLD,
    NGRAM_N,
)
from redpanda_to_parquet_writer_spark.sources.parquet import load_table  # noqa: E402
from redpanda_to_parquet_writer_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _pairs_hashed(df, id_col, ngram_col, threshold, kind) -> DataFrame:
    """jaccard_pairs/containment_pairs with the post-explode 64-bit hash."""
    shingles = (
        df.select(F.col(id_col), F.array_distinct(F.col(ngram_col)).alias("__gs"))
        .select(F.col(id_col), F.size("__gs").alias("n"), F.explode("__gs").alias("g0"))
        .select(F.col(id_col), F.col("n"), F.xxhash64("g0").alias("g"))
    )
    postings = (
        shingles.groupBy("g")
        .agg(F.collect_list(F.struct(F.col(id_col).alias("id"), F.col("n"))).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    lhs = postings.select(F.explode("ids").alias("a"), "ids")
    pairs = lhs.select("a", F.explode("ids").alias("b")).filter(
        F.col("a.id") < F.col("b.id")
    )
    inter = pairs.groupBy(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.col("a.n").alias("na"),
        F.col("b.n").alias("nb"),
    ).agg(F.count("*").alias("common"))
    if kind == "jaccard":
        jac = F.col("common").cast("double") / (
            F.col("na") + F.col("nb") - F.col("common")
        )
        return inter.select(
            "id_a", "id_b", F.round(jac, 6).alias("jaccard")
        ).filter(F.col("jaccard") >= threshold)
    thr = int(round(threshold * 1000000))
    return (
        inter.filter(F.expr(f"common * 1000000 >= {thr} * least(na, nb)"))
        .select(
            "id_a",
            "id_b",
            "common",
            (
                F.expr("(2 * common * 1000000 + least(na, nb)) DIV (2 * least(na, nb))")
                / F.lit(1000000.0)
            ).alias("containment"),
        )
    )


def build(spark, kind: str, variant: str) -> DataFrame:
    docs = load_table(spark, SF_DIR, "documents")
    grams = T.with_ngrams(docs, "text", NGRAM_N)
    if kind == "jaccard":
        if variant == "old":
            return T.jaccard_pairs(grams, "doc_id", "ngrams", JACCARD_THRESHOLD)
        return _pairs_hashed(grams, "doc_id", "ngrams", JACCARD_THRESHOLD, "jaccard")
    if variant == "old":
        return T.containment_pairs(grams, "doc_id", "ngrams", CONTAINMENT_THRESHOLD)
    return _pairs_hashed(
        grams, "doc_id", "ngrams", CONTAINMENT_THRESHOLD, "containment"
    )


def main() -> None:
    mode = sys.argv[1]
    spark = get_spark(
        EngineConfig(master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)),
        app_name=f"ab_hash_g_{mode}",
    )
    if mode == "eq":
        for kind in ("jaccard", "containment"):
            old = build(spark, kind, "old")
            new = build(spark, kind, "new")
            a = old.exceptAll(new).count()
            b = new.exceptAll(old).count()
            print(f"{kind}: old_minus_new={a} new_minus_old={b} n_old={old.count()}")
        return
    variant, kind = sys.argv[2], sys.argv[3]
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    warm = build(spark, kind, variant)
    warm.write.mode("overwrite").format("noop").save()
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        build(spark, kind, variant).write.mode("overwrite").format("noop").save()
        runs.append(round(time.perf_counter() - t0, 4))
    print(json.dumps({"variant": variant, "kind": kind, "runs": runs, "min": min(runs)}))


if __name__ == "__main__":
    main()

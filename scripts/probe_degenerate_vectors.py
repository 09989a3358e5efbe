#!/usr/bin/env python
"""Degenerate-corpus probe for the VECTOR side (VERDICT r13 #4) — the
r13 text-side treatment applied to embeddings: 200k IDENTICAL vectors,
i.e. ONE hot LSH bucket in every table, ONE hot IVF list per shard, and
a SemDeDup "cluster" that is the whole corpus. Exactly the input that
hands any window-partitioned-by-content plan one unsplittable task.

What it measures (timings land in SCALING.md; exact outputs are pinned
as a 50k regression test in tests/test_properties.py):

  1. exact vector dedup (`content_dedup_keep_first` on the embedding
     column) — the production FIRST pass for identical vectors: a
     min_by aggregate whose map-side partial combine collapses the hot
     hash to one candidate per partition; skew-immune by construction.
  2. capped LSH near-dup pairs (`lsh_bucketed_neighbors` with
     `max_bucket_size`) — the hot bucket sub-collects per (bucket,
     salt), totals aggregate skew-free, and the oversize bucket drops
     before its member array ever materializes.
  3. SemDeDup on the degenerate corpus = exact pre-pass ∘ capped LSH:
     identical vectors are BITWISE equal, so metric near-dup machinery
     is the wrong first tool — collapse them exactly, then LSH the
     survivors (where no bucket is hot anymore).
  4. sharded IVF build + collapsed serve: every vector ties to cluster
     0 (ivf_assign breaks ties to the lowest cluster id), so each shard
     serves ONE corpus-sized list — the probe measures whether the
     serve's verify + global top-k stay parallel when the probed
     candidate volume is the whole corpus.

Corpus: 200k identical vectors + 1k distinct tail vectors (so the
capped LSH still has real pairs to find and the exact pre-pass has
survivors beyond one row).

Usage: python scripts/probe_degenerate_vectors.py [n_hot]
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
    content_dedup_keep_first,
)
from redpanda_to_parquet_writer_spark.operators.similarity import (  # noqa: E402
    build_ivf_index_auto,
    build_ivf_index_sharded,
    ivf_topk_indexed,
    ivf_topk_indexed_sharded,
    lsh_bucketed_neighbors,
)
from redpanda_to_parquet_writer_spark.session import get_spark  # noqa: E402

DIM = 64
N_REST = 1_000
N_QUERIES = 8
CAP = 1_000


def degenerate_embeddings(spark, n_hot: int, n_rest: int = N_REST):
    """n_hot copies of ONE vector (ids 0..n_hot-1) + n_rest distinct
    deterministic vectors — all expression-built, no driver rows."""
    hot_vec = F.array(*[F.lit(float((d * 7) % 13 + 1)) for d in range(DIM)])
    hot = spark.range(n_hot).select(F.col("id").alias("vec_id"), hot_vec.alias("embedding"))
    d = F.sequence(F.lit(0), F.lit(DIM - 1))
    # component 0 carries the raw id so every tail vector is DISTINCT
    # (a pure mod-101 pattern cycles after 101 ids); the rest is a
    # deterministic signed pattern so directions vary
    rest_vec = F.transform(
        d,
        lambda i: F.when(i == 0, F.col("id").cast("double")).otherwise(
            ((F.col("id") * 31 + i * 17) % 101 - 50).cast("double")
        ),
    )
    rest = spark.range(n_hot, n_hot + n_rest).select(
        F.col("id").alias("vec_id"), rest_vec.alias("embedding")
    )
    return hot.unionByName(rest)


def main() -> None:
    n_hot = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        EngineConfig(master=f"local[{cpus}]", shuffle_partitions=int(cpus)),
        app_name="probe_degenerate_vectors",
    )
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    tmp = tempfile.mkdtemp(prefix="degenerate_vec_")
    emb = degenerate_embeddings(spark, n_hot)
    emb.write.mode("overwrite").parquet(f"{tmp}/emb")  # real scan, not range
    emb = spark.read.parquet(f"{tmp}/emb")
    print(f"corpus: {n_hot} identical + {N_REST} distinct vectors, dim={DIM}", flush=True)

    # 1. exact vector dedup: the hot group collapses map-side
    t0 = time.perf_counter()
    survivors = content_dedup_keep_first(
        emb, content_cols=["embedding"], order_cols=["vec_id"]
    ).count()
    t_exact = time.perf_counter() - t0
    print(f"exact_vector_dedup: {survivors} survivors in {t_exact:.2f}s", flush=True)
    assert survivors == 1 + N_REST

    # 2. capped LSH: the hot bucket drops salted, tail pairs survive
    from redpanda_to_parquet_writer_spark.plans.vector_queries import _lsh_planes

    t0 = time.perf_counter()
    pairs = lsh_bucketed_neighbors(
        emb, _lsh_planes(DIM), "vec_id", "embedding", 0.9, max_bucket_size=CAP
    )
    n_pairs = pairs.count()
    t_lsh = time.perf_counter() - t0
    print(f"capped_lsh_pairs(cap={CAP}): {n_pairs} pairs in {t_lsh:.2f}s", flush=True)

    # 3. SemDeDup on a degenerate corpus = exact pre-pass ∘ capped LSH
    t0 = time.perf_counter()
    collapsed = content_dedup_keep_first(
        emb, content_cols=["embedding"], order_cols=["vec_id"]
    )
    p2 = lsh_bucketed_neighbors(
        collapsed, _lsh_planes(DIM), "vec_id", "embedding", 0.9, max_bucket_size=CAP
    )
    dropped = p2.select(F.col("id_b").alias("vec_id")).distinct()
    keep = collapsed.join(dropped, "vec_id", "left_anti").count()
    t_sem = time.perf_counter() - t0
    print(f"semdedup_keep (exact∘LSH): {keep} kept in {t_sem:.2f}s", flush=True)

    # 4. sharded IVF build + serve with ONE hot list per shard
    t0 = time.perf_counter()
    books = build_ivf_index_sharded(
        emb, f"{tmp}/idx", 4, n_updates=0, use_arrow=True
    )
    t_build = time.perf_counter() - t0
    print(f"4-shard build (all-ties corpus): {t_build:.2f}s", flush=True)
    queries = emb.limit(N_QUERIES)
    for label, vp in (("default", None), ("verify_parallelism=32", 32)):
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            ivf_topk_indexed_sharded(
                spark,
                f"{tmp}/idx",
                queries,
                books,
                k=3,
                n_probe=4,
                verify_parallelism=vp,
            ).write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        print(
            f"sharded serve over hot lists [{label}]: min={min(runs):.2f}s runs={[round(t, 2) for t in runs]}",
            flush=True,
        )

    # 5. FLAT serve on the same corpus (VERDICT r14 #6): the flat
    # paths' "candidates bounded at n_probe x target_list_len" is an
    # AVERAGE this corpus defeats — every vector ties into ONE list, so
    # the single-level top-k window streams the corpus through one task
    # per query. Measures default vs the opt-in salted two-level rank
    # vs salted + verify repartition; rows asserted identical.
    t0 = time.perf_counter()
    flat_book = build_ivf_index_auto(emb, f"{tmp}/flat", n_updates=0, use_arrow=True)
    print(f"flat build (all-ties corpus): {time.perf_counter() - t0:.2f}s", flush=True)
    flat_variants = {
        "default": dict(),
        "salted": dict(salted=True),
        "vp=32": dict(verify_parallelism=32),
        "salted+vp=32": dict(salted=True, verify_parallelism=32),
    }
    rows_by_label = {}
    times_by_label = {lbl: [] for lbl in flat_variants}
    for _ in range(3):
        for label, kw in flat_variants.items():
            t0 = time.perf_counter()
            res = ivf_topk_indexed(
                spark, f"{tmp}/flat", queries, flat_book, k=3, n_probe=4, **kw
            )
            rows = sorted(tuple(r) for r in res.collect())
            times_by_label[label].append(time.perf_counter() - t0)
            rows_by_label[label] = rows
    base_rows = rows_by_label["default"]
    assert all(rows == base_rows for rows in rows_by_label.values())
    for label, runs in times_by_label.items():
        print(
            f"flat serve over hot list [{label}]: min={min(runs):.2f}s runs={[round(t, 2) for t in runs]}",
            flush=True,
        )

    # 6. CHUNKED serve on the same hot-list index (VERDICT r15 #6):
    # the chunked path inherits the sharded serve's salted two-level
    # rank, but each CHUNK runs its own pruned-scan verify — exactly
    # where the hot list lands — so the open question was whether
    # `verify_parallelism` passes through to the per-chunk verify (it
    # does, by signature) and what it buys ON this corpus. 2-shard
    # chunks over the 4-shard index (2 chunks), rows asserted
    # identical to the one-shot sharded serve, min-of-3 interleaved.
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        ivf_topk_indexed_sharded_chunked,
    )

    one_shot_rows = sorted(
        tuple(r)
        for r in ivf_topk_indexed_sharded(
            spark, f"{tmp}/idx", queries, books, k=3, n_probe=4
        ).collect()
    )
    chunk_variants = {"default": None, "verify_parallelism=32": 32}
    chunk_times = {lbl: [] for lbl in chunk_variants}
    for lbl, vp in chunk_variants.items():
        got = sorted(
            tuple(r)
            for r in ivf_topk_indexed_sharded_chunked(
                spark, f"{tmp}/idx", queries, books, 2, k=3, n_probe=4,
                verify_parallelism=vp,
            ).collect()
        )
        assert got == one_shot_rows, lbl
    for _ in range(3):
        for lbl, vp in chunk_variants.items():
            t0 = time.perf_counter()
            ivf_topk_indexed_sharded_chunked(
                spark, f"{tmp}/idx", queries, books, 2, k=3, n_probe=4,
                verify_parallelism=vp,
            ).write.mode("overwrite").format("noop").save()
            chunk_times[lbl].append(time.perf_counter() - t0)
    for lbl, runs in chunk_times.items():
        print(
            f"chunked serve (2 chunks) over hot lists [{lbl}]: min={min(runs):.2f}s runs={[round(t, 2) for t in runs]}",
            flush=True,
        )


if __name__ == "__main__":
    main()

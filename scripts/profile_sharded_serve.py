#!/usr/bin/env python
"""A/B the sharded-IVF serve's fixed costs (VERDICT r12 #1).

r12's `ivf_topk_indexed_sharded` prepared each shard separately —
codebook collect, probe checkpoint, probed-id collect, pruned read —
a chain of small blocking jobs per shard, threaded but still linear in
n_shards (measured 3.9s vs 1.5s flat for an 8-query batch at 4 shards
on the 200k-vector probe corpus). r13 collapsed the serve into ONE
union job: one combined codebook relation, one probe-ranking job
windowed per (query, shard), one checkpoint, one bounded collect, one
scan with OR-of-conjunction partition filters over the sibling
shard=/cluster_id= directories, one global top-k.

To keep the A/B meaningful after adoption, this script carries a
FROZEN copy of the r12 per-shard serve loop (`serve_r12_pershard`) as
the baseline — production is the collapsed one-job shape. Rows are
asserted identical between the two before timing.

Usage: python scripts/profile_sharded_serve.py [emb_parquet]
  default corpus: .scaling_sf10/embeddings.parquet (200k vectors —
  synthesize via scripts/scaling_sf10_probe.py). Builds a 4-shard and
  a flat index, then alternates collapsed/per-shard/flat serves x3
  each to control host drift; prints min/median per variant.

       python scripts/profile_sharded_serve.py --sweep [emb_parquet]
  the FLATNESS CURVE (VERDICT r13 #1 done-condition): builds indexes
  at 1/2/4/8 shards, then times the collapsed serve min-of-3
  interleaved across shard counts (full call: prep + job). The claim
  under test: the serve's fixed costs are n_shards-free, so cost
  growth across the curve is candidate volume only (n_shards x
  n_probe lists verified at equal n_probe).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from redpanda_to_parquet_writer_spark.config import EngineConfig  # noqa: E402
from redpanda_to_parquet_writer_spark.operators.similarity import (  # noqa: E402
    _materialize_probes,
    _rank_probes,
    _rank_topk,
    _score_probed_candidates,
    _topk_window,
    build_ivf_index_auto,
    build_ivf_index_sharded,
    ivf_topk_indexed,
    ivf_topk_indexed_sharded,
    materialize_centroids,
)
from redpanda_to_parquet_writer_spark.session import get_spark  # noqa: E402

N_SHARDS = 4
N_QUERIES = 8
K = 3
N_PROBE = 8


def serve_r12_pershard(spark, index_path, queries, codebooks, k, n_probe):
    """FROZEN r12 baseline: per-shard prep chains fanned over a thread
    pool, per-shard local top-k, union re-rank (the pre-collapse shape,
    verbatim from the r12 source)."""

    def _prep(s):
        cents = materialize_centroids(codebooks[s])
        probes = _materialize_probes(
            _rank_probes(queries, cents, "vec_id", "embedding", n_probe), False
        )
        probed_clusters = sorted(
            int(r["cluster_id"])
            for r in probes.select("cluster_id").distinct().collect()
        )
        return s, probes, probed_clusters

    shards = sorted(codebooks)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(8, len(shards))) as ex:
        preps = sorted(ex.map(_prep, shards))

    shard_tops = []
    for s, probes, probed_clusters in preps:
        index = spark.read.parquet(f"{index_path}/shard={s}").filter(
            F.col("cluster_id").isin(probed_clusters)
        )
        scored = _score_probed_candidates(index, probes)
        shard_tops.append(
            scored.withColumn("__r", F.row_number().over(_topk_window()))
            .filter(F.col("__r") <= k)
            .drop("__r")
        )
    union = shard_tops[0]
    for t in shard_tops[1:]:
        union = union.unionByName(t)
    return _rank_topk(union, k)


def sweep(emb_path: str) -> None:
    """Flatness curve: collapsed serve at 1/2/4/8 shards, min-of-3
    interleaved (host-drift control), plus per-count build times."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        EngineConfig(master=f"local[{cpus}]", shuffle_partitions=int(cpus)),
        app_name="sharded_serve_flatness",
    )
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    tmp = tempfile.mkdtemp(prefix="sharded_serve_sweep_")
    emb = spark.read.parquet(emb_path)
    queries = emb.limit(N_QUERIES)
    counts = [1, 2, 4, 8]
    books: dict[int, dict] = {}
    print(f"corpus={emb.count()} vectors; building {counts}-shard indexes…", flush=True)
    for n in counts:
        t0 = time.perf_counter()
        books[n] = build_ivf_index_sharded(emb, f"{tmp}/sh{n}", n, use_arrow=True)
        print(f"{n}-shard build {time.perf_counter() - t0:.1f}s", flush=True)
    times: dict[int, list[float]] = {n: [] for n in counts}
    for _ in range(3):
        for n in counts:
            t0 = time.perf_counter()
            ivf_topk_indexed_sharded(
                spark, f"{tmp}/sh{n}", queries, books[n], k=K, n_probe=N_PROBE
            ).write.mode("overwrite").format("noop").save()
            times[n].append(time.perf_counter() - t0)
    for n in counts:
        ts = times[n]
        print(
            f"{n} shards: min={min(ts):.3f}s median={statistics.median(ts):.3f}s runs={[round(t, 3) for t in ts]}",
            flush=True,
        )


def sweep_chunked(emb_path: str) -> None:
    """Chunked-serve cost shape (VERDICT r14 #2 done-condition): 8-shard
    index, one-shot serve vs chunked at chunk_shards 8/4/2 (= 1/2/4
    chunks), min-of-3 interleaved, rows asserted identical. r14's
    serial chunk loop measured one-shot 3.53s / 1 chunk 3.18s /
    2 chunks 4.26s / 4 chunks 6.01s (~1.3s fixed cost per extra chunk,
    queued serially); r15 fans the per-chunk preparations out on a
    thread pool, so the 2- and 4-chunk points should drop toward the
    one-shot cost plus ONE chunk's fixed cost."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        EngineConfig(master=f"local[{cpus}]", shuffle_partitions=int(cpus)),
        app_name="chunked_serve_overlap",
    )
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    from redpanda_to_parquet_writer_spark.operators.similarity import (
        ivf_topk_indexed_sharded_chunked,
    )

    tmp = tempfile.mkdtemp(prefix="chunked_serve_sweep_")
    emb = spark.read.parquet(emb_path)
    queries = emb.limit(N_QUERIES)
    n_shards = 8
    print(f"corpus={emb.count()} vectors; building {n_shards}-shard index…", flush=True)
    t0 = time.perf_counter()
    books = build_ivf_index_sharded(emb, f"{tmp}/sh", n_shards, use_arrow=True)
    print(f"build {time.perf_counter() - t0:.1f}s", flush=True)

    variants = {
        "one-shot": lambda: ivf_topk_indexed_sharded(
            spark, f"{tmp}/sh", queries, books, k=K, n_probe=N_PROBE
        ),
        **{
            f"chunk_shards={cs} ({-(-n_shards // cs)} chunks)": (
                # the probe's chunks are tiny (~10 KB of centroids), so
                # declare that via the per-chunk budget: the fan-out
                # widens to the full 8-way overlap instead of the
                # default budget's envelope-bounded 2-way
                lambda cs=cs: ivf_topk_indexed_sharded_chunked(
                    spark,
                    f"{tmp}/sh",
                    queries,
                    books,
                    cs,
                    k=K,
                    n_probe=N_PROBE,
                    broadcast_budget_bytes=1 << 20,
                )
            )
            for cs in (8, 4, 2)
        },
    }
    base = sorted(tuple(r) for r in variants["one-shot"]().collect())
    for name, fn in variants.items():
        assert sorted(tuple(r) for r in fn().collect()) == base, name
    print(f"rows identical across variants ({len(base)} rows)", flush=True)

    times: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(3):  # interleaved to control host drift
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(
            f"{name}: min={min(ts):.3f}s median={statistics.median(ts):.3f}s runs={[round(t, 3) for t in ts]}",
            flush=True,
        )


def main() -> None:
    argv = [a for a in sys.argv[1:] if a not in ("--sweep", "--chunked")]
    if "--chunked" in sys.argv[1:]:
        sweep_chunked(
            argv[0]
            if argv
            else os.path.join(ROOT, ".scaling_sf10", "embeddings.parquet")
        )
        return
    if "--sweep" in sys.argv[1:]:
        sweep(
            argv[0]
            if argv
            else os.path.join(ROOT, ".scaling_sf10", "embeddings.parquet")
        )
        return
    emb_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(ROOT, ".scaling_sf10", "embeddings.parquet")
    )
    if not os.path.exists(emb_path):
        raise SystemExit(f"{emb_path} missing — run scripts/scaling_sf10_probe.py first")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        EngineConfig(master=f"local[{cpus}]", shuffle_partitions=int(cpus)),
        app_name="profile_sharded_serve",
    )
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    tmp = tempfile.mkdtemp(prefix="sharded_serve_ab_")
    emb = spark.read.parquet(emb_path)
    queries = emb.limit(N_QUERIES)
    print(f"corpus={emb.count()} vectors; building flat + {N_SHARDS}-shard indexes…", flush=True)
    t0 = time.perf_counter()
    flat_book = build_ivf_index_auto(emb, f"{tmp}/flat", use_arrow=True)
    print(f"flat build {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    books = build_ivf_index_sharded(emb, f"{tmp}/sh", N_SHARDS, use_arrow=True)
    print(f"sharded build {time.perf_counter() - t0:.1f}s", flush=True)

    variants = {
        "collapsed_r13": lambda: ivf_topk_indexed_sharded(
            spark, f"{tmp}/sh", queries, books, k=K, n_probe=N_PROBE
        ),
        "pershard_r12": lambda: serve_r12_pershard(
            spark, f"{tmp}/sh", queries, books, k=K, n_probe=N_PROBE
        ),
        "flat": lambda: ivf_topk_indexed(
            spark, f"{tmp}/flat", queries, flat_book, k=K, n_probe=N_PROBE
        ),
    }
    # the collapse must not change rows (same probes, same verify)
    a = sorted(tuple(r) for r in variants["collapsed_r13"]().collect())
    b = sorted(tuple(r) for r in variants["pershard_r12"]().collect())
    assert a == b, "collapsed serve diverged from the frozen r12 per-shard serve"
    print(f"rows identical across variants ({len(a)} rows)", flush=True)

    times: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(3):  # interleaved to control host drift
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(
            f"{name}: min={min(ts):.3f}s median={statistics.median(ts):.3f}s runs={[round(t, 3) for t in ts]}",
            flush=True,
        )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Trained-build decade probe (VERDICT r16 #4): measure what the
bounded-sample Lloyd trainer (`max_train_rows`, default 256*k) buys at
the decades where full-corpus training is unaffordable.

The r16 20M probes had to build with n_updates=0 (init-only codebook)
because one Lloyd update through the JVM join assignment is n x k
joined rows per shard pass — ~40 BILLION at 20M vectors with per-shard
k=2000, hours of build. With the cap, each shard trains on its
hash-ordered 256*k sample (512k rows at k=2000) through the Arrow
matmul assignment — this probe measures that the TRAINED 20M build
lands in minutes, and what recall the trained codebook buys.

Stage 1 — recall anatomy at 200k (.scaling_sf10), where BOTH brute
force and unbounded training are affordable, and where the default cap
(256*160 = 40,960) is genuinely smaller than the corpus (so sampling
actually engages, unlike the registry fixtures):
  deterministic (init-only) vs sampled-trained vs FULL-trained
  codebooks, identical serve settings, recall@3 against exact brute
  force on an out-of-seed query window. This is the "how much recall
  does sampling cost vs full training" number the 20M decade cannot
  measure (full training is the scale wall being removed).

Stage 2 — the 20M decade (.scaling_sf20m, synthesized by
scripts/probe_chunked_2m.py --decade20): build n_updates=0 (the r16
baseline convention, re-measured same-host) vs n_updates=1 sampled
(train_use_arrow), serve both, recall@3 of both against ONE exact
brute-force pass over all 20M vectors.

Output: human-readable timings + JSON rows appended to
SCALING_CURVE_r17.jsonl. Run with SPARK_GRAFT_DRIVER_MEMORY=24g.

Usage: python scripts/probe_trained_build_20m.py [--skip-20m]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from redpanda_to_parquet_writer_spark.config import EngineConfig  # noqa: E402
from redpanda_to_parquet_writer_spark.session import get_spark  # noqa: E402

SF10_DIR = os.path.join(ROOT, ".scaling_sf10")
SF20M_DIR = os.path.join(ROOT, ".scaling_sf20m")
CURVE = os.path.join(ROOT, "SCALING_CURVE_r17.jsonl")
QUERY_LO = 1000  # out-of-seed base (init seeds are the lowest ids)
K = 3
N_PROBE = 8


def _spread_query_ids(replica_stride: int, n_replicas: int, per_replica: int):
    """Query ids SPREAD across the synthetic corpus's replicas. The
    probe corpora are disjoint-key orthogonal replicas, and the
    deterministic init's seeds all live in replica 0 — measuring recall
    on replica-0-only queries grades the quantizers on the one region
    the untrained init happens to blanket (measured: the same three
    quantizers read 0.29-0.43 on replica-0 queries vs 0.80-0.83
    spread, with the ORDERING inverted). Spreading the query window
    across replicas measures quantizer quality over the whole space."""
    return [
        QUERY_LO + i + j * replica_stride
        for j in range(n_replicas)
        for i in range(per_replica)
    ]


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def _recall(got, exact):
    return round(len(got & exact) / len(exact), 4)


def stage1_recall_200k(spark):
    from redpanda_to_parquet_writer_spark.operators import similarity as S

    import tempfile

    emb = spark.read.parquet(f"{SF10_DIR}/embeddings.parquet")
    n = emb.count()
    k = S.select_n_centroids(n)
    cap = S._resolve_train_cap(k, None)
    assert cap < n, f"stage 1 needs a genuinely-engaged cap ({cap} vs {n})"
    qids = _spread_query_ids(20_000, 8, 8)  # 64 queries, 192 exact pairs
    queries = emb.filter(F.col("vec_id").isin(qids))
    print(f"[200k] corpus={n} k={k} cap={cap} queries={len(qids)}", flush=True)

    t0 = time.perf_counter()
    exact = _pairs(S.brute_force_topk(emb, queries, k=K))
    t_exact = time.perf_counter() - t0
    print(f"[200k] brute force {t_exact:.1f}s ({len(exact)} pairs)", flush=True)

    quantizers = {}
    t0 = time.perf_counter()
    quantizers["deterministic"] = S.materialize_centroids(
        S.deterministic_centroids(emb, k)
    )
    t_det = time.perf_counter() - t0
    t0 = time.perf_counter()
    quantizers["sampled_trained"] = S.kmeans_lloyd_centroids(
        emb, k=k, n_updates=1, use_arrow=True
    )
    t_sampled = time.perf_counter() - t0
    t0 = time.perf_counter()
    quantizers["full_trained"] = S.kmeans_lloyd_centroids(
        emb, k=k, n_updates=1, max_train_rows=0, use_arrow=True
    )
    t_full = time.perf_counter() - t0
    train_sec = {
        "deterministic": round(t_det, 1),
        "sampled_trained": round(t_sampled, 1),
        "full_trained": round(t_full, 1),
    }
    print(f"[200k] quantizer train: {train_sec}", flush=True)

    recall = {}
    for name, cents in quantizers.items():
        idx = tempfile.mkdtemp(prefix=f"trained_{name}_")
        S.build_ivf_index(emb, cents, idx, use_arrow=True)
        got = _pairs(
            S.ivf_topk_indexed(spark, idx, queries, cents, k=K, n_probe=N_PROBE)
        )
        recall[name] = _recall(got, exact)
        print(f"[200k] {name}: recall@{K}={recall[name]}", flush=True)
    # the sampled-trained quantizer must hold the deterministic floor
    # (small slack: at 192 pairs one flipped pair moves recall 0.005)
    assert recall["sampled_trained"] >= 0.95 * recall["deterministic"], recall
    row = {
        "probe": "trained_quantizer_recall_200k",
        "corpus": n,
        "k": k,
        "max_train_rows": cap,
        "n_updates": 1,
        "n_queries": len(qids),
        "topk": K,
        "n_probe": N_PROBE,
        "train_sec": train_sec,
        "recall_at_k": recall,
    }
    with open(CURVE, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def stage_sharded(spark, tag, fixture_dir, stride, builds, per_replica):
    """Sharded-build decade stage: time each build variant, serve it,
    and measure recall@K against ONE exact brute-force pass with
    replica-spread queries."""
    from redpanda_to_parquet_writer_spark.operators import similarity as S

    import tempfile

    n_shards = 8
    emb = spark.read.parquet(f"{fixture_dir}/embeddings.parquet")
    n = emb.count()
    qids = _spread_query_ids(stride, 8, per_replica)
    queries = emb.filter(F.col("vec_id").isin(qids))
    print(f"[{tag}] corpus={n}; one exact brute-force pass…", flush=True)
    t0 = time.perf_counter()
    exact = _pairs(S.brute_force_topk(emb, queries, k=K))
    t_exact = time.perf_counter() - t0
    print(f"[{tag}] brute force {t_exact:.1f}s ({len(exact)} pairs)", flush=True)

    out = {}
    for name, kwargs in builds.items():
        path = tempfile.mkdtemp(prefix=f"b_{tag}_{name}_")
        t0 = time.perf_counter()
        books = S.build_ivf_index_sharded(
            emb, path, n_shards, use_arrow=True, **kwargs
        )
        t_build = time.perf_counter() - t0
        serve = lambda: S.ivf_topk_indexed_sharded(  # noqa: E731
            spark, path, queries, books, k=K, n_probe=N_PROBE
        )
        got = _pairs(serve())
        serve().write.mode("overwrite").format("noop").save()  # warm
        t0 = time.perf_counter()
        serve().write.mode("overwrite").format("noop").save()
        t_serve = time.perf_counter() - t0
        out[name] = {
            "build_sec": round(t_build, 1),
            "serve_sec": round(t_serve, 3),
            "recall_at_k": _recall(got, exact),
        }
        print(f"[{tag}] {name}: {out[name]}", flush=True)
    row = {
        "probe": f"trained_build_{tag}",
        "corpus": n,
        "n_shards": n_shards,
        "n_queries": len(qids),
        "topk": K,
        "n_probe": N_PROBE,
        "brute_force_sec": round(t_exact, 1),
        "builds": out,
    }
    with open(CURVE, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def main():
    for d in (SF10_DIR,) + (() if "--skip-20m" in sys.argv else (SF20M_DIR,)):
        if not os.path.exists(os.path.join(d, "embeddings.parquet")):
            raise SystemExit(f"{d} missing — see scripts/probe_chunked_2m.py")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        EngineConfig(
            master=f"local[{cpus}]",
            shuffle_partitions=int(cpus),
            driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEMORY", "24g"),
        ),
        app_name="probe_trained_build",
    )
    spark.sparkContext.setLogLevel("ERROR")
    builds_20m = {
        # the r16 baseline convention: init-only codebook (the serve
        # probes shipped this because training was the scale wall)
        "init_only": dict(n_updates=0),
        # what this round makes affordable: one sampled Lloyd update
        # per shard through the Arrow matmul assignment
        "sampled_trained": dict(n_updates=1, train_use_arrow=True),
    }
    if "--2m" in sys.argv:
        # the middle decade: full training is still affordable here
        # (250k rows/shard x k=200), so all THREE codebooks compare
        stage_sharded(
            spark,
            "2m",
            os.path.join(ROOT, ".scaling_sf2m"),
            200_000,
            {
                **builds_20m,
                "full_trained": dict(
                    n_updates=1, max_train_rows=0, train_use_arrow=True
                ),
            },
            per_replica=8,  # 64 queries, 192 exact pairs
        )
        return
    stage1_recall_200k(spark)
    if "--skip-20m" not in sys.argv:
        stage_sharded(
            spark, "20m", SF20M_DIR, 2_000_000, builds_20m, per_replica=2
        )


if __name__ == "__main__":
    main()

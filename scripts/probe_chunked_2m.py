#!/usr/bin/env python
"""Fourth-decade chunked-serve probe (VERDICT r15 #5): 2M vectors,
8 shards — one decade past the 200k corpus every serve-flatness and
chunk-overlap number was taken at, i.e. where the codebook clamp and
chunking machinery actually start to matter.

Claims under test at 2M:
  1. the one-shot collapsed serve stays flat (fixed costs are
     n_shards-free; per-query cost is candidate volume only);
  2. chunking ratios hold: 2 chunks ~ one-shot, 4 chunks pay one
     extra chunk's overlapped fixed cost (the r15 thread-fan contract,
     measured 0.94-1.02x / 1.20-1.29x at 200k);
  3. the build-time stats SIDECAR (r16) sizes the serve: the recorded
     self-sized chunk choice at the default budget must recover the
     one-shot serve (8 tiny codebooks fit trivially), with zero
     sizing job;
  4. the fan-out width bound sees ACTUAL chunk bytes from the sidecar
     on the explicit-chunk_shards path too (ADVICE r15 #2) — tiny
     chunks keep the full overlap without the caller declaring a
     matching budget.

Corpus: 10 disjoint-key replicas of the 200k probe corpus
(.scaling_sf10/embeddings.parquet — synthesize via
scripts/scaling_sf10_probe.py first), each replica under a distinct
orthogonal transform (rotate-by-r, then negate the first r dims) so
norms and within-replica geometry are exact while cross-replica
cosines decorrelate — the same recipe as the sf10 synthesis, applied
one decade up.

Output: human-readable timings + ONE JSON row appended to
SCALING_CURVE_r16.jsonl. Run with SPARK_GRAFT_DRIVER_MEMORY=24g (the
8-shard build at 2M vectors needs more than the 1 GiB default JVM
direct-buffer headroom).

Usage: python scripts/probe_chunked_2m.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from redpanda_to_parquet_writer_spark.config import EngineConfig  # noqa: E402
from redpanda_to_parquet_writer_spark.session import get_spark  # noqa: E402

#: `--decade20` runs the NEXT decade: 20M vectors synthesized as 10
#: replicas of the 2M corpus (transform-of-transform — still a distinct
#: orthogonal map per replica), probe row tagged chunked_serve_20m.
DECADE20 = "--decade20" in sys.argv
SF10_DIR = os.path.join(ROOT, ".scaling_sf10")
SRC_DIR = os.path.join(ROOT, ".scaling_sf2m" if DECADE20 else ".scaling_sf10")
OUT_DIR = os.path.join(ROOT, ".scaling_sf20m" if DECADE20 else ".scaling_sf2m")
PROBE_TAG = "chunked_serve_20m" if DECADE20 else "chunked_serve_2m"
REPLICAS = 10
N_SHARDS = 8
N_QUERIES = 8
K = 3
N_PROBE = 8


def synthesize_decade() -> None:
    """10 disjoint-key orthogonally-transformed replicas of the source
    corpus — the sf10 synthesis recipe, one decade up."""
    import duckdb

    os.makedirs(OUT_DIR, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        "CREATE OR REPLACE VIEW embeddings AS "
        f"SELECT * FROM '{SRC_DIR}/embeddings.parquet'"
    )
    dim = int(
        con.execute("SELECT len(embedding) FROM embeddings LIMIT 1").fetchone()[0]
    )
    vec_pad = int(con.execute("SELECT max(vec_id)+1 FROM embeddings").fetchone()[0])

    def emb_select(i: int) -> list[str]:
        if i == 0:
            e = "embedding"
        else:
            rot = f"embedding[{i + 1}:{dim}] || embedding[1:{i}]"
            e = (
                f"list_transform(list_zip({rot}, range(1, {dim + 1})),"
                f" z -> CASE WHEN z[2] <= {i} THEN -z[1] ELSE z[1] END)"
            )
        return [
            f"vec_id + {i * vec_pad} AS vec_id",
            f"CAST({e} AS FLOAT[]) AS embedding",
            "label",
        ]

    union = " UNION ALL ".join(
        f"SELECT {', '.join(emb_select(i))} FROM embeddings"
        for i in range(REPLICAS)
    )
    con.execute(
        f"COPY ({union}) TO '{OUT_DIR}/embeddings.parquet' (FORMAT PARQUET)"
    )
    print(f"synthesized {OUT_DIR} embeddings", flush=True)


def main() -> None:
    if not os.path.exists(os.path.join(SRC_DIR, "embeddings.parquet")):
        raise SystemExit(
            f"{SRC_DIR} missing — run scripts/scaling_sf10_probe.py first"
            + (" then this script without --decade20" if DECADE20 else "")
        )
    if not os.path.exists(os.path.join(OUT_DIR, "embeddings.parquet")):
        synthesize_decade()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        EngineConfig(
            master=f"local[{cpus}]",
            shuffle_partitions=int(cpus),
            driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEMORY", "24g"),
        ),
        app_name="probe_chunked_2m",
    )
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    from redpanda_to_parquet_writer_spark.operators.similarity import (
        _read_codebook_sidecar,
        build_ivf_index_sharded,
        ivf_topk_indexed_sharded,
        ivf_topk_indexed_sharded_chunked,
        select_chunk_shards,
    )

    tmp = tempfile.mkdtemp(prefix="chunked_2m_")
    emb = spark.read.parquet(f"{OUT_DIR}/embeddings.parquet")
    n = emb.count()
    queries = emb.limit(N_QUERIES)
    print(f"corpus={n} vectors; building {N_SHARDS}-shard index…", flush=True)
    t0 = time.perf_counter()
    # --decade20 builds with n_updates=0 (init-only codebook): this is
    # a SERVE-cost probe, so list geometry is what matters, not recall
    # — the default Lloyd update trains through the JVM join assignment
    # (n x k joined rows per pass; at 20M with per-shard k=2000 that is
    # ~40 BILLION joined rows, hours of build for zero serve-cost
    # signal). Same convention as the degenerate probe and the
    # candidate-volume decade test.
    books = build_ivf_index_sharded(
        emb, f"{tmp}/sh", N_SHARDS, use_arrow=True,
        n_updates=0 if DECADE20 else 1,
    )
    t_build = time.perf_counter() - t0
    print(f"build {t_build:.1f}s", flush=True)

    # the r16 sidecar: the serve's self-sizing input, written at build
    sidecar = _read_codebook_sidecar(spark, f"{tmp}/sh")
    assert sidecar is not None, "build must persist the stats sidecar"
    counts, dim = sidecar
    self_sized = select_chunk_shards(counts, dim)
    print(
        f"sidecar: counts={counts} dim={dim}; "
        f"self-sized chunk_shards={self_sized} at the default budget",
        flush=True,
    )

    variants = {
        "one-shot": lambda: ivf_topk_indexed_sharded(
            spark, f"{tmp}/sh", queries, books, k=K, n_probe=N_PROBE
        ),
        # self-sized from the sidecar (chunk_shards=None): with 8 tiny
        # codebooks this must recover the one-shot plan, zero sizing job
        "self-sized": lambda: ivf_topk_indexed_sharded_chunked(
            spark, f"{tmp}/sh", queries, books, k=K, n_probe=N_PROBE
        ),
        # explicit chunking: the fan-out width reads ACTUAL chunk bytes
        # from the sidecar (no declared-budget crutch needed)
        "2 chunks": lambda: ivf_topk_indexed_sharded_chunked(
            spark, f"{tmp}/sh", queries, books, 4, k=K, n_probe=N_PROBE
        ),
        "4 chunks": lambda: ivf_topk_indexed_sharded_chunked(
            spark, f"{tmp}/sh", queries, books, 2, k=K, n_probe=N_PROBE
        ),
    }
    base = sorted(tuple(r) for r in variants["one-shot"]().collect())
    for name, fn in variants.items():
        assert sorted(tuple(r) for r in fn().collect()) == base, name
    print(f"rows identical across variants ({len(base)} rows)", flush=True)

    # one warm noop save per variant: each variant is a DIFFERENT plan
    # shape (codegen/JIT warm separately), and the first 2M-scale save
    # also pays page-cache population — the first probe run measured
    # 2-4x first-round inflation without this
    for fn in variants.values():
        fn().write.mode("overwrite").format("noop").save()

    times: dict[str, list[float]] = {name: [] for name in variants}
    for _ in range(4):  # interleaved to control host drift
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            times[name].append(time.perf_counter() - t0)
    mins = {}
    for name, ts in times.items():
        mins[name] = round(min(ts), 3)
        print(
            f"{name}: min={min(ts):.3f}s median={statistics.median(ts):.3f}s "
            f"runs={[round(t, 3) for t in ts]}",
            flush=True,
        )
    row = {
        "probe": PROBE_TAG,
        "corpus": n,
        "n_shards": N_SHARDS,
        "n_queries": N_QUERIES,
        "k": K,
        "n_probe": N_PROBE,
        "build_sec": round(t_build, 1),
        "sidecar_counts": {str(s): c for s, c in sorted(counts.items())},
        "sidecar_dim": dim,
        "self_sized_chunk_shards": self_sized,
        "timings_sec": mins,
        "ratios_to_one_shot": {
            name: round(mins[name] / mins["one-shot"], 3) for name in mins
        },
    }
    with open(os.path.join(ROOT, "SCALING_CURVE_r16.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()

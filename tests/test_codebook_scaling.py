"""The codebook-scaling contract (VERDICT r10 #4).

The sf10 campaign measured that indexed ANN serving tracks per-list
candidate volume (n_probe x corpus/k): a FIXED 16-centroid codebook let
serve time grow 0.28 -> 0.74s across 100x data, while k ∝ corpus
(k=160 at 200k vectors — lists of 1250) restored 0.215s at the same
n_probe (SCALING.md "codebook scaling"). `select_n_centroids` promotes
that measurement into a tested contract on the index-build path, and
`build_ivf_index_auto` makes it the default build.

The decade test here replays the measured pair at 1/100 corpus size:
the sf0.1 embeddings fixture (2,000 vectors) and a synthesized 10x
disjoint-copy decade (20,000 vectors), with target_list_len at 1/10
(corpus /100, k /10 -> lists /10) so the selected k's are EXACTLY the
measured 16 -> 160.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redpanda_to_parquet_writer_spark.operators.similarity import (
    IVF_TARGET_LIST_LEN,
    build_ivf_index_auto,
    select_n_centroids,
)

SF01 = "/root/testdata/sf0.1"


# --- the pure selection contract -------------------------------------------

def test_selects_the_measured_sf10_point():
    # the measurement the contract encodes: 200k vectors -> k=160
    assert select_n_centroids(200_000) == 160
    assert 200_000 / select_n_centroids(200_000) == IVF_TARGET_LIST_LEN


def test_mean_list_length_bounded_when_unclamped():
    for n in (5_001, 10_000, 123_457, 2_000_000, 81_000_000):
        k = select_n_centroids(n)
        assert n / k <= IVF_TARGET_LIST_LEN, (n, k)
        # ceil is tight: one fewer centroid would break the bound
        if k > 4:
            assert n / (k - 1) > IVF_TARGET_LIST_LEN, (n, k)


def test_k_tracks_the_corpus_across_decades():
    # proportionality is the whole point: 10x rows -> ~10x centroids
    for n in (10_000, 100_000, 1_000_000):
        k1, k10 = select_n_centroids(n), select_n_centroids(10 * n)
        assert 9 <= k10 / k1 <= 11, (n, k1, k10)


def test_clamps_and_validation():
    assert select_n_centroids(0) == 4          # k_min floor
    assert select_n_centroids(100) == 4        # tiny corpus -> k_min
    assert select_n_centroids(10**12) == 65536  # k_max ceiling
    assert select_n_centroids(100, k_min=1) == 1
    with pytest.raises(ValueError):
        select_n_centroids(-1)
    with pytest.raises(ValueError):
        select_n_centroids(10, target_list_len=0)
    with pytest.raises(ValueError):
        select_n_centroids(10, k_min=8, k_max=4)


# --- candidate volume stays bounded across a real decade -------------------

def _mean_list_len(spark, path: str) -> tuple[float, int]:
    sizes = (
        spark.read.parquet(path)
        .groupBy("cluster_id")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in sizes)
    return total / len(sizes), len(sizes)


def test_candidate_volume_bounded_across_decades(spark, tmp_path):
    """Build the index at two corpus decades with helper-selected k and
    assert the quantity serving cost tracks — list length — stays at
    the target instead of growing with the corpus (the fixed-k failure
    mode the sf10 probe measured)."""
    # the sf10 pair replayed at 1/100 corpus: lists shrink by 10 (corpus
    # /100, k /10), so 2000/16 = 20000/160 = 125 = IVF_TARGET_LIST_LEN/10
    target = IVF_TARGET_LIST_LEN // 10
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    n1 = emb.count()
    assert n1 == 2_000, "fixture moved; re-derive the decade arithmetic"

    # 10x disjoint-copy decade: same vectors, shifted ids (the scaling
    # fixture's construction — dedup/ANN structure is preserved)
    copies = [
        emb.select((F.col("vec_id") + F.lit(i * n1)).alias("vec_id"), "embedding")
        for i in range(10)
    ]
    emb10 = copies[0]
    for c in copies[1:]:
        emb10 = emb10.unionByName(c)

    stats = {}
    for name, df, n in (("sf0.1", emb, n1), ("sf1", emb10, 10 * n1)):
        k = select_n_centroids(n, target_list_len=target)
        cents = build_ivf_index_auto(
            df,
            str(tmp_path / name),
            target_list_len=target,
            n_updates=0,  # init-only codebook: list geometry, not recall
            use_arrow=True,
        )
        mean_len, n_lists = _mean_list_len(spark, str(tmp_path / name))
        stats[name] = (k, mean_len, n_lists)

    (k1, mean1, lists1), (k10, mean10, lists10) = stats["sf0.1"], stats["sf1"]
    # the measured sf10 pair, replayed: 16 -> 160
    assert (k1, k10) == (16, 160)
    # mean list length (the per-probe candidate volume driver) is flat
    # across the decade — NOT 10x, which is what a fixed k would give
    assert mean10 <= 2 * mean1, stats
    # and both decades honor the contract's bound (empty clusters can
    # only shrink the mean below n/k; ceil guarantees n/k <= target)
    assert mean1 <= target and mean10 <= target, stats
    # the codebook really is the returned relation's size (snapshot
    # contract for append/serve)
    assert lists10 <= k10 and cents.count() == k10
    # contrast: the fixed-k failure mode this contract kills — at the
    # 10x corpus a frozen k=16 means 10x the per-probe candidates
    assert (10 * n1) / k1 >= 10 * target


# --- sharding: the scale path PAST the k_max clamp (VERDICT r11 #4) --------

SF001 = "/root/testdata/sf0.01"


def _served(df) -> list[tuple]:
    return sorted(tuple(r) for r in df.collect())


def test_sharded_index_serves_identically_at_two_shard_counts(spark, tmp_path):
    """`build_ivf_index_sharded` + `ivf_topk_indexed_sharded` must
    return the unsharded build's rows BITWISE at n_shards=2 and 4.

    The config makes the equality a guarantee, not a coincidence: with
    the default target the fixture selects k_min=4 centroids per shard
    and per codebook, and n_probe=4 covers them all — both paths verify
    the full corpus with exact cosine, so any divergence is a bug in
    the shard routing, the local-top-k containment, or the union
    re-rank (ties, rounding order), which is exactly what this pins."""
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        build_ivf_index_sharded,
        ivf_topk_indexed,
        ivf_topk_indexed_sharded,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    queries = emb.limit(5)
    cents = build_ivf_index_auto(emb, str(tmp_path / "flat"), use_arrow=True)
    flat = _served(
        ivf_topk_indexed(spark, str(tmp_path / "flat"), queries, cents, k=3, n_probe=4)
    )
    assert len(flat) == 15  # 5 queries x k=3, fully ranked
    for n_shards in (2, 4):
        books = build_ivf_index_sharded(
            emb, str(tmp_path / f"sh{n_shards}"), n_shards, use_arrow=True
        )
        assert sorted(books) == list(range(n_shards))
        served = _served(
            ivf_topk_indexed_sharded(
                spark,
                str(tmp_path / f"sh{n_shards}"),
                queries,
                books,
                k=3,
                n_probe=4,
            )
        )
        assert served == flat, f"n_shards={n_shards} diverged from unsharded"


def test_sharded_codebooks_sized_by_their_own_shard(spark, tmp_path):
    """Each shard's codebook must size by the SHARD's row count (the
    point of sharding: per-shard k stays under the clamp while total
    capacity grows with shards), and each shard's lists must honor the
    target bound."""
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        _shard_router,
        build_ivf_index_sharded,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    target, n_shards = 25, 4
    books = build_ivf_index_sharded(
        emb,
        str(tmp_path / "sh"),
        n_shards,
        target_list_len=target,
        n_updates=0,
        use_arrow=True,
    )
    shard_counts = {
        int(r["s"]): r["c"]
        for r in emb.groupBy(_shard_router("vec_id", n_shards).alias("s"))
        .count()
        .withColumnRenamed("count", "c")
        .collect()
    }
    assert sum(shard_counts.values()) == emb.count()  # partition, no loss
    total_k = 0
    for s, book in books.items():
        k = book.count()
        assert k == select_n_centroids(shard_counts[s], target_list_len=target), s
        mean_len, _ = _mean_list_len(spark, str(tmp_path / "sh" / f"shard={s}"))
        assert mean_len <= target, (s, mean_len)
        total_k += k
    # total quantizer capacity grows with shards — a single codebook at
    # the same target would need select_n_centroids(n) in ONE codebook;
    # sharding spreads it (ceil per shard can only add centroids)
    assert total_k >= select_n_centroids(emb.count(), target_list_len=target)


def test_shard_router_rejects_bad_counts():
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        build_ivf_index_sharded,
    )

    with pytest.raises(ValueError):
        build_ivf_index_sharded(None, "/tmp/x", 0)


def test_sharded_append_equals_rebuild(spark, tmp_path):
    """`append_ivf_index_sharded` must route with the build's router
    and assign under each shard's frozen codebook: building on 80% of
    the fixture, then appending the remaining 20%, must serve the SAME
    rows as a from-scratch sharded build over the full corpus with the
    SAME codebooks (same frozen quantizer => same assignments => same
    directories — the single-index append contract, per shard)."""
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        _write_ivf_rows,
        append_ivf_index_sharded,
        build_ivf_index_sharded,
        ivf_topk_indexed_sharded,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    n = emb.count()
    head = emb.filter(F.col("vec_id") < int(n * 0.8))
    tail = emb.filter(F.col("vec_id") >= int(n * 0.8))
    assert tail.count() > 0
    queries = emb.limit(5)
    n_shards = 2

    books = build_ivf_index_sharded(
        head, str(tmp_path / "grown"), n_shards, use_arrow=True
    )
    append_ivf_index_sharded(tail, books, str(tmp_path / "grown"), use_arrow=True)

    # rebuild over the full corpus under the SAME (frozen) codebooks
    from redpanda_to_parquet_writer_spark.operators.similarity import _shard_router

    for s in range(n_shards):
        _write_ivf_rows(
            emb.filter(_shard_router("vec_id", n_shards) == s),
            books[s],
            str(tmp_path / "rebuilt" / f"shard={s}"),
            "vec_id",
            "embedding",
            "overwrite",
            use_arrow=True,
        )

    grown = _served(
        ivf_topk_indexed_sharded(
            spark, str(tmp_path / "grown"), queries, books, k=3, n_probe=4
        )
    )
    rebuilt = _served(
        ivf_topk_indexed_sharded(
            spark, str(tmp_path / "rebuilt"), queries, books, k=3, n_probe=4
        )
    )
    assert grown == rebuilt and len(grown) == 15


def test_sharded_append_rejects_sparse_codebook_dict():
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        append_ivf_index_sharded,
    )

    with pytest.raises(ValueError):
        append_ivf_index_sharded(None, {}, "/tmp/x")
    with pytest.raises(ValueError):
        append_ivf_index_sharded(None, {0: None, 2: None}, "/tmp/x")


# --- the sharding contract: select_n_shards (VERDICT r12 #5) ----------------


def test_select_n_shards_contract():
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        select_n_shards,
    )

    cap = 65536 * IVF_TARGET_LIST_LEN  # ~82M at the defaults
    # flat below the clamp boundary, sharded above — the exact boundary
    assert select_n_shards(0) == 1
    assert select_n_shards(cap) == 1
    assert select_n_shards(cap + 1) == 2
    assert select_n_shards(10 * cap) == 10
    with pytest.raises(ValueError):
        select_n_shards(-1)
    with pytest.raises(ValueError):
        select_n_shards(10, target_list_len=0)
    with pytest.raises(ValueError):
        select_n_shards(10, k_max=0)


def test_select_n_shards_keeps_per_shard_k_under_clamp():
    """The property sharding exists for, property-tested across the
    boundary: for ANY corpus size, the expected per-shard row count
    n/n_shards keeps that shard's select_n_centroids UNDER its clamp —
    so lists stay at target length no matter how big the corpus."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from redpanda_to_parquet_writer_spark.operators.similarity import (
        select_n_shards,
    )

    @settings(max_examples=300, deadline=None)
    @given(
        n=st.integers(min_value=0, max_value=10**13),
        target=st.integers(min_value=1, max_value=5000),
        k_max=st.integers(min_value=1, max_value=100_000),
    )
    def check(n, target, k_max):
        s = select_n_shards(n, target, k_max)
        assert s >= 1
        per_shard = -(-n // s)  # ceil: the heaviest shard's expected load
        k = select_n_centroids(per_shard, target, k_min=1, k_max=k_max)
        # unclamped k for the per-shard load never exceeds k_max…
        assert -(-per_shard // target) <= k_max, (n, target, k_max, s)
        # …so per-shard mean list length honors the target
        assert per_shard / max(k, 1) <= target or per_shard <= target, (
            n, target, k_max, s, k,
        )
        # and sharding is minimal: one fewer shard would break the cap
        if s > 1:
            assert n > (s - 1) * k_max * target, (n, target, k_max, s)

    check()


def test_select_chunk_shards_keeps_every_chunk_under_budget():
    """The chunk-sizing contract (VERDICT r14 #4), property-tested
    across the broadcast boundary: for ANY per-shard codebook sizes the
    selected chunking keeps EVERY possible chunk's combined codebook
    bytes inside the budget, and is maximal (one more shard per chunk
    would break it, unless all shards already fit in one chunk)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from redpanda_to_parquet_writer_spark.operators.similarity import (
        select_chunk_shards,
    )

    @settings(max_examples=300, deadline=None)
    @given(
        counts=st.lists(
            st.integers(min_value=0, max_value=65536), min_size=1, max_size=64
        ),
        dim=st.integers(min_value=1, max_value=4096),
        budget=st.integers(min_value=1, max_value=8 * 1024**3),
    )
    def check(counts, dim, budget):
        import pytest

        shard_centroids = dict(enumerate(counts))
        max_bytes = max(counts) * dim * 8
        if max_bytes > budget:
            # even one-shard chunks cannot fit: explicit refusal, never
            # a silently over-budget broadcast
            with pytest.raises(ValueError, match="over the"):
                select_chunk_shards(shard_centroids, dim, budget)
            return
        c = select_chunk_shards(shard_centroids, dim, budget)
        assert 1 <= c <= len(counts)
        if max_bytes == 0:
            assert c == len(counts)  # all-empty: one chunk serves all
            return
        # EVERY window of c shards fits (worst window <= c * max)
        assert c * max_bytes <= budget, (counts, dim, budget, c)
        # and the chunking is maximal
        if c < len(counts):
            assert (c + 1) * max_bytes > budget, (counts, dim, budget, c)

    check()


def test_chunk_fanout_workers_respect_broadcast_envelope():
    """`_select_chunk_workers` (r15 — the scale bound on the thread
    fan-out itself): concurrent chunk preps each hold their chunk's
    codebook broadcast live, so workers × worst_chunk_bytes must stay
    inside the one-shot serve's own 8 GiB broadcast envelope — tiny
    codebooks keep full overlap, budget-sized chunks serialize down,
    and the floor is the serial loop (1), never a refusal."""
    import pytest

    from redpanda_to_parquet_writer_spark.operators.similarity import (
        BROADCAST_TABLE_CEILING_BYTES as CEIL,
    )
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        _select_chunk_workers,
    )

    # tiny codebooks: full 8-way overlap (bounded by chunk count)
    assert _select_chunk_workers(1024, 20) == 8
    assert _select_chunk_workers(1024, 3) == 3
    assert _select_chunk_workers(0, 5) == 5  # empty codebooks
    # budget-sized chunks (default budget = CEIL // 2): exactly 2 fit
    assert _select_chunk_workers(CEIL // 2, 20) == 2
    # chunks at the full ceiling: serial, never 0
    assert _select_chunk_workers(CEIL, 20) == 1
    assert _select_chunk_workers(CEIL * 3, 20) == 1
    # the envelope invariant across a sweep of sizes
    for bytes_ in (1, 10**6, 10**9, CEIL // 3, CEIL - 1):
        w = _select_chunk_workers(bytes_, 20)
        assert 1 <= w <= 8 and (w == 1 or w * bytes_ <= CEIL)
    with pytest.raises(ValueError, match="n_chunks"):
        _select_chunk_workers(1024, 0)


def test_chunked_serve_self_sizes_within_budget(spark, tmp_path):
    """`chunk_shards=None` (the r15 default) must self-size from the
    ACTUAL codebook sizes: the default budget admits everything (one
    chunk = the one-shot plan), a budget of exactly 2 max-shard
    codebooks forces 2-shard chunks, and either way the served rows
    stay BITWISE equal to the one-shot serve."""
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        build_ivf_index_sharded,
        ivf_topk_indexed_sharded,
        ivf_topk_indexed_sharded_chunked,
        select_chunk_shards,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    queries = emb.limit(5)
    n_shards = 4
    books = build_ivf_index_sharded(emb, str(tmp_path / "sh"), n_shards, use_arrow=True)
    base = _served(
        ivf_topk_indexed_sharded(
            spark, str(tmp_path / "sh"), queries, books, k=3, n_probe=4
        )
    )

    counts = {s: books[s].count() for s in books}
    dim = len(books[0].select("cv").first()["cv"])
    max_bytes = max(counts.values()) * dim * 8

    # default budget: everything fits -> the contract picks one chunk
    assert select_chunk_shards(counts, dim) == n_shards
    got_default = _served(
        ivf_topk_indexed_sharded_chunked(
            spark, str(tmp_path / "sh"), queries, books, k=3, n_probe=4
        )
    )
    assert got_default == base

    # a budget of exactly two max-shard codebooks forces 2-shard chunks
    assert select_chunk_shards(counts, dim, 2 * max_bytes) == 2
    got_forced = _served(
        ivf_topk_indexed_sharded_chunked(
            spark,
            str(tmp_path / "sh"),
            queries,
            books,
            k=3,
            n_probe=4,
            broadcast_budget_bytes=2 * max_bytes,
        )
    )
    assert got_forced == base


def test_auto_sharded_escalates_across_the_boundary(spark, tmp_path):
    """`build_ivf_index_auto_sharded` must stay FLAT (one shard, one
    codebook) below k_max * target_list_len rows and shard past it —
    exercised on the 500-row fixture by shrinking the boundary. The
    1-shard auto layout must serve BITWISE what the flat auto build
    serves (the degenerate shard is the flat plan plus a shard
    predicate)."""
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        build_ivf_index_auto_sharded,
        ivf_topk_indexed,
        ivf_topk_indexed_sharded,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    queries = emb.limit(5)

    # below the boundary (defaults: cap ~82M >> 500) -> flat, 1 shard
    books = build_ivf_index_auto_sharded(
        emb, str(tmp_path / "auto_flat"), use_arrow=True
    )
    assert sorted(books) == [0]
    flat_auto = build_ivf_index_auto(emb, str(tmp_path / "flat"), use_arrow=True)
    served_1 = _served(
        ivf_topk_indexed_sharded(
            spark, str(tmp_path / "auto_flat"), queries, books, k=3, n_probe=4
        )
    )
    served_flat = _served(
        ivf_topk_indexed(
            spark, str(tmp_path / "flat"), queries, flat_auto, k=3, n_probe=4
        )
    )
    assert served_1 == served_flat and len(served_1) == 15

    # past the boundary (cap = k_max * target = 10 * 10 = 100 < 500
    # rows) -> escalates to ceil(500/100) = 5 shards, each with its own
    # codebook sized by its shard
    books5 = build_ivf_index_auto_sharded(
        emb,
        str(tmp_path / "auto_sharded"),
        target_list_len=10,
        k_max=10,
        n_updates=0,
        use_arrow=True,
    )
    assert sorted(books5) == list(range(5))
    served_5 = ivf_topk_indexed_sharded(
        spark, str(tmp_path / "auto_sharded"), queries, books5, k=3, n_probe=4
    )
    assert served_5.count() == 15


def test_staged_build_routes_once_and_serves_identically(spark, tmp_path):
    """`build_ivf_index_sharded(staging_path=...)` must (a) write the
    routed corpus shard-partitioned so per-shard builds read only their
    own directory, and (b) serve BITWISE what the in-plan-routed build
    serves (routing layout cannot leak into the deterministic Lloyd
    codebook)."""
    import os

    from redpanda_to_parquet_writer_spark.operators.similarity import (
        build_ivf_index_sharded,
        ivf_topk_indexed_sharded,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    queries = emb.limit(5)
    n_shards = 4

    books_a = build_ivf_index_sharded(
        emb, str(tmp_path / "inplan"), n_shards, use_arrow=True
    )
    books_b = build_ivf_index_sharded(
        emb,
        str(tmp_path / "staged"),
        n_shards,
        use_arrow=True,
        staging_path=str(tmp_path / "routing"),
        cleanup_staging=False,  # keep the scratch tree to inspect the layout
    )
    # the staging layout is the route-once artifact: one dir per shard
    staged_dirs = sorted(
        d for d in os.listdir(tmp_path / "routing") if d.startswith("__ivf_shard=")
    )
    assert staged_dirs == [f"__ivf_shard={s}" for s in range(n_shards)]
    # identical codebooks shard by shard…
    for s in range(n_shards):
        assert sorted(
            (int(r["cluster_id"]), [round(x, 9) for x in r["cv"]])
            for r in books_a[s].collect()
        ) == sorted(
            (int(r["cluster_id"]), [round(x, 9) for x in r["cv"]])
            for r in books_b[s].collect()
        ), s
    # …and identical served rows
    a = _served(
        ivf_topk_indexed_sharded(
            spark, str(tmp_path / "inplan"), queries, books_a, k=3, n_probe=4
        )
    )
    b = _served(
        ivf_topk_indexed_sharded(
            spark, str(tmp_path / "staged"), queries, books_b, k=3, n_probe=4
        )
    )
    assert a == b and len(a) == 15


def test_staging_is_scratch_cleaned_after_success(spark, tmp_path):
    """`staging_path` is SCRATCH (ADVICE r13): the default build deletes
    the routed tree after success (cleanup_staging=True), and a
    pre-existing file at the path is clobbered by the routing write."""
    import os

    from redpanda_to_parquet_writer_spark.operators.similarity import (
        build_ivf_index_sharded,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    routing = tmp_path / "routing"
    routing.mkdir()
    (routing / "leftover.txt").write_text("scratch contract: overwritten")
    build_ivf_index_sharded(
        emb, str(tmp_path / "idx"), 2, use_arrow=True, staging_path=str(routing)
    )
    assert not os.path.exists(routing)


def test_staging_overlapping_index_path_rejected(spark, tmp_path):
    """ADVICE r14 #1: staging is overwritten then deleted, so a
    staging_path that equals, contains, or lives inside the index path
    would destroy the index on a 'successful' run — both sharded entry
    points must refuse it BEFORE any write happens."""
    import pytest

    from redpanda_to_parquet_writer_spark.operators.similarity import (
        _check_staging_disjoint,
        append_ivf_index_sharded,
        build_ivf_index_sharded,
    )

    # the guard itself: equal, parent-of, child-of, and URI forms
    for staging, path in [
        ("/idx", "/idx"),
        ("/idx/", "/idx"),
        ("/a/b", "/a/b/c"),  # staging contains the index
        ("/a/b/c", "/a/b"),  # staging inside the index
        ("s3://bkt/idx", "s3://bkt/idx/shard=0"),
        ("relative/../x", "x"),  # normalizes to the same local dir
    ]:
        with pytest.raises(ValueError, match="overlaps the index path"):
            _check_staging_disjoint(staging, path)
    # disjoint siblings (and lookalike prefixes) pass
    _check_staging_disjoint("/a/scratch", "/a/idx")
    _check_staging_disjoint("/a/idx_scratch", "/a/idx")  # not a segment prefix
    _check_staging_disjoint("s3://bkt/scratch", "s3://bkt/idx")

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    idx = tmp_path / "idx"
    books = build_ivf_index_sharded(emb, str(idx), 2, use_arrow=True)
    # build: refuse before touching storage
    with pytest.raises(ValueError, match="overlaps the index path"):
        build_ivf_index_sharded(
            emb, str(idx), 2, use_arrow=True, staging_path=str(idx)
        )
    with pytest.raises(ValueError, match="overlaps the index path"):
        build_ivf_index_sharded(
            emb, str(idx), 2, use_arrow=True, staging_path=str(tmp_path)
        )
    # append: same refusal; the existing index survives untouched
    batch = emb.limit(3).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    with pytest.raises(ValueError, match="overlaps the index path"):
        append_ivf_index_sharded(
            batch, books, str(idx), staging_path=str(idx / "shard=0")
        )
    assert spark.read.parquet(str(idx)).count() == emb.count()


def test_staged_append_routes_once_and_appends_identically(spark, tmp_path):
    """`append_ivf_index_sharded(staging_path=...)` (VERDICT r13 #3)
    must append EXACTLY what the in-plan-routed append appends — same
    router expression either way, so a staged batch can never land a
    vector in a different shard or list — and clean up its scratch tree
    by default, like the build."""
    import os

    from redpanda_to_parquet_writer_spark.operators.similarity import (
        append_ivf_index_sharded,
        build_ivf_index_sharded,
        ivf_topk_indexed_sharded,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    n = emb.count()
    head = emb.filter(F.col("vec_id") < int(n * 0.8))
    tail = emb.filter(F.col("vec_id") >= int(n * 0.8))
    queries = emb.limit(5)
    n_shards = 2

    books = build_ivf_index_sharded(
        head, str(tmp_path / "inplan"), n_shards, use_arrow=True
    )
    books_b = build_ivf_index_sharded(
        head, str(tmp_path / "staged"), n_shards, use_arrow=True
    )
    append_ivf_index_sharded(tail, books, str(tmp_path / "inplan"), use_arrow=True)
    append_ivf_index_sharded(
        tail,
        books_b,
        str(tmp_path / "staged"),
        use_arrow=True,
        staging_path=str(tmp_path / "routing"),
    )
    assert not os.path.exists(tmp_path / "routing")  # scratch cleaned up

    a = _served(
        ivf_topk_indexed_sharded(
            spark, str(tmp_path / "inplan"), queries, books, k=3, n_probe=4
        )
    )
    b = _served(
        ivf_topk_indexed_sharded(
            spark, str(tmp_path / "staged"), queries, books_b, k=3, n_probe=4
        )
    )
    assert a == b and len(a) == 15


def test_chunked_serve_equals_unchunked(spark, tmp_path):
    """`ivf_topk_indexed_sharded_chunked` (r14 — the escalation past the
    combined-codebook broadcast ceiling) must serve BITWISE what the
    one-shot collapsed serve serves, at every chunking: per-chunk top-k
    is a row bound (selection decomposes over any partition of the
    shards), per-chunk sims stay unrounded into the global re-rank, and
    chunk_shards >= n_shards degenerates to the unchunked plan."""
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        build_ivf_index_sharded,
        ivf_topk_indexed_sharded,
        ivf_topk_indexed_sharded_chunked,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    queries = emb.limit(5)
    n_shards = 4
    books = build_ivf_index_sharded(emb, str(tmp_path / "sh"), n_shards, use_arrow=True)

    base = _served(
        ivf_topk_indexed_sharded(
            spark, str(tmp_path / "sh"), queries, books, k=3, n_probe=4
        )
    )
    assert len(base) == 15
    for chunk_shards in (1, 2, 4, 7):
        got = _served(
            ivf_topk_indexed_sharded_chunked(
                spark,
                str(tmp_path / "sh"),
                queries,
                books,
                chunk_shards,
                k=3,
                n_probe=4,
            )
        )
        assert got == base, chunk_shards


def test_chunked_rerank_orders_sub_rounding_near_ties(spark, tmp_path):
    """The chunked serve's WHY-unrounded gate: two candidates in
    DIFFERENT shards whose sims differ by ~2e-7 (both round to the same
    6-decimal value), with the higher unrounded sim on the HIGHER
    neighbor id. The unchunked serve ranks the higher-sim candidate
    first; a chunked re-rank over ROUNDED per-chunk sims would see a
    tie and flip the order to the lower id. `_topk_unrounded` must keep
    the unchunked order across chunks."""
    import math

    from pyspark.sql import functions as F

    from redpanda_to_parquet_writer_spark.operators.similarity import (
        build_ivf_index_sharded,
        ivf_topk_indexed_sharded,
        ivf_topk_indexed_sharded_chunked,
    )

    # pick two ids the router sends to DIFFERENT shards (n_shards=2)
    ids = spark.range(10, 40).select(
        F.col("id"), F.pmod(F.xxhash64(F.col("id")), F.lit(2)).alias("s")
    ).collect()
    shard0 = [int(r["id"]) for r in ids if r["s"] == 0]
    shard1 = [int(r["id"]) for r in ids if r["s"] == 1]
    # id_hi > id_lo AND cos(id_hi) > cos(id_lo): rounded tie-break
    # (id asc) would WRONGLY put id_lo first
    id_lo, id_hi = min(shard0[0], shard1[0]), max(shard0[0], shard1[0])

    q = [1.0, 0.0, 0.0, 0.0]
    eps_lo = math.sqrt(6e-7)  # cos ≈ 1 - 3e-7
    eps_hi = math.sqrt(2e-7)  # cos ≈ 1 - 1e-7  (closer to q)
    rows = [
        (0, q),
        (id_lo, [1.0, eps_lo, 0.0, 0.0]),
        (id_hi, [1.0, eps_hi, 0.0, 0.0]),
    ]
    # orthogonal-ish fillers so both shards hold several rows
    rows += [(100 + j, [0.0, 1.0, float(j), 1.0]) for j in range(8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    books = build_ivf_index_sharded(
        emb, str(tmp_path / "idx"), 2, n_updates=0, use_arrow=True
    )
    queries = emb.filter(F.col("vec_id") == 0)
    base = ivf_topk_indexed_sharded(
        spark, str(tmp_path / "idx"), queries, books, k=2, n_probe=4
    ).collect()
    order = [r["neighbor_id"] for r in sorted(base, key=lambda r: r["rank"])]
    assert order == [id_hi, id_lo]  # unrounded sims decide, not the ids
    assert base[0]["sim"] == base[1]["sim"]  # …and they ROUND equal
    chunked = ivf_topk_indexed_sharded_chunked(
        spark, str(tmp_path / "idx"), queries, books, 1, k=2, n_probe=4
    ).collect()
    assert sorted(map(tuple, chunked)) == sorted(map(tuple, base))


def test_chunked_serve_reliable_matches_default(spark, tmp_path):
    """`reliable=True` through the THREADED chunked serve (r15): each
    chunk's probe materialization becomes a persist -> checkpoint ->
    unpersist bracket, and the thread fan-out runs those brackets
    CONCURRENTLY against the shared SparkContext — the one corner where
    the fan-out could bite. Materialization strategy is not part of the
    query semantics: rows must match the default-localCheckpoint serve
    bitwise."""
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        build_ivf_index_sharded,
        ivf_topk_indexed_sharded_chunked,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    queries = emb.limit(5)
    books = build_ivf_index_sharded(emb, str(tmp_path / "sh"), 4, use_arrow=True)
    base = _served(
        ivf_topk_indexed_sharded_chunked(
            spark, str(tmp_path / "sh"), queries, books, 2, k=3, n_probe=4
        )
    )
    assert len(base) == 15
    sc = spark.sparkContext
    old = sc.getCheckpointDir()
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        durable = _served(
            ivf_topk_indexed_sharded_chunked(
                spark,
                str(tmp_path / "sh"),
                queries,
                books,
                2,
                k=3,
                n_probe=4,
                reliable=True,
            )
        )
    finally:
        if old is not None:
            sc.setCheckpointDir(old)
    assert durable == base


def test_verify_parallelism_is_plan_only(spark, tmp_path):
    """`verify_parallelism` (r14 — the RLE-compressed-hot-list escape
    hatch) must be PLAN-ONLY: repartitioning the pruned candidate slice
    before the exact-cosine verify cannot change a single served row,
    on both the flat and the sharded serve."""
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        build_ivf_index_auto,
        build_ivf_index_sharded,
        ivf_topk_indexed,
        ivf_topk_indexed_sharded,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    queries = emb.limit(5)
    flat_book = build_ivf_index_auto(emb, str(tmp_path / "flat"), use_arrow=True)
    books = build_ivf_index_sharded(emb, str(tmp_path / "sh"), 2, use_arrow=True)

    flat_a = _served(
        ivf_topk_indexed(spark, str(tmp_path / "flat"), queries, flat_book, k=3, n_probe=4)
    )
    flat_b = _served(
        ivf_topk_indexed(
            spark,
            str(tmp_path / "flat"),
            queries,
            flat_book,
            k=3,
            n_probe=4,
            verify_parallelism=8,
        )
    )
    assert flat_a == flat_b and len(flat_a) == 15

    sh_a = _served(
        ivf_topk_indexed_sharded(spark, str(tmp_path / "sh"), queries, books, k=3, n_probe=4)
    )
    sh_b = _served(
        ivf_topk_indexed_sharded(
            spark,
            str(tmp_path / "sh"),
            queries,
            books,
            k=3,
            n_probe=4,
            verify_parallelism=8,
        )
    )
    assert sh_a == sh_b and len(sh_a) == 15


def test_flat_serve_salted_is_row_identical(spark, tmp_path):
    """`salted=True` on the FLAT serve (r15 — the degenerate-corpus
    opt-in documented on `ivf_topk_indexed`) must swap only the task
    shape of the top-k rank, never a row: selection decomposes over the
    neighbor-salt partition, so rows, ranks, and rounded sims match the
    default single-window plan bitwise."""
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        build_ivf_index_auto,
        ivf_topk_indexed,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    queries = emb.limit(5)
    flat_book = build_ivf_index_auto(emb, str(tmp_path / "flat"), use_arrow=True)
    base = _served(
        ivf_topk_indexed(spark, str(tmp_path / "flat"), queries, flat_book, k=3, n_probe=4)
    )
    salted = _served(
        ivf_topk_indexed(
            spark,
            str(tmp_path / "flat"),
            queries,
            flat_book,
            k=3,
            n_probe=4,
            salted=True,
        )
    )
    assert salted == base and len(base) == 15
    # and combined with the verify escape hatch (the measured fix pair
    # for the degenerate corpus: scripts/probe_degenerate_vectors.py)
    both = _served(
        ivf_topk_indexed(
            spark,
            str(tmp_path / "flat"),
            queries,
            flat_book,
            k=3,
            n_probe=4,
            salted=True,
            verify_parallelism=8,
        )
    )
    assert both == base


def test_sharded_serve_is_one_pruned_scan(spark, tmp_path):
    """The collapsed sharded serve (VERDICT r12 #1) must plan ONE index
    scan whose PartitionFilters carry BOTH partition levels (shard and
    cluster_id) — not one scan per shard — so the fixed serve costs are
    paid once regardless of n_shards."""
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        build_ivf_index_sharded,
        ivf_topk_indexed_sharded,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    queries = emb.limit(3)
    books = build_ivf_index_sharded(
        emb, str(tmp_path / "sh"), 4, use_arrow=True
    )
    df = ivf_topk_indexed_sharded(
        spark, str(tmp_path / "sh"), queries, books, k=3, n_probe=2
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # exactly one scan of the index directory tree
    assert plan.count("FileScan parquet") == 1, plan[:3000]
    pf_at = plan.index("PartitionFilters")
    pf = plan[pf_at : pf_at + 400]
    assert "shard" in pf and "cluster_id" in pf, pf
    # and the result is still fully ranked
    assert df.count() == 9


# --- the staging guard's scheme aliasing (ADVICE r15 #1) --------------------

def test_staging_guard_sees_through_scheme_aliases():
    """ADVICE r15 #1: 'file:///tmp/idx' and '/tmp/idx' are the SAME
    location, as are s3:// vs s3a:// vs s3n:// on one bucket — a
    scheme-aliased spelling must not escape the overwrite-then-delete
    guard."""
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        _check_staging_disjoint,
        _path_segments,
    )

    # one location, many spellings -> identical segments
    assert (
        _path_segments("file:///tmp/idx")
        == _path_segments("file:/tmp/idx")
        == _path_segments("/tmp/idx")
    )
    assert (
        _path_segments("s3a://bkt/idx")
        == _path_segments("s3n://bkt/idx")
        == _path_segments("s3://bkt/idx/")
    )
    for staging, path in [
        ("file:///tmp/idx", "/tmp/idx"),  # equal, scheme-aliased
        ("file:/tmp/idx", "/tmp/idx/shard=0"),  # contains, single-slash URI
        ("s3a://bkt/idx", "s3://bkt/idx/shard=0"),  # connector-aliased
        ("s3n://bkt/idx/scratch", "s3://bkt/idx"),  # inside, aliased
    ]:
        with pytest.raises(ValueError, match="overlaps the index path"):
            _check_staging_disjoint(staging, path)
    # distinct locations still pass whatever the spelling
    _check_staging_disjoint("file:///a/scratch", "/a/idx")
    _check_staging_disjoint("s3a://bkt/scratch", "s3://bkt/idx")
    _check_staging_disjoint("s3://bkt2/idx", "s3://bkt/idx")  # other bucket
    _check_staging_disjoint("hdfs://nn/idx", "s3://nn/idx")  # other store


# --- the codebook-stats sidecar (VERDICT r15 #1) ----------------------------

def _sidecar_payload(path):
    import json
    import pathlib

    f = pathlib.Path(path) / "_codebook_stats.json"
    assert f.exists(), f"sidecar missing at {f}"
    return json.loads(f.read_text())


def test_build_persists_codebook_stats_sidecar(spark, tmp_path):
    """`build_ivf_index_sharded` must persist {shard: n_centroids} +
    dim next to the layout — the stats it already has — and the
    underscore-prefixed sidecar must stay invisible to the index
    scan's file listing."""
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        build_ivf_index_sharded,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    idx = str(tmp_path / "idx")
    books = build_ivf_index_sharded(emb, idx, 3, use_arrow=True)

    payload = _sidecar_payload(idx)
    assert payload["counts"] == {str(s): books[s].count() for s in books}
    assert payload["dim"] == len(books[0].select("cv").first()["cv"])
    # hidden-file convention: the parquet scan never sees the sidecar
    assert spark.read.parquet(idx).count() == emb.count()


def test_chunked_serve_self_sizes_from_sidecar_without_a_job(
    spark, tmp_path, monkeypatch
):
    """With the sidecar present, `chunk_shards=None` must NOT run the
    ~2s stats aggregate (the r15 structural leftover) — and must still
    serve bitwise what the one-shot serve returns. Removing the
    sidecar falls back to the job, same rows."""
    from redpanda_to_parquet_writer_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    queries = emb.limit(5)
    idx = str(tmp_path / "idx")
    books = sim.build_ivf_index_sharded(emb, idx, 4, use_arrow=True)
    base = _served(
        sim.ivf_topk_indexed_sharded(spark, idx, queries, books, k=3, n_probe=4)
    )

    def _boom(codebooks):
        raise AssertionError("stats job must not run when the sidecar exists")

    monkeypatch.setattr(sim, "_codebook_stats_job", _boom)
    got = _served(
        sim.ivf_topk_indexed_sharded_chunked(
            spark, idx, queries, books, k=3, n_probe=4
        )
    )
    assert got == base

    # sidecar gone -> the bounded job takes over
    calls = []
    monkeypatch.undo()
    orig = sim._codebook_stats_job

    def _spy(codebooks):
        calls.append(sorted(codebooks))
        return orig(codebooks)

    monkeypatch.setattr(sim, "_codebook_stats_job", _spy)
    (tmp_path / "idx" / "_codebook_stats.json").unlink()
    got_fallback = _served(
        sim.ivf_topk_indexed_sharded_chunked(
            spark, idx, queries, books, k=3, n_probe=4
        )
    )
    assert got_fallback == base
    assert calls == [[0, 1, 2, 3]]


def test_append_backfills_a_missing_sidecar(spark, tmp_path):
    """Appends never change the frozen codebooks, so an existing
    sidecar stays correct; appending to a PRE-sidecar index must
    backfill it with the true counts."""
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        append_ivf_index_sharded,
        build_ivf_index_sharded,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    idx = str(tmp_path / "idx")
    books = build_ivf_index_sharded(emb, idx, 2, use_arrow=True)
    before = _sidecar_payload(idx)

    batch = emb.limit(10).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    # sidecar'd index: append leaves it untouched-and-correct
    append_ivf_index_sharded(batch, books, idx, use_arrow=True)
    assert _sidecar_payload(idx) == before

    # pre-sidecar index: append backfills the same stats
    (tmp_path / "idx" / "_codebook_stats.json").unlink()
    batch2 = emb.limit(10).select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"), "embedding"
    )
    append_ivf_index_sharded(batch2, books, idx, use_arrow=True)
    assert _sidecar_payload(idx) == before


def test_stats_job_names_shards_with_null_centroids(spark):
    """ADVICE r15 #3: a NULL centroid vector must raise a targeted
    error naming the bad shard, not let F.size(NULL) drive a confusing
    'dim must be >= 1' out of select_chunk_shards."""
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        _codebook_stats_job,
    )

    ok = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cluster_id int, cv array<double>"
    )
    bad = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, None)], "cluster_id int, cv array<double>"
    )
    assert _codebook_stats_job({0: ok}) == ({0: 2}, 2)
    with pytest.raises(ValueError, match=r"shards \[1\] contain NULL"):
        _codebook_stats_job({0: ok, 1: bad})


def test_explicit_chunking_feeds_actual_bytes_to_the_worker_bound(
    spark, tmp_path, monkeypatch
):
    """ADVICE r15 #2: with the sidecar present, the fan-out width bound
    must see ACTUAL worst-chunk bytes on the explicit-chunk_shards path
    too — not the caller's declared budget."""
    from redpanda_to_parquet_writer_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    queries = emb.limit(3)
    idx = str(tmp_path / "idx")
    books = sim.build_ivf_index_sharded(emb, idx, 4, use_arrow=True)
    payload = _sidecar_payload(idx)
    dim = payload["dim"]
    counts = {int(s): n for s, n in payload["counts"].items()}

    seen = []
    orig = sim._select_chunk_workers

    def _spy(worst_chunk_bytes, n_chunks, cap=8):
        seen.append((worst_chunk_bytes, n_chunks))
        return orig(worst_chunk_bytes, n_chunks, cap)

    monkeypatch.setattr(sim, "_select_chunk_workers", _spy)
    declared = 123_456_789  # a budget bearing no relation to the chunks
    sim.ivf_topk_indexed_sharded_chunked(
        spark, idx, queries, books, 2, k=3, n_probe=4,
        broadcast_budget_bytes=declared,
    ).write.mode("overwrite").format("noop").save()
    # chunks of 2 shards each over 4 shards -> worst chunk = the larger
    # 2-shard codebook sum, from the SIDECAR's counts, never `declared`
    expect = max(
        (counts[0] + counts[1]) * dim * 8, (counts[2] + counts[3]) * dim * 8
    )
    assert seen == [(expect, 2)]

    # sidecar-less explicit serve: the declared budget is all it has
    seen.clear()
    (tmp_path / "idx" / "_codebook_stats.json").unlink()
    sim.ivf_topk_indexed_sharded_chunked(
        spark, idx, queries, books, 2, k=3, n_probe=4,
        broadcast_budget_bytes=declared,
    ).write.mode("overwrite").format("noop").save()
    assert seen == [(declared, 2)]


def test_corrupt_sidecar_falls_back_to_the_stats_job(spark, tmp_path):
    """A corrupt or truncated sidecar must never fail a serve — the
    reader returns None and the bounded aggregate takes over, rows
    unchanged."""
    from redpanda_to_parquet_writer_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    queries = emb.limit(3)
    idx = str(tmp_path / "idx")
    books = sim.build_ivf_index_sharded(emb, idx, 2, use_arrow=True)
    base = _served(
        sim.ivf_topk_indexed_sharded(spark, idx, queries, books, k=3, n_probe=4)
    )
    for garbage in ["not json {", '{"dim": 0, "counts": {"0": 5}}',
                    '{"dim": 4, "counts": {"0": -1}}']:
        (tmp_path / "idx" / "_codebook_stats.json").write_text(garbage)
        assert sim._read_codebook_sidecar(spark, idx) is None
        got = _served(
            sim.ivf_topk_indexed_sharded_chunked(
                spark, idx, queries, books, k=3, n_probe=4
            )
        )
        assert got == base


# --- r16 code-review hardening ----------------------------------------------

def test_guard_resolves_authority_bearing_file_uris_like_hadoop():
    """'file://tmp/idx' (the two-slash typo) has AUTHORITY 'tmp' and
    Hadoop path '/idx' — the guard must compare the path Hadoop will
    actually write to, or the typo slips past and the cleanup deletes
    the index."""
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        _check_staging_disjoint,
        _path_segments,
    )

    assert _path_segments("file://tmp/idx") == ["idx"]
    assert _path_segments("file://host/tmp/idx") == ["tmp", "idx"]
    with pytest.raises(ValueError, match="overlaps the index path"):
        _check_staging_disjoint("file://tmp/idx", "/idx")
    # and a local directory literally named after a scheme must NOT
    # collide with the scheme'd URI (they are different locations)
    _check_staging_disjoint("/s3/bkt/idx", "s3://bkt/idx")
    _check_staging_disjoint("/hdfs/nn/idx", "hdfs://nn/idx")


def test_sidecar_write_failure_does_not_fail_the_build(
    spark, tmp_path, monkeypatch
):
    """The sidecar is an optimization: a transient failure of its small
    driver-side write must not fail an otherwise-complete build (nor
    skip staging cleanup) — serving just pays the fallback job."""
    from redpanda_to_parquet_writer_spark.operators import similarity as sim

    def _boom(spark_, index_path):
        raise OSError("simulated transient FS failure")

    monkeypatch.setattr(sim, "_sidecar_jpath", _boom)
    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    idx = str(tmp_path / "idx")
    staging = str(tmp_path / "staging")
    # the degradation must be OBSERVABLE (VERDICT r16 #3): a persistent
    # FS failure otherwise silently costs every self-sized serve ~2s
    # forever with nothing in any log to say why
    with pytest.warns(RuntimeWarning, match="sidecar write failed"):
        books = sim.build_ivf_index_sharded(
            emb, idx, 2, use_arrow=True, staging_path=staging
        )
    assert sorted(books) == [0, 1]
    import os
    assert not os.path.exists(staging), "staging cleanup must still run"
    assert not os.path.exists(f"{idx}/_codebook_stats.json")
    # the serve works regardless (fallback job path)
    queries = emb.limit(3)
    monkeypatch.undo()
    assert (
        sim.ivf_topk_indexed_sharded_chunked(
            spark, idx, queries, books, k=3, n_probe=4
        ).count()
        == 9
    )


def test_sidecar_write_is_atomic_and_overwrites_cleanly(spark, tmp_path):
    """ADVICE r16 #3: the sidecar lands via temp-name + rename, so no
    .tmp residue survives a successful write, and a rebuild's write
    replaces an existing (stale) sidecar with the new payload."""
    from redpanda_to_parquet_writer_spark.operators import similarity as sim

    idx = tmp_path / "idx"
    idx.mkdir()
    final = idx / "_codebook_stats.json"
    final.write_text('{"dim": 99, "counts": {"0": 99}}')  # stale rebuild victim
    sim._write_codebook_sidecar(spark, str(idx), {0: 5, 1: 7}, 4)
    assert _sidecar_payload(str(idx)) == {
        "dim": 4,
        "counts": {"0": 5, "1": 7},
    }
    assert not (idx / "._codebook_stats.json.tmp").exists()


def test_failed_sidecar_overwrite_removes_the_stale_sidecar(spark, tmp_path):
    """ADVICE r16 #2: a rebuild whose sidecar write fails must not
    leave the OLD sidecar describing the NEW index — stale counts would
    mis-size chunk_shards and the fan-out's broadcast envelope. The
    failure path deletes whatever sidecar remains (serves fall back to
    the bounded stats job, which is always correct)."""
    from redpanda_to_parquet_writer_spark.operators import similarity as sim

    idx = tmp_path / "idx"
    idx.mkdir()
    final = idx / "_codebook_stats.json"
    final.write_text('{"dim": 2, "counts": {"0": 4}}')  # the pre-rebuild sidecar
    # natural failure injection: a non-empty DIRECTORY squatting on the
    # temp name makes fs.create(tmp, overwrite) throw
    (idx / "._codebook_stats.json.tmp" / "blocker").mkdir(parents=True)
    with pytest.warns(RuntimeWarning, match="sidecar write failed"):
        sim._write_codebook_sidecar(spark, str(idx), {0: 5}, 4)
    assert not final.exists(), "stale sidecar must not survive a failed overwrite"
    assert sim._read_codebook_sidecar(spark, str(idx)) is None


def test_append_backfill_failure_does_not_fail_the_append(
    spark, tmp_path, monkeypatch
):
    """ADVICE r16 #1: on a sidecar-less index with caller-reconstructed
    codebooks, the backfill's stats JOB runs after the per-shard
    appends have durably completed — a failure there (transient Spark,
    or the targeted NULL-centroid error) must neither fail the append
    (a retry would double-append the batch) nor skip staging cleanup."""
    import os

    from redpanda_to_parquet_writer_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    idx = str(tmp_path / "idx")
    books = sim.build_ivf_index_sharded(emb, idx, 2, use_arrow=True)
    n_built = spark.read.parquet(idx).count()
    (tmp_path / "idx" / "_codebook_stats.json").unlink()  # pre-sidecar index

    def _boom(codebooks):
        raise RuntimeError("simulated stats-job failure")

    monkeypatch.setattr(sim, "_codebook_stats_job", _boom)
    # caller-reconstructed codebooks (e.g. reloaded from a snapshot):
    # no _codebook_stats attribute, so the backfill needs the job
    rebuilt = {s: b.select("cluster_id", "cv") for s, b in books.items()}
    assert sim._local_codebook_stats(rebuilt) is None
    batch = emb.limit(10).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    staging = str(tmp_path / "staging")
    with pytest.warns(RuntimeWarning, match="sidecar backfill failed"):
        sim.append_ivf_index_sharded(
            batch, rebuilt, idx, use_arrow=True, staging_path=staging
        )
    assert not os.path.exists(staging), "staging cleanup must still run"
    assert spark.read.parquet(idx).count() == n_built + 10
    assert sim._read_codebook_sidecar(spark, idx) is None


def test_chunked_serve_accepts_str_shard_keys(spark, tmp_path):
    """A codebook snapshot round-tripped through JSON metadata comes
    back with str keys ('0', '1', ...). The serve's stats plumbing must
    index by the caller's ORIGINAL keys on every path (sidecar,
    fallback job, worst-chunk bytes) instead of KeyError'ing."""
    from redpanda_to_parquet_writer_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    queries = emb.limit(5)
    idx = str(tmp_path / "idx")
    books = sim.build_ivf_index_sharded(emb, idx, 4, use_arrow=True)
    base = _served(
        sim.ivf_topk_indexed_sharded(spark, idx, queries, books, k=3, n_probe=4)
    )
    str_books = {str(s): df for s, df in books.items()}
    # explicit multi-chunk with the sidecar present (the r16 regression
    # shape), self-sized with sidecar, and self-sized via the fallback job
    for kwargs in ({"chunk_shards": 2}, {}):
        got = _served(
            sim.ivf_topk_indexed_sharded_chunked(
                spark, idx, queries, str_books, k=3, n_probe=4, **kwargs
            )
        )
        assert got == base, kwargs
    (tmp_path / "idx" / "_codebook_stats.json").unlink()
    got = _served(
        sim.ivf_topk_indexed_sharded_chunked(
            spark, idx, queries, str_books, k=3, n_probe=4
        )
    )
    assert got == base


def test_codebook_stats_dim_is_max_over_rows(spark):
    """materialize_centroids' stashed dim must be the MAX over rows
    (matching the fallback job's max(size)) so a short first vector
    cannot understate the sidecar's bytes."""
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        materialize_centroids,
    )

    cb = spark.createDataFrame(
        [(0, [1.0]), (1, [0.0, 1.0, 2.0])], "cluster_id int, cv array<double>"
    )
    assert materialize_centroids(cb)._codebook_stats == (2, 3)

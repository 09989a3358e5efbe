"""Similarity-search operators: LSH scale path vs brute-force baseline."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from redpanda_to_parquet_writer_spark.operators.similarity import (
    brute_force_topk,
    cosine_neardup_pairs,
    ivf_topk,
    kmeans_centroids,
    lsh_bucketed_neighbors,
)
from redpanda_to_parquet_writer_spark.sources.parquet import load_table


def _planes(n_planes: int, dim: int, seed: int = 7):
    rng = random.Random(seed)
    return [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]


def _tables(n_tables: int, n_planes: int, dim: int, seed: int = 7):
    return [_planes(n_planes, dim, seed + t) for t in range(n_tables)]


def test_lsh_pairs_subset_of_exact_and_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_neardup_pairs(emb, threshold=0.2).collect()
    }
    assert exact, "fixture should contain some similar pairs at 0.2"
    # L=8 tables of k=2 planes: recall = 1-(1-p^2)^8, ~0.95 at cos 0.2
    lsh = {
        (r["id_a"], r["id_b"])
        for r in lsh_bucketed_neighbors(emb, _tables(8, 2, 64), min_sim=0.2).collect()
    }
    assert lsh <= exact  # candidates are verified with exact cosine
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.8, f"recall {recall} too low for 8x2 LSH tables"


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    """Two IVF properties with seeded KMeans centroids:
    (a) probing ALL inverted lists reproduces brute force exactly —
        the quantizer partitions, it never loses vectors;
    (b) partial probe (4 of 8 lists) keeps most exact neighbors
        (measured 0.68 on this fixture; asserted with margin)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    centroids = kmeans_centroids(emb, n_centroids=8, seed=42)
    full = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, queries, centroids, k=5, n_probe=8).collect()
    }
    assert full == exact, "full probe must equal brute force"
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, queries, centroids, k=5, n_probe=4).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.6, f"IVF recall {recall} too low at n_probe=4/8"


def test_brute_force_topk_sane(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    top = brute_force_topk(emb, queries, k=5).collect()
    assert len(top) == 15
    by_q = {}
    for r in top:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        sims = [r["sim"] for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert all(r["neighbor_id"] != q for r in rows)


def test_int8_quantization_roundtrip_preserves_neighbors(spark, sf_dir):
    """Quantize -> dequantize, then top-k on the dequantized vectors:
    relative error bounded by the int8 grid, neighbor sets mostly
    preserved (the practical bar for a 4x memory cut)."""
    from pyspark.sql import functions as F2

    from redpanda_to_parquet_writer_spark.operators.similarity import (
        dequantize_int8,
        quantize_int8,
    )

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    q = dequantize_int8(quantize_int8(emb))
    err = q.select(
        F2.aggregate(
            F2.zip_with(
                F2.col("embedding").cast("array<double>"),
                F2.col("embedding_deq"),
                lambda a, b: F2.abs(a - b),
            ),
            F2.lit(0.0),
            lambda acc, x: F2.greatest(acc, x),
        ).alias("max_err"),
        F2.col("q_embedding_scale").alias("scale"),
    ).collect()
    for r in err:
        assert r["max_err"] <= r["scale"] * 0.5 + 1e-9  # round-to-nearest bound

    queries = emb.filter(F2.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    deq = q.select("vec_id", F2.col("embedding_deq").alias("embedding"))
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(
            deq, deq.filter(F2.col("vec_id") < 5), k=5
        ).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.8, f"int8 quantization degraded neighbors: {recall}"


def test_assemble_centroids_roundtrip(spark, sf_dir):
    """Per-dim centroid rows fold back into ordered arrays: dimension
    count matches the embedding width and values land in pos order."""
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        assemble_centroids,
        label_centroid_dims,
    )
    from redpanda_to_parquet_writer_spark.sources.parquet import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.first()["embedding"])
    dims = label_centroid_dims(emb, "label", "embedding")
    arrays = assemble_centroids(dims, "label").collect()
    assert arrays, "expected at least one label"
    by_label = {r["label"]: r for r in arrays}
    flat = {(r["label"], r["pos"]): r["centroid"] for r in dims.collect()}
    for label, row in by_label.items():
        assert len(row["centroid"]) == dim
        assert row["centroid"][0] == flat[(label, 0)]
        assert row["centroid"][dim - 1] == flat[(label, dim - 1)]


def test_cosine_neardup_zero_norm_vector_yields_no_pair(spark):
    """ADVICE r01 repro: a zero-norm embedding must produce NULL
    similarity (dropped by the threshold), not an ANSI DIVIDE_BY_ZERO
    that kills the job."""
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        cosine_neardup_pairs,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.0, 0.0]),  # degenerate: zero norm
            (3, [2.0, 0.0]),  # parallel to 1 -> sim 1.0
        ],
        "vec_id long, embedding array<double>",
    )
    rows = cosine_neardup_pairs(df, "vec_id", "embedding", 0.9).collect()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(1, 3)]


def test_bucket_pair_candidates_hot_bucket_cap(spark):
    """VERDICT r4 #2: one degenerate bucket (e.g. all-empty docs) must
    not emit B^2/2 pairs when capped — oversize buckets are dropped
    BEFORE their member array is collected; normal buckets unaffected."""
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        bucket_pair_candidates,
    )

    rows = [(i, "HOT") for i in range(200)] + [(1000, "ok"), (1001, "ok")]
    df = spark.createDataFrame(rows, "doc_id long, bucket string")

    uncapped = bucket_pair_candidates(df, ["bucket"], "doc_id", [])
    assert uncapped.count() == 200 * 199 // 2 + 1

    capped = bucket_pair_candidates(df, ["bucket"], "doc_id", [], max_bucket_size=10)
    got = [(r["id_a"], r["id_b"]) for r in capped.collect()]
    assert got == [(1000, 1001)], "hot bucket must be dropped, normal kept"
    # the cap rides an aggregate + join-back (r12): NO window keyed on
    # the bucket — the hot bucket the cap targets would otherwise pass
    # through one unsplittable window task before being dropped. The
    # join-back adds at most one exchange over the uncapped plan.
    def plan(q):
        return q._jdf.queryExecution().executedPlan().toString()

    fresh_capped = bucket_pair_candidates(df, ["bucket"], "doc_id", [], max_bucket_size=10)
    assert "Window" not in plan(fresh_capped)
    # the one-signature-pass invariant: both consumers of the salted
    # sub-collect (bucket totals + the flatten probe) share its
    # exchange — the static plan duplicates the branch, but after AQE
    # the input lineage plans once (the capped input scans once)
    fresh_capped.collect()
    final = plan(fresh_capped).split("== Initial Plan ==")[0]
    assert "isFinalPlan=true" in final
    assert final.count("ReusedExchange") >= 1, final
    assert final.count("Scan ExistingRDD") == 1, final


def test_bucket_pair_candidates_cap_keeps_null_keyed_buckets(spark):
    """ADVICE r12: the capped path's totals join-back must be NULL-SAFE
    — a plain equi-join drops null-keyed buckets (null != null), so
    members bucketed under a null key (hyperplane-LSH signature of a
    null/ragged vector) would silently stop pairing ONLY when the cap
    is set. The cap must be a pure refinement of the uncapped path:
    identical pairs for every bucket under the cap, null key included."""
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        bucket_pair_candidates,
    )

    rows = [(1, None), (2, None), (3, "ok"), (4, "ok"), (5, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, bucket string")

    def pairs(q):
        return sorted((r["id_a"], r["id_b"]) for r in q.collect())

    uncapped = pairs(bucket_pair_candidates(df, ["bucket"], "doc_id", []))
    assert uncapped == [(1, 2), (3, 4)]
    capped = pairs(
        bucket_pair_candidates(df, ["bucket"], "doc_id", [], max_bucket_size=10)
    )
    assert capped == uncapped, "null-keyed bucket lost on the capped path"
    # and the cap itself still applies to a null-keyed hot bucket
    hot = [(i, None) for i in range(50)] + [(100, "ok"), (101, "ok")]
    hot_df = spark.createDataFrame(hot, "doc_id long, bucket string")
    assert pairs(
        bucket_pair_candidates(hot_df, ["bucket"], "doc_id", [], max_bucket_size=10)
    ) == [(100, 101)]


def test_jaccard_max_doc_freq_caps_hot_shingle(spark):
    """A boilerplate shingle shared by every doc must not pair the whole
    corpus when capped; surviving-set sizes stay consistent."""
    from redpanda_to_parquet_writer_spark.operators.text import jaccard_pairs

    # 50 docs all share shingle "X"; docs 0/1 also share "a","b"
    rows = [(i, ["X"] + ([f"u{i}"] if i > 1 else ["a", "b"])) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, grams array<string>")

    uncapped = jaccard_pairs(df, "doc_id", "grams", threshold=0.01)
    assert uncapped.count() == 50 * 49 // 2

    capped = jaccard_pairs(df, "doc_id", "grams", threshold=0.01, max_doc_freq=10)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in capped.collect()}
    # only docs 0 and 1 still co-occur (on "a","b"); sizes recomputed
    # over surviving shingles: |A|=|B|=2, common=2 -> jaccard 1.0
    assert got == {(0, 1): 1.0}


def test_simhash_banding_precondition_enforced(spark):
    """ADVICE r4: max_hamming >= n_bands breaks the pigeonhole recall-1
    guarantee -> must raise, not silently under-return pairs."""
    import pytest

    from redpanda_to_parquet_writer_spark.operators.text import (
        simhash_incremental_anti,
        simhash_neardup_pairs,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_neardup_pairs(df, "text", "doc_id", max_hamming=4, n_bands=4)
    with pytest.raises(ValueError, match="divide evenly"):
        simhash_neardup_pairs(df, "text", "doc_id", max_hamming=3, n_bands=5, bits=48)
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_incremental_anti(df, df, "text", "doc_id", max_hamming=7, n_bands=4)


def test_pq_encode_properties(spark, sf_dir):
    """PQ invariants: m codes per vector in [0, ksub); a SEED vector
    encodes to its own code in every subspace (its subvector is a
    centroid, distance 0, min-code tie-break)."""
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    m, ksub, dim = 8, 16, 64
    cb = pq_codebooks(emb, m, ksub, dim)
    assert cb.count() == m * ksub
    codes = pq_encode(emb, cb, m, dim)
    n = emb.count()
    assert codes.count() == n * m
    rng = codes.agg(F.min("code"), F.max("code")).collect()[0]
    assert 0 <= rng[0] and rng[1] < ksub
    # seeds (lowest ksub ids in the fixture: vec_id 0..ksub-1) self-encode
    seed_codes = {
        (r["vec_id"], r["subspace"]): r["code"]
        for r in codes.filter(F.col("vec_id") < ksub).collect()
    }
    for vid in range(ksub):
        for s in range(m):
            assert seed_codes[(vid, s)] == vid, (vid, s, seed_codes[(vid, s)])


def test_pq_adc_approximates_true_ranking(spark, sf_dir):
    """ADC distances must correlate with true L2: for each query the
    true nearest non-self neighbor by exact L2 lands within the ADC
    top-quartile of candidates (a weak-but-meaningful bound for a
    16-centroid seed codebook)."""
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("label") == 0)
    m, dim, ksub = 8, 64, 16
    cb = pq_codebooks(emb, m, ksub, dim)
    codes = pq_encode(emb, cb, m, dim)
    queries = emb.orderBy("vec_id").limit(3)
    n = emb.count()
    full = pq_adc_topk(codes, queries, cb, m, dim, k=n)
    rows = full.collect()
    # exact L2 via driver-side numpy over the small label-0 subset
    import numpy as np

    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    for q in [r["vec_id"] for r in queries.collect()]:
        true_nn = min(
            ((vid, float(np.sum((v - vecs[q]) ** 2))) for vid, v in vecs.items() if vid != q),
            key=lambda t: (t[1], t[0]),
        )[0]
        adc_rank = next(
            r["rank"] for r in rows if r["query_id"] == q and r["neighbor_id"] == true_nn
        )
        assert adc_rank <= max(3, (n - 1) // 4), (q, true_nn, adc_rank)


def test_pq_dimension_preconditions_enforced(spark):
    """dim % m != 0 would silently slice short subvectors — it must
    raise instead; ksub > 256 breaks the one-byte-code claim."""
    import pytest

    from redpanda_to_parquet_writer_spark.operators.similarity import (
        pq_codebooks,
    )

    df = spark.createDataFrame([(0, [0.0] * 10)], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="divide evenly"):
        pq_codebooks(df, m=3, ksub=4, dim=10)
    with pytest.raises(ValueError, match="one-byte"):
        pq_codebooks(df, m=2, ksub=300, dim=10)


def test_containment_max_doc_freq_caps_hot_shingle(spark):
    """A boilerplate shingle shared by every doc would pair the whole
    corpus; max_doc_freq drops it before its posting list is collected
    (same guard as jaccard), and containment is computed over the
    SURVIVING shingle space."""
    from redpanda_to_parquet_writer_spark.operators.text import containment_pairs

    rows = [(i, ["HOT", f"u{i}a", f"u{i}b"]) for i in range(20)]
    # docs 0/1 genuinely overlap beyond the hot shingle
    rows[1] = (1, ["HOT", "u0a", "u1b"])
    df = spark.createDataFrame(rows, "doc_id long, ngrams array<string>")
    uncapped = containment_pairs(df, "doc_id", "ngrams", 0.3)
    assert uncapped.count() == 20 * 19 // 2  # HOT pairs everyone
    capped = containment_pairs(df, "doc_id", "ngrams", 0.3, max_doc_freq=5)
    got = {(r["id_a"], r["id_b"]): r["containment"] for r in capped.collect()}
    # only the real overlap survives: docs 0/1 share u0a of 2 surviving
    # shingles each -> containment 0.5
    assert got == {(0, 1): 0.5}


def test_ivfadc_recall_audit_and_probe_tradeoff(spark, sf_dir, tmp_path):
    """The IVFADC recall audit (VERDICT r6 #2) must (a) report per-query
    recall that matches a from-scratch set comparison of the indexed
    serving path against brute force, and (b) be monotone in n_probe on
    the fixture — more inverted lists probed can only add candidates, so
    recall at full probe bounds recall at partial probe from above."""
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        build_ivfadc_index,
        deterministic_centroids,
        ivfadc_topk_indexed,
        materialize_centroids,
        pq_codebooks,
    )
    from redpanda_to_parquet_writer_spark.plans.vector_queries import (
        EMB_DIM,
        IVF_CENTROIDS,
        IVF_PROBE,
        N_QUERY_VECS,
        PQ_KSUB,
        PQ_M,
        TOPK_K,
        ann_ivfadc_recall_audit,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=TOPK_K).collect()
    }

    centroids = materialize_centroids(
        deterministic_centroids(emb, IVF_CENTROIDS, "vec_id", "embedding")
    )
    cb = pq_codebooks(emb, PQ_M, PQ_KSUB, EMB_DIM)
    path = str(tmp_path / "ivfadc_idx")
    build_ivfadc_index(emb, centroids, cb, path, PQ_M, EMB_DIM)

    def hits(n_probe: int) -> set:
        return {
            (r["query_id"], r["neighbor_id"])
            for r in ivfadc_topk_indexed(
                spark, path, queries, centroids, cb, PQ_M, EMB_DIM, TOPK_K, n_probe
            ).collect()
        }

    partial = hits(IVF_PROBE)
    full = hits(IVF_CENTROIDS)
    # (b) probe tradeoff: full probe recall bounds partial from above
    assert len(full & exact) >= len(partial & exact)

    # (c) codebook-size tradeoff: a larger PQ codebook (lower
    # quantization error) must not lose recall on the fixture — the
    # measured knob a pipeline turns when the audit's recall is low
    small_cb = pq_codebooks(emb, PQ_M, 4, EMB_DIM)
    small_path = str(tmp_path / "ivfadc_idx_small")
    build_ivfadc_index(emb, centroids, small_cb, small_path, PQ_M, EMB_DIM)
    small_hits = {
        (r["query_id"], r["neighbor_id"])
        for r in ivfadc_topk_indexed(
            spark, small_path, queries, centroids, small_cb,
            PQ_M, EMB_DIM, TOPK_K, IVF_PROBE,
        ).collect()
    }
    assert len(partial & exact) >= len(small_hits & exact)

    # (a) the audit's aggregate matches the set comparison exactly
    audit = {r["query_id"]: r for r in ann_ivfadc_recall_audit(spark, sf_dir).collect()}
    assert set(audit) == {r[0] for r in exact}
    for qid, row in audit.items():
        n_matched = sum(1 for (q, n) in partial & exact if q == qid)
        assert row["n_exact"] == TOPK_K
        assert row["n_matched"] == n_matched
        # recall recorded as exact half-up millionths of n_matched/k
        assert row["recall"] == (n_matched * 2_000_000 + TOPK_K) // (2 * TOPK_K) / 1e6


def test_append_ivf_index_equals_rebuild(spark, sf_dir, tmp_path):
    """Incremental maintenance contract: building on half the corpus
    then appending the other half serves EXACTLY what a full rebuild
    serves (rows compared exactly), appended rows land inside the same
    cluster_id= directories (no new top-level dirs), and the appended
    index contains every corpus row exactly once."""
    import os

    from redpanda_to_parquet_writer_spark.operators.similarity import (
        append_ivf_index,
        build_ivf_index,
        deterministic_centroids,
        ivf_topk_indexed,
        materialize_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = materialize_centroids(deterministic_centroids(emb, 8))
    full_path, inc_path = str(tmp_path / "full"), str(tmp_path / "inc")
    build_ivf_index(emb, centroids, full_path)
    build_ivf_index(emb.filter(F.col("vec_id") % 2 == 0), centroids, inc_path)
    dirs_before = {d for d in os.listdir(inc_path) if d.startswith("cluster_id=")}
    append_ivf_index(emb.filter(F.col("vec_id") % 2 == 1), centroids, inc_path)
    dirs_after = {d for d in os.listdir(inc_path) if d.startswith("cluster_id=")}
    assert dirs_after <= {f"cluster_id={i}" for i in range(8)}

    n = emb.count()
    inc_rows = spark.read.parquet(inc_path)
    assert inc_rows.count() == n
    assert inc_rows.select("neighbor_id").distinct().count() == n

    queries = emb.filter(F.col("vec_id") < 10)
    serve = lambda p: sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
        for r in ivf_topk_indexed(spark, p, queries, centroids, k=5, n_probe=3).collect()
    )
    assert serve(inc_path) == serve(full_path)
    # dirs_before may lack clusters no even-id vector mapped to; append
    # is allowed to create those
    assert dirs_before <= dirs_after


def test_append_ivfadc_index_and_compaction(spark, sf_dir, tmp_path):
    """IVFADC incremental maintenance + operational compaction over the
    FULL production cycle append -> compact -> append -> serve: (a)
    build + append under the frozen quantizers; (b) mid-cycle
    compact_parquet(partition_by=['cluster_id']) collapses the part
    files; (c) a further append lands on the COMPACTED index (VERDICT
    r8 #7 — compaction is an online maintenance step, not the end of
    the lineage); the post-compact-append index, its never-compacted
    twin, and a full rebuild all serve EXACTLY the same rows."""
    import os

    from redpanda_to_parquet_writer_spark.operators.similarity import (
        append_ivfadc_index,
        build_ivfadc_index,
        deterministic_centroids,
        ivfadc_topk_indexed,
        materialize_centroids,
        pq_codebooks,
    )
    from redpanda_to_parquet_writer_spark.plans.vector_queries import (
        EMB_DIM,
        PQ_KSUB,
        PQ_M,
    )
    from redpanda_to_parquet_writer_spark.sources.parquet import compact_parquet

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = materialize_centroids(deterministic_centroids(emb, 8))
    cb = pq_codebooks(emb, PQ_M, PQ_KSUB, EMB_DIM)
    full_path, inc_path = str(tmp_path / "full"), str(tmp_path / "inc")
    build_ivfadc_index(emb, centroids, cb, full_path, PQ_M, EMB_DIM)
    build_ivfadc_index(
        emb.filter(F.col("vec_id") % 3 == 0), centroids, cb, inc_path, PQ_M, EMB_DIM
    )
    append_ivfadc_index(
        emb.filter(F.col("vec_id") % 3 == 1), centroids, cb, inc_path,
        PQ_M, EMB_DIM,
    )

    # mid-cycle compaction: 2/3 of the corpus, two part-file generations
    compact_path = str(tmp_path / "compacted")
    stats = compact_parquet(
        spark, inc_path, compact_path, partition_by=["cluster_id"]
    )
    assert stats["files_after"] < stats["files_before"]

    # the last ingest batch appends onto BOTH the compacted index and
    # its never-compacted twin — compaction must be transparent to
    # subsequent appends
    last = emb.filter(F.col("vec_id") % 3 == 2)
    append_ivfadc_index(last, centroids, cb, compact_path, PQ_M, EMB_DIM)
    append_ivfadc_index(last, centroids, cb, inc_path, PQ_M, EMB_DIM)

    n = emb.count()
    for p in (compact_path, inc_path):
        idx = spark.read.parquet(p)
        assert idx.select("neighbor_id").distinct().count() == n

    queries = emb.filter(F.col("vec_id") < 8)
    serve = lambda p: sorted(
        tuple(r)
        for r in ivfadc_topk_indexed(
            spark, p, queries, centroids, cb, PQ_M, EMB_DIM, 5, 3
        ).collect()
    )
    full_rows = serve(full_path)
    assert serve(inc_path) == full_rows
    assert serve(compact_path) == full_rows


def test_append_under_wrong_codebook_is_callers_contract(spark, sf_dir, tmp_path):
    """The documented contract hole, demonstrated: appending under a
    DIFFERENT coarse quantizer mis-assigns list membership — serving
    results diverge from the rebuild. (The engine cannot detect this
    cheaply; the docstring tells callers to snapshot quantizers beside
    the index. This test pins that the failure mode is real, so the
    doc claim stays honest.)"""
    from redpanda_to_parquet_writer_spark.operators.similarity import (
        append_ivf_index,
        build_ivf_index,
        deterministic_centroids,
        ivf_topk_indexed,
        materialize_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    c8 = materialize_centroids(deterministic_centroids(emb, 8))
    c4 = materialize_centroids(deterministic_centroids(emb, 4))
    full_path, bad_path = str(tmp_path / "full"), str(tmp_path / "bad")
    build_ivf_index(emb, c8, full_path)
    build_ivf_index(emb.filter(F.col("vec_id") % 2 == 0), c8, bad_path)
    append_ivf_index(emb.filter(F.col("vec_id") % 2 == 1), c4, bad_path)
    queries = emb.filter(F.col("vec_id") < 10)
    serve = lambda p: sorted(
        tuple(r)
        for r in ivf_topk_indexed(spark, p, queries, c8, k=5, n_probe=3).collect()
    )
    assert serve(bad_path) != serve(full_path)


def test_reliable_serving_path_bitwise_equals_local(spark, sf_dir, tmp_path):
    """VERDICT r8 #6: the resilient serving variant (reliable=True →
    durable `checkpoint()` of the probe sub-plan against the configured
    checkpoint dir) must return BITWISE the same top-k as the default
    localCheckpoint path for both IVF and IVFADC serving — the
    materialization strategy is operational, never semantic. Also pins
    the fail-fast: reliable=True without a configured checkpoint dir
    raises immediately with the fix in the message."""
    import pytest as _pytest

    from redpanda_to_parquet_writer_spark.operators.similarity import (
        build_ivf_index,
        build_ivfadc_index,
        deterministic_centroids,
        ivf_topk_indexed,
        ivfadc_topk_indexed,
        materialize_centroids,
        pq_codebooks,
    )
    from redpanda_to_parquet_writer_spark.plans.vector_queries import (
        EMB_DIM,
        PQ_KSUB,
        PQ_M,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = materialize_centroids(deterministic_centroids(emb, 8))
    cb = pq_codebooks(emb, PQ_M, PQ_KSUB, EMB_DIM)
    ivf_path, adc_path = str(tmp_path / "ivf"), str(tmp_path / "adc")
    build_ivf_index(emb, centroids, ivf_path)
    build_ivfadc_index(emb, centroids, cb, adc_path, PQ_M, EMB_DIM)
    queries = emb.filter(F.col("vec_id") < 10)

    sc = spark.sparkContext
    if sc.getCheckpointDir() is None:
        with _pytest.raises(ValueError, match="checkpoint directory"):
            ivf_topk_indexed(
                spark, ivf_path, queries, centroids, k=5, n_probe=3, reliable=True
            ).count()
    sc.setCheckpointDir(str(tmp_path / "reliable_ckpt"))

    def bits(df):
        # float.hex: bitwise, not 9-sig-digit, equality on the scores
        return sorted(
            tuple(float(v).hex() if isinstance(v, float) else v for v in r)
            for r in df.collect()
        )

    ivf_local = ivf_topk_indexed(spark, ivf_path, queries, centroids, k=5, n_probe=3)
    ivf_rel = ivf_topk_indexed(
        spark, ivf_path, queries, centroids, k=5, n_probe=3, reliable=True
    )
    assert bits(ivf_rel) == bits(ivf_local)

    adc_local = ivfadc_topk_indexed(
        spark, adc_path, queries, centroids, cb, PQ_M, EMB_DIM, 5, 3
    )
    adc_rel = ivfadc_topk_indexed(
        spark, adc_path, queries, centroids, cb, PQ_M, EMB_DIM, 5, 3, reliable=True
    )
    assert bits(adc_rel) == bits(adc_local)
    # durable blocks actually landed in the configured dir
    import os

    assert any(os.scandir(str(tmp_path / "reliable_ckpt")))


def test_arrow_assignment_matches_jvm_and_serves_identically(spark, sf_dir, tmp_path):
    """ivf_assign_arrow (vectorized numpy build path) must produce the
    same cluster assignments as the JVM formulation on the fixtures, and
    an index built with use_arrow=True must serve the exact same top-k
    rows (the serving contract)."""
    from pyspark.sql import functions as F

    from redpanda_to_parquet_writer_spark.operators.similarity import (
        _as_double,
        build_ivf_index,
        deterministic_centroids,
        ivf_assign,
        ivf_assign_arrow,
        ivf_topk_indexed,
        materialize_centroids,
    )
    from redpanda_to_parquet_writer_spark.sources.parquet import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = materialize_centroids(
        deterministic_centroids(emb, 8, "vec_id", "embedding")
    )
    c = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    jvm = {
        r["vec_id"]: r["cluster_id"] for r in ivf_assign(c, cents).collect()
    }
    arrow = {
        r["vec_id"]: r["cluster_id"] for r in ivf_assign_arrow(c, cents).collect()
    }
    assert jvm == arrow
    # zero-norm vector -> the LOWEST cluster id on both paths (the JVM
    # max_by orders struct(NULL sim, -cluster_id) with NULL smallest)
    z = spark.createDataFrame(
        [(999999, [0.0] * 64)], "vec_id long, v array<double>"
    )
    assert ivf_assign(z, cents).collect()[0]["cluster_id"] == 0
    assert ivf_assign_arrow(z, cents).collect()[0]["cluster_id"] == 0

    queries = emb.filter(F.col("vec_id") < 3)
    build_ivf_index(emb, cents, str(tmp_path / "jvm_idx"))
    build_ivf_index(emb, cents, str(tmp_path / "arrow_idx"), use_arrow=True)
    serve = lambda p: sorted(
        tuple(r)
        for r in ivf_topk_indexed(
            spark, p, queries, cents, "vec_id", "embedding", 3, 2
        ).collect()
    )
    assert serve(str(tmp_path / "jvm_idx")) == serve(str(tmp_path / "arrow_idx"))


def test_arrow_ivfadc_build_serves_identically(spark, sf_dir, tmp_path):
    """An IVFADC index built with the one-pass vectorized assign+encode
    must serve the exact same top-k as the JVM composition (the serving
    contract), and its rows must match the JVM index row-for-row on the
    fixtures."""
    from pyspark.sql import functions as F

    from redpanda_to_parquet_writer_spark.operators.similarity import (
        build_ivfadc_index,
        deterministic_centroids,
        ivfadc_topk_indexed,
        materialize_centroids,
        pq_codebooks,
    )
    from redpanda_to_parquet_writer_spark.sources.parquet import load_table

    m, dim = 8, 64
    emb = load_table(spark, sf_dir, "embeddings")
    cents = materialize_centroids(
        deterministic_centroids(emb, 8, "vec_id", "embedding")
    )
    cb = pq_codebooks(emb, m, 16, dim)
    build_ivfadc_index(emb, cents, cb, str(tmp_path / "jvm"), m, dim)
    build_ivfadc_index(
        emb, cents, cb, str(tmp_path / "arrow"), m, dim, use_arrow=True
    )
    rows = lambda p: sorted(
        tuple(r) for r in spark.read.parquet(p).collect()
    )
    assert rows(str(tmp_path / "jvm")) == rows(str(tmp_path / "arrow"))
    queries = emb.filter(F.col("vec_id") < 3)
    serve = lambda p: sorted(
        tuple(r)
        for r in ivfadc_topk_indexed(
            spark, p, queries, cents, cb, m, dim, 3, 2
        ).collect()
    )
    assert serve(str(tmp_path / "jvm")) == serve(str(tmp_path / "arrow"))


def test_rrf_fuse_precondition_unique_nonnull_ids(spark):
    """ADVICE r8 #3: rrf_fuse's union+groupBy formulation assumes each
    leg carries one NON-NULL rank per unique id (row_number legs give
    this by construction). This test (a) pins the correct fused scores
    on clean legs, and (b) pins the documented DEVIATION on dirty legs
    — a duplicated id collapses to its worst rank instead of summing,
    and NULL ids merge into one phantom row — so the docstring contract
    can't drift silently if the formulation changes."""
    from redpanda_to_parquet_writer_spark.operators.similarity import rrf_fuse

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, rank int")

    # clean legs: the textbook case
    a = mk([(1, 1), (2, 2)])
    b = mk([(2, 1), (3, 2)])
    fused = {r["doc_id"]: r["rrf"] for r in rrf_fuse(a, b, "doc_id", k=10, c=60).collect()}
    assert fused[1] == 1.0 / 61.0
    assert fused[2] == 1.0 / 62.0 + 1.0 / 61.0  # both legs sum
    assert fused[3] == 1.0 / 62.0

    # dirty leg 1: duplicate id within a leg -> collapses to max (worst)
    # rank, NOT two reciprocals summed — the documented deviation
    dup = mk([(1, 1), (1, 2)])
    got = {r["doc_id"]: r["rrf"] for r in rrf_fuse(dup, mk([]), "doc_id", k=10, c=60).collect()}
    assert got[1] == 1.0 / 62.0  # max(1,2)=2, single term

    # dirty leg 2: NULL ids from both legs merge into one phantom row
    na = spark.createDataFrame([(None, 1)], "doc_id long, rank int")
    nb = spark.createDataFrame([(None, 1)], "doc_id long, rank int")
    phantom = rrf_fuse(na, nb, "doc_id", k=10, c=60).collect()
    assert len(phantom) == 1 and phantom[0]["doc_id"] is None

"""Mixture rebalancing: proportions land near targets, deterministic
with a seed, never upsamples."""

from __future__ import annotations

from redpanda_to_parquet_writer_spark.operators.sampling import (
    mixture_fractions,
    rebalance_sources,
)
from redpanda_to_parquet_writer_spark.sources.parquet import load_table


def test_mixture_fractions_math():
    counts = {"web": 1000, "code": 100, "books": 50}
    # code binds: 100/0.3 = 333.3 feasible total (scarcest vs target)
    fr = mixture_fractions(counts, {"web": 0.6, "code": 0.3, "books": 0.1})
    assert abs(fr["code"] - 1.0) < 1e-9
    assert abs(fr["web"] - 0.2) < 1e-9  # 0.6*333.3/1000
    assert abs(fr["books"] - 2 / 3) < 1e-9  # 0.1*333.3/50


def test_rebalance_proportions(spark, sf_dir):
    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    weights = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    out = rebalance_sources(docs, "source", weights)
    counts = {r[0]: r[1] for r in out.groupBy("source").count().collect()}
    assert set(counts) <= set(weights)
    total = sum(counts.values())
    for s, w in weights.items():
        share = counts.get(s, 0) / total
        assert abs(share - w) < 0.08, f"{s}: {share} vs target {w}"
    # deterministic with the same seed
    again = rebalance_sources(docs, "source", weights)
    assert again.count() == out.count()


def test_temperature_sample_keeps_min_group_whole(spark):
    from redpanda_to_parquet_writer_spark.operators.sampling import temperature_sample

    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    kept = temperature_sample(df, "grp", "doc_id").collect()
    by_grp = {}
    for r in kept:
        by_grp.setdefault(r["grp"], []).append(r)
    # the smallest group is kept whole (rate = sqrt(n_min/n_min) = 1)
    assert len(by_grp["small"]) == 4
    # the dominant group downsamples toward sqrt(4/400) = 10% of 400
    assert 10 <= len(by_grp["big"]) <= 90
    # determinism: a rerun keeps the identical id set
    again = {r["doc_id"] for r in temperature_sample(df, "grp", "doc_id").collect()}
    assert again == {r["doc_id"] for r in kept}
    # the emitted bucket satisfies the exact integer predicate
    for r in kept:
        assert r["bucket"] ** 2 * r["n_group"] < 10**12 * r["n_min"]


def test_grouped_running_sum_multi_bucket_equals_single_window(spark, monkeypatch):
    """The two-level prefix sum (r11: within-bucket window + per-group
    bucket offsets) must equal the naive per-group running-sum window
    on inputs that SPAN MANY BUCKETS — the fixtures' ids all fit one
    2^20 span, so without shrinking the span the second level is never
    exercised. Random ids with gaps across three groups, span patched
    to 8 (~60 buckets per group)."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from redpanda_to_parquet_writer_spark.operators import sampling

    monkeypatch.setattr(sampling, "PREFIX_SPAN", 8)
    rng = random.Random(11)
    rows = []
    for g in ("web", "code", "books"):
        ids = sorted(rng.sample(range(0, 500), 120))  # ~60 buckets of 8
        rows += [(g, i, rng.randint(0, 50)) for i in ids]
    df = spark.createDataFrame(rows, "grp string, doc_id long, n long")

    got = {
        (r["grp"], r["doc_id"]): r["cum"]
        for r in sampling._grouped_running_sum(df, "grp", "doc_id", "n").collect()
    }
    w = (
        Window.partitionBy("grp")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r["grp"], r["doc_id"]): r["cum"]
        for r in df.withColumn("cum", F.sum("n").over(w)).collect()
    }
    assert got == want
    # and the bucketing really was multi-level under the patched span
    n_buckets = df.selectExpr("count(DISTINCT grp, doc_id DIV 8)").collect()[0][0]
    assert n_buckets > 100

def test_grouped_running_sum_duplicate_id_bucket_totals_exact(spark, monkeypatch):
    """ADVICE r12: with DUPLICATE ids in one bucket, the bucket total
    read off the windowed frame (`max_by`) must not return a mid-tie
    partial sum — the tie breaks to the largest inclusive sum via
    struct(id, __cum_in), which is the true total for non-negative
    values. Per-row cum among tied ids is order-dependent by contract;
    what must be exact is every LATER bucket's cum."""
    from pyspark.sql import functions as F

    from redpanda_to_parquet_writer_spark.operators import sampling

    monkeypatch.setattr(sampling, "PREFIX_SPAN", 4)
    # bucket 0: ids 3,3 (vals 5 and 0 — a zero-val duplicate is the
    # adversarial tie: a bare-id max_by that picks the 0-val row's cum
    # BEFORE the 5 was added reports total 0); bucket 1: id 7
    df = spark.createDataFrame(
        [("g", 3, 5), ("g", 3, 0), ("g", 7, 2)],
        "grp string, doc_id long, n long",
    )
    out = sampling._grouped_running_sum(df, "grp", "doc_id", "n")
    later = {r["n"]: r["cum"] for r in out.filter(F.col("doc_id") == 7).collect()}
    assert later == {2: 7}  # 5 + 0 + 2: bucket-0 total carried exactly
    # the group's final running sum is the full group total
    assert out.agg(F.max("cum")).collect()[0][0] == 7

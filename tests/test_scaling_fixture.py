"""The sf~1 fixture generator's honesty invariants (VERDICT r9 #4).

`scripts/scaling_sf1.py` synthesizes the scaling decade by replication
with cardinality-honest transforms; if those transforms rot, the curve
silently measures a fantasy workload (10-way exact dups collapse dedup,
identical embeddings make 45-pair cliques). Pinned here at sf0.001 so
the generator itself is under test, not just its one-off output.
"""

from __future__ import annotations

import importlib.util
import math
import os

from pyspark.sql import functions as F

_SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts", "scaling_sf1.py")
spec = importlib.util.spec_from_file_location("scaling_sf1", _SCRIPT)
scaling_sf1 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(scaling_sf1)


def test_sf_fixture_cardinalities_honest(spark, tmp_path):
    src = "/root/testdata/sf0.001"
    dst = str(tmp_path / "sfx")
    scaling_sf1.synthesize(src, dst)
    R = scaling_sf1.REPLICAS

    for t, key in [
        ("lineitem", None),
        ("orders", "o_orderkey"),
        ("customer", "c_custkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]:
        base = spark.read.parquet(f"{src}/{t}.parquet")
        out = spark.read.parquet(f"{dst}/{t}.parquet")
        assert out.count() == R * base.count(), t
        if key:
            # shifted keys stay globally unique: dedup scales, never collapses
            assert out.select(key).distinct().count() == out.count(), t

    # fixed dims copied once — their fan-in grows, their size doesn't
    for t in ("region", "nation"):
        assert (
            spark.read.parquet(f"{dst}/{t}.parquet").count()
            == spark.read.parquet(f"{src}/{t}.parquet").count()
        )

    # star-schema keys shift in LOCKSTEP: every fact FK still resolves
    li = spark.read.parquet(f"{dst}/lineitem.parquet")
    orders = spark.read.parquet(f"{dst}/orders.parquet")
    part = spark.read.parquet(f"{dst}/part.parquet")
    dangling = li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
    assert dangling.count() == 0
    dangling_p = li.join(part, li.l_partkey == part.p_partkey, "left_anti")
    assert dangling_p.count() == 0

    # document text: within-replica dup structure preserved exactly
    # (distinct-text ratio scales by R), cross-replica texts disjoint
    base_docs = spark.read.parquet(f"{src}/documents.parquet")
    out_docs = spark.read.parquet(f"{dst}/documents.parquet")
    base_distinct = base_docs.select("text").distinct().count()
    assert out_docs.select("text").distinct().count() == R * base_distinct
    # the Caesar rotation preserves length (n_chars stays truthful)
    bad_len = out_docs.filter(F.length("text") != F.col("n_chars")).count()
    base_bad = base_docs.filter(F.length("text") != F.col("n_chars")).count()
    assert bad_len == R * base_bad  # no new length drift beyond the base's own

    # embeddings: rotation preserves the norm bitwise-ish and the
    # replicas of one vector must NOT be near-duplicates of each other
    emb = spark.read.parquet(f"{dst}/embeddings.parquet")
    base_emb = spark.read.parquet(f"{src}/embeddings.parquet")
    n0 = base_emb.count()
    sq = lambda c: F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x)
    pad = int(base_emb.agg(F.max("vec_id")).first()[0]) + 1
    pairs = (
        emb.filter(F.col("vec_id") < 3)  # replica 0 originals
        .alias("a")
        .join(
            emb.filter((F.col("vec_id") >= pad) & (F.col("vec_id") < pad + 3)).alias("b"),
            F.col("a.vec_id") + pad == F.col("b.vec_id"),
        )
        .select(
            sq(F.col("a.embedding").cast("array<double>")).alias("na"),
            sq(F.col("b.embedding").cast("array<double>")).alias("nb"),
            F.aggregate(
                F.zip_with(
                    F.col("a.embedding").cast("array<double>"),
                    F.col("b.embedding").cast("array<double>"),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("dot"),
        )
        .collect()
    )
    assert len(pairs) == 3
    for r in pairs:
        assert math.isclose(r["na"], r["nb"], rel_tol=1e-9)  # norm preserved
        cos = r["dot"] / math.sqrt(r["na"] * r["nb"])
        assert abs(cos) < 0.9, f"replica pair still near-dup: cos={cos}"
    assert emb.count() == scaling_sf1.REPLICAS * n0


def test_top15_subset_of_registry():
    """The curve times real registry queries — a renamed query must fail
    here, not silently drop out of the scaling evidence."""
    from redpanda_to_parquet_writer_spark.plans import QUERIES

    missing = [q for q in scaling_sf1.TOP15 if q not in QUERIES]
    assert not missing, missing
    assert len(scaling_sf1.TOP15) == 15

"""What AQE's skew-join rule actually covers — measured, not assumed.

The r12 skewed-key window sweep replaced content/term-keyed windows
with aggregates + join-backs. This module pins the EXACT mechanics of
the fallback story on this Spark version, because the obvious claim
("the join-back is AQE-skew-splittable") is only true for joins whose
BOTH children are Sort over a shuffle read:

  - POSITIVE: a canonical sort-merge join with a skewed probe side IS
    split by OptimizeSkewedJoin (SortMergeJoin(skew=true), the shuffle
    read shows `skewed`).
  - LIMITATION (documented + asserted so a Spark upgrade that lifts it
    becomes visible): when a join side is fed by an aggregate whose
    output distribution already satisfies the join keys, the aggregate
    sits INSIDE the join stage between the sort and the shuffle read —
    OptimizeSkewedJoin's pattern does not match and no split happens.
    An explicit repartition() cannot restore it either: its shuffle
    origin is REPARTITION_BY_COL, and the rule only touches
    ENSURE_REQUIREMENTS shuffles.

So the honest scale story for the sweep's agg-fed join-backs is: the
per-key STATS computation is skew-free (map-side partial combine —
the win over the removed windows), the stats side broadcasts in the
common case (runtime size-based, no probe shuffle at all), and in the
giant-stats SMJ case the hot probe partition is one sorted merge task
— bounded by the same per-key work the removed window did, with the
stats pass no longer inside it. See SCALING.md "skewed-key window
sweep".
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

#: aggressive thresholds so a ~20 MB hot partition counts as skewed on
#: the tiny test frames
_SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128KB",
}


@contextmanager
def _skew_confs(spark):
    old = {}
    for k, v in _SKEW_CONFS.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _hot_rows(spark):
    """200k copies of one key + a 20k uniform tail; the sha2 payload is
    high-entropy so shuffle compression cannot hide the hot partition's
    bytes (a constant-only hot key compresses below any threshold —
    and then AQE CORRECTLY declines to split it)."""
    hot = spark.range(200_000).select(
        F.lit("HOT").alias("k"),
        F.col("id").alias("doc_id"),
        F.sha2(F.col("id").cast("string"), 512).alias("payload"),
    )
    tail = spark.range(20_000).select(
        F.concat(F.lit("u"), F.col("id")).alias("k"),
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.sha2((F.col("id") + 7).cast("string"), 512).alias("payload"),
    )
    return hot.unionByName(tail)


def _final_plan(df) -> str:
    df.collect()
    return (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )


def test_canonical_smj_hot_probe_is_skew_split(spark):
    """Independent (non-aggregate) join sides: AQE splits the hot probe
    partition — the mechanism the sweep's fallback story rests on."""
    with _skew_confs(spark):
        rows = _hot_rows(spark)
        right = spark.range(30_000).select(
            F.when(F.col("id") < 1, F.lit("HOT"))
            .otherwise(F.concat(F.lit("u"), F.col("id")))
            .alias("k"),
            F.col("id").alias("v"),
        )
        joined = rows.join(right, "k").groupBy().agg(
            F.sum(F.length("payload")).alias("b")
        )
        plan = _final_plan(joined)
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        assert "skewed" in plan, plan


def test_agg_fed_join_side_blocks_the_skew_rule(spark):
    """The line-dedup-shaped join (stats side fed by an aggregate on
    the join key) is NOT split on this Spark version — the aggregate
    sits between the join's sort and the shuffle read, breaking
    OptimizeSkewedJoin's pattern. Asserted so a Spark upgrade lifting
    the limitation flips this test and the SCALING.md story can be
    upgraded with it."""
    with _skew_confs(spark):
        rows = _hot_rows(spark)
        stats = rows.groupBy("k").agg(F.min("doc_id").alias("first_doc"))
        joined = rows.join(stats, "k").groupBy().agg(
            F.sum(
                F.when(
                    F.col("doc_id") == F.col("first_doc"), F.length("payload")
                ).otherwise(0)
            ).alias("b")
        )
        plan = _final_plan(joined)
        assert "isFinalPlan=true" in plan
        # correctness unaffected; the limitation is about task shape
        assert "skew=true" not in plan, (
            "OptimizeSkewedJoin now splits agg-fed join sides — "
            "upgrade SCALING.md's skew story and drop this guard"
        )

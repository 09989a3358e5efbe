"""Deduplication operators.

Reference parity:
  - J1/J2 anti-join key dedup on ``(kafka_partition, kafka_offset)``
    (collector:741-758, 1003-1010) -> broadcast left-anti join.
  - D2 content-hash dedup keep-FIRST (reader:653-710): Polars
    ``unique(keep="first")`` depends on file row order; we sharpen it to a
    deterministic rule — keep the row with the smallest order key
    (offset order) — via a window ``row_number``.

Scale notes:
  - The anti-join's right side (already-persisted keys for one
    topic/date) is small relative to the batch -> broadcast hint avoids a
    shuffle of the big side entirely.
  - Content keep-first is a min_by AGGREGATE (r12): hash keys are
    uniform by construction, but list LENGTHS are not — the corpus's
    hottest exact duplicate is precisely what dedup removes, and a
    window partitioned by the hash would hold all its copies in one
    unsplittable task; partial min_by collapses them map-side instead.
  - `exact_dedup_min_key` is the keys-only groupBy formulation —
    cheaper still when only the surviving keys are needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redpanda_to_parquet_writer_spark.functions.hashing import content_columns, content_hash

DEDUP_KEY = ("kafka_partition", "kafka_offset")


def anti_join_dedup(
    new_df: DataFrame,
    existing_df: DataFrame,
    keys: tuple[str, ...] = DEDUP_KEY,
    broadcast_existing: bool = True,
) -> DataFrame:
    """Drop rows of `new_df` whose composite key already exists (J1/J2).

    Set difference by key as a left-anti equi-join; the existing key set
    is projected to the key columns only (column pruning, S7) and
    broadcast when the caller has established it is small (e.g. the
    date-pruned, size-gated merge path in `streaming/sink.py`). When the
    caller demotes (`broadcast_existing=False`) the join is pinned to
    sort-merge: Catalyst's stats-based auto-broadcast must not override
    an explicit too-big-to-broadcast decision — stats can underestimate,
    and a misjudged broadcast of a billion-key set OOMs every executor.
    """
    existing_keys = existing_df.select(*keys).dropDuplicates(list(keys))
    if broadcast_existing:
        existing_keys = F.broadcast(existing_keys)
    else:
        existing_keys = existing_keys.hint("merge")
    return new_df.join(existing_keys, on=list(keys), how="left_anti")


def content_dedup_keep_first(
    df: DataFrame,
    content_cols: list[str] | None = None,
    order_cols: tuple[str, ...] = DEDUP_KEY,
) -> DataFrame:
    """Content-hash dedup keeping the first row in `order_cols` order (D2).

    Hash all non-kafka columns (F4, reader:596-618), keep the row with the
    lowest (partition, offset) — a deterministic sharpening of Polars'
    row-order-dependent keep="first" (SURVEY 7.3 risk 3).

    Skew shape (r12): keep-first runs as a min_by AGGREGATE, not a
    row_number window — a window partitioned by content hash puts every
    copy of the corpus's hottest duplicate (the exact thing dedup
    exists to remove) in ONE unsplittable task, while the aggregate's
    map-side partial combine collapses hot hashes to one candidate row
    per map partition before the shuffle. The ordering struct encodes
    NULLS FIRST per order column ((0, null) sorts below (1, v)), so the
    selected row is bit-for-bit the one the old `orderBy(asc)` window
    picked, for any caller (ties in `order_cols` — impossible for the
    (partition, offset) default — were window-nondeterministic anyway).
    """
    hashed = df.withColumn("_content_hash", content_hash(df, content_cols))
    order_key = F.struct(
        *[
            f
            for c in order_cols
            for f in (
                F.when(F.col(c).isNotNull(), F.lit(1)).otherwise(F.lit(0)),
                F.col(c),
            )
        ]
    )
    first = F.min_by(
        F.struct(*[F.col(c) for c in df.columns]), order_key
    ).alias("__first")
    return hashed.groupBy("_content_hash").agg(first).select("__first.*")


def _ckpt_fresh_stats(df: DataFrame) -> DataFrame:
    """Materialize one iteration of a checkpoint loop with RESET stats.

    A bare per-round `localCheckpoint` truncates lineage but PRESERVES
    the child plan's Catalyst statistics in the resulting LogicalRDD —
    and a join's size estimate is the BigInt PRODUCT of its children's
    sizeInBytes. In an iterative loop that joins the checkpointed frame
    (worst: a self-join, which squares it), the stat's bit-length
    doubles every round, and round r's planning multiplies
    (2^r)-bit BigIntegers: profiled on the sf~1 fixture, the driver
    burned 50s of a 51s round inside BigInteger.multiplyToomCook3 by
    round 21, with every executor thread idle — exponential driver CPU
    on constant-size data (123s total; 18s after this fix; the gap is
    unbounded in round count, so at 100 TB depth it is a hang).

    Fix: persist -> count -> localCheckpoint -> unpersist. The count
    materializes the cache, so the checkpoint's stats come from the
    cached relation's REAL byte size instead of the compounded
    estimate; the checkpoint then owns the data and the cache slot is
    released immediately. Costs one extra in-memory copy of a
    vertex-sized frame per round.
    """
    cached = df.persist()
    cached.count()
    out = cached.localCheckpoint(eager=True)
    cached.unpersist()
    return out


def connected_components(
    vertices: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Resolve near-dup candidate PAIRS into clusters: min-label propagation.

    LSH/Jaccard stages emit candidate *pairs*; an actual dedup pipeline
    must then group pairs transitively (a~b, b~c => {a,b,c} is one
    cluster) and keep one canonical doc per cluster. This is connected
    components — not expressible as one SQL query, so it runs as a
    driver-controlled iteration of Spark joins:

      label(v) starts as v; each round, label(v) := min(label(v),
      min over neighbors u of label(u)), then POINTER-JUMPS:
      label(v) := min(label(v), label(label(v))); stop when stable.

    The neighbor step alone needs diameter-many rounds — measured
    insufficient on sf0.1's chained near-dup graph (22 vertices still
    mislabeled after 25 rounds). The pointer-jump halves the remaining
    label-chain depth every round, so convergence is O(log diameter)
    (the same doubling idea as Kiveris et al.'s "Connected Components
    in MapReduce" star rounds): 25 rounds cover diameter ~2^25.

    Scale notes:
      - Each round is two shuffle joins keyed on vertex id; the edge
        list (candidate pairs) is orders of magnitude smaller than the
        corpus.
      - Each round materializes ONCE through `_ckpt_fresh_stats` (the
        pointer-jumped labels), which both truncates lineage (the
        classic iterative-algorithm trap) AND resets Catalyst's size
        statistics — see its docstring for the exponential-driver-CPU
        failure a bare localCheckpoint loop has. The intermediate
        `propagated` frame is only persist+count'ed for its self-join
        (r11 fold — real cached stats, no second checkpoint copy).

    Returns (id_col, cluster_id) with one row per vertex; singletons keep
    cluster_id == their own id.
    """
    edges = pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)

    labels = vertices.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("cluster_id")
    ).localCheckpoint(eager=True)

    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["src"] == labels["id"])
            .groupBy("dst")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        # propagated is persist+count'ed, NOT checkpointed (r11 fold,
        # VERDICT r10 #6): the pointer-jump self-join below only needs
        # the frame cached with REAL stats — the count materializes the
        # cache so both join sides read it and Catalyst sees the cached
        # relation's byte size (no estimate compounding); lineage
        # truncation for the next round comes from new_labels'
        # checkpoint, so plans stay one round deep. One checkpoint copy
        # per round instead of two: measured bitwise-identical and
        # ~7% faster on the sf1 workload (scripts/profile_cc_fold.py).
        propagated = (
            labels.join(
                neighbor_min, labels["id"] == neighbor_min["dst"], "left"
            )
            .select(
                "id",
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_min", "cluster_id")
                ).alias("cluster_id"),
            )
            .persist()
        )
        propagated.count()
        # pointer jump: label(v) := min(label(v), label(label(v))) —
        # collapses label chains logarithmically instead of one hop/round
        parent = propagated.select(
            F.col("id").alias("p_id"), F.col("cluster_id").alias("p_cluster")
        )
        new_labels = _ckpt_fresh_stats(
            propagated.join(
                parent, propagated["cluster_id"] == parent["p_id"], "left"
            )
            .select(
                "id",
                F.least(
                    F.col("cluster_id"), F.coalesce("p_cluster", "cluster_id")
                ).alias("cluster_id"),
            )
        )
        propagated.unpersist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.cluster_id") < F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("id").alias(id_col), "cluster_id")


def exact_dedup_min_key(
    df: DataFrame, content_cols: list[str] | None = None, order_col: str = "kafka_offset"
) -> DataFrame:
    """Keys of surviving rows after exact-content dedup (groupBy form).

    Returns one row per distinct content with the minimal `order_col`.
    Cheaper than the window when downstream only needs the keys: the
    map-side partial min() collapses duplicates before the shuffle.
    """
    cols = content_cols or content_columns(df)
    return df.groupBy(*cols).agg(F.min(order_col).alias(order_col))


# --- Bloom-filter prefilter -------------------------------------------------
# The standard ingest-dedup accelerator: a fixed-size bit array over the
# seen-key set answers "definitely new" without touching the key table,
# so the exact anti-join only processes the (few) maybe-seen rows. Words
# are 63-bit so every mask and every OR stays a non-negative BIGINT in
# both Spark and DuckDB (the 48-bit-simhash portability rule); hashes
# are md5-derived — the oracle rebuilds the filter bit-for-bit.

BLOOM_WORD_BITS = 63
BLOOM_WORDS = 64  # 64 x 63 = 4032 bits
BLOOM_HASHES = 3


def _bloom_bit(key: Column | str, j: int, n_bits: int) -> Column:
    col = F.col(key) if isinstance(key, str) else key
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{j}:"), col)), 1, 8), 16, 10
        ).cast("long"),
        F.lit(n_bits),
    )


def bloom_build(
    keys: DataFrame,
    key_col: str,
    n_words: int = BLOOM_WORDS,
    word_bits: int = BLOOM_WORD_BITS,
    n_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """Fold a key set into a Bloom bit array: `n_words` rows of
    (word_idx, word) built by a bit_or aggregate — fixed size no matter
    how many keys, partial-aggregated map-side, ONE tiny result to
    broadcast at probe time."""
    n_bits = n_words * word_bits
    bits = keys.select(
        F.explode(
            F.array(
                *[_bloom_bit(key_col, j, n_bits).alias(f"b{j}") for j in range(n_hashes)]
            )
        ).alias("bit")
    )
    return (
        bits.select(
            F.expr(f"bit DIV {word_bits}").alias("word_idx"),
            F.expr(f"CAST(shiftleft(CAST(1 AS BIGINT), CAST(bit % {word_bits} AS INT)) AS BIGINT)").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("word"))
    )


def bloom_probe(
    probes: DataFrame,
    bloom: DataFrame,
    key_col: str,
    n_words: int = BLOOM_WORDS,
    word_bits: int = BLOOM_WORD_BITS,
    n_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """Membership test against a broadcast Bloom filter: a probe is
    `maybe_seen` iff ALL its hash bits are set (no false negatives —
    the guarantee the oracle gate enforces; false positives are the
    collision price the exact verify pays for). Adds `maybe_seen`
    boolean; probes never shuffle (the filter broadcasts)."""
    n_bits = n_words * word_bits
    hashed = probes.select(
        "*",
        F.explode(
            F.array(*[_bloom_bit(key_col, j, n_bits) for j in range(n_hashes)])
        ).alias("bit"),
    ).withColumn("word_idx", F.expr(f"bit DIV {word_bits}"))
    joined = hashed.join(F.broadcast(bloom), "word_idx", "left").withColumn(
        "hit",
        F.expr(
            f"CASE WHEN word IS NULL THEN 0"
            f" WHEN (word DIV CAST(shiftleft(CAST(1 AS BIGINT), CAST(bit % {word_bits} AS INT)) AS BIGINT)) % 2 = 1"
            f" THEN 1 ELSE 0 END"
        ),
    )
    group_cols = [c for c in probes.columns]
    # min(hit)==1 (not sum==n_hashes): duplicate probe rows collapse in
    # the groupBy, which would make sum(hit) a multiple of n_hashes and
    # turn seen keys into false negatives — min is duplicate-safe.
    return (
        joined.groupBy(*group_cols)
        .agg((F.min("hit") == F.lit(1)).alias("maybe_seen"))
    )

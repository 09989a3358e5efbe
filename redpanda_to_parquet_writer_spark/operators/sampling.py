"""Sampling / mixture-weighting operators for training-data curation.

Rebalancing a multi-source corpus to target mixture weights is a core
pre-training step (e.g. 60% web, 30% code, 10% books). `rebalance_sources`
computes per-source Bernoulli fractions from the actual source counts and
the target weights, then samples in one distributed pass (`sampleBy` —
no shuffle, rows are filtered map-side by a seeded hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mixture_fractions(
    counts: dict[str, int], weights: dict[str, float]
) -> dict[str, float]:
    """Per-source sampling fractions hitting `weights` proportions at the
    largest achievable total (the scarcest source relative to its target
    weight is kept whole; everything else downsamples).
    """
    total_w = sum(weights.values())
    if total_w <= 0:
        return {}
    shares = {s: w / total_w for s, w in weights.items()}
    feasible = [
        counts[s] / share
        for s, share in shares.items()
        if share > 0 and counts.get(s, 0) > 0
    ]
    if not feasible:
        # no weighted source present (e.g. empty input) -> empty sample,
        # not a ValueError that kills the job
        return {}
    feasible_total = min(feasible)
    return {
        s: min(1.0, shares[s] * feasible_total / counts[s])
        for s in shares
        if s in counts and counts[s] > 0
    }


def rebalance_sources(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Resample a corpus so sources land at `weights` proportions.

    Two passes: one count aggregation (tiny result to the driver — one
    row per source), then a map-side seeded Bernoulli filter. Sources
    absent from `weights` are dropped.
    """
    counts = {
        r[0]: r[1]
        for r in df.groupBy(source_col).count().collect()
    }
    fractions = mixture_fractions(counts, weights)
    return df.sampleBy(source_col, fractions, seed=seed)


#: contiguous id-range span for the two-level grouped prefix sum: the
#: within-bucket window holds at most this many ids' rows in one task,
#: and the per-group bucket-offset frame is data/span rows — at 1e13
#: rows and 2^20 span that is ~1e7 offset rows, one more 2-level step
#: away from any single-task bottleneck (not needed at realistic scale)
PREFIX_SPAN = 1 << 20


def _grouped_running_sum(
    rows: DataFrame, group_col: str, id_col: str, val_col: str
) -> DataFrame:
    """Exact per-group running sum of `val_col` in ascending `id_col`
    order, WITHOUT a per-group window (r11): a window partitioned by a
    low-cardinality group (source/domain/language) puts corpus/|groups|
    rows in ONE task at scale, and running sums were the last operators
    using that shape. Two-level decomposition instead:

      1. within-bucket running sum, window partitioned by
         (group, id DIV span) — task unit bounded by the id span;
      2. bucket offsets: per-(group, bucket) totals read off the
         WINDOWED frame itself — the last inclusive running sum in a
         bucket IS the bucket total (`max_by(__cum_in, id)`), so the
         totals branch shares the window-input exchange with the fact
         branch (ReusedExchange: ONE corpus scan, `val_col` — e.g. an
         expensive tokenize — evaluated once) — prefix-summed per
         group over the TINY bucket frame;
      3. cum = bucket_offset + within-bucket sum (integer adds — the
         regrouping cannot change a single bit).

    Appends `cum` (inclusive running sum) to the input columns.

    Ordering contract (ADVICE r12): running sums are only well-defined
    up to the order of rows that TIE on `id_col`. With unique ids per
    group the helper is exact for ANY integer `val_col`. With duplicate
    ids, the per-row `cum` among tied rows is order-dependent in any
    formulation (the window's tie order is not contractual), but the
    bucket totals — and therefore every LATER bucket's cum — stay exact
    for non-negative `val_col`: the tie on max-id rows breaks to the
    LARGEST inclusive sum (`max_by` on struct(id, __cum_in)), which
    equals the true bucket total when no tied row carries a negative
    value. Callers with duplicate ids AND negative values must
    de-duplicate ids first (e.g. pre-aggregate val per (group, id)).
    """
    w_in = (
        Window.partitionBy(group_col, "__b")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the explicit __b IS NOT NULL matches the constraint the inner
    # join infers on the fact branch — without it the two branches'
    # scan filters canonicalize differently and ReuseExchange can't
    # collapse them (null __b rows are join-dropped either way)
    bucketed = (
        rows.withColumn("__b", F.expr(f"{id_col} DIV {PREFIX_SPAN}"))
        .filter(F.col("__b").isNotNull())
        .withColumn("__cum_in", F.sum(val_col).over(w_in))
    )
    # max_by (not max): the total is the LAST inclusive sum in id
    # order, which equals max only for non-negative values — max_by is
    # sign-agnostic, keeping the helper exact for any integer val_col.
    # The ordering key is struct(id, __cum_in), not bare id (ADVICE
    # r12): with duplicate ids in one bucket a bare-id max_by resolves
    # the tie non-deterministically and can return a mid-tie partial
    # sum as the bucket total; the struct breaks the tie to the largest
    # inclusive sum, which IS the total whenever tied rows are
    # non-negative (see the ordering contract above).
    totals = bucketed.groupBy(group_col, "__b").agg(
        F.max_by(
            "__cum_in", F.struct(F.col(id_col), F.col("__cum_in"))
        ).alias("__tot")
    )
    offsets = totals.withColumn(
        "__off",
        F.coalesce(
            F.sum("__tot").over(
                Window.partitionBy(group_col)
                .orderBy(F.col("__b").asc())
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select(group_col, "__b", "__off")
    return (
        bucketed.join(offsets, [group_col, "__b"])
        .withColumn("cum", F.col("__off") + F.col("__cum_in"))
        .drop("__b", "__cum_in", "__off")
    )


def token_budget_cap(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    budget_tokens: int,
) -> DataFrame:
    """Cap each group (source/domain/language) at a token budget: keep
    documents in deterministic priority order (ascending id) while the
    group's running token total fits the budget — the mixture-capping
    step of a training-data pipeline ("at most N tokens of source X").

    The running sum rides the two-level grouped prefix sum
    (`_grouped_running_sum`, r11) — the task unit is an id-span bucket,
    never a whole (low-cardinality) source. Returns
    (group_col, id_col, n_tokens, cum_tokens).
    """
    from redpanda_to_parquet_writer_spark.operators.text import token_count

    rows = df.select(
        F.col(group_col),
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
    )
    return (
        _grouped_running_sum(rows, group_col, id_col, "n_tokens")
        .withColumnRenamed("cum", "cum_tokens")
        .filter(F.col("cum_tokens") <= budget_tokens)
        .select(group_col, id_col, "n_tokens", "cum_tokens")
    )


def sequence_pack(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    seq_tokens: int,
) -> DataFrame:
    """Greedy sequential sequence packing: concatenate documents (in
    deterministic id order per group) into fixed-size training sequences
    of `seq_tokens`, assigning each doc the sequence it STARTS in —
    seq_id = (cum_tokens_before_doc) DIV seq_tokens. The packing step of
    a pretraining tokenization pipeline ("pack docs into 4k-token
    rows"), minus the tokenizer itself.

    Same shape as `token_budget_cap`: the running sum rides the
    two-level grouped prefix sum (`_grouped_running_sum`, r11), so the
    task unit is an id-span bucket, never a whole source. Docs longer
    than `seq_tokens` simply span sequences (greedy packing does not
    split or reorder). Returns (group_col, id_col, n_tokens, seq_id,
    seq_offset) where seq_offset is the doc's token offset within its
    sequence.
    """
    from redpanda_to_parquet_writer_spark.operators.text import token_count

    rows = df.select(
        F.col(group_col),
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
    )
    with_cum = _grouped_running_sum(rows, group_col, id_col, "n_tokens").withColumn(
        "__start", F.col("cum") - F.col("n_tokens")
    )
    return with_cum.select(
        group_col,
        id_col,
        "n_tokens",
        F.expr(f"__start DIV {int(seq_tokens)}").alias("seq_id"),
        F.expr(f"__start % {int(seq_tokens)}").alias("seq_offset"),
    )


def temperature_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    buckets: int = 1_000_000,
) -> DataFrame:
    """α=0.5 temperature sampling over a skewed grouping column — the
    multilingual rebalancer (kept count per group ∝ n_g^α, so dominant
    languages/sources are downweighted and the tail is boosted relative
    to its natural share; cf. the sampling-temperature scheme of
    multilingual pretraining, e.g. XLM-R).

    Per-group keep rate r_g = sqrt(n_min / n_g) (the smallest group is
    kept whole). The Bernoulli trial is the deterministic md5(id)
    bucket in [0, buckets), kept iff bucket/buckets < r_g — evaluated
    as the EXACT integer predicate

        bucket^2 * n_g < buckets^2 * n_min

    (decimal(38,0) arithmetic, no sqrt, no float threshold), so the
    sample is reproducible across runs, partitionings, and engines,
    and the oracle replays it bitwise.

    Scale shape: group counts are one map-side-combined aggregate over
    the grouping column only; the tiny (n_groups)-row frame broadcasts
    back with the global min attached; the trial itself is a narrow
    per-row expression. One scan, zero wide exchanges on the corpus.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("n_group"))
    # global min via a window over the (n_groups)-row counts frame — a
    # separate .agg() branch would recompute the aggregate subtree and
    # scan the corpus a second time; the single-partition exchange is
    # fine because counts is provably tiny (one row per group)
    rates = counts.withColumn(
        "n_min", F.min("n_group").over(Window.partitionBy())
    )
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("long"),
        F.lit(buckets),
    )
    dec = "decimal(38,0)"
    keep = (
        bucket.cast(dec) * bucket.cast(dec) * F.col("n_group").cast(dec)
        < F.lit(buckets).cast(dec) * F.lit(buckets).cast(dec) * F.col("n_min").cast(dec)
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .withColumn("bucket", bucket)
        .filter(keep)
        .select(F.col(id_col), F.col(group_col), "n_group", "n_min", "bucket")
    )

"""Sampling / mixture-weighting operators for training-data curation.

Rebalancing a multi-source corpus to target mixture weights is a core
pre-training step (e.g. 60% web, 30% code, 10% books). `rebalance_sources`
computes per-source Bernoulli fractions from the actual source counts and
the target weights, then samples in one distributed pass (`sampleBy` —
no shuffle, rows are filtered map-side by a seeded hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


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

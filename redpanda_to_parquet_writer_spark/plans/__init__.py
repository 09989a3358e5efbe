"""Named query plans + DuckDB oracle SQL.

Each plan module exposes `QUERIES: dict[str, (spark, sf_dir) -> DataFrame]`
and `ORACLES: dict[str, str]` (ANSI SQL DuckDB can run on the same parquet
tables). Column names/aliases match exactly between the two — the driver
sorts columns by name and hash-compares values.

Floating-point convention: any column produced by arithmetic/aggregation
is `round()`ed to a fixed scale on BOTH sides, so double summation-order
differences between engines can't flip the hash. Columns that merely copy
stored values stay exact.
"""

from redpanda_to_parquet_writer_spark.plans import (
    curation_pipeline,
    multimodal_queries,
    relational,
    relational2,
    relational3,
    streaming_queries,
    text_queries,
    vector_queries,
)

_MERGED_QUERIES = {
    **relational.QUERIES,
    **relational2.QUERIES,
    **relational3.QUERIES,
    **streaming_queries.QUERIES,
    **text_queries.QUERIES,
    **vector_queries.QUERIES,
    **multimodal_queries.QUERIES,
    **curation_pipeline.QUERIES,
}

# Registry order matters: the driver's correctness gate truncates at 50
# queries in iteration order. Put the least-verified queries first —
# never driver-tested, then previously-red, then verified only once —
# so every query accumulates a green driver row across rounds. Queries
# absent from this list keep merge order and land at the tail (they are
# the multiply-verified ones).
_PRIORITY = [
    # never driver-tested through round 3
    "embeddings_label_centroids",
    "ann_ivf_topk",
    "embeddings_neardup_pairs",
    "embeddings_semdedup_keep",
    "embeddings_norm_stats",
    "multimodal_byte_stats",
    "curation_pipeline",
    # new this round
    "multimodal_wav_roundtrip",
    "multimodal_image_resize",
    "multimodal_frame_sample",
    "streaming_hourly_event_stats",
    "nation_volume_shipping",
    "nation_market_share",
    "supplier_part_variety",
    "events_funnel_conversion",
    "events_weekly_cohorts",
    "embeddings_lsh_neardup_pairs",
    "sole_late_supplier",
    "customer_order_distribution",
    "docs_simhash_neardup_pairs",
    "docs_incremental_neardup_filter",
    # red (ERR or hash-mismatch) in round 3 — re-verify the fixes
    "json_extract_props",
    "date_partition_counts",
    "hourly_event_stats",
    "events_sessionization",
    "clicks_asof_purchases",
    "purchase_attribution_window",
    "inter_event_gap_stats",
    "priority_shipping_stats",
    "docs_token_budget_cap",
    "docs_sequence_pack",
    # driver-green in rounds 2-3 only (never in round 1's window)
    "order_priority_counts",
    "small_quantity_revenue",
    "discounted_brand_revenue",
    "large_order_customers",
    "customer_balance_quartiles",
    "events_value_histogram",
    "sink_reconciliation",
    "top_event_type_per_user",
    "promo_revenue_pct",
    "top_revenue_supplier",
    "rich_inactive_customers",
    "docs_repetition_stats",
    # driver-green in round 1 only
    "docs_token_stats",
    "docs_stopword_stats",
    "docs_language_id",
    "docs_minhash_lsh_pairs",
    "docs_jaccard_pairs",
    "docs_simhash",
    "docs_fingerprint",
    "docs_chunked",
    "docs_redacted",
    "docs_train_split",
    "docs_dedup_clusters",
    "docs_decontaminate",
    "docs_top_ngrams",
    "docs_stratified_sample",
    "docs_tfidf_top_terms",
    "ann_cosine_topk",
]


def _ordered(merged: dict) -> dict:
    head = {n: merged[n] for n in _PRIORITY if n in merged}
    tail = {n: v for n, v in merged.items() if n not in head}
    return {**head, **tail}


QUERIES = _ordered(_MERGED_QUERIES)

ORACLES = _ordered(
    {
        **relational.ORACLES,
        **relational2.ORACLES,
        **relational3.ORACLES,
        **streaming_queries.ORACLES,
        **text_queries.ORACLES,
        **vector_queries.ORACLES,
        **multimodal_queries.ORACLES,
        **curation_pipeline.ORACLES,
    }
)

__all__ = ["QUERIES", "ORACLES"]

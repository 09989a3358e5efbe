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
    relational4,
    relational5,
    streaming_queries,
    text_queries,
    vector_queries,
)

_MERGED_QUERIES = {
    **relational.QUERIES,
    **relational2.QUERIES,
    **relational3.QUERIES,
    **relational4.QUERIES,
    **relational5.QUERIES,
    **streaming_queries.QUERIES,
    **text_queries.QUERIES,
    **vector_queries.QUERIES,
    **multimodal_queries.QUERIES,
    **curation_pipeline.QUERIES,
}

# Registry order matters: the driver's correctness gate truncates at 50
# queries in iteration order. Put the least-verified queries first —
# new/changed this round, then the stalest (queries whose last green
# driver row is oldest) — so every query accumulates a green driver row
# across rounds. Queries absent from this list keep merge order and land
# at the tail (they are the most-recently-verified ones: the whole r4
# window was green).
_PRIORITY = [
    # --- new or implementation-changed in round 6 (anything whose
    # implementation, shared operator code, or oracle changed goes to
    # the top of the window) ---
    "events_user_resample_sql",  # new: JVM resample twin
    "multimodal_png_rgb_decode",  # new: truecolor PNG codec
    "multimodal_jpeg_color_roundtrip",  # new: color (YCbCr 4:2:0) JPEG codec
    "multimodal_mjpeg_frame_decode",  # new: MJPEG split/sample/decode video path
    "multimodal_avi_mjpg_decode",  # new: AVI container probe/demux/decode
    "ann_ivfadc_indexed_topk",  # new: persisted IVFADC serving index
    "docs_bloom_prefilter",  # min(hit) aggregate fix (impl + oracle)
    "parts_triangle_count",  # persisted + operator extraction
    "events_user_resample",  # resample_locf key-type derivation
    "ann_ivf_topk",  # broadcast probe hint in shared verify tail
    "ann_ivf_indexed_topk",  # probe persist + distinct-id collect
    "ann_ivfadc_topk",  # shares _verify_and_rank_topk
    "ann_recall_audit",  # consumes ivf_topk
    "multimodal_jpeg_roundtrip",  # DCT einsum batching can shift entropy bytes
    "multimodal_wav_roundtrip",  # RIFF sniff now disambiguates wav/avi (oracle changed)
    # (multimodal_png_decode / msgpack queries also had internal
    # refactors this round, but their outputs are provably unchanged —
    # bitwise-verified locally — and r5-green, so they stay in the
    # tail to keep every r1/r3-stale row inside the 50-query window)
    # --- stale: last driver-green in round 1 (VERDICT r5 #1) ---
    "docs_redacted",
    "docs_train_split",
    "docs_dedup_clusters",
    "docs_decontaminate",
    "docs_top_ngrams",
    "docs_stratified_sample",
    "docs_tfidf_top_terms",
    "ann_cosine_topk",
    # --- stale: last driver-green in round 3 (VERDICT r5 #1) ---
    "topk_events_by_type",
    "events_locf_gap_fill",
    "offset_recovery",
    "partition_counts",
    "distinct_event_types",
    "null_counts_events",
    "dedup_anti_join",
    "dedup_content_keep_first",
    "union_dedup_count",
    "pricing_summary",
    "revenue_by_region",
    "shipping_priority",
    "top_brands_by_revenue",
    "returned_item_revenue",
    "global_stats_lineitem",
    "local_supplier_volume",
    "running_max_value",
    "events_rollup",
    "events_cube",
    "events_pivot",
    "events_except_intersect",
    "distinct_users_by_type",
    "offset_gap_check",
    "top_parts_per_brand",
    "docs_exact_dedup",
    "docs_quality_score",
    "docs_bpe_token_stats",
    # --- last driver-green in round 4, oldest first (fill the window;
    # everything below position 50 keeps accumulating age until a
    # later round rotates it in) ---
    "docs_token_stats",
    "docs_stopword_stats",
    "docs_language_id",
    "docs_minhash_lsh_pairs",
    "docs_jaccard_pairs",
    "docs_simhash",
    "docs_fingerprint",
    "json_extract_props",
    "date_partition_counts",
    "hourly_event_stats",
    "events_sessionization",
    "clicks_asof_purchases",
    "purchase_attribution_window",
    "sole_late_supplier",
    "customer_order_distribution",
    "order_priority_counts",
    "small_quantity_revenue",
    "discounted_brand_revenue",
    "large_order_customers",
    "customer_balance_quartiles",
    "events_value_histogram",
    "inter_event_gap_stats",
    "sink_reconciliation",
    "top_event_type_per_user",
    "priority_shipping_stats",
    "promo_revenue_pct",
    "top_revenue_supplier",
    "rich_inactive_customers",
    "nation_volume_shipping",
    "nation_market_share",
    "supplier_part_variety",
    "events_funnel_conversion",
    "events_weekly_cohorts",
    "streaming_hourly_event_stats",
    "docs_repetition_stats",
    "docs_token_budget_cap",
    "docs_sequence_pack",
    "docs_simhash_neardup_pairs",
    "docs_incremental_neardup_filter",
    "embeddings_label_centroids",
    "embeddings_neardup_pairs",
    "embeddings_lsh_neardup_pairs",
    "embeddings_semdedup_keep",
    "embeddings_norm_stats",
    "multimodal_byte_stats",
    "multimodal_image_resize",
    "multimodal_frame_sample",
    "curation_pipeline",
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
        **relational4.ORACLES,
        **relational5.ORACLES,
        **streaming_queries.ORACLES,
        **text_queries.ORACLES,
        **vector_queries.ORACLES,
        **multimodal_queries.ORACLES,
        **curation_pipeline.ORACLES,
    }
)

__all__ = ["QUERIES", "ORACLES"]

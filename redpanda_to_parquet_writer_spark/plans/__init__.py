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
    # --- NEW in round 7 whose VERDICT r6 "Done =" criteria require a
    # green CORRECTNESS_r07 driver row (#2 recall audit, #3 cap audit,
    # #7 palette decode, #8 color AVI); the other new-in-r7 queries sit
    # just past the 50-row boundary below.
    # Queries whose shared operator code changed this round but whose
    # outputs were bitwise-verified unchanged (scripts/bitcheck.py) stay
    # in the tail, per the r6 precedent: ann_ivf_indexed_topk /
    # ann_ivfadc_indexed_topk (probe localCheckpoint),
    # parts_triangle_count (counting-helper extraction),
    # multimodal_png_decode / _png_rgb_decode (decoder color-type
    # extension), multimodal_mjpeg_frame_decode / _avi_mjpg_decode
    # (sampler on_error plumbing) — all r6-green. ---
    "ann_ivfadc_recall_audit",
    "parts_triangle_cap_audit",
    "multimodal_png_palette_decode",
    "multimodal_avi_color_decode",
    # --- stale: last driver-green in round 4, the whole cohort
    # (VERDICT r6 #1: lead with these; 46 of 48 fit the 50-row window
    # behind the 4 new queries — the 2 overflow rows below the window
    # boundary are the ones whose code paths have the freshest sibling
    # coverage, and they lead round 8) ---
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
    "multimodal_image_resize",
    "multimodal_frame_sample",
    "curation_pipeline",
    # ---- 50-query window boundary (4 + 46 above) ----
    # These lead round 8's window: the two r4-cohort overflow rows
    # (their code paths have the freshest sibling coverage — the
    # hourly twin is in the window, byte stats' multimodal siblings are
    # r6/r7-green), then the TWELVE new round-7 queries deliberately
    # held OUT of this round's driver window to protect the stale
    # rotation (every one is bitcheck-verified against its oracle —
    # the six latest at sf0.1 too — and green in the local sweep;
    # VERDICT r6 #1 prioritized re-verifying the 48 stale rows over
    # driver rows for new queries; only the four queries whose verdict
    # "Done =" criteria name a green CORRECTNESS_r07 row stay in).
    "streaming_hourly_event_stats",
    "multimodal_byte_stats",
    "docs_bm25_topk",
    "docs_hybrid_rrf_topk",
    "docs_dup_ngram_fraction",
    "docs_lang_temperature_sample",
    "embeddings_kmeans_assign",
    "multimodal_png_interlaced_decode",
    "ann_ivf_append_topk",
    "multimodal_jpeg_progressive_decode",
    "multimodal_jpeg_progressive_color",
    "multimodal_tiff_roundtrip",
    "multimodal_webp_roundtrip",
    "streaming_media_ingest",
    # --- last driver-green in round 5, in their r5 window order (they
    # age next; round 8 rotates them in behind the two rows above) ---
    "numeric_profile_events",
    "cheapest_supplier_per_part",
    "nation_part_profit",
    "important_suppliers",
    "heavy_part_suppliers",
    "events_value_median_by_type",
    "events_sliding_hour_counts",
    "events_salted_type_join",
    "bucketed_revenue_join",
    "events_value_trend_by_type",
    "events_anomaly_zscore",
    "parts_co_occurrence",
    "events_sketch_audit",
    "events_value_percentile",
    "orders_open_backlog",
    "msgpack_roundtrip_decode",
    "events_transition_matrix",
    "events_contract_violations",
    "events_zorder_key",
    "events_value_winsorized_stats",
    "forecast_revenue_change",
    "streaming_msgpack_ingest",
    "streaming_session_stats",
    "streaming_sliding_event_stats",
    "streaming_offset_gaps",
    "streaming_interval_join",
    "streaming_dedup_keys",
    "streaming_static_enrichment",
    "docs_line_dedup",
    "docs_chunked",
    "docs_unigram_logprob",
    "docs_containment_pairs",
    "docs_normalized_dedup",
    "docs_countmin_heavy_hitters",
    "docs_edit_distance_pairs",
    "ann_pq_adc_topk",
    "embeddings_random_projection",
    "multimodal_png_decode",
    "multimodal_mp4_probe",
    "multimodal_gif_roundtrip",
    "multimodal_jpeg_probe",
    "curation_pipeline_v2",
    # (everything absent from this list is the round-6-green cohort —
    # the youngest rows — and keeps merge order at the very tail)
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

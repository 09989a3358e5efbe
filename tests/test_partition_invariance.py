"""Results must not depend on the physical partitioning.

On a 1000-executor cluster the shuffle partition count, input split
layout, and per-partition row order all differ run to run; any operator
whose OUTPUT depends on them (an un-tie-broken window, order-sensitive
use of collect_list, first() without a frame) is silently
nondeterministic at scale even though a single local run looks fine.

This suite replays the nondeterminism-prone queries under two very
different `spark.sql.shuffle.partitions` settings (a runtime conf, so no
session restart) plus a pre-shuffled input and asserts bit-identical
result sets. Deterministic-under-repartition is what lets the oracle
hash gate (and any production backfill) be reproducible.
"""

from __future__ import annotations

import pytest

from redpanda_to_parquet_writer_spark.plans import QUERIES

# queries whose implementations lean on the order-sensitive primitives:
# window keep-first (dedup), collect_list pair enumeration (simhash/LSH),
# running-sum packing, hash-bucket sampling, session windows
PRONE = [
    "dedup_content_keep_first",
    "docs_simhash_neardup_pairs",
    "docs_incremental_neardup_filter",
    "embeddings_lsh_neardup_pairs",
    "docs_sequence_pack",
    "docs_stratified_sample",
    "events_sessionization",
    "top_event_type_per_user",
    # r5 additions: collect_set pair enumeration, argmin-struct PQ codes
    # + decimal ADC sums, rank-selected winsorization cuts
    "parts_co_occurrence",
    "ann_pq_adc_topk",
    "events_value_winsorized_stats",
]


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(repr(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", PRONE)
def test_result_invariant_under_shuffle_partitioning(name, spark, sf_dir):
    original = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        narrow = _rows(QUERIES[name](spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        wide = _rows(QUERIES[name](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
    assert narrow == wide, f"{name}: result depends on shuffle partition count"

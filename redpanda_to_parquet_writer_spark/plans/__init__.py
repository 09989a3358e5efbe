"""Named query plans + DuckDB oracle SQL.

Each plan module exposes `QUERIES: dict[str, (spark, sf_dir) -> DataFrame]`
and `ORACLES: dict[str, str]` (ANSI SQL DuckDB can run on the same parquet
tables). Column names/aliases match exactly between the two — the driver
sorts columns by name and hash-compares values.

Floating-point convention: any column produced by arithmetic/aggregation
is `round()`ed to a fixed scale on BOTH sides, so double summation-order
differences between engines can't flip the hash. Columns that merely copy
stored values stay exact.

Driver-window rotation (VERDICT r7 #1/#8)
-----------------------------------------
The driver's correctness gate runs the FIRST 50 registry queries per
round, in iteration order. Rather than hand-maintaining a priority list
(the r5-r7 approach, which the r7 verdict flagged as structural debt),
the registry now orders itself STALEST-FIRST from the committed evidence:
`_staleness_order` reads every `CORRECTNESS_r*.json` at the repo root and
sorts queries by (round of last fully-green driver row, position within
that round's window). Consequences, by construction:

  - a query that has NEVER had a green driver row (new this round, or
    red last time it ran) sorts to the very front and stays there until
    it goes green;
  - green queries rotate in cohorts of 50: the cohort verified in round
    N re-enters the window together once every younger cohort has had
    its turn, so with R registry queries and a 50-row window, max
    a row re-verifies at worst every ceil(R/50)-th round — the
    mathematical floor for this window size (R=150 -> every 3rd round,
    i.e. a green row is never more than 2 rounds stale — the r7 #8
    "Done" criterion);
  - the schedule needs no edits when queries are added: they are born
    never-covered and lead the next window automatically.

Registry growth is FROZEN except for verdict-mandated additions (r7 #8):
round 8 adds exactly the two queries the r7 verdict required
(`ann_ivfadc_compact_topk`, `ann_kmeans_recall_audit`) and nothing else.

r8 consolidation (the OTHER half of r7 #8 — "consolidate near-duplicate
gated rows"): eight rows that shared a codec path or were one SURVEY
capability split in two are merged into six, bringing the registry to
150 and the driver cycle back to 3 rounds. Each merged query unions (or
chains) the UNCHANGED per-variant plan builders, so no codec path lost
its oracle branch:

  multimodal_png_roundtrip           <- png_decode + png_rgb_decode +
                                        png_palette_decode + png_interlaced_decode
  multimodal_jpeg_baseline_roundtrip <- jpeg_roundtrip + jpeg_color_roundtrip
  multimodal_jpeg_progressive_roundtrip <- jpeg_progressive_decode +
                                           jpeg_progressive_color
  multimodal_avi_decode              <- avi_mjpg_decode + avi_color_decode
  multimodal_container_probe         <- jpeg_probe + mp4_probe
  docs_tokenizer_stats               <- docs_token_stats + docs_bpe_token_stats

The merged names are born never-covered, so they lead the round-8 window
and the consolidated codec paths re-verify under the driver gate
immediately (this also covers the r7-verdict-named driver-debt rows
`multimodal_png_interlaced_decode` / `multimodal_jpeg_progressive_decode`
/ `multimodal_jpeg_progressive_color`, whose codec paths now ride in
their merged successors).
"""

from __future__ import annotations

import glob
import json
import os
import re

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

#: Tie-break among never-covered queries: names listed here lead, in this
#: order (the queries the current round's verdict most wants verified);
#: unlisted never-covered queries follow alphabetically. Everything
#: covered sorts strictly after, by staleness.
_NEVER_COVERED_ORDER = [
    # the new-in-r7 queries the r7 driver window deliberately held out
    "docs_bm25_topk",
    "docs_hybrid_rrf_topk",
    "docs_dup_ngram_fraction",
    "docs_lang_temperature_sample",
    "embeddings_kmeans_assign",
    "ann_ivf_append_topk",
    "multimodal_tiff_roundtrip",
    "multimodal_webp_roundtrip",
    "streaming_media_ingest",
    # new in r8 (verdict-mandated: r7 #4 and #5)
    "ann_ivfadc_compact_topk",
    "ann_kmeans_recall_audit",
    # r8 consolidation successors (see module docstring) — these carry
    # the codec paths of the merged-away r7 driver-debt rows
    "multimodal_jpeg_progressive_roundtrip",
    "multimodal_png_roundtrip",
    "multimodal_jpeg_baseline_roundtrip",
    "multimodal_avi_decode",
    "multimodal_container_probe",
    "docs_tokenizer_stats",
]


def _green(row: dict) -> bool:
    """A driver row counts as coverage only if it fully passed: row count,
    schema AND value hash. A red/partial row leaves the query at the
    front of the next window."""
    return (
        row.get("rows_match") is True
        and row.get("schema_match") is True
        and row.get("hash_match") is True
        and not row.get("err")
    )


def _last_green() -> dict[str, tuple[int, int]]:
    """name -> (round, index-within-that-round's-window) of the most
    recent fully-green driver row, from the committed CORRECTNESS
    artifacts at the repo root."""
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    last: dict[str, tuple[int, int]] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r0*(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue  # unreadable artifact: skip, never break the registry
        if not isinstance(rows, dict):
            continue
        for idx, (name, row) in enumerate(rows.items()):
            if isinstance(row, dict) and _green(row):
                prev = last.get(name)
                if prev is None or rnd > prev[0]:
                    last[name] = (rnd, idx)
    return last


def _staleness_order(names) -> list[str]:
    last = _last_green()
    head_rank = {n: i for i, n in enumerate(_NEVER_COVERED_ORDER)}

    def key(n: str):
        rnd, idx = last.get(n, (0, 0))
        if rnd == 0:
            return (0, head_rank.get(n, len(head_rank)), 0, n)
        return (rnd, len(head_rank), idx, n)

    return sorted(names, key=key)


def _ordered(merged: dict) -> dict:
    return {n: merged[n] for n in _staleness_order(merged)}


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

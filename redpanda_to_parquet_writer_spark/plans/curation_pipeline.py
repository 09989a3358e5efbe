"""End-to-end corpus-curation pipeline: the composition a training-data
user actually runs, as ONE lazy DataFrame plan.

    exact dedup (keep-first)  ->  quality gate  ->  chunking

Each stage is an operator from `operators.text`; composing them stays a
single Catalyst plan — the dedup shuffle, the quality projection, and
the chunk explode pipeline into each other with no materialization
between stages. The DuckDB oracle replays the whole composition, so the
end-to-end result (not just each piece) is hash-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redpanda_to_parquet_writer_spark.operators import text as T
from redpanda_to_parquet_writer_spark.plans.text_queries import (
    CHUNK_OVERLAP,
    CHUNK_TOKENS,
    QUALITY_EXPR_SQL,
    chunk_sql_tail,
)
from redpanda_to_parquet_writer_spark.sources.parquet import load_table

QUALITY_THRESHOLD = 0.5


def curate_corpus(
    spark: SparkSession,
    sf_dir: str,
    quality_threshold: float = QUALITY_THRESHOLD,
    chunk_tokens: int = CHUNK_TOKENS,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    survivors = T.exact_dedup_hash(docs, "text", "doc_id").select("doc_id")
    deduped = docs.join(survivors, on="doc_id")  # keep-first unique texts
    quality = T.quality_score(docs, "text", "doc_id", keep_threshold=quality_threshold)
    kept = deduped.join(quality.filter(F.col("keep")).select("doc_id"), on="doc_id")
    return T.chunk_documents(kept, "text", "doc_id", chunk_tokens, overlap)


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curate_corpus(spark, sf_dir)


QUERIES = {"curation_pipeline": curation_pipeline}

# The quality expression and chunking SQL are imported from text_queries
# (single source of truth) so the composed oracle can't drift from the
# standalone docs_quality_score / docs_chunked definitions.
ORACLES = {
    "curation_pipeline": f"""
        WITH survivors AS (
          SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        ),
        quality AS (
          SELECT doc_id, {QUALITY_EXPR_SQL} AS q
          FROM (
            SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks
            FROM documents
          )
        ),
        kept AS (
          SELECT d.doc_id, string_split_regex(trim(d.text), '\\s+') AS t
          FROM documents d
          JOIN survivors s USING (doc_id)
          JOIN quality q USING (doc_id)
          WHERE q.q >= {QUALITY_THRESHOLD}
        ),
        {chunk_sql_tail('kept')}
    """,
}


LOGPROB_FLOOR = -3.41


def curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 composition, again as ONE Catalyst plan: normalize-then-
    hash dedup (case/punct-invariant canonical per group) -> corpus-LM
    quality gate (avg unigram log-prob above a floor set at roughly the
    corpus 10th percentile — the gate SELECTS, it is not vacuous). The
    survivor
    set with its scores — the first two passes of a modern curation
    stack, end-to-end hash-verified (the LM statistics are computed over
    the FULL corpus, then the gate applies to dedup survivors: dedup
    must not change what the LM sees, matching how corpus statistics
    are computed in practice before filtering).
    """
    docs = load_table(spark, sf_dir, "documents")
    canon = T.normalized_fingerprint(docs, "text", "doc_id").filter(
        F.col("doc_id") == F.col("canonical_id")
    )
    scored = T.unigram_logprob(docs, "text", "doc_id")
    return (
        canon.select("doc_id", "n_variants")
        .join(scored, "doc_id")
        .filter(F.col("avg_logprob") >= LOGPROB_FLOOR)
        .select("doc_id", "n_variants", "n_tokens", "avg_logprob")
    )


QUERIES["curation_pipeline_v2"] = curation_pipeline_v2

from redpanda_to_parquet_writer_spark.plans.text_queries import (  # noqa: E402
    ORACLES as _TEXT_ORACLES,
)

ORACLES["curation_pipeline_v2"] = f"""
    WITH norm AS ({_TEXT_ORACLES["docs_normalized_dedup"]}),
    lm AS ({_TEXT_ORACLES["docs_unigram_logprob"]})
    SELECT n.doc_id, n.n_variants, lm.n_tokens, lm.avg_logprob
    FROM norm n JOIN lm USING (doc_id)
    WHERE n.doc_id = n.canonical_id AND lm.avg_logprob >= {LOGPROB_FLOOR}
"""

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
from redpanda_to_parquet_writer_spark.sources.parquet import load_table

QUALITY_THRESHOLD = 0.5
CHUNK_TOKENS = 16
CHUNK_OVERLAP = 4


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

_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP

ORACLES = {
    "curation_pipeline": f"""
        WITH survivors AS (
          SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        ),
        quality AS (
          SELECT doc_id,
                 round(
                   0.25 * least(CAST(len(toks) AS DOUBLE) / 64.0, 1.0)
                 + 0.25 * least((CAST(len(list_filter(toks, x -> x IN ('the', 'a')))
                       AS DOUBLE) / len(toks)) / 0.04, 1.0)
                 + 0.25 * CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g'))
                       AS DOUBLE) / length(text)
                 + 0.25 * CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6
                 ) AS q
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
        counted AS (
          SELECT doc_id, t,
                 greatest(
                   CAST(ceil(CAST(len(t) - {CHUNK_OVERLAP} AS DOUBLE) / {_STRIDE}) AS INT),
                   1
                 ) AS n_chunks
          FROM kept
        ),
        expanded AS (
          SELECT doc_id, t, CAST(cid AS INT) AS chunk_id
          FROM counted, LATERAL unnest(generate_series(0, n_chunks - 1)) u(cid)
        )
        SELECT doc_id, chunk_id,
               array_to_string(
                 t[chunk_id * {_STRIDE} + 1 : chunk_id * {_STRIDE} + {CHUNK_TOKENS}], ' '
               ) AS chunk_text,
               len(t[chunk_id * {_STRIDE} + 1 : chunk_id * {_STRIDE} + {CHUNK_TOKENS}])
                 AS chunk_tokens
        FROM expanded
    """,
}

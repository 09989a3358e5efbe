"""Text / document-curation plans over the `documents` table, paired with
DuckDB oracles.

These are the training-data-pipeline operators (exact dedup, MinHash-LSH,
n-gram Jaccard, SimHash, token/quality stats, language-ID) expressed as
portable deterministic pipelines: every hash is md5-based so the DuckDB
oracle reproduces Spark's results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redpanda_to_parquet_writer_spark.operators import text as T
from redpanda_to_parquet_writer_spark.sources.parquet import load_table

NGRAM_N = 3
NUM_HASHES = 12
BAND_SIZE = 3
JACCARD_THRESHOLD = 0.4


def docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return T.exact_dedup_hash(docs, "text", "doc_id")


LINE_TOKENS = 10


def docs_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-corpus line dedup stats: fixed 10-token lines, a
    line survives only at its first (doc_id, line_idx) occurrence —
    duplicate-line counts per document (operators/text.py:
    line_dedup_stats). The sub-document dedup granularity the whole-doc
    exact/LSH paths don't cover."""
    docs = load_table(spark, sf_dir, "documents")
    return T.line_dedup_stats(docs, "text", "doc_id", LINE_TOKENS)


def docs_tokenizer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace AND BPE-ish-regex token counting in one narrow scan
    (r8 consolidation, VERDICT r7 #8 — replaces the former
    `docs_token_stats` + `docs_bpe_token_stats` registry rows; SURVEY
    lists 'token counting (whitespace + a BPE-ish regex)' as ONE
    capability and this row now gates it as one operator)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.tokenizer_stats(docs, "text", "doc_id")


def docs_stopword_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return T.stopword_stats(docs, "text", "doc_id")


def docs_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return T.language_id(docs, "text", "doc_id")


def docs_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    grams = T.with_ngrams(docs, "text", NGRAM_N)
    sig = T.minhash_signature(grams, "doc_id", "ngrams", NUM_HASHES)
    return T.lsh_candidate_pairs(sig, "doc_id", NUM_HASHES, BAND_SIZE)


def docs_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    grams = T.with_ngrams(docs, "text", NGRAM_N)
    return T.jaccard_pairs(grams, "doc_id", "ngrams", JACCARD_THRESHOLD)


SIMHASH_BITS = 48  # BIGINT-safe analogue of the standard 64-bit fingerprint


def docs_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return T.simhash_fingerprint(docs, "text", "doc_id", bits=SIMHASH_BITS)


SIMHASH_MAX_HAMMING = 3


def docs_simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via 12-bit-band bucketing + exact Hamming
    verify. Recall vs the quadratic oracle is 1 BY CONSTRUCTION
    (pigeonhole over 4 bands > 3 max differing bits), so the banded
    100-TB plan is gated against the exact pair set."""
    docs = load_table(spark, sf_dir, "documents")
    return T.simhash_neardup_pairs(
        docs, "text", "doc_id", max_hamming=SIMHASH_MAX_HAMMING, bits=SIMHASH_BITS
    )


INCR_DELTA_MOD = 20  # delta = doc_id % 20 == 0, corpus = the rest


def docs_incremental_neardup_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (delta-vs-history) near-dup dedup: the daily-ingest
    shape — new docs banded and joined against the historical corpus's
    bands, never history x history. Surviving delta docs and their
    48-bit simhash. Recall 1 by pigeonhole, so the banded anti-filter
    reproduces the exact NOT-EXISTS oracle."""
    docs = load_table(spark, sf_dir, "documents")
    delta = docs.filter(F.col("doc_id") % INCR_DELTA_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % INCR_DELTA_MOD != 0)
    return T.simhash_incremental_anti(
        delta,
        corpus,
        "text",
        "doc_id",
        max_hamming=SIMHASH_MAX_HAMMING,
        bits=SIMHASH_BITS,
    )


def docs_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: lexicographic min/max md5 over word-5-gram
    shingles (a winnowing-style content signature — stable under
    reordering of unrelated docs, shifts only when content shifts)."""
    docs = load_table(spark, sf_dir, "documents")
    grams = T.with_ngrams(docs, "text", 5)
    hashed = F.transform(F.array_distinct(F.col("ngrams")), lambda g: F.md5(g))
    return grams.select(
        "doc_id",
        F.array_min(hashed).alias("fp_min"),
        F.array_max(hashed).alias("fp_max"),
        F.size(F.array_distinct(F.col("ngrams"))).alias("n_shingles"),
    )


def docs_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return T.quality_score(docs, "text", "doc_id")


CHUNK_TOKENS = 16
CHUNK_OVERLAP = 4


def docs_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return T.chunk_documents(docs, "text", "doc_id", CHUNK_TOKENS, CHUNK_OVERLAP)


#: blocklist for the redaction demo — terms present in the synthetic corpus
REDACT_TERMS = ("customer", "merge")
# escaped identically to redact_text's Spark-side pattern (no-op for these
# alphanumeric terms, but keeps oracle and engine in lockstep for terms
# containing regex metacharacters)
_TERM_PATTERN = (
    r"\b(?:" + "|".join(T.regex_escape_term(t) for t in REDACT_TERMS) + r")\b"
)


def docs_redacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return T.redact_text(docs, "text", "doc_id", blocklist_terms=REDACT_TERMS)


#: deterministic split fractions: bucket 0-79 train, 80-89 val, 90-99 test
SPLIT_TRAIN_END = 80
SPLIT_VAL_END = 90


def docs_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment: md5(doc_id) -> bucket 0-99.

    Hash-based (not random) so the split is stable across runs, engines,
    and repartitioning — the property a reproducible training pipeline
    needs. Narrow per-row expressions, zero shuffles.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
            "long"
        ),
        F.lit(100),
    )
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < SPLIT_TRAIN_END, "train")
        .when(bucket < SPLIT_VAL_END, "val")
        .otherwise("test")
        .alias("split"),
    )


#: md5-bucket threshold carving the held-out benchmark set (~5% of docs)
BENCH_BUCKET_END = 5
TOP_NGRAMS_K = 50


def _split_bucket() -> F.Column:
    """The same deterministic md5(doc_id) -> 0-99 bucket used by
    docs_train_split, reused so every derived split stays consistent."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
            "long"
        ),
        F.lit(100),
    )


def docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination check: carve a deterministic ~5%
    benchmark set out of `documents` (md5 bucket < 5), then flag every
    remaining doc that shares any word-3-gram with it. The benchmark
    shingle set rides a broadcast join — the corpus side never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    bucketed = docs.withColumn("__bucket", _split_bucket())
    grams = T.with_ngrams(bucketed, "text", NGRAM_N)
    bench = grams.filter(F.col("__bucket") < BENCH_BUCKET_END)
    corpus = grams.filter(F.col("__bucket") >= BENCH_BUCKET_END)
    return T.decontaminate(corpus, bench, "doc_id", "ngrams")


def docs_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-50 word-3-grams by document frequency
    (boilerplate detection); deterministic tie-break on gram text."""
    docs = load_table(spark, sf_dir, "documents")
    grams = T.with_ngrams(docs, "text", NGRAM_N)
    return T.top_ngrams(grams, "ngrams", TOP_NGRAMS_K)


#: per-source keep-threshold: 30 + (source_number mod 7) * 10 buckets of
#: 100 — a deliberately uneven mixture so the stratified logic is exercised
def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-source keep fractions
    applied via the md5(doc_id) bucket, so the sample is reproducible
    across runs/engines/partitionings (unlike seeded `sampleBy`, whose
    hash is engine-private). Pure narrow expressions — zero shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    src_num = F.regexp_extract(F.col("source"), r"(\d+)$", 1).try_cast("long")
    threshold = F.lit(30) + F.pmod(src_num, F.lit(7)) * 10
    bucket = _split_bucket()
    return docs.select(
        "doc_id",
        "source",
        bucket.alias("bucket"),
        threshold.cast("long").alias("keep_threshold"),
    ).filter(F.col("bucket") < F.col("keep_threshold"))


TFIDF_K = 3


def docs_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document (corpus-wide idf)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.tfidf_top_terms(docs, "text", "doc_id", TFIDF_K)


def docs_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality score: avg unigram log-prob per document — the
    SQL-expressible analogue of the CCNet/KenLM perplexity filter (see
    operators/text.py:unigram_logprob)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.unigram_logprob(docs, "text", "doc_id")


def docs_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End of the fuzzy-dedup pipeline: LSH candidate pairs -> transitive
    clusters (connected components) -> keep flag on the canonical
    (min-id) doc of each cluster. Singleton docs keep themselves."""
    from redpanda_to_parquet_writer_spark.operators.dedup import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = docs_minhash_lsh_pairs(spark, sf_dir)
    cc = connected_components(docs.select("doc_id"), pairs)
    return cc.select(
        "doc_id", "cluster_id", (F.col("cluster_id") == F.col("doc_id")).alias("keep")
    )


#: per-source token budget for the mixture-capping query (~40% of each
#: source's tokens at sf0.01 — selective but non-trivial at every sf)
TOKEN_BUDGET = 2000


def docs_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filter: distinct-token ratio,
    top-token / top-bigram mass, keep verdict. Zero-shuffle map-side
    filter — see operators/text.py:repetition_stats."""
    docs = load_table(spark, sf_dir, "documents")
    return T.repetition_stats(docs, "text", "doc_id")


def docs_token_budget_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget capping (mixture control): keep docs in
    ascending-id priority while the source's running token total fits
    TOKEN_BUDGET."""
    from redpanda_to_parquet_writer_spark.operators.sampling import token_budget_cap

    docs = load_table(spark, sf_dir, "documents")
    return token_budget_cap(docs, "text", "doc_id", "source", TOKEN_BUDGET)


#: training-sequence length for the packing query (tokens)
SEQ_TOKENS = 512


def docs_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: assign each doc (per source, id order)
    the SEQ_TOKENS-sized training sequence it starts in, plus its token
    offset within that sequence."""
    from redpanda_to_parquet_writer_spark.operators.sampling import sequence_pack

    docs = load_table(spark, sf_dir, "documents")
    return sequence_pack(docs, "text", "doc_id", "source", SEQ_TOKENS)


QUERIES = {
    "docs_exact_dedup": docs_exact_dedup,
    "docs_line_dedup": docs_line_dedup,
    "docs_repetition_stats": docs_repetition_stats,
    "docs_token_budget_cap": docs_token_budget_cap,
    "docs_sequence_pack": docs_sequence_pack,
    "docs_quality_score": docs_quality_score,
    "docs_tokenizer_stats": docs_tokenizer_stats,
    "docs_stopword_stats": docs_stopword_stats,
    "docs_language_id": docs_language_id,
    "docs_minhash_lsh_pairs": docs_minhash_lsh_pairs,
    "docs_jaccard_pairs": docs_jaccard_pairs,
    "docs_simhash": docs_simhash,
    "docs_simhash_neardup_pairs": docs_simhash_neardup_pairs,
    "docs_incremental_neardup_filter": docs_incremental_neardup_filter,
    "docs_fingerprint": docs_fingerprint,
    "docs_chunked": docs_chunked,
    "docs_redacted": docs_redacted,
    "docs_train_split": docs_train_split,
    "docs_dedup_clusters": docs_dedup_clusters,
    "docs_decontaminate": docs_decontaminate,
    "docs_top_ngrams": docs_top_ngrams,
    "docs_stratified_sample": docs_stratified_sample,
    "docs_tfidf_top_terms": docs_tfidf_top_terms,
    "docs_unigram_logprob": docs_unigram_logprob,
}

# Shared SQL fragments for the oracles. DuckDB list indexing is 1-based
# (Spark's element_at-style bracket on transform(sequence...) below is
# 0-based via the generated index), so the gram builder uses i..i+2 over
# generate_series(1, len-2).
_GRAMS_CTE = f"""
  grams AS (
    SELECT doc_id,
           list_transform(
             generate_series(1, len(toks) - {NGRAM_N - 1}),
             i -> concat_ws(' ', {", ".join(f"toks[i + {j}]" for j in range(NGRAM_N))})
           ) AS ngrams
    FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents)
  )
"""

# double hashing (Kirsch-Mitzenmacher), mirroring minhash_signature:
# one md5 per distinct shingle -> (h1, h2) 32-bit ints -> min(h1 + i*h2)
_SIG_CTE = f"""
  hp AS (
    SELECT doc_id,
           list_transform(
             list_distinct(ngrams),
             g -> struct_pack(
               h1 := CAST(concat('0x', substring(md5(g), 1, 8)) AS BIGINT),
               h2 := CAST(concat('0x', substring(md5(g), 9, 8)) AS BIGINT)
             )
           ) AS hs
    FROM grams
  ),
  sig AS (
    SELECT doc_id,
           [{", ".join(f"list_min(list_transform(hs, p -> p.h1 + {i} * p.h2))" for i in range(NUM_HASHES))}] AS minhash
    FROM hp
  )
"""

_N_BANDS = NUM_HASHES // BAND_SIZE


def chunk_sql_tail(source_cte: str, chunk_tokens: int = CHUNK_TOKENS, overlap: int = CHUNK_OVERLAP) -> str:
    """Shared DuckDB chunking SQL over a CTE exposing (doc_id, t) —
    single source of truth for docs_chunked AND the curation pipeline's
    oracle, so the two can't silently desynchronize."""
    stride = chunk_tokens - overlap
    return f"""
        counted AS (
          SELECT doc_id, t,
                 greatest(
                   CAST(ceil(CAST(len(t) - {overlap} AS DOUBLE) / {stride}) AS INT),
                   1
                 ) AS n_chunks
          FROM {source_cte}
        ),
        expanded AS (
          SELECT doc_id, t, CAST(cid AS INT) AS chunk_id
          FROM counted, LATERAL unnest(generate_series(0, n_chunks - 1)) u(cid)
        )
        SELECT doc_id, chunk_id,
               array_to_string(
                 t[chunk_id * {stride} + 1 : chunk_id * {stride} + {chunk_tokens}], ' '
               ) AS chunk_text,
               len(t[chunk_id * {stride} + 1 : chunk_id * {stride} + {chunk_tokens}])
                 AS chunk_tokens
        FROM expanded
    """


#: shared quality-score SQL expression over (text, toks) columns — the
#: single source of truth for docs_quality_score and curation_pipeline
QUALITY_EXPR_SQL = """
                 round(
                   0.25 * least(CAST(len(toks) AS DOUBLE) / 64.0, 1.0)
                 + 0.25 * least((CAST(len(list_filter(toks, x -> x IN ('the', 'a')))
                       AS DOUBLE) / len(toks)) / 0.04, 1.0)
                 + 0.25 * CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g'))
                       AS DOUBLE) / length(text)
                 + 0.25 * CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6
                 )
"""

ORACLES = {
    "docs_chunked": f"""
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
          FROM documents WHERE text IS NOT NULL
        ),
        {chunk_sql_tail('toks')}
    """,
    # both tokenizers replayed over one toks CTE — the whitespace stats
    # and the BPE-pre-tokenizer stats are per-row expressions of the
    # same text column, exactly like the Spark plan's single scan
    "docs_tokenizer_stats": r"""
        WITH toks AS (
          SELECT doc_id, text,
                 string_split_regex(trim(text), '\s+') AS wt,
                 regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+', 0) AS bt
          FROM documents
        )
        SELECT doc_id,
               length(text) AS n_chars,
               len(wt) AS n_tokens,
               round(
                 CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
                 / len(wt), 6
               ) AS avg_token_len,
               len(bt) AS n_bpe_tokens,
               len(list_distinct(bt)) AS n_distinct_bpe_tokens,
               round(
                 CAST(list_sum(list_transform(bt, x -> length(trim(x)))) AS DOUBLE) / len(bt),
                 6
               ) AS avg_bpe_token_len
        FROM toks
    """,
    "docs_quality_score": f"""
        SELECT doc_id, quality, quality >= 0.5 AS keep
        FROM (
          SELECT doc_id, {QUALITY_EXPR_SQL} AS quality
          FROM (
            SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks
            FROM documents
          )
        )
    """,
    "docs_exact_dedup": """
        SELECT md5(text) AS text_hash, min(doc_id) AS doc_id
        FROM documents GROUP BY md5(text)
    """,
    "docs_line_dedup": f"""
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
          FROM documents WHERE text IS NOT NULL
        ),
        lines AS (
          SELECT doc_id,
                 CAST(i - 1 AS INT) AS line_idx,
                 array_to_string(
                   list_slice(t, (i - 1) * {LINE_TOKENS} + 1, i * {LINE_TOKENS}), ' '
                 ) AS line
          FROM toks,
               LATERAL unnest(generate_series(
                 1, CAST(ceil(len(t) / {LINE_TOKENS}.0) AS BIGINT)
               )) u(i)
        ),
        marked AS (
          SELECT doc_id,
                 row_number() OVER (
                   PARTITION BY line ORDER BY doc_id ASC, line_idx ASC
                 ) AS rn
          FROM lines
        )
        SELECT doc_id,
               count(*) AS n_lines,
               CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dupes
        FROM marked GROUP BY doc_id
    """,
    "docs_stopword_stats": """
        SELECT doc_id,
               len(toks) AS n_tokens,
               len(list_filter(toks, x -> x IN ('the', 'a'))) AS n_stopwords,
               round(CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE)
                     / len(toks), 6) AS stopword_ratio
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents)
    """,
    "docs_language_id": """
        WITH scored AS (
          SELECT doc_id,
                 len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and'))) AS s_en,
                 len(list_filter(toks, x -> x IN ('der', 'die', 'und', 'das'))) AS s_de,
                 len(list_filter(toks, x -> x IN ('le', 'la', 'et', 'les'))) AS s_fr,
                 len(list_filter(toks, x -> x IN ('el', 'la', 'y', 'los'))) AS s_es
          FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents)
        )
        SELECT doc_id,
               CASE
                 WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                 WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                 WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                 WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                 ELSE 'fr'
               END AS predicted_lang
        FROM scored
    """,
    "docs_minhash_lsh_pairs": f"""
        WITH {_GRAMS_CTE}, {_SIG_CTE},
        bands AS (
          SELECT doc_id, b.band, b.key
          FROM sig, LATERAL unnest([
            {", ".join(
                "{'band': %d, 'key': concat_ws('|', %s)}" % (
                    b, ", ".join(f"minhash[{b * BAND_SIZE + j + 1}]" for j in range(BAND_SIZE))
                )
                for b in range(_N_BANDS)
            )}
          ]) t(b)
        )
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        FROM bands l JOIN bands r
          ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
    """,
    "docs_jaccard_pairs": f"""
        WITH {_GRAMS_CTE},
        shingles AS (
          SELECT DISTINCT doc_id, g
          FROM grams, LATERAL unnest(ngrams) t(g)
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
        inter AS (
          SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS common
          FROM shingles l JOIN shingles r ON l.g = r.g AND l.doc_id < r.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               round(CAST(common AS DOUBLE) / (sa.n + sb.n - common), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE round(CAST(common AS DOUBLE) / (sa.n + sb.n - common), 6) >= {JACCARD_THRESHOLD}
    """,
    "docs_fingerprint": """
        WITH grams AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   generate_series(1, len(toks) - 4),
                   i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])
                 )) AS ngrams
          FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents)
        )
        SELECT doc_id,
               list_min(list_transform(ngrams, g -> md5(g))) AS fp_min,
               list_max(list_transform(ngrams, g -> md5(g))) AS fp_max,
               len(ngrams) AS n_shingles
        FROM grams
    """,
    "docs_redacted": f"""
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(text, '{T.REDACT_EMAIL}', '<EMAIL>', 'g'),
                   '{T.REDACT_NUMBER}', '<NUM>', 'g'),
                 '{_TERM_PATTERN}', '<TERM>', 'g'
               ) AS redacted,
               len(regexp_extract_all(text, '{T.REDACT_EMAIL}')) AS n_emails,
               len(regexp_extract_all(text, '{T.REDACT_NUMBER}')) AS n_numbers,
               len(regexp_extract_all(text, '{_TERM_PATTERN}')) AS n_terms
        FROM documents
    """,
    "docs_train_split": f"""
        SELECT doc_id, bucket,
               CASE WHEN bucket < {SPLIT_TRAIN_END} THEN 'train'
                    WHEN bucket < {SPLIT_VAL_END} THEN 'val'
                    ELSE 'test' END AS split
        FROM (
          SELECT doc_id,
                 CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                   AS BIGINT) % 100 AS bucket
          FROM documents
        )
    """,
    "docs_simhash": f"""
        WITH toks AS (
          SELECT doc_id,
                 CAST(concat('0x', substring(md5(tok), 1, {SIMHASH_BITS // 4}))
                   AS BIGINT) AS h
          FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
               LATERAL unnest(t) u(tok)
        ),
        votes AS (
          SELECT doc_id,
                 {", ".join(
                     f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS bit{b}"
                     for b in range(SIMHASH_BITS)
                 )}
          FROM toks GROUP BY doc_id
        )
        SELECT doc_id,
               {" + ".join(
                   f"(CASE WHEN bit{b} > 0 THEN CAST({2 ** b} AS BIGINT) ELSE 0 END)"
                   for b in range(SIMHASH_BITS)
               )} AS simhash
        FROM votes
    """,
}

ORACLES["docs_decontaminate"] = f"""
    WITH bucketed AS (
      SELECT doc_id, text,
             CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
               AS BIGINT) % 100 AS b
      FROM documents
    ),
    grams AS (
      SELECT doc_id, b,
             list_distinct(list_transform(
               generate_series(1, len(toks) - {NGRAM_N - 1}),
               i -> concat_ws(' ', {", ".join(f"toks[i + {j}]" for j in range(NGRAM_N))})
             )) AS ngrams
      FROM (SELECT doc_id, b, string_split_regex(trim(text), '\\s+') AS toks
            FROM bucketed)
    ),
    bench AS (
      SELECT DISTINCT g FROM grams, LATERAL unnest(ngrams) t(g)
      WHERE b < {BENCH_BUCKET_END}
    ),
    corpus AS (
      SELECT doc_id, g FROM grams, LATERAL unnest(ngrams) t(g)
      WHERE b >= {BENCH_BUCKET_END}
    ),
    hits AS (
      SELECT doc_id, count(*) AS n_overlap
      FROM corpus JOIN bench USING (g) GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(h.n_overlap, 0) AS n_overlap,
           coalesce(h.n_overlap, 0) >= 1 AS contaminated
    FROM (SELECT doc_id FROM grams WHERE b >= {BENCH_BUCKET_END}) d
    LEFT JOIN hits h USING (doc_id)
"""

ORACLES["docs_top_ngrams"] = f"""
    WITH {_GRAMS_CTE}
    SELECT g AS ngram, count(*) AS doc_freq
    FROM grams, LATERAL unnest(list_distinct(ngrams)) t(g)
    GROUP BY g
    ORDER BY doc_freq DESC, ngram ASC
    LIMIT {TOP_NGRAMS_K}
"""

ORACLES["docs_stratified_sample"] = r"""
    SELECT doc_id, source, bucket, keep_threshold
    FROM (
      SELECT doc_id, source,
             CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
               AS BIGINT) % 100 AS bucket,
             30 + (TRY_CAST(regexp_extract(source, '(\d+)$', 1) AS BIGINT) % 7) * 10
               AS keep_threshold
      FROM documents
    )
    WHERE bucket < keep_threshold
"""

ORACLES["docs_tfidf_top_terms"] = f"""
    WITH toks AS (
      SELECT doc_id, tok AS term
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
           LATERAL unnest(t) u(tok)
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df), 6) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, tfidf, rank
    FROM (
      SELECT doc_id, term, tf, tfidf,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
             ) AS rank
      FROM scored
    )
    WHERE rank <= {TFIDF_K}
"""

# Connected-components oracle: transitive closure via a recursive CTE over
# the SAME candidate-pair SQL as docs_minhash_lsh_pairs (reused verbatim so
# the two stages can't desynchronize). reach(id, r) = "label r has
# propagated to node id"; min(r) per id is the component's min member.
ORACLES["docs_dedup_clusters"] = f"""
    WITH RECURSIVE pairs AS (
      SELECT * FROM ({ORACLES["docs_minhash_lsh_pairs"]}) q
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach AS (
      SELECT doc_id AS id, doc_id AS r FROM documents
      UNION
      SELECT e.dst AS id, reach.r AS r
      FROM reach JOIN edges e ON e.src = reach.id
    )
    SELECT id AS doc_id, min(r) AS cluster_id, min(r) = id AS keep
    FROM reach GROUP BY id
"""

ORACLES["docs_repetition_stats"] = """
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             len(toks) AS n,
             len(list_distinct(toks)) AS nd,
             list_max(list_transform(list_distinct(toks),
               t -> len(list_filter(toks, x -> x = t)))) AS top_tok,
             list_transform(generate_series(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i + 1]) AS bg
      FROM t
    ),
    s2 AS (
      SELECT doc_id, n, nd, top_tok, bg,
             CASE WHEN len(bg) > 0
                  THEN list_max(list_transform(list_distinct(bg),
                       t -> len(list_filter(bg, x -> x = t))))
             END AS top_bg
      FROM s
    )
    SELECT doc_id,
           n AS n_tokens,
           nd AS n_distinct,
           ((nd * 2000000 + n) // (2 * n)) / 1000000.0 AS distinct_frac,
           ((top_tok * 2000000 + n) // (2 * n)) / 1000000.0 AS top_token_frac,
           CASE WHEN len(bg) > 0
                THEN ((top_bg * 2000000 + len(bg)) // (2 * len(bg))) / 1000000.0
           END AS top_bigram_frac,
           (((nd * 2000000 + n) // (2 * n)) / 1000000.0 >= 0.5
            AND ((top_tok * 2000000 + n) // (2 * n)) / 1000000.0 <= 0.12)
             AS keep
    FROM s2
"""

ORACLES["docs_token_budget_cap"] = f"""
    SELECT source, doc_id, n_tokens, cum_tokens
    FROM (
      SELECT source, doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             CAST(sum(len(string_split_regex(trim(text), '\\s+'))) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS cum_tokens
      FROM documents
    )
    WHERE cum_tokens <= {TOKEN_BUDGET}
"""

ORACLES["docs_sequence_pack"] = f"""
    SELECT source, doc_id, n_tokens,
           (start_tok // {SEQ_TOKENS}) AS seq_id,
           (start_tok % {SEQ_TOKENS}) AS seq_offset
    FROM (
      SELECT source, doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             CAST(sum(len(string_split_regex(trim(text), '\\s+'))) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING
             ) - len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS start_tok
      FROM documents
    )
"""

# the banded formulation must reproduce the EXACT Hamming-<=k pair set
# (recall 1 by pigeonhole), so it is gated against the quadratic oracle
_SIMHASH_VOTES = ", ".join(
    f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS bit{b}"
    for b in range(SIMHASH_BITS)
)
_SIMHASH_BITS_EXPR = " + ".join(
    f"(CASE WHEN bit{b} > 0 THEN CAST({2 ** b} AS BIGINT) ELSE 0 END)"
    for b in range(SIMHASH_BITS)
)
ORACLES["docs_simhash_neardup_pairs"] = f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(concat('0x', substring(md5(tok), 1, {SIMHASH_BITS // 4}))
               AS BIGINT) AS h
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
           LATERAL unnest(t) u(tok)
    ),
    votes AS (
      SELECT doc_id, {_SIMHASH_VOTES}
      FROM toks GROUP BY doc_id
    ),
    sh AS (
      SELECT doc_id, {_SIMHASH_BITS_EXPR} AS simhash FROM votes
    )
    SELECT id_a, id_b, hamming
    FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    )
    WHERE hamming <= {SIMHASH_MAX_HAMMING}
"""

# textbook NOT-EXISTS replay of the banded delta-vs-corpus anti-filter
ORACLES["docs_incremental_neardup_filter"] = f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(concat('0x', substring(md5(tok), 1, {SIMHASH_BITS // 4}))
               AS BIGINT) AS h
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
           LATERAL unnest(t) u(tok)
    ),
    votes AS (
      SELECT doc_id, {_SIMHASH_VOTES}
      FROM toks GROUP BY doc_id
    ),
    sh AS (
      SELECT doc_id, {_SIMHASH_BITS_EXPR} AS simhash FROM votes
    )
    SELECT d.doc_id, d.simhash
    FROM sh d
    WHERE d.doc_id % {INCR_DELTA_MOD} = 0
      AND NOT EXISTS (
        SELECT 1 FROM sh c
        WHERE c.doc_id % {INCR_DELTA_MOD} <> 0
          AND bit_count(xor(d.simhash, c.simhash)) <= {SIMHASH_MAX_HAMMING}
      )
"""

# cascaded exact aggregates mirror the Spark plan: tf -> corpus counts ->
# 1-row total; per-term ln rounds to 6 dp (the tfidf precedent for
# last-ulp ln tolerance) and the doc total accumulates tf x DECIMAL
ORACLES["docs_unigram_logprob"] = """
    WITH toks AS (
      SELECT doc_id, tok AS term
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
           LATERAL unnest(t) u(tok)
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    cnt AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY term),
    total AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM cnt),
    scored AS (
      SELECT tf.doc_id, tf.tf,
             CAST(round(ln(CAST(cnt.cnt AS DOUBLE) / CAST(total.t AS DOUBLE)), 6)
                  AS DECIMAL(18,6)) AS lp
      FROM tf JOIN cnt USING (term) CROSS JOIN total
    ),
    per_doc AS (
      SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens, sum(tf * lp) AS s
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           -- exact integer half-away-from-zero (sf1 boundary fix: a
           -- doc hit s/n = -5.7056285 and round(double) split engines)
           CAST(CAST((CASE WHEN s < 0 THEN -1 ELSE 1 END)
                * ((2 * CAST(abs(s) * 1000000 AS HUGEINT) + n_tokens)
                   // (2 * n_tokens)) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS avg_logprob
    FROM per_doc
"""


CONTAINMENT_THRESHOLD = 0.5


def docs_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs (subset-duplicate detection) — the
    Jaccard companion that catches a short doc embedded in a long one
    (operators/text.py:containment_pairs)."""
    docs = load_table(spark, sf_dir, "documents")
    grams = T.with_ngrams(docs, "text", NGRAM_N)
    return T.containment_pairs(grams, "doc_id", "ngrams", CONTAINMENT_THRESHOLD)


QUERIES["docs_containment_pairs"] = docs_containment_pairs

_CONT_MILL = int(round(CONTAINMENT_THRESHOLD * 1000000))
ORACLES["docs_containment_pairs"] = f"""
    WITH {_GRAMS_CTE},
    shingles AS (
      SELECT DISTINCT doc_id, g
      FROM grams, LATERAL unnest(ngrams) t(g)
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS common
      FROM shingles l JOIN shingles r ON l.g = r.g AND l.doc_id < r.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, common,
           (2 * common * 1000000 + least(sa.n, sb.n))
             // (2 * least(sa.n, sb.n)) / 1000000.0 AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE common * 1000000 >= {_CONT_MILL} * least(sa.n, sb.n)
"""


def docs_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize-then-hash dedup groups (case/punct-invariant exact
    dedup — the standard first pass before fuzzy methods; see
    operators/text.py:normalized_fingerprint)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.normalized_fingerprint(docs, "text", "doc_id")


QUERIES["docs_normalized_dedup"] = docs_normalized_dedup

# DuckDB regexp_replace needs the 'g' flag (Spark replaces all matches
# by default); explicit [ \t\n\r] classes keep Java-vs-RE2 \s drift out
ORACLES["docs_normalized_dedup"] = r"""
    WITH base AS (
      SELECT doc_id,
             md5(trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 \t\n\r]', ' ', 'g'),
               '[ \t\n\r]+', ' ', 'g'
             ))) AS norm_fp
      FROM documents
    )
    SELECT doc_id, norm_fp,
           min(doc_id) OVER (PARTITION BY norm_fp) AS canonical_id,
           count(*) OVER (PARTITION BY norm_fp) AS n_variants
    FROM base
"""


CM_PROBE_K = 10


def docs_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch under the oracle gate: exact corpus term counts
    feed a 4x256 md5-hashed sketch, and the top-10 heavy hitters are
    point-estimated back out of it (estimate >= exact by construction,
    overshoot = hash collisions). Because the hashes are md5-derived
    and the sums exact integers, the ENTIRE sketch is engine-portable —
    the oracle rebuilds it bit-for-bit (operators/text.py:
    countmin_sketch/countmin_estimate)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(T.tokens("text")).alias("term"))
    cnt = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    probes = cnt.orderBy(F.desc("cnt"), F.asc("term")).limit(CM_PROBE_K)
    sketch = T.countmin_sketch(cnt)
    est = T.countmin_estimate(sketch, probes.select("term"))
    return probes.join(est, "term").select(
        "term", F.col("cnt").alias("exact_count"), "cm_estimate"
    )


QUERIES["docs_countmin_heavy_hitters"] = docs_countmin_heavy_hitters

ORACLES["docs_countmin_heavy_hitters"] = f"""
    WITH toks AS (
      SELECT tok AS term
      FROM (SELECT string_split_regex(trim(text), '\\s+') AS t FROM documents),
           LATERAL unnest(t) u(tok)
    ),
    cnt AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
    probes AS (
      SELECT term, cnt FROM cnt ORDER BY cnt DESC, term ASC LIMIT {CM_PROBE_K}
    ),
    hashes AS (
      SELECT term, cnt, CAST(j AS INTEGER) AS j,
             CAST(concat('0x', substring(
               md5(concat(CAST(j AS VARCHAR), ':', term)), 1, 8)
             ) AS BIGINT) % {T.CM_WIDTH} AS bucket
      FROM cnt, LATERAL unnest(range({T.CM_DEPTH})) t(j)
    ),
    sketch AS (
      SELECT j, bucket, CAST(sum(cnt) AS BIGINT) AS bucket_count
      FROM hashes GROUP BY 1, 2
    ),
    est AS (
      SELECT h.term, min(s.bucket_count) AS cm_estimate
      FROM hashes h JOIN sketch s USING (j, bucket)
      WHERE h.term IN (SELECT term FROM probes)
      GROUP BY h.term
    )
    SELECT p.term, CAST(p.cnt AS BIGINT) AS exact_count, e.cm_estimate
    FROM probes p JOIN est e USING (term)
"""


BLOOM_DELTA_MOD = 20


def docs_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter dedup prefilter under the oracle gate: the history
    corpus's content keys fold into a 64x63-bit filter (fixed size, one
    bit_or aggregate), and each delta doc is probed against the
    BROADCAST filter before any exact work — `maybe_seen` rows go to
    the exact verify, `definitely new` rows skip the key-table join
    entirely (the ingest-dedup accelerator; see operators/dedup.py:
    bloom_build/bloom_probe). The no-false-negative guarantee is what
    the hash gate enforces: every actually_seen row must be maybe_seen.
    """
    from redpanda_to_parquet_writer_spark.operators.dedup import (
        bloom_build,
        bloom_probe,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("key")
    )
    hist = docs.filter(F.col("doc_id") % BLOOM_DELTA_MOD != 0)
    delta = docs.filter(F.col("doc_id") % BLOOM_DELTA_MOD == 0)
    bloom = bloom_build(hist.select("key"), "key")
    probed = bloom_probe(delta, bloom, "key")
    seen = hist.select("key").distinct().withColumn("__seen", F.lit(True))
    return (
        probed.join(seen, "key", "left")
        .select(
            "doc_id",
            "maybe_seen",
            F.coalesce(F.col("__seen"), F.lit(False)).alias("actually_seen"),
        )
    )


QUERIES["docs_bloom_prefilter"] = docs_bloom_prefilter

from redpanda_to_parquet_writer_spark.operators.dedup import (  # noqa: E402
    BLOOM_HASHES as _BH,
    BLOOM_WORD_BITS as _BWB,
    BLOOM_WORDS as _BW,
)

_BLOOM_BITS = _BW * _BWB
ORACLES["docs_bloom_prefilter"] = f"""
    WITH keyed AS (SELECT doc_id, md5(text) AS key FROM documents),
    hist AS (SELECT key FROM keyed WHERE doc_id % {BLOOM_DELTA_MOD} != 0),
    delta AS (
      SELECT doc_id, key FROM keyed WHERE doc_id % {BLOOM_DELTA_MOD} = 0
    ),
    bits AS (
      SELECT CAST(concat('0x', substring(
               md5(concat(CAST(j AS VARCHAR), ':', key)), 1, 8)
             ) AS BIGINT) % {_BLOOM_BITS} AS bit
      FROM hist, LATERAL unnest(range({_BH})) t(j)
    ),
    words AS (
      SELECT bit // {_BWB} AS word_idx,
             bit_or(CAST(1 AS BIGINT) << CAST(bit % {_BWB} AS INTEGER)) AS word
      FROM bits GROUP BY 1
    ),
    probe_bits AS (
      SELECT d.doc_id, d.key,
             CAST(concat('0x', substring(
               md5(concat(CAST(j AS VARCHAR), ':', d.key)), 1, 8)
             ) AS BIGINT) % {_BLOOM_BITS} AS bit
      FROM delta d, LATERAL unnest(range({_BH})) t(j)
    ),
    hits AS (
      SELECT p.doc_id, p.key,
             CASE WHEN w.word IS NULL THEN 0
                  WHEN (w.word // (CAST(1 AS BIGINT)
                        << CAST(p.bit % {_BWB} AS INTEGER))) % 2 = 1
                  THEN 1 ELSE 0 END AS hit
      FROM probe_bits p LEFT JOIN words w ON w.word_idx = p.bit // {_BWB}
    ),
    agg AS (
      SELECT doc_id, key, min(hit) = 1 AS maybe_seen
      FROM hits GROUP BY 1, 2
    )
    SELECT a.doc_id, a.maybe_seen,
           COALESCE(h.__seen, FALSE) AS actually_seen
    FROM agg a
    LEFT JOIN (SELECT DISTINCT key, TRUE AS __seen FROM hist) h USING (key)
"""


def docs_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact edit-distance verify over the LSH candidate pairs — the
    final fuzzy-dedup confirmation step: Levenshtein is O(len²) per
    pair, affordable ONLY because banding already collapsed the pair
    space (never run it all-pairs). Integer distances are engine-exact
    (Spark and DuckDB implement the same DP definition)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = docs_minhash_lsh_pairs(spark, sf_dir)
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("__ta"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("__tb"))
    # REPARTITION before the O(len^2) verify: the joined pair set is
    # small and would otherwise land on the doc table's few input
    # partitions — measured 14.6s -> ~1s at sf0.1 once the DP work
    # spreads across the cluster (the verify stage is CPU-bound, so its
    # parallelism must come from an explicit exchange, not file splits)
    n = spark.sparkContext.defaultParallelism
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .repartition(n)
        .select(
            "id_a",
            "id_b",
            F.levenshtein("__ta", "__tb").alias("edit_distance"),
        )
    )


QUERIES["docs_edit_distance_pairs"] = docs_edit_distance_pairs

ORACLES["docs_edit_distance_pairs"] = f"""
    WITH lsh AS ({ORACLES["docs_minhash_lsh_pairs"]})
    SELECT l.id_a, l.id_b, levenshtein(da.text, db.text) AS edit_distance
    FROM lsh l
    JOIN documents da ON da.doc_id = l.id_a
    JOIN documents db ON db.doc_id = l.id_b
"""


#: bag-of-terms retrieval query for the BM25 plan — terms drawn from the
#: synthetic corpus vocabulary, mixing rare-ish and common tokens so idf
#: actually differentiates
BM25_TERMS = ("spark", "vector", "query")
BM25_K = 20
BM25_K1 = 1.2
BM25_B = 0.75


def docs_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval over the corpus — the ranking primitive for
    retrieval-based decontamination / targeted data selection
    (operators/text.py:bm25_topk). Only postings of the query's terms
    shuffle; df/corpus stats broadcast; top-k is TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    return T.bm25_topk(docs, "text", "doc_id", BM25_TERMS, BM25_K, BM25_K1, BM25_B)


QUERIES["docs_bm25_topk"] = docs_bm25_topk

ORACLES["docs_bm25_topk"] = f"""
    WITH lengths AS (
      SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS dl
      FROM documents
    ),
    corpus AS (
      SELECT count(*) AS n, avg(dl) AS avgdl FROM lengths
    ),
    postings AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
        FROM documents
      )
      WHERE term IN ({", ".join(f"'{t}'" for t in BM25_TERMS)})
      GROUP BY doc_id, term
    ),
    dfreq AS (
      SELECT term, count(*) AS df FROM postings GROUP BY term
    ),
    scored AS (
      SELECT p.doc_id,
             ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5))
               * p.tf * ({BM25_K1} + 1.0)
               / (p.tf + {BM25_K1} * (1.0 - {BM25_B}
                    + {BM25_B} * l.dl / c.avgdl)) AS term_score
      FROM postings p
      JOIN lengths l USING (doc_id)
      JOIN dfreq d USING (term)
      CROSS JOIN corpus c
    ),
    per_doc AS (
      SELECT doc_id, round(sum(term_score), 6) AS bm25,
             count(*) AS n_terms_matched
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, bm25, n_terms_matched,
           row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank
    FROM per_doc
    ORDER BY bm25 DESC, doc_id ASC
    LIMIT {BM25_K}
"""


DUPNGRAM_N = 5
DUPNGRAM_MIN_DOCS = 2


def docs_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level duplication signal (Lee et al. ExactSubstr, at
    n-gram-start granularity): per doc, the fraction of 5-gram
    positions whose gram occurs in >=2 documents corpus-wide
    (operators/text.py:dup_ngram_fraction). One explode, gram-keyed
    docfreq + left-semi reusing the same partitioning, exact half-up
    millionths for the ratio."""
    docs = load_table(spark, sf_dir, "documents")
    return T.dup_ngram_fraction(
        docs, "text", "doc_id", DUPNGRAM_N, DUPNGRAM_MIN_DOCS
    )


QUERIES["docs_dup_ngram_fraction"] = docs_dup_ngram_fraction

_DUPGRAM_JOIN = ", ".join(f"toks[i + {j}]" for j in range(DUPNGRAM_N))

ORACLES["docs_dup_ngram_fraction"] = f"""
    WITH grams AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, len(toks) - {DUPNGRAM_N - 1}),
               i -> concat_ws(' ', {_DUPGRAM_JOIN})
             ) AS gs
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
            FROM documents)
    ),
    pos AS (
      SELECT doc_id, unnest(gs) AS g FROM grams
    ),
    docfreq AS (
      SELECT g, count(DISTINCT doc_id) AS df FROM pos GROUP BY g
    ),
    perdoc AS (
      SELECT p.doc_id,
             count(*) AS n_positions,
             CAST(sum(CASE WHEN d.df >= {DUPNGRAM_MIN_DOCS} THEN 1 ELSE 0 END)
               AS BIGINT) AS n_dup_positions
      FROM pos p JOIN docfreq d USING (g)
      GROUP BY p.doc_id
    )
    SELECT doc_id, n_positions, n_dup_positions,
           ((n_dup_positions * 2000000 + n_positions)
              // (2 * n_positions)) / 1000000.0 AS dup_frac
    FROM perdoc
"""


def docs_lang_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """α=0.5 temperature rebalancing over the skewed `lang` column
    (operators/sampling.py:temperature_sample): kept docs per language
    ∝ sqrt(n_lang), so `en` (the dominant language) downsamples and the
    tail keeps its smallest member whole. The Bernoulli trial is an
    exact integer predicate on the md5(doc_id) bucket — reproducible
    across engines, no float threshold."""
    from redpanda_to_parquet_writer_spark.operators.sampling import (
        temperature_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    return temperature_sample(docs, "lang", "doc_id")


QUERIES["docs_lang_temperature_sample"] = docs_lang_temperature_sample

ORACLES["docs_lang_temperature_sample"] = """
    WITH counts AS (
      SELECT lang, count(*) AS n_group FROM documents GROUP BY lang
    ),
    rates AS (
      SELECT lang, n_group, (SELECT min(n_group) FROM counts) AS n_min
      FROM counts
    ),
    trials AS (
      SELECT d.doc_id, d.lang, r.n_group, r.n_min,
             CAST(concat('0x', substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 1000000 AS bucket
      FROM documents d JOIN rates r USING (lang)
    )
    SELECT doc_id, lang, n_group, n_min, bucket
    FROM trials
    WHERE CAST(bucket AS HUGEINT) * bucket * n_group
          < CAST(1000000 AS HUGEINT) * 1000000 * n_min
"""

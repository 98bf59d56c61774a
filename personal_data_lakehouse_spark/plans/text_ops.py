"""Text-analysis & dedup query surface (LLM-data-pipeline extensions).

Every operator here is what a large-scale training-data pipeline runs over
a document corpus: quality features, token counting, language ID,
fingerprinting, exact dedup, MinHash+LSH / SimHash / n-gram-Jaccard
near-dedup. All are built-in-expression DataFrame plans (no Python UDFs) and
each carries an exact DuckDB oracle — including the MinHash and SimHash
math, which use engine-neutral md5-derived hashes precisely so an external
oracle can replay them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from personal_data_lakehouse_spark.dedup.exact import exact_dedup
from personal_data_lakehouse_spark.dedup.minhash import (
    lsh_candidate_pairs,
    minhash_signatures,
)
from personal_data_lakehouse_spark.dedup.ngram import shingle_jaccard
from personal_data_lakehouse_spark.dedup.simhash import simhash
from personal_data_lakehouse_spark.functions.text import (
    BPE_SPLIT_PATTERN,
    STOPWORDS,
    fingerprint,
    lang_id,
    quality_features,
    stopword_hits,
    token_count_bpe,
    token_count_whitespace,
    tokens,
    word_shingles,
)
from personal_data_lakehouse_spark.plans.registry import query, t

# --- shared DuckDB fragments (mirror functions.text / dedup exactly) -------
_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
_TOKS = f"string_split({_NORM}, ' ')"
_SHINGLES = (
    "CASE WHEN len(w) >= 3 THEN list_distinct(list_transform("
    "range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) "
    "ELSE [] END"
)
# 60-bit md5 fold mod p — identical to dedup.minhash._base_hash.
_P = 2147483647
_XS = (
    "list_transform(shingles, s -> "
    "list_reduce(list_transform(range(1, 16), "
    "i -> (strpos('0123456789abcdef', md5(s)[i]) - 1)::BIGINT), "
    f"(a, b) -> a * 16 + b) % {_P})"
)


def _sig_sql() -> str:
    """DuckDB minhash signature from the same seed-pinned (a,b) family."""
    from personal_data_lakehouse_spark.dedup.minhash import hash_family

    mins = ", ".join(
        f"list_min(list_transform(xs, x -> ({a}::BIGINT * x + {b}) % {_P}))"
        for a, b in hash_family(16)
    )
    return f"[{mins}]"


def _stopword_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


@query(
    "t_text_stats",
    oracle=rf"""
    SELECT doc_id,
           CAST(length(text) AS INT) AS n_chars,
           CAST(len(w) AS INT) AS n_words,
           CAST(len(list_distinct(w)) AS INT) AS n_distinct_words,
           ROUND(CAST(length(text) - (len(w) - 1) AS DOUBLE) / len(w), 6)
               AS avg_word_len,
           ROUND(CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 6)
               AS distinct_ratio,
           ROUND(CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE)
                 / length(text), 6) AS punct_ratio,
           ROUND(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                 / length(text), 6) AS digit_ratio
    FROM (SELECT doc_id, text, {_TOKS} AS w FROM documents)
    """,
)
def t_text_stats(spark, sf_dir):
    """Quality-scoring features per document (length/word/symbol ratios) —
    a narrow map stage, built-in expressions only."""
    d = t(spark, sf_dir, "documents")
    feats = quality_features("text")
    return d.select("doc_id", *[c.alias(n) for n, c in feats.items()])


@query(
    "t_token_count",
    oracle=rf"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS INT) AS n_tokens_ws,
           CAST(len(regexp_extract_all(text, '{BPE_SPLIT_PATTERN}')) AS INT)
               AS n_tokens_bpe
    FROM documents
    """,
)
def t_token_count(spark, sf_dir):
    """Token counting: whitespace tokens + BPE-ish regex pre-tokens."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count_whitespace("text").alias("n_tokens_ws"),
        token_count_bpe("text").alias("n_tokens_bpe"),
    )


@query(
    "t_lang_id",
    oracle=f"""
    SELECT doc_id, hits_en, hits_es, hits_de, hits_fr,
           CASE WHEN hits_en >= hits_es AND hits_en >= hits_de AND hits_en >= hits_fr
                     THEN 'en'
                WHEN hits_es >= hits_de AND hits_es >= hits_fr THEN 'es'
                WHEN hits_de >= hits_fr THEN 'de'
                ELSE 'fr' END AS predicted_lang,
           actual_lang
    FROM (
        SELECT doc_id, lang AS actual_lang,
               CAST(len(list_intersect(w, {_stopword_list("en")})) AS INT) AS hits_en,
               CAST(len(list_intersect(w, {_stopword_list("es")})) AS INT) AS hits_es,
               CAST(len(list_intersect(w, {_stopword_list("de")})) AS INT) AS hits_de,
               CAST(len(list_intersect(w, {_stopword_list("fr")})) AS INT) AS hits_fr
        FROM (SELECT doc_id, lang, list_distinct({_TOKS}) AS w FROM documents)
    )
    """,
)
def t_lang_id(spark, sf_dir):
    """Stopword-overlap language ID (deterministic tie-break en>es>de>fr)."""
    d = t(spark, sf_dir, "documents")
    toks = tokens("text")
    return d.select(
        "doc_id",
        stopword_hits(toks, "en").alias("hits_en"),
        stopword_hits(toks, "es").alias("hits_es"),
        stopword_hits(toks, "de").alias("hits_de"),
        stopword_hits(toks, "fr").alias("hits_fr"),
        lang_id(toks).alias("predicted_lang"),
        F.col("lang").alias("actual_lang"),
    )


@query(
    "t_fingerprint",
    oracle=f"""
    SELECT doc_id, md5({_NORM}) AS fp, source FROM documents
    """,
)
def t_fingerprint(spark, sf_dir):
    """Document fingerprint: md5 over whitespace-normalized lowercase text
    (rolling-hash-class canonical key for exact dedup)."""
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint("text").alias("fp"), "source")


@query(
    "t_dedup_exact",
    oracle=f"""
    SELECT md5({_NORM}) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
    FROM documents GROUP BY 1
    """,
)
def t_dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on the fingerprint, min-id survivor."""
    return exact_dedup(t(spark, sf_dir, "documents"))


@query(
    "t_minhash_signatures",
    oracle=f"""
    SELECT doc_id,
           md5(list_aggregate(list_transform(sig, v -> v::VARCHAR),
                              'string_agg', '|')) AS sig_digest,
           CAST(len(shingles) AS INT) AS n_shingles
    FROM (
        SELECT doc_id, shingles, {{sig}} AS sig
        FROM (SELECT doc_id, shingles, {_XS} AS xs
              FROM (SELECT doc_id, {_SHINGLES} AS shingles
                    FROM (SELECT doc_id, {_TOKS} AS w FROM documents)))
    )
    """.replace("{sig}", _sig_sql()),
)
def t_minhash_signatures(spark, sf_dir):
    """MinHash signatures (k=16, 3-word shingles, universal-hash family),
    digest-checked against the oracle — verifies the full shingle→minhash
    math per document."""
    sigs = minhash_signatures(t(spark, sf_dir, "documents"))
    return sigs.select(
        "doc_id",
        F.md5(
            F.concat_ws("|", F.transform(F.col("sig"), lambda v: v.cast("string")))
        ).alias("sig_digest"),
        "n_shingles",
    )


@query(
    "t_minhash_lsh_pairs",
    oracle=f"""
    WITH sig AS (
        SELECT doc_id, shingles, {{sig}} AS sig
        FROM (SELECT doc_id, shingles, {_XS} AS xs
              FROM (SELECT doc_id, {_SHINGLES} AS shingles
                    FROM (SELECT doc_id, {_TOKS} AS w FROM documents)))
    ), bands AS (
        SELECT doc_id, shingles, b,
               md5(sig[b*4+1]::VARCHAR || '|' || sig[b*4+2]::VARCHAR || '|' ||
                   sig[b*4+3]::VARCHAR || '|' || sig[b*4+4]::VARCHAR) AS bucket
        FROM sig, unnest([0, 1, 2, 3]) AS u(b)
    ), pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
               a.shingles AS sh_a, c.shingles AS sh_b
        FROM bands a JOIN bands c
          ON a.b = c.b AND a.bucket = c.bucket AND a.doc_id < c.doc_id
    )
    SELECT id_a, id_b,
           ROUND(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
                 / len(list_distinct(list_concat(sh_a, sh_b))), 6) AS jaccard
    FROM pairs
    """.replace("{sig}", _sig_sql()),
)
def t_minhash_lsh_pairs(spark, sf_dir):
    """MinHash+LSH near-dup candidates (b=4 bands × r=4 rows) with exact
    shingle-Jaccard verification — the scale path for fuzzy dedup."""
    return lsh_candidate_pairs(t(spark, sf_dir, "documents"))


@query(
    "t_ngram_jaccard_blocked",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, lang, n_chars // 8 AS szb, {_SHINGLES} AS sh
        FROM (SELECT doc_id, lang, n_chars, {_TOKS} AS w FROM documents)
    )
    SELECT a.doc_id AS id_a, c.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.sh, c.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.sh, c.sh))), 6) AS jaccard
    FROM d a JOIN d c
      ON a.lang = c.lang AND a.szb = c.szb AND a.doc_id < c.doc_id
    """,
)
def t_ngram_jaccard_blocked(spark, sf_dir):
    """Exact n-gram Jaccard within (lang, length-bucket) blocks — the
    blocked-quadratic pattern every near-dedup verifier uses."""
    d = t(spark, sf_dir, "documents")
    block = F.concat_ws(
        "|", F.col("lang"), F.floor(F.col("n_chars") / 8).cast("string")
    )
    return shingle_jaccard(d, block)


@query(
    "t_simhash",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               list_distinct(string_split(
                   trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
        FROM documents
    ), h AS (
        SELECT doc_id,
               list_transform(w, t ->
                   list_reduce(
                       list_transform(range(1, 16),
                           i -> (strpos('0123456789abcdef', md5(t)[i]) - 1)::BIGINT),
                       (a, b) -> a * 16 + b)) AS hashes
        FROM toks
    )
    SELECT doc_id,
           list_reduce(list_transform(range(0, 60), j ->
               CASE WHEN list_reduce(
                             list_transform(hashes, v -> ((v >> j) & 1) * 2 - 1),
                             (a, b) -> a + b) >= 0
                    THEN (1::BIGINT << j) ELSE 0::BIGINT END),
               (a, b) -> a + b) AS simhash
    FROM h
    """,
)
def t_simhash(spark, sf_dir):
    """SimHash 60-bit sketches from md5-derived token hashes — bitwise
    reproducible in the oracle (engine-neutral hash family)."""
    return simhash(t(spark, sf_dir, "documents"))


@query(
    "t_quality_filter",
    oracle=rf"""
    SELECT doc_id, n_words, avg_word_len, punct_ratio, distinct_ratio,
           (n_words >= 10 AND n_words <= 1000
            AND avg_word_len >= 2.0 AND avg_word_len <= 12.0
            AND punct_ratio <= 0.2
            AND distinct_ratio >= 0.3) AS keep
    FROM (
        SELECT doc_id,
               CAST(len(w) AS INT) AS n_words,
               ROUND(CAST(length(text) - (len(w) - 1) AS DOUBLE) / len(w), 6)
                   AS avg_word_len,
               ROUND(CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE)
                     / length(text), 6) AS punct_ratio,
               ROUND(CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 6)
                   AS distinct_ratio
        FROM (SELECT doc_id, text, {_TOKS} AS w FROM documents))
    """,
)
def t_quality_filter(spark, sf_dir):
    """The C4-style keep/drop decision: thresholded conjunction over the
    quality features — the actual FILTER stage of a training-data pipeline
    (here emitted as a boolean column so the oracle can check both kept
    and dropped rows). Map-only; at 100 TB this is a pushdown-friendly
    predicate over precomputed feature columns."""
    d = t(spark, sf_dir, "documents")
    feats = quality_features("text")
    scored = d.select(
        "doc_id",
        feats["n_words"].alias("n_words"),
        feats["avg_word_len"].alias("avg_word_len"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["distinct_ratio"].alias("distinct_ratio"),
    )
    keep = (
        (F.col("n_words") >= 10) & (F.col("n_words") <= 1000)
        & (F.col("avg_word_len") >= 2.0) & (F.col("avg_word_len") <= 12.0)
        & (F.col("punct_ratio") <= 0.2)
        & (F.col("distinct_ratio") >= 0.3)
    )
    return scored.withColumn("keep", keep)


_SIMHASH_CTE = r"""
    toks AS (
        SELECT doc_id,
               list_distinct(string_split(
                   trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
        FROM documents
    ), h AS (
        SELECT doc_id,
               list_transform(w, t ->
                   list_reduce(
                       list_transform(range(1, 16),
                           i -> (strpos('0123456789abcdef', md5(t)[i]) - 1)::BIGINT),
                       (a, b) -> a * 16 + b)) AS hashes
        FROM toks
    ), sk AS (
        SELECT doc_id,
               list_reduce(list_transform(range(0, 60), j ->
                   CASE WHEN list_reduce(
                                 list_transform(hashes, v -> ((v >> j) & 1) * 2 - 1),
                                 (a, b) -> a + b) >= 0
                        THEN (1::BIGINT << j) ELSE 0::BIGINT END),
                   (a, b) -> a + b) AS simhash
        FROM h
    )
"""


@query(
    "t_simhash_neardup",
    oracle=f"""
    WITH {_SIMHASH_CTE},
    banded AS (
        SELECT doc_id, b AS band, (simhash >> (b * 15)) & 32767 AS bandval
        FROM sk, unnest([0, 1, 2, 3]) AS u(b)
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
        FROM banded a JOIN banded c
          ON a.band = c.band AND a.bandval = c.bandval
         AND a.doc_id < c.doc_id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming
    FROM pairs
    JOIN sk sa ON sa.doc_id = id_a
    JOIN sk sb ON sb.doc_id = id_b
    WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 8
    """,
)
def t_simhash_neardup(spark, sf_dir):
    """SimHash near-dup pairs: band the 60-bit sketch into 4×15-bit keys,
    equi-join candidates within a band bucket, verify with exact
    bit_count(xor) <= 8 — the constant-space counterpart to MinHash (one
    integer per doc instead of a shingle set)."""
    from personal_data_lakehouse_spark.dedup.simhash import (
        simhash_neardup_pairs,
    )

    return simhash_neardup_pairs(t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Cross-document boilerplate span mining


@query(
    "t_boilerplate_spans",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, unnest({_SHINGLES}) AS s
        FROM (SELECT doc_id, {_TOKS} AS w FROM documents) d
    ),
    common AS (
        SELECT s, COUNT(DISTINCT doc_id) AS n_docs
        FROM sh GROUP BY s HAVING COUNT(DISTINCT doc_id) >= 5
    )
    SELECT sh.doc_id,
           COUNT(*) AS n_boiler_spans,
           CAST(MAX(common.n_docs) AS BIGINT) AS max_span_reach
    FROM sh JOIN common ON sh.s = common.s
    GROUP BY sh.doc_id
    """,
)
def t_boilerplate_spans(spark, sf_dir):
    """Cross-document boilerplate mining: 3-word spans appearing in ≥5
    distinct docs (headers, footers, license blurbs at production scale)
    counted back per document — the detection step before span-level
    boilerplate stripping in an LLM cleaning pipeline. Two passes over the
    exploded shingles: a grouped distinct-count finds the common spans
    (shuffle keyed on the span string — cardinality grows with corpus, no
    skew since list_distinct caps per-doc repeats), then the span set —
    tiny after the HAVING — broadcasts back for the per-doc rollup, so the
    second pass never shuffles the corpus. Unlike t_contamination (corpus
    vs held-out benchmark) this is corpus-vs-itself discovery.

    spread(): the shingle construction is CPU-bound string work, so an
    unsplittable single-row-group scan must be fanned across cores first
    (no-op at scale where the scan already yields many splits)."""
    from personal_data_lakehouse_spark.operators.partitioning import spread

    docs = spread(t(spark, sf_dir, "documents"))
    sh = docs.select(
        "doc_id", F.explode(word_shingles(tokens("text"))).alias("s")
    )
    common = (
        sh.groupBy("s")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 5)
    )
    return (
        sh.join(F.broadcast(common), "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_boiler_spans"),
            F.max("n_docs").cast("long").alias("max_span_reach"),
        )
    )

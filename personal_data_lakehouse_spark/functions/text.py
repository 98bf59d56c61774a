"""Text-analysis column builders (LLM-data-pipeline extension ops).

All hot-path functions are built-in Spark SQL expressions (JVM-side,
codegen'd, no Python in the loop) — including the shingling and hashing that
feed MinHash/SimHash dedup. At 100 TB these run as narrow map stages with
zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from personal_data_lakehouse_spark.functions import normalize_text

# A BPE-ish pre-tokenization: letter runs, digit runs, single non-space
# symbols — the standard byte-pair-encoding pre-split shape.
BPE_SPLIT_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deterministic and SQL-expressible (the oracle uses the same
# lists), which is the point — not linguistic completeness.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "de": ["der", "die", "das", "und", "ist", "von", "ein", "zu"],
    "fr": ["le", "la", "de", "et", "un", "est", "dans", "que"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(normalize_text(col), " ")


def word_shingles(tokens_col: Column, n: int = 3) -> Column:
    """Distinct n-word shingles (order-preserving windows, then dedup).

    Guarded for texts shorter than n words (empty array, matching the
    oracle's CASE branch)."""
    toks = tokens_col
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    window = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + k) for k in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(window)).otherwise(
        F.array().cast("array<string>")
    )


def token_count_whitespace(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("int")


def token_count_bpe(col: Column | str) -> Column:
    """Count of BPE-ish pre-tokens (regexp-driven, JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_SPLIT_PATTERN)).cast("int")


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercased text.

    The canonical exact-dedup key; identical across engines, so it doubles
    as an oracle-checkable hash."""
    return F.md5(normalize_text(col))


def stopword_hits(tokens_col: Column, lang: str) -> Column:
    """Number of distinct stopwords of ``lang`` present in the text."""
    vocab = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(F.array_distinct(tokens_col), vocab)).cast("int")


def lang_id(tokens_col: Column) -> Column:
    """Stopword-overlap language ID with a fixed tie-break order
    (en > es > de > fr) so the prediction is deterministic."""
    hits = {lang: stopword_hits(tokens_col, lang) for lang in STOPWORDS}
    en, es, de, fr = hits["en"], hits["es"], hits["de"], hits["fr"]
    return (
        F.when((en >= es) & (en >= de) & (en >= fr), "en")
        .when((es >= de) & (es >= fr), "es")
        .when(de >= fr, "de")
        .otherwise("fr")
    )


def quality_features(text_col: Column | str) -> dict[str, Column]:
    """Quality-scoring feature set: length, word stats, symbol ratios.

    Ratios are double math over exact int counts → deterministic."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = tokens(c)
    n_chars = F.length(c).cast("int")
    n_words = F.size(toks).cast("int")
    n_distinct = F.size(F.array_distinct(toks)).cast("int")
    n_punct = F.regexp_count(c, F.lit(r"[^\w\s]")).cast("int")
    n_digit = F.regexp_count(c, F.lit(r"[0-9]")).cast("int")
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "n_distinct_words": n_distinct,
        "avg_word_len": F.round(
            (n_chars - (n_words - 1)).cast("double") / n_words, 6
        ),
        "distinct_ratio": F.round(n_distinct.cast("double") / n_words, 6),
        "punct_ratio": F.round(n_punct.cast("double") / n_chars, 6),
        "digit_ratio": F.round(n_digit.cast("double") / n_chars, 6),
    }

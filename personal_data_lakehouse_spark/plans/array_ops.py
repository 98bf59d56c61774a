"""Nested-type operator surface, wave 4: arrays, maps, higher-order functions.

The reference's data model is strictly flat — "No nested structs, arrays,
maps, or intervals appear anywhere" (SURVEY §1.3) — but the north-star
extension tables (`documents.text`, `embeddings.embedding array<float>`)
make the nested-type surface a first-class requirement: tokenization
produces arrays, LSH signatures are arrays, and every embedding op is a
higher-order traversal. This module proves that surface end-to-end against
DuckDB's list/lambda dialect.

Determinism discipline (same as every plans module): float positions are
quantized to integers BEFORE any reassociable reduction (float32→double is
exact, ×1000 and round are single correctly-rounded ops in both engines;
Spark's ROUND and DuckDB's round() both round half away from zero), window
ORDER BYs carry a unique tie-break, and collect_list nondeterminism is
neutralized with array_sort before map construction.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from personal_data_lakehouse_spark.functions.text import normalize_text, tokens
from personal_data_lakehouse_spark.plans.registry import query, t
from personal_data_lakehouse_spark.plans.text_ops import _NORM, _TOKS

# ---------------------------------------------------------------------------
# Higher-order functions over embedding vectors


@query(
    "q_higher_order_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           CAST(list_sum(list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)))
                AS BIGINT) AS q_sum,
           CAST(list_sum(list_transform(embedding,
                x -> abs(CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))))
                AS BIGINT) AS q_l1
    FROM embeddings
    """,
)
def q_higher_order_funcs(spark, sf_dir):
    """Array higher-order functions — filter / transform / aggregate — over
    the embedding column, the idiom behind every vector feature extractor.
    All three lambdas run inside codegen on the JVM (no Python), per-row and
    shuffle-free: at 100 TB this is a pure map stage that scales linearly
    with input splits. Quantize-then-sum keeps the reduction in exact
    integer arithmetic (float sums reassociate; integer sums don't care)."""
    emb = t(spark, sf_dir, "embeddings")
    qx = lambda x: F.round(x.cast("double") * 1000, 0).cast("long")  # noqa: E731
    return emb.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_pos"),
        F.aggregate(
            F.transform("embedding", qx),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("q_sum"),
        F.aggregate(
            F.transform("embedding", lambda x: F.abs(qx(x))),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("q_l1"),
    )


# ---------------------------------------------------------------------------
# Positional explode (ordinality)


@query(
    "q_posexplode_tokens",
    oracle=f"""
    SELECT doc_id, ord, term FROM (
        SELECT doc_id,
               unnest(range(1, len(w) + 1)) AS ord,
               unnest(w) AS term
        FROM (SELECT doc_id, {_TOKS} AS w FROM documents) u
    ) z WHERE ord <= 5
    """,
)
def q_posexplode_tokens(spark, sf_dir):
    """Ordinality-preserving explode: each document's first five tokens with
    their 1-based position — the prefix-feature shape (leading-token
    heuristics, title extraction). posexplode is pipelined map-side output,
    zero shuffles; the position filter cuts fan-out 40× before anything
    downstream."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.posexplode(tokens("text")).alias("pos", "term"))
        .filter(F.col("pos") < 5)
        .select("doc_id", (F.col("pos") + 1).cast("long").alias("ord"), "term")
    )


# ---------------------------------------------------------------------------
# Map construction / explosion roundtrip


@query(
    "q_map_roundtrip",
    oracle="""
    SELECT l_linestatus, l_returnflag, COUNT(*) AS cnt
    FROM lineitem GROUP BY l_linestatus, l_returnflag
    """,
)
def q_map_roundtrip(spark, sf_dir):
    """Map-typed aggregation state: per linestatus, build a returnflag→count
    map (collect_list → array_sort → map_from_entries), then explode it back
    to rows. Proves the map surface produces exactly the flat group-by it
    encodes. array_sort neutralizes collect_list's partition-order
    nondeterminism — required for any map built from a shuffle. The wide map
    row is the serving-layer shape (one row per entity, metrics keyed
    inside); at scale the first aggregation does the heavy lifting and the
    map build runs on the already-tiny grouped output."""
    li = t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_linestatus", "l_returnflag").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    maps = counts.groupBy("l_linestatus").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("l_returnflag", "cnt")))
        ).alias("by_flag")
    )
    return maps.select(
        "l_linestatus", F.explode("by_flag").alias("l_returnflag", "cnt")
    )


# ---------------------------------------------------------------------------
# Character n-gram language profile


@query(
    "t_char_trigram_profile",
    oracle=f"""
    WITH nt AS (
        SELECT lang, {_NORM} AS nt FROM documents WHERE length({_NORM}) >= 3
    ),
    tri AS (
        SELECT lang, substr(nt, CAST(i AS INT), 3) AS tri
        FROM (SELECT lang, nt, unnest(range(1, length(nt) - 1)) AS i FROM nt) u
    ),
    c AS (SELECT lang, tri, COUNT(*) AS cnt FROM tri GROUP BY lang, tri)
    SELECT lang, tri, cnt, rk FROM (
        SELECT lang, tri, cnt,
               CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                       ORDER BY cnt DESC, tri) AS BIGINT) AS rk
        FROM c
    ) r WHERE rk <= 10
    """,
)
def t_char_trigram_profile(spark, sf_dir):
    """Character-trigram frequency profile per language — the classic
    n-gram-profile language-ID model (Cavnar-Trenkle textcat): top-10
    trigrams by count, tie-broken lexicographically. The explode is a map
    stage (fan-out ≈ text length); the profile aggregation reduces to
    |langs|×|trigrams| rows, tiny at any corpus scale, so the single shuffle
    carries already-combined partial counts (partial hash agg map-side)."""
    docs = t(spark, sf_dir, "documents")
    nt = docs.select("lang", normalize_text("text").alias("nt")).filter(
        F.length("nt") >= 3
    )
    tri = nt.select(
        "lang",
        F.explode(F.sequence(F.lit(1), F.length("nt") - 2)).alias("i"),
        "nt",
    ).select("lang", F.expr("substring(nt, i, 3)").alias("tri"))
    c = tri.groupBy("lang", "tri").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), "tri")
    return (
        c.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 10)
        .select("lang", "tri", "cnt", "rk")
    )


# ---------------------------------------------------------------------------
# Corpus-familiarity quality score (bigram LM without floats)


@query(
    "t_bigram_familiarity",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_TOKS} AS w FROM documents),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w)),
                                     i -> w[i] || ' ' || w[i + 1])) AS bg
        FROM w WHERE len(w) >= 2
    ),
    c AS (SELECT bg, COUNT(*) AS cnt FROM bg GROUP BY bg)
    SELECT b.doc_id,
           CAST(SUM(c.cnt) AS BIGINT) AS familiarity_sum,
           COUNT(*) AS n_bigrams,
           CAST(MIN(c.cnt) AS BIGINT) AS rarest_cnt
    FROM bg b JOIN c USING (bg)
    GROUP BY b.doc_id
    """,
)
def t_bigram_familiarity(spark, sf_dir):
    """Corpus-familiarity scoring: each document's bigrams weighted by their
    corpus-wide frequency — the integer-exact core of an n-gram LM
    perplexity filter (a doc whose bigrams are rare corpus-wide is unusual;
    downstream divides familiarity_sum / n_bigrams, a single float op).
    Two aggregations keyed on the bigram then doc_id; the corpus bigram
    count table is vastly smaller than the corpus (vocab², zipf-truncated)
    so the join back is broadcast-able at scale, keeping the per-doc
    aggregation a single shuffle on doc_id."""
    docs = t(spark, sf_dir, "documents")
    toks = tokens("text")
    bg = (
        docs.select("doc_id", toks.alias("w"))
        .filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1), "
                    "i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"
                )
            ).alias("bg"),
        )
    )
    c = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        bg.join(F.broadcast(c), "bg")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("familiarity_sum"),
            F.count(F.lit(1)).alias("n_bigrams"),
            F.min("cnt").alias("rarest_cnt"),
        )
    )

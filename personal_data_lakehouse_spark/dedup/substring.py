"""Exact-substring dedup building blocks: content-defined gram sampling
shared by the batch operator (plans/round5_ops.t_substring_dedup — the
full Lee-et-al span decision with its DuckDB oracle) and the STREAMING
ingest probe below.

The selection rule is the one the registered operator pins: every
``gram_len``-char gram is md5-hashed and kept when the hex digest starts
with '0' (a content-defined 1/16 bucket — the selection travels with the
text, so a span shared at different offsets selects the same grams;
position-strided sampling provably cannot do this). Reference capability:
Lee et al., "Deduplicating Training Data Makes Language Models Better"
(the substring-dedup north star in BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GRAM_LEN = 64
# Viral-gram guard (boilerplate): corpus grams occurring more often than
# this are dropped from the index so one hot hash key cannot fan the probe
# join out quadratically.
OCC_CAP = 64


def positional_grams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_len: int = GRAM_LEN,
) -> DataFrame:
    """(id, p, gh): 1-based char position + md5 of every SELECTED gram.

    Pure generate/map expressions (sequence → explode → substring → md5 →
    prefix filter) — no aggregation, no window — so the same plan runs on
    a STREAMING DataFrame unchanged. ~1/16 of positions survive.
    """
    return (
        df.filter(F.length(text_col) >= gram_len)
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(
                    F.lit(1), F.length(text_col) - F.lit(gram_len - 1)
                )
            ).alias("p"),
            F.col(text_col).alias("__t"),
        )
        .select(
            id_col,
            "p",
            F.md5(
                F.expr(f"substring(__t, p, {gram_len})").cast("binary")
            ).alias("gh"),
        )
        .filter(F.substring("gh", 1, 1) == "0")
    )


def gram_index(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_len: int = GRAM_LEN,
    occ_cap: int = OCC_CAP,
) -> DataFrame:
    """Viral-capped positional gram index over the static corpus,
    coalesced + persisted (the written index on a cluster). Batch-side
    only — the occurrence cap is a corpus-global count."""
    g = positional_grams(corpus, text_col, id_col, gram_len)
    capped = (
        g.withColumn(
            "occ", F.count(F.lit(1)).over(Window.partitionBy("gh"))
        )
        .filter(F.col("occ") <= occ_cap)
        .drop("occ")
    )
    spark = corpus.sparkSession
    return capped.coalesce(spark.sparkContext.defaultParallelism).persist()


def substring_anchor_stream(
    stream_docs: DataFrame,
    corpus_index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_len: int = GRAM_LEN,
) -> DataFrame:
    """STREAMING exact-substring probe: anchors of a live document stream
    against the static corpus gram index — the substring sibling of
    ``minhash.neardup_candidate_stream`` (online crawl dedup).

    The stream side is 100% stateless (positional_grams is generate/map
    only), so gram rows emit the micro-batch their document arrives and
    state stays empty at any stream length; the stream-static join probes
    the persisted, viral-capped corpus index. Emits one ANCHOR row per
    matching gram: (batch_id, corpus_id, pb, pa, diff) with ``pb`` the
    position in the incoming doc, ``pa`` in the corpus doc, and ``diff``
    the offset delta that groups anchors of one shared span.

    Span assembly (run-merge on (pair, diff), interval union — the
    lag/cumsum stages of t_substring_dedup) is WINDOWED work a streaming
    plan forbids; run it per micro-batch in a ``foreachBatch`` consumer
    (anchors of one incoming doc always land in the same batch, so the
    merge sees every anchor it needs). Scale: per-event work is
    O(|doc|) hashing map-side; the index join fans out ≤ occ_cap rows
    per gram by construction.
    """
    probe = positional_grams(stream_docs, text_col, id_col, gram_len).select(
        F.col(id_col).alias("batch_id"), F.col("p").alias("pb"), "gh"
    )
    idx = corpus_index.select(
        F.col(id_col).alias("corpus_id"), F.col("p").alias("pa"), "gh"
    )
    return probe.join(idx, "gh").select(
        "batch_id",
        "corpus_id",
        "pb",
        "pa",
        (F.col("pb") - F.col("pa")).alias("diff"),
    )


def spans_from_anchors(
    anchors: DataFrame,
    gram_len: int = GRAM_LEN,
    merge_gap: int = 256,
) -> DataFrame:
    """Batch span assembly for ``substring_anchor_stream``'s foreachBatch
    consumer: merge anchors sharing (batch_id, corpus_id, diff) whose
    incoming-doc positions are ≤ ``merge_gap`` apart into maximal shared
    spans, then interval-union per incoming document into removable
    character mass — the same run-merge/interval-union algebra the
    registered ``t_substring_dedup`` operator pins against its DuckDB
    oracle and a pure-Python reference, applied to the (batch × corpus)
    anchor set.

    Returns one row per incoming doc: (batch_id, n_spans,
    removable_chars). Windows run over anchor/span rows only
    (candidate-bounded, never corpus rows)."""
    wd = Window.partitionBy("batch_id", "corpus_id", "diff").orderBy("pb")
    runs = (
        anchors.withColumn("prev", F.lag("pb").over(wd))
        .withColumn(
            "brk",
            F.when(
                F.col("prev").isNull()
                | (F.col("pb") - F.col("prev") > merge_gap),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "run",
            F.sum("brk").over(wd.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    spans = runs.groupBy("batch_id", "corpus_id", "diff", "run").agg(
        F.min("pb").alias("s"),
        (F.max("pb") + F.lit(gram_len - 1)).alias("e"),
    )
    iv = spans.select("batch_id", "s", "e").distinct()
    wu = Window.partitionBy("batch_id").orderBy("s", F.desc("e"))
    u = (
        iv.withColumn(
            "rmax",
            F.max("e").over(wu.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .withColumn(
            "brk",
            F.when(
                F.col("rmax").isNull() | (F.col("s") > F.col("rmax") + 1), 1
            ).otherwise(0),
        )
        .withColumn(
            "grp",
            F.sum("brk").over(wu.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    merged = u.groupBy("batch_id", "grp").agg(
        F.min("s").alias("lo"), F.max("e").alias("hi")
    )
    return merged.groupBy("batch_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("hi") - F.col("lo") + 1).alias("removable_chars"),
    )

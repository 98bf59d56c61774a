"""Distributed BPE vocabulary training.

The tokenizer-training step of an LLM data pipeline, done Spark-first: the
corpus collapses to a (distinct word, count) table in one aggregation, and
every merge round runs entirely on that weighted vocabulary — pair counting
is an explode + hash aggregate over codegen'd array lambdas, and applying a
merge is an `aggregate()` fold over each word's symbol array (greedy
left-to-right, the standard BPE semantics). No Python executes on executors.

Scale: the heavy input (the corpus) is touched ONCE. The per-round working
set is the distinct-word table — ~1e7 rows for a 100 TB web corpus, a
rounding error next to the corpus itself — so each of the N rounds is one
small shuffle plus a 1-row collect of the winning pair (the same
driver-coordinated-iteration shape as Lloyd's k-means in
plans/cluster_ops.py). Ties break (count desc, left asc, right asc), making
the merge list bit-deterministic; the equivalent sequential implementation
is pinned against it in tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _merge_pair(syms: Column, left: str, right: str, joined: str) -> Column:
    """Greedy left-to-right replacement of adjacent (left, right) with the
    merged symbol, as a JVM-side fold over the symbol array."""
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, F.lit(-1)) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(joined))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


_PAIRS = (
    "transform(sequence(1, size(syms) - 1), "
    "i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))"
)


def train_bpe(
    docs: DataFrame, text_col: str = "text", n_merges: int = 8, min_count: int = 2
) -> list[tuple[str, str, int]]:
    """Learn *n_merges* BPE merges from the corpus; returns
    [(left, right, weighted_pair_count), ...] in merge order."""
    from personal_data_lakehouse_spark.functions.text import tokens

    wc = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("cnt", F.split("w", "").alias("syms"))
        # coalesce before persist: the cache keeps the groupBy's shuffle
        # partitioning, and every merge round's pair-count + fold stage
        # inherits it — n_merges × 200 near-empty tasks under a vanilla
        # session. The DISTINCT-word table is tiny relative to the corpus;
        # one partition per core is the right layout for the loop.
        .coalesce(docs.sparkSession.sparkContext.defaultParallelism)
    )
    wc.persist()
    merges: list[tuple[str, str, int]] = []
    cur = wc
    try:
        for _ in range(n_merges):
            best = (
                cur.filter(F.size("syms") >= 2)
                .select("cnt", F.explode(F.expr(_PAIRS)).alias("p"))
                .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
                .agg(F.sum("cnt").alias("pc"))
                .orderBy(F.desc("pc"), "l", "r")
                .first()
            )
            if best is None or best.pc < min_count:
                break
            merges.append((best.l, best.r, int(best.pc)))
            nxt = cur.withColumn(
                "syms", _merge_pair(F.col("syms"), best.l, best.r, best.l + best.r)
            )
            nxt.persist()
            nxt.count()  # materialize before dropping the parent
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return merges


def encode_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained merge list — tokenize the corpus with it.

    The merges are applied IN TRAINING ORDER as a chain of the same
    JVM-side greedy folds the trainer uses, so encode ∘ train is
    self-consistent by construction. Scale shape mirrors the trainer: the
    expensive encode runs once per DISTINCT word (the ~1e7-row vocabulary,
    not the 100 TB corpus), and the corpus only pays a hash join on the
    word to pick up its token count. Returns per-document
    (n_words, n_bpe_tokens)."""
    from personal_data_lakehouse_spark.functions.text import tokens

    words = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("w")
    ).filter(F.length("w") > 0)
    col: Column = F.split("w", "")
    for left, right, _cnt in merges:
        col = _merge_pair(col, left, right, left + right)
    vocab = words.select("w").distinct().select("w", F.size(col).alias("n_sym"))
    return (
        words.join(vocab, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").alias("n_bpe_tokens"),
        )
    )

"""Exact n-gram Jaccard similarity over blocked candidate pairs.

The all-pairs Jaccard is O(n²); this operator takes any blocking column
(LSH bucket, length bucket, language, ...) and computes the exact shingle
Jaccard only within blocks. Set arithmetic is array_intersect/array_union —
built-in, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from personal_data_lakehouse_spark.functions.text import tokens, word_shingles


def shingle_jaccard(
    df: DataFrame,
    block_col: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs sharing a block value.

    Scale: one shuffle on the block key; pairs form locally per block. Block
    granularity controls the quadratic term — at 100 TB pick blocks so the
    p99 block fits one task (or salt oversized blocks).
    """
    from personal_data_lakehouse_spark.operators.partitioning import spread

    docs = spread(df).select(
        F.col(id_col),
        block_col.alias("block"),
        word_shingles(tokens(text_col), n=shingle_n).alias("sh"),
    )
    a, b = docs.alias("a"), docs.alias("b")
    inter = F.size(F.array_intersect("a.sh", "b.sh"))
    union = F.size(F.array_union("a.sh", "b.sh"))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
    )

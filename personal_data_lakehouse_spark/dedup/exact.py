"""Exact deduplication: hash-groupBy on a canonical text fingerprint.

Scale: one shuffle on the 128-bit fingerprint (uniformly distributed → no
skew), map-side partial aggregation collapses duplicates before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from personal_data_lakehouse_spark.functions.text import fingerprint


def fingerprint_docs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Attach the canonical md5 fingerprint."""
    return df.withColumn("fp", fingerprint(text_col))


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One representative (min id) per distinct normalized text.

    Returns (fp, keep_id, n_dups): the survivor and the duplicate count —
    join back on ``keep_id`` to materialize the deduplicated corpus.
    """
    return (
        fingerprint_docs(df, text_col, id_col)
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )

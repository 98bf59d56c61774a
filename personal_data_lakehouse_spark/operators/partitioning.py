"""Partitioning helpers — the knobs that make operators hold at 100 TB.

``spread`` fixes the small-input/heavy-compute case (one parquet split would
serialize CPU-bound hashing onto one core). The inverse problem — too many
tiny output files — is ``coalesce`` before the sink, applied in the writers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition a compute-heavy input across all cores when
    the scan produced fewer splits than the cluster has slots."""
    target = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target) if df.rdd.getNumPartitions() < target else df

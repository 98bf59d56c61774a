"""Similarity search over embedding columns (array<float>)."""

from personal_data_lakehouse_spark.similarity.brute_force import (
    cosine_similarity_expr,
    cosine_topk,
)
from personal_data_lakehouse_spark.similarity.lsh import signed_random_projection_topk

__all__ = ["cosine_similarity_expr", "cosine_topk", "signed_random_projection_topk"]

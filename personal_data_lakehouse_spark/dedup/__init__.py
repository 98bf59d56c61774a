"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All variants are pure DataFrame algebra over built-in expressions — no
Python UDFs — so they scale as map stages + one key-partitioned shuffle for
the candidate join.
"""

from personal_data_lakehouse_spark.dedup.exact import exact_dedup, fingerprint_docs
from personal_data_lakehouse_spark.dedup.minhash import (
    lsh_candidate_pairs,
    minhash_signatures,
)
from personal_data_lakehouse_spark.dedup.ngram import shingle_jaccard
from personal_data_lakehouse_spark.dedup.simhash import simhash

__all__ = [
    "exact_dedup",
    "fingerprint_docs",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "shingle_jaccard",
    "simhash",
]

"""Similarity-search query surface over the embeddings fixture.

Brute-force cosine top-k is the exact baseline (oracle-checked — the dot
product is a deterministic double-precision left fold both engines compute
bit-identically). SRP-LSH is the approximate scale path; its oracle SQL is
generated from the same seed-pinned hyperplanes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from personal_data_lakehouse_spark.plans.registry import query, t
from personal_data_lakehouse_spark.similarity.brute_force import cosine_topk
from personal_data_lakehouse_spark.similarity.lsh import (
    hyperplanes,
    signed_random_projection_topk,
)

_N_QUERIES = 8
_DIM = 64
_N_BITS = 8

# DuckDB-side deterministic left-fold dot product (mirrors
# similarity.brute_force.cosine_similarity_expr exactly).
def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (x, y) -> x + y)"
    )


_COS_SQL = f"{_dot_sql('qe', 'e')} / (sqrt({_dot_sql('qe', 'qe')}) * sqrt({_dot_sql('e', 'e')}))"


@query(
    "s_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
               WHERE vec_id < {_N_QUERIES}),
         c AS (SELECT vec_id, embedding AS e FROM embeddings
               WHERE vec_id >= {_N_QUERIES}),
         s AS (SELECT qid, vec_id, {_COS_SQL} AS sim FROM q, c),
         r AS (SELECT qid, vec_id, sim,
                      ROW_NUMBER() OVER (PARTITION BY qid
                                         ORDER BY sim DESC, vec_id) AS rnk
               FROM s)
    SELECT qid, rnk, vec_id, ROUND(sim, 6) AS cosine
    FROM r WHERE rnk <= 5
    """,
)
def s_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-5 for 8 query vectors against the corpus —
    broadcast queries, map-only scoring, per-query rank pushdown."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    candidates = emb.filter(F.col("vec_id") >= _N_QUERIES)
    return cosine_topk(queries, candidates, k=5)


def _srp_sig_sql(vec: str) -> str:
    """DuckDB SRP signature from the same seed-pinned hyperplanes."""
    planes = hyperplanes(_DIM, _N_BITS, seed=42)
    bits = []
    for i, plane in enumerate(planes):
        lits = ", ".join(f"{w!r}::DOUBLE" for w in plane)
        dot = (
            f"list_reduce(list_transform(range(1, len({vec}) + 1), "
            f"i -> {vec}[i]::DOUBLE * ([{lits}])[i]), (x, y) -> x + y)"
        )
        bits.append(f"CASE WHEN {dot} >= 0 THEN (1::BIGINT << {i}) ELSE 0::BIGINT END")
    return " + ".join(bits)


@query(
    "s_srp_ann_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe,
                      {_srp_sig_sql('embedding')} AS sig
               FROM embeddings WHERE vec_id < {_N_QUERIES}),
         c AS (SELECT vec_id, embedding AS e,
                      {_srp_sig_sql('embedding')} AS sig
               FROM embeddings WHERE vec_id >= {_N_QUERIES}),
         s AS (SELECT qid, vec_id, {_COS_SQL} AS sim
               FROM q JOIN c USING (sig)),
         r AS (SELECT qid, vec_id, sim,
                      ROW_NUMBER() OVER (PARTITION BY qid
                                         ORDER BY sim DESC, vec_id) AS rnk
               FROM s)
    SELECT qid, rnk, vec_id, ROUND(sim, 6) AS cosine
    FROM r WHERE rnk <= 5
    """,
)
def s_srp_ann_topk(spark, sf_dir):
    """Approximate NN via signed-random-projection LSH (8-bit signatures,
    seed=42): bucket-join instead of cross product, exact cosine re-rank
    within buckets. Oracle SQL is generated from the identical hyperplanes."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    candidates = emb.filter(F.col("vec_id") >= _N_QUERIES)
    return signed_random_projection_topk(queries, candidates, dim=_DIM, k=5)

"""Approximate nearest neighbor via signed random projection (SRP-LSH).

The scale path for similarity search: hash every vector to an n-bit
signature (sign of dot product with n fixed hyperplanes), bucket by
signature prefix, and only score candidates sharing a bucket — turning the
O(|Q|·|C|) cross product into a bucket-local join.

Hyperplanes are generated from a seeded PRNG on the driver (tiny:
n_bits × dim floats) and inlined as literals, so results are deterministic
and engine-independent. Recall/latency trade via n_bits and n_tables
(standard SRP-LSH — Charikar 2002).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from personal_data_lakehouse_spark.similarity.brute_force import (
    dot_expr,
    norm_col,
)


def hyperplanes(dim: int, n_bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (driver-side, tiny, seed-pinned)."""
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)
    ]


def srp_signature_expr(vec_col: str, planes: list[list[float]]) -> str:
    """SQL expression: n-bit SRP signature of an array<float> column.

    Bit i = 1 iff dot(vec, plane_i) >= 0; the dot is the same deterministic
    left fold used by the brute-force scorer.
    """
    bits = []
    for i, plane in enumerate(planes):
        lits = ", ".join(f"CAST({w!r} AS DOUBLE)" for w in plane)
        dot = (
            f"aggregate(zip_with({vec_col}, array({lits}), "
            f"(p, q) -> CAST(p AS DOUBLE) * q), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        bits.append(f"IF({dot} >= 0, shiftleft(CAST(1 AS BIGINT), {i}), CAST(0 AS BIGINT))")
    return " + ".join(bits)


def signed_random_projection_topk(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 5,
    n_bits: int = 8,
    seed: int = 42,
    query_id: str = "qid",
    query_vec: str = "qe",
    cand_id: str = "vec_id",
    cand_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates scored only within the query's bucket.

    One equi-join on the signature (shuffle on an 8-64 bit key) instead of
    a cross product; exact cosine re-ranks inside the bucket.
    """
    planes = hyperplanes(dim, n_bits, seed)
    qsig = queries.withColumn(
        "sig", F.expr(srp_signature_expr(query_vec, planes))
    ).withColumn("_qn", norm_col(query_vec))
    csig = candidates.withColumn(
        "sig", F.expr(srp_signature_expr(cand_vec, planes))
    ).withColumn("_cn", norm_col(cand_vec))
    joined = csig.join(F.broadcast(qsig), on="sig")
    sim = F.expr(dot_expr(query_vec, cand_vec)) / (F.col("_qn") * F.col("_cn"))
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col(cand_id))
    return (
        joined.select(F.col(query_id), F.col(cand_id), sim.alias("sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id, "rnk", cand_id, F.round("sim", 6).alias("cosine"))
    )

"""Brute-force cosine top-k — the exact baseline for ANN search.

The dot product is an explicit left fold over zip_with (built-in
higher-order functions, JVM-side): float32 inputs are widened to float64
first, so the fold is bit-reproducible across engines — the DuckDB oracle
runs the identical fold and gets the identical doubles.

Scale: queries broadcast (small side), candidates stream — a map-only
cross product followed by a per-query top-k (window with rank pushdown).
At 100 TB of vectors, cap the broadcast query set and move to the LSH/IVF
variant in ``similarity.lsh`` for the candidate-generation step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cosine_similarity_expr(a: str, b: str) -> str:
    """SQL expression: cosine similarity of two array<float> columns,
    computed as deterministic left folds in double precision."""

    def dot(x: str, y: str) -> str:
        return (
            f"aggregate(zip_with({x}, {y}, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )

    return f"{dot(a, b)} / (sqrt({dot(a, a)}) * sqrt({dot(b, b)}))"


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    query_id: str = "qid",
    query_vec: str = "qe",
    cand_id: str = "vec_id",
    cand_vec: str = "embedding",
) -> DataFrame:
    """Exact top-k nearest candidates per query by cosine similarity.

    Ties broken by candidate id; the ranking uses the unrounded double (the
    fold is engine-reproducible), the output rounds to 6dp.
    """
    joined = candidates.crossJoin(F.broadcast(queries))
    sim = F.expr(cosine_similarity_expr(query_vec, cand_vec))
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col(cand_id))
    return (
        joined.select(F.col(query_id), F.col(cand_id), sim.alias("sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            query_id,
            "rnk",
            cand_id,
            F.round("sim", 6).alias("cosine"),
        )
    )

"""IVF (inverted-file) vector index: coarse-quantize the corpus into cells,
search/dedup only within probed cells.

The scale path beyond SRP-LSH: assign every vector to its nearest centroid
(the "cell"), then

* **search**: a query probes only its ``nprobe`` nearest cells — the
  cross product shrinks from O(|Q|·|C|) to O(|Q|·|C|·nprobe/k_cells);
* **near-dup**: candidate pairs are generated cell-locally — O(Σ|cell|²)
  instead of O(|C|²), and each cell's pair generation is an independent
  partition (embarrassingly parallel, no global shuffle beyond the
  cell repartition).

The coarse codebook here is seed-pinned (fixed member vectors as
centroids) so results are deterministic and replayable by an external
oracle; swapping in k-means centroids changes recall, not the dataflow.
At 100 TB: centroids stay a broadcast table (k ≤ ~2^16 × dim floats),
assignment is a map-only stage, and cells are the shuffle key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from personal_data_lakehouse_spark.similarity.brute_force import (
    cosine_similarity_expr,
)


def pick_centroids(
    emb: DataFrame,
    ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fixed coarse codebook: the member vectors with the given ids.

    Deterministic stand-in for k-means (identical dataflow); tiny →
    always broadcast.
    """
    return emb.filter(F.col(id_col).isin(ids)).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("ce")
    )


def assign_cells(
    vectors: DataFrame,
    cents: DataFrame,
    id_col: str,
    vec_col: str,
    n: int = 1,
    out_col: str = "cell",
) -> DataFrame:
    """Attach each vector's ``n`` nearest cells (by cosine, ties → lower cid).

    Map-only against the broadcast codebook; the per-vector argmax is a
    window over k_cells rows.
    """
    w = Window.partitionBy(id_col).orderBy(F.desc("csim"), F.col("cid"))
    return (
        vectors.crossJoin(F.broadcast(cents))
        .withColumn("csim", F.expr(cosine_similarity_expr(vec_col, "ce")))
        .withColumn("crnk", F.row_number().over(w))
        .filter(F.col("crnk") <= n)
        .drop("ce", "csim", "crnk")
        .withColumnRenamed("cid", out_col)
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    cents: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    query_id: str = "qid",
    query_vec: str = "qe",
    cand_id: str = "vec_id",
    cand_vec: str = "embedding",
) -> DataFrame:
    """IVF-flat ANN: probe ``nprobe`` cells per query, exact re-rank inside.

    Candidates shuffle once on their cell; queries (with probe list) are
    broadcast — the join is cell-local.
    """
    cells = assign_cells(candidates, cents, cand_id, cand_vec, n=1)
    probes = assign_cells(queries, cents, query_id, query_vec, n=nprobe)
    joined = cells.join(F.broadcast(probes), on="cell")
    sim = F.expr(cosine_similarity_expr(query_vec, cand_vec))
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col(cand_id))
    return (
        joined.select(F.col(query_id), F.col(cand_id), sim.alias("sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id, "rnk", cand_id, F.round("sim", 6).alias("cosine"))
    )


def ivf_blocked_neardup(
    candidates: DataFrame,
    cents: DataFrame,
    threshold: float,
    cand_id: str = "vec_id",
    cand_vec: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by IVF cell.

    Pairs are generated only within a cell (id_a < id_b), scored exactly,
    and kept when round(cosine, 6) >= threshold — the embedding analogue of
    the shingle-Jaccard blocked dedup. Cell-local quadratic work scales as
    Σ|cell|² and parallelizes per cell.
    """
    cells = assign_cells(candidates, cents, cand_id, cand_vec, n=1)
    a = cells.select(
        F.col("cell"),
        F.col(cand_id).alias("id_a"),
        F.col(cand_vec).alias("va"),
    )
    b = cells.select(
        F.col("cell"),
        F.col(cand_id).alias("id_b"),
        F.col(cand_vec).alias("vb"),
    )
    sim = F.round(F.expr(cosine_similarity_expr("va", "vb")), 6)
    return (
        a.join(b, on="cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", sim)
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("id_a", "id_b", "cosine")
    )

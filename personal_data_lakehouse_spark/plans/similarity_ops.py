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
from personal_data_lakehouse_spark.similarity.ivf import (
    ivf_blocked_neardup,
    ivf_topk,
    pick_centroids,
)
from personal_data_lakehouse_spark.similarity.lsh import (
    hyperplanes,
    signed_random_projection_topk,
)

_N_QUERIES = 8
_DIM = 64
_N_BITS = 8
_CENTROID_IDS = list(range(8, 16))  # fixed coarse codebook (seed-pinned)
_NEARDUP_THRESHOLD = 0.4

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


def _cos(a: str, b: str) -> str:
    return f"{_dot_sql(a, b)} / (sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)}))"


_CENT_LIST = ", ".join(str(i) for i in _CENTROID_IDS)

# Shared oracle CTE: nearest-centroid cell assignment for every vector
# (ties → lower centroid id), replaying similarity.ivf.assign_cells.
_CELLS_SQL = f"""
    cents AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
              WHERE vec_id IN ({_CENT_LIST})),
    asg AS (SELECT vec_id, e, cid, {_cos('e', 'ce')} AS csim
            FROM (SELECT vec_id, embedding AS e FROM embeddings
                  WHERE vec_id >= {_N_QUERIES}) c, cents),
    cells AS (SELECT vec_id, e, cid AS cell FROM (
                  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                      ORDER BY csim DESC, cid) AS crnk FROM asg)
              WHERE crnk = 1)
"""


@query(
    "s_ivf_ann_topk",
    oracle=f"""
    WITH {_CELLS_SQL},
         qasg AS (SELECT qid, qe, cid, {_cos('qe', 'ce')} AS csim
                  FROM (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                        WHERE vec_id < {_N_QUERIES}) q, cents),
         probes AS (SELECT qid, qe, cid AS cell FROM (
                        SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY csim DESC, cid) AS crnk FROM qasg)
                    WHERE crnk <= 2),
         s AS (SELECT qid, vec_id, {_cos('qe', 'e')} AS sim
               FROM cells JOIN probes USING (cell)),
         r AS (SELECT qid, vec_id, sim,
                      ROW_NUMBER() OVER (PARTITION BY qid
                                         ORDER BY sim DESC, vec_id) AS rnk
               FROM s)
    SELECT qid, rnk, vec_id, ROUND(sim, 6) AS cosine
    FROM r WHERE rnk <= 5
    """,
)
def s_ivf_ann_topk(spark, sf_dir):
    """IVF-flat ANN: corpus coarse-quantized into cells (fixed 8-vector
    codebook), each query probes its 2 nearest cells, exact cosine re-rank
    inside — the candidate set shrinks ~4x vs brute force and the join is
    cell-local (cells are the shuffle key at scale)."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    candidates = emb.filter(F.col("vec_id") >= _N_QUERIES)
    cents = pick_centroids(emb, _CENTROID_IDS)
    return ivf_topk(queries, candidates, cents, k=5, nprobe=2)


@query(
    "t_embed_neardup",
    oracle=f"""
    WITH {_CELLS_SQL}
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND({_cos('a.e', 'b.e')}, 6) AS cosine
    FROM cells a JOIN cells b
      ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE ROUND({_cos('a.e', 'b.e')}, 6) >= {_NEARDUP_THRESHOLD}
    """,
)
def t_embed_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs, blocked by IVF cell: pair
    generation is cell-local (Σ|cell|² work, parallel per cell) instead of
    a corpus cross-product; exact cosine filters at the threshold."""
    emb = t(spark, sf_dir, "embeddings")
    candidates = emb.filter(F.col("vec_id") >= _N_QUERIES)
    cents = pick_centroids(emb, _CENTROID_IDS)
    return ivf_blocked_neardup(candidates, cents, threshold=_NEARDUP_THRESHOLD)


# ---------------------------------------------------------------------------
# Product-quantization ADC top-k (similarity/pq.py)

_PQ_QV = (
    "list_transform(embedding, x -> "
    "CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
)


def _pq_d2(a: str, b: str) -> str:
    """Exact integer L2² between subspace m (0-based) of two quantized
    64-dim lists — the DuckDB twin of similarity.pq._D2 over slices."""
    return (
        f"list_reduce(list_transform(range(1, 9), "
        f"i -> ({a}[m*8+i] - {b}[m*8+i]) * ({a}[m*8+i] - {b}[m*8+i])), "
        f"(x, y) -> x + y)"
    )


@query(
    "s_pq_adc_topk",
    oracle=f"""
    WITH cb AS (
      SELECT list(qv ORDER BY vec_id) AS cbk
      FROM (SELECT vec_id, {_PQ_QV} AS qv FROM embeddings
            WHERE vec_id % 31 = 0 ORDER BY vec_id LIMIT 16)
    ),
    cand AS (SELECT vec_id, {_PQ_QV} AS qv FROM embeddings
             WHERE vec_id >= {_N_QUERIES}),
    enc AS (
      SELECT vec_id,
             list_transform(range(0, 8), m ->
               list_position(list_transform(cbk, a -> {_pq_d2('a', 'qv')}),
                             list_min(list_transform(cbk, a -> {_pq_d2('a', 'qv')})))
             ) AS codes
      FROM cand, cb
    ),
    q AS (
      SELECT vec_id AS qid,
             list_transform(range(0, 8), m ->
               list_transform(cbk, a -> {_pq_d2('a', 'qv')})) AS lut
      FROM (SELECT vec_id, {_PQ_QV} AS qv FROM embeddings
            WHERE vec_id < {_N_QUERIES}) qq, cb
    ),
    scored AS (
      SELECT q.qid, enc.vec_id,
             list_reduce(list_transform(range(1, 9),
                         m -> lut[m][codes[m]]), (x, y) -> x + y)
                 AS adc_dist_q
      FROM enc, q
    ),
    r AS (
      SELECT qid, vec_id, adc_dist_q,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY adc_dist_q, vec_id) AS rnk
      FROM scored
    )
    SELECT qid, rnk, vec_id, adc_dist_q FROM r WHERE rnk <= 5
    """,
)
def s_pq_adc_topk(spark, sf_dir):
    """PQ/ADC approximate top-5: candidates carry 8 codebook codes (32×
    smaller than raw vectors at scale), queries carry exact per-subspace
    lookup tables, distance = 8 integer LUT lookups per pair — the
    IVF-PQ scoring layout (Jégou et al. 2011) as a broadcast-joined,
    codegen'd DataFrame plan with zero Python. Integer-quantized math
    makes the approximate result itself oracle-exact."""
    from personal_data_lakehouse_spark.similarity.pq import (
        adc_topk,
        build_codebook,
        encode,
    )

    emb = t(spark, sf_dir, "embeddings")
    cb = build_codebook(emb)
    cand = encode(emb.filter(F.col("vec_id") >= _N_QUERIES), cb)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    return adc_topk(queries, cand, cb, k=5)


@query(
    "s_ivf_pq_topk",
    oracle=f"""
    WITH {_CELLS_SQL},
    cb AS (
      SELECT list(qv ORDER BY vec_id) AS cbk
      FROM (SELECT vec_id, {_PQ_QV} AS qv FROM embeddings
            WHERE vec_id % 31 = 0 ORDER BY vec_id LIMIT 16)
    ),
    enc AS (
      SELECT cells.vec_id, cells.cell,
             list_transform(e, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000)
                                         AS BIGINT)) AS cq,
             list_transform(range(0, 8), m ->
               list_position(list_transform(cbk, a -> {_pq_d2('a', 'qv')}),
                             list_min(list_transform(cbk, a -> {_pq_d2('a', 'qv')})))
             ) AS codes
      FROM cells, cb,
           LATERAL (SELECT list_transform(cells.e, x ->
                      CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv) t
    ),
    qasg AS (SELECT qid, qe, cid, {_cos('qe', 'ce')} AS csim
             FROM (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                   WHERE vec_id < {_N_QUERIES}) q, cents),
    probes AS (SELECT qid, qe, cid AS cell FROM (
                   SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                       ORDER BY csim DESC, cid) AS crnk FROM qasg)
               WHERE crnk <= 2),
    qlut AS (
      SELECT qid, cell,
             list_transform(qe, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000)
                                          AS BIGINT)) AS qq,
             list_transform(range(0, 8), m ->
               list_transform(cbk, a -> {_pq_d2('a', 'qv')})) AS lut
      FROM probes, cb,
           LATERAL (SELECT list_transform(probes.qe, x ->
                      CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv) t
    ),
    adc AS (
      SELECT qlut.qid, enc.vec_id, enc.cq, qlut.qq,
             list_reduce(list_transform(range(1, 9),
                         m -> lut[m][codes[m]]), (x, y) -> x + y) AS adc_dist_q
      FROM enc JOIN qlut ON enc.cell = qlut.cell
    ),
    short AS (
      SELECT * FROM (
        SELECT qid, vec_id, cq, qq,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY adc_dist_q, vec_id) AS srnk
        FROM adc) WHERE srnk <= 30
    ),
    rer AS (
      SELECT qid, vec_id,
             list_reduce(list_transform(range(1, 65),
                         i -> (cq[i] - qq[i]) * (cq[i] - qq[i])),
                         (x, y) -> x + y) AS d2_q
      FROM short
    )
    SELECT qid, rnk, vec_id, d2_q FROM (
      SELECT qid, vec_id, d2_q,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY d2_q, vec_id) AS rnk
      FROM rer) WHERE rnk <= 5
    """,
)
def s_ivf_pq_topk(spark, sf_dir):
    """Production ANN cascade in one plan: IVF coarse cells prune the pair
    space (one candidate shuffle on cell, nprobe=2 per query), PQ codes
    score the in-cell pairs with 8 LUT lookups each, and the 30-deep
    shortlist re-ranks with exact integer L2 — the Jégou-style IVF-PQ
    topology whose every distance is a BIGINT, making the whole cascade
    hash-comparable against the SQL oracle."""
    from personal_data_lakehouse_spark.similarity.pq import (
        build_codebook,
        ivf_pq_topk,
    )

    emb = t(spark, sf_dir, "embeddings")
    cents = pick_centroids(emb, _CENTROID_IDS)
    cb = build_codebook(emb)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    candidates = emb.filter(F.col("vec_id") >= _N_QUERIES)
    return ivf_pq_topk(queries, candidates, cents, cb, k=5, nprobe=2, shortlist=30)

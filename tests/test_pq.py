"""PQ/ADC: code determinism under partitioning, JVM-only plan shape, and
shortlist+exact-rerank recall materially above a random shortlist."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from personal_data_lakehouse_spark.similarity.pq import (
    K_CODES,
    M_SUBSPACES,
    _quantized,
    adc_topk,
    build_codebook,
    encode,
)
from tests.conftest import SF_DIR

N_QUERIES = 8


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_codes_shape_and_partitioning_invariance(spark):
    emb = _emb(spark)
    cb = build_codebook(emb)
    a = encode(emb.coalesce(1), cb).select("vec_id", "codes")
    b = encode(emb.repartition(7), cb).select("vec_id", "codes")
    ra = {r.vec_id: tuple(r.codes) for r in a.collect()}
    rb = {r.vec_id: tuple(r.codes) for r in b.collect()}
    assert ra == rb  # quantized argmin is layout-independent
    for codes in list(ra.values())[:20]:
        assert len(codes) == M_SUBSPACES
        assert all(1 <= c <= K_CODES for c in codes)  # 1-based indices


def test_plan_is_jvm_side_with_broadcast_codebook(spark):
    emb = _emb(spark)
    cb = build_codebook(emb)
    cand = encode(emb.filter(F.col("vec_id") >= N_QUERIES), cb)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    plan = adc_topk(q, cand, cb)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # HOF arithmetic only
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def _exact_pairs(emb):
    c = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("cid"), _quantized("embedding").alias("cq")
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), _quantized("embedding").alias("qq")
    )
    return c.crossJoin(F.broadcast(q)).withColumn(
        "d2",
        F.expr(
            "aggregate(zip_with(cq, qq, (x, y) -> (x - y) * (x - y)), "
            "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ),
    )


def test_shortlist_rerank_recall_beats_random(spark):
    """ADC shortlist (S of N) + exact re-rank must recover the true top-5
    at well over the S/N rate a random shortlist would — the property that
    makes PQ useful as a pre-filter even on unclustered data."""
    emb = _emb(spark)
    cb = build_codebook(emb)
    cand = encode(emb.filter(F.col("vec_id") >= N_QUERIES), cb)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    pairs = _exact_pairs(emb)
    w = Window.partitionBy("qid").orderBy("d2", "cid")
    exact5 = {
        (r.qid, r.cid)
        for r in pairs.withColumn("rnk", F.row_number().over(w))
        .filter("rnk <= 5")
        .collect()
    }
    S = 100
    n_cand = cand.count()
    short = adc_topk(q, cand, cb, k=S).select(
        "qid", F.col("vec_id").alias("cid")
    )
    rerank = (
        short.join(pairs.select("qid", "cid", "d2"), ["qid", "cid"])
        .withColumn("rnk", F.row_number().over(w))
        .filter("rnk <= 5")
    )
    got = {(r.qid, r.cid) for r in rerank.collect()}
    recall = len(got & exact5) / len(exact5)
    random_rate = S / n_cand
    assert recall >= 2 * random_rate, (
        f"recall {recall:.2f} not above 2× random shortlist rate "
        f"{random_rate:.2f}"
    )

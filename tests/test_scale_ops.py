"""Salted skew join, stateful streaming tracker, vectorized cosine —
operators whose value is the physical plan, verified for semantic
equivalence against their straightforward counterparts."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from personal_data_lakehouse_spark.operators.partitioning import salted_join
from personal_data_lakehouse_spark.plans.registry import t
from personal_data_lakehouse_spark.similarity.brute_force import cosine_topk
from personal_data_lakehouse_spark.similarity.vectorized import (
    cosine_topk_vectorized,
)
from tests.conftest import SF_DIR


def test_salted_join_matches_plain_join(spark):
    # 90% of rows share one hot key — the shape that melts a plain shuffle.
    skewed = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 50)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim_val")
    )
    plain = skewed.join(small, "k").select("k", "payload", "dim_val")
    salted = salted_join(skewed, small, on=["k"]).select(
        "k", "payload", "dim_val"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_left_outer(spark):
    skewed = spark.range(0, 100).select(
        (F.col("id") % 60).alias("k"), F.col("id").alias("payload")
    )
    small = spark.range(0, 30).select(
        F.col("id").alias("k"), F.lit("d").alias("dim_val")
    )
    plain = skewed.join(small, "k", "left").select("k", "payload", "dim_val")
    salted = salted_join(skewed, small, on=["k"], how="left").select(
        "k", "payload", "dim_val"
    )
    assert sorted(
        map(tuple, plain.fillna("∅").collect())
    ) == sorted(map(tuple, salted.fillna("∅").collect()))


def test_salted_join_rejects_outer_joins(spark):
    df = spark.range(0, 10).select(F.col("id").alias("k"))
    import pytest

    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(df, df, on=["k"], how=how)


def test_stateful_user_activity_stream(spark, tmp_path):
    from personal_data_lakehouse_spark.streaming.stateful import (
        user_activity_stream,
    )
    from personal_data_lakehouse_spark.streaming.windows import stream_events

    events = stream_events(spark, f"{SF_DIR}/events.parquet")
    q = (
        user_activity_stream(events, idle_timeout_ms=None)
        .writeStream.format("memory")
        .queryName("user_activity")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM user_activity")
    batch = t(spark, SF_DIR, "events")
    expected = (
        batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    )
    got = {r.user_id: (r.n_events, r.total_value) for r in out.collect()}
    assert len(got) == len(expected)
    for r in expected:
        n, tv = got[r.user_id]
        assert n == r.n
        assert abs(tv - r.tv) < 1e-6
    assert not any(r.closed for r in out.collect())  # no timeout in one batch


def test_vectorized_cosine_agrees_with_exact(spark):
    emb = t(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    candidates = emb.filter(F.col("vec_id") >= 8)
    exact = {
        (r.qid, r.rnk): (r.vec_id, r.cosine)
        for r in cosine_topk(queries, candidates, k=5).collect()
    }
    fast = {
        (r.qid, r.rnk): (r.vec_id, r.cosine)
        for r in cosine_topk_vectorized(queries, candidates, k=5).collect()
    }
    assert set(exact) == set(fast)
    for key, (vid, cos) in exact.items():
        fvid, fcos = fast[key]
        assert fvid == vid
        assert abs(fcos - cos) < 1e-6

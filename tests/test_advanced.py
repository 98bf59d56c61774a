"""Sanity bounds for operators whose values can't be oracle-hashed, plus
as-of join edge semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__  # noqa: F401 — populates the query registry
from personal_data_lakehouse_spark.operators.asof import asof_join
from personal_data_lakehouse_spark.plans.registry import REGISTRY, t
from tests.conftest import SF_DIR


def test_approx_distinct_error_bound(spark):
    approx = {
        r.l_returnflag: (r.approx_orders, r.approx_parts)
        for r in REGISTRY["q_approx_distinct"].fn(spark, SF_DIR).collect()
    }
    exact = {
        r.l_returnflag: (r.o, r.p)
        for r in t(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("o"),
            F.countDistinct("l_partkey").alias("p"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        for a, e in zip(approx[k], exact[k]):
            assert abs(a - e) / e < 0.12  # HLL++ default rsd ~0.05, slack 2x


def test_asof_join_equal_and_missing_ts(spark):
    left = spark.createDataFrame(
        [(1, 100, "e1"), (1, 200, "e2"), (2, 50, "e3")],
        "k int, ts int, tag string",
    )
    right = spark.createDataFrame(
        [(1, 100, 10.0), (1, 150, 15.0), (3, 10, 99.0)],
        "k int, ts int, v double",
    )
    out = {
        r.tag: (r.matched_ts, r.matched_v)
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", value_cols=["v"]
        ).collect()
    }
    assert out["e1"] == (100, 10.0)  # equal ts matches (<=)
    assert out["e2"] == (150, 15.0)  # latest prior
    assert out["e3"] == (None, None)  # no reference row for key → left outer


def test_approx_percentile_error_bound(spark):
    approx = {
        r.l_returnflag: (r.qty_p50_approx, r.price_p50_approx)
        for r in REGISTRY["q_approx_percentile"].fn(spark, SF_DIR).collect()
    }
    exact = {
        r.l_returnflag: (r.qty_p50, r.price_median)
        for r in REGISTRY["q_percentiles"].fn(spark, SF_DIR).collect()
    }
    assert set(approx) == set(exact)
    for k, (qa, pa) in approx.items():
        qe, pe = exact[k]
        assert abs(qa - qe) / max(qe, 1) < 0.05
        assert abs(pa - pe) / max(pe, 1) < 0.05

"""Algebraic aggregate-state merge: merge(partial(A), partial(B)) must be
bit-equal to aggregate(A ∪ B) for any split, including keys on one side
only and empty batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from personal_data_lakehouse_spark.functions import dec
from personal_data_lakehouse_spark.operators.incremental import (
    merge_states,
    partial_state,
)
from tests.conftest import SF_DIR

MEASURES = {
    "n": ("count", "*"),
    "total": ("sum", "p_dec"),
    "lo": ("min", "p_dec"),
    "hi": ("max", "p_dec"),
}


def _prep(df):
    return df.withColumn("p_dec", dec("o_totalprice"))


def _full(orders):
    return partial_state(_prep(orders), ["o_orderpriority"], MEASURES)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_equals_full_for_any_split(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    full = _rows(_full(orders))
    for mod in (2, 3, 7):  # several disjoint splits
        a = orders.filter(F.col("o_orderkey") % mod == 0)
        b = orders.filter(F.col("o_orderkey") % mod != 0)
        merged = merge_states(
            partial_state(_prep(a), ["o_orderpriority"], MEASURES),
            partial_state(_prep(b), ["o_orderpriority"], MEASURES),
            ["o_orderpriority"],
            MEASURES,
        )
        assert _rows(merged) == full, f"split mod {mod} diverged"


def test_key_on_one_side_only_passes_through(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    prios = [r[0] for r in orders.select("o_orderpriority").distinct().collect()]
    assert len(prios) >= 2
    a = orders.filter(F.col("o_orderpriority") == prios[0])
    b = orders.filter(F.col("o_orderpriority") != prios[0])
    merged = merge_states(
        partial_state(_prep(a), ["o_orderpriority"], MEASURES),
        partial_state(_prep(b), ["o_orderpriority"], MEASURES),
        ["o_orderpriority"],
        MEASURES,
    )
    assert _rows(merged) == _rows(_full(orders))


def test_empty_delta_is_identity(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    state = _full(orders)
    empty = partial_state(
        _prep(orders.filter(F.lit(False))), ["o_orderpriority"], MEASURES
    )
    merged = merge_states(state, empty, ["o_orderpriority"], MEASURES)
    assert _rows(merged) == _rows(state)


def test_three_way_associativity(spark):
    """merge is associative: ((A+B)+C) == (A+(B+C)) == full."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    parts = [
        partial_state(
            _prep(orders.filter(F.col("o_orderkey") % 3 == i)),
            ["o_orderpriority"],
            MEASURES,
        )
        for i in range(3)
    ]
    left = merge_states(
        merge_states(parts[0], parts[1], ["o_orderpriority"], MEASURES),
        parts[2],
        ["o_orderpriority"],
        MEASURES,
    )
    right = merge_states(
        parts[0],
        merge_states(parts[1], parts[2], ["o_orderpriority"], MEASURES),
        ["o_orderpriority"],
        MEASURES,
    )
    assert _rows(left) == _rows(right) == _rows(_full(orders))


def test_hll_state_merge_equals_full_and_error_bounded(spark):
    """Sketch-state mergeability: union of per-batch HLL states estimates
    what one full-pass sketch estimates. Bit-equality holds only while the
    sketches stay in sparse mode (sf0.001); past that, DataSketches' union
    runs through an HLL_8 target representation and the merged estimate
    can differ from the single-pass one by well under 1% (observed ~0.8%
    at sf0.01) — so the contract asserted here is: merged ≈ full within
    2%, and BOTH within 5% of the true distinct count."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    full = (
        orders.groupBy("o_orderpriority")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("est"))
    )
    parts = [
        orders.filter(F.col("o_orderkey") % 3 == i)
        .groupBy("o_orderpriority")
        .agg(F.hll_sketch_agg("o_custkey").alias("s"))
        for i in range(3)
    ]
    merged = (
        parts[0]
        .unionByName(parts[1])
        .unionByName(parts[2])
        .groupBy("o_orderpriority")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("s")).alias("est"))
    )
    got = {r[0]: r[1] for r in merged.collect()}
    want = {r[0]: r[1] for r in full.collect()}
    assert set(got) == set(want)
    for k, est in got.items():
        assert abs(est - want[k]) / want[k] < 0.02, (k, est, want[k])
    exact = {
        r[0]: r[1]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey"))
        .collect()
    }
    for k in got:
        for est in (got[k], want[k]):
            assert abs(est - exact[k]) / exact[k] < 0.05, (k, est, exact[k])

"""r13: lazily-constructed merged-state frames must (a) build identical
frames to the eager merges, (b) defer construction of tables a consumer
never reads, and (c) keep the stream/MERGE paths (frames(), replace)
working unchanged. Plus the new rollup release handles (r12 ADVICE)."""

from __future__ import annotations

import os
from dataclasses import replace

import pytest
from pyspark.sql import functions as F

from personal_data_lakehouse_spark.corpus_incremental import (
    CorpusState,
    _LazyCorpusState,
    apply_increment_detailed,
    build_state_detailed,
    state_rollup,
    state_rollup_detailed,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def split(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    row = docs.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).first()
    thr = int(row["hi"]) - (int(row["hi"]) - int(row["lo"])) // 5
    return (
        docs.filter(F.col("doc_id") < thr),
        docs.filter(F.col("doc_id") >= thr),
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_lazy_fields_defer_and_memoize(spark):
    calls = {"fp": 0, "skeleton": 0}
    base = spark.range(1).selectExpr("id AS doc_id")

    def mk(name):
        def thunk():
            calls[name] += 1
            return base

        return thunk

    st = _LazyCorpusState(
        fp=mk("fp"), shingles=base, bands=base, edges=base, skeleton=mk("skeleton")
    )
    assert calls == {"fp": 0, "skeleton": 0}  # nothing built yet
    _ = st.skeleton
    assert calls == {"fp": 0, "skeleton": 1}  # only the accessed field
    _ = st.skeleton
    assert calls["skeleton"] == 1  # memoized
    assert set(st.frames()) == {"fp", "shingles", "bands", "edges", "skeleton"}
    assert calls == {"fp": 1, "skeleton": 1}  # frames() forces the rest


def test_lazy_state_replace_forces_to_plain_frames(spark):
    base = spark.range(1).selectExpr("id AS doc_id")
    st = _LazyCorpusState(
        fp=lambda: base, shingles=base, bands=base, edges=base, skeleton=base
    )
    st2 = replace(st, edges=base.selectExpr("doc_id AS x"))
    assert isinstance(st2, CorpusState)
    assert st2.fp is base  # forced through getattr, stored materialized


def test_increment_lazy_equals_eager_merges(spark, split):
    base, batch = split
    built = build_state_detailed(base)
    inc = apply_increment_detailed(built.state, batch)
    # force every lazy field and compare against a fresh eager recompute
    # over the union (the module's own parity contract)
    full = build_state_detailed(base.unionByName(batch))
    for name, frame in inc.state.frames().items():
        assert _rows(frame) == _rows(full.state.frames()[name]), name
    assert _rows(state_rollup(inc.state)) == _rows(
        state_rollup(full.state)
    )
    inc.release()
    built.release()
    full.release()
    spark.catalog.clearCache()


def test_rollup_detailed_release_path(spark, split):
    base, _batch = split
    built = build_state_detailed(base)
    res = state_rollup_detailed(built.state)
    n_before = len(
        [r for r in res.persisted if r.storageLevel.useMemory]
    )
    assert n_before == 2  # merged skeleton + canonical survivors
    res.rollup.write.format("noop").mode("overwrite").save()
    res.release()
    assert all(not f.storageLevel.useMemory for f in res.persisted)
    built.release()
    spark.catalog.clearCache()

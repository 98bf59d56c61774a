"""Bloom-filter semi-join reduction: no-false-negative property, exact
downstream-join equivalence, plan shape (codegen'd probe, no Python), and
the native Catalyst runtime-bloom injection once its size thresholds are
crossed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from personal_data_lakehouse_spark.operators.bloomjoin import (
    bloom_build,
    bloom_probe,
    bloom_semi_reduce,
)
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def li(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


@pytest.fixture(scope="module")
def dim(spark):
    return spark.read.parquet(f"{SF_DIR}/part.parquet").filter(
        F.col("p_brand") == "Brand#23"
    )


def test_no_false_negatives_and_superset(spark, li, dim):
    reduced = bloom_semi_reduce(li, dim, "l_partkey", "p_partkey")
    true_semi = li.join(dim, li.l_partkey == dim.p_partkey, "left_semi")
    n_red, n_semi = reduced.count(), true_semi.count()
    assert n_red >= n_semi  # bloom is a superset filter
    # every true match survives the bloom (no false negatives)
    missing = true_semi.join(
        reduced.select("l_orderkey", "l_linenumber"),
        ["l_orderkey", "l_linenumber"],
        "left_anti",
    )
    assert missing.count() == 0


def test_downstream_join_exact(spark, li, dim):
    reduced = bloom_semi_reduce(li, dim, "l_partkey", "p_partkey")
    j_red = reduced.join(dim, reduced.l_partkey == dim.p_partkey).count()
    j_full = li.join(dim, li.l_partkey == dim.p_partkey).count()
    assert j_red == j_full


def test_tiny_filter_high_fpp_still_correct(spark, li, dim):
    """With m shrunk to 256 bits the filter saturates — correctness must
    hold (only the reduction ratio degrades)."""
    reduced = bloom_semi_reduce(
        li, dim, "l_partkey", "p_partkey", num_bits=256, num_hashes=2
    )
    j_red = reduced.join(dim, reduced.l_partkey == dim.p_partkey).count()
    j_full = li.join(dim, li.l_partkey == dim.p_partkey).count()
    assert j_red == j_full


def test_probe_plan_is_jvm_side(spark, li, dim):
    reduced = bloom_semi_reduce(li, dim, "l_partkey", "p_partkey")
    plan = _plan(reduced)
    assert "Python" not in plan  # probe is pure column arithmetic
    assert "shiftright" in plan and "xxhash64" in plan  # codegen'd bit tests
    # the bitmap attaches as a broadcast of ONE row, not a data-sized side
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_build_is_distributed(spark, dim):
    """The bitmap build folds positions via a bit_or hash aggregate (no
    driver-side key materialization) and yields exactly one row."""
    bitmap = bloom_build(dim, "p_partkey")
    rows = bitmap.collect()
    assert len(rows) == 1
    bf = rows[0][0]
    assert isinstance(bf, dict) and len(bf) <= (1 << 17) // 64
    plan = _plan(bitmap)
    assert "bit_or" in plan or "BitOrAgg" in plan


def test_probe_empty_build_side_drops_everything(spark, li, dim):
    """An empty build side → empty (not NULL-map) bitmap; every probe row
    must fail the membership test rather than crash or pass."""
    empty = dim.filter(F.lit(False))
    bitmap = bloom_build(empty, "p_partkey")
    out = bloom_probe(li, bitmap, "l_partkey")
    assert out.count() == 0


def test_native_runtime_bloom_injects_when_thresholds_allow(spark, tmp_path):
    """Catalyst's own runtime bloom filter (enabled by default) injects a
    BloomFilterAggregate/might_contain pair once the application-side scan
    clears its size threshold — prove the session is configured such that
    the 100 TB path gets it for free by lowering the thresholds locally."""
    assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    li_path = f"{SF_DIR}/lineitem.parquet"
    part_path = f"{SF_DIR}/part.parquet"
    old = {
        k: spark.conf.get(k)
        for k in [
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        ]
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB"
        )
        # force a shuffle join: runtime filters only help non-broadcast joins
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet(li_path)
        dim = spark.read.parquet(part_path).filter(F.col("p_brand") == "Brand#23")
        j = li.join(dim, li.l_partkey == dim.p_partkey).select("l_orderkey")
        optimized = (
            j._jdf.queryExecution().optimizedPlan().toString().lower()
        )
        assert "bloomfilter" in optimized or "might_contain" in optimized
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)

"""Table maintenance: compaction bin-packs files, clustered writes produce
disjoint per-file key ranges (row-group skipping), stats drive both."""

from __future__ import annotations

from pyspark.sql import functions as F

from personal_data_lakehouse_spark.operators.maintenance import (
    clustered_write,
    compact_small_files,
    file_stats,
)
from tests.conftest import SF_DIR


def _fragmented_copy(spark, tmp_path, n_fragments=40):
    path = str(tmp_path / "frag")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    orders.repartition(n_fragments).write.parquet(path)
    return path, orders.count()


def test_compaction_binpacks_and_preserves_rows(spark, tmp_path):
    path, n = _fragmented_copy(spark, tmp_path)
    stats = compact_small_files(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert stats["files_before"] >= 40
    assert stats["files_after"] < stats["files_before"]
    assert spark.read.parquet(path).count() == n


def test_compaction_with_clustering_gives_disjoint_ranges(spark, tmp_path):
    path, n = _fragmented_copy(spark, tmp_path)
    compact_small_files(
        spark, path, target_file_bytes=32 * 1024, cluster_by=["o_orderkey"]
    )
    assert spark.read.parquet(path).count() == n
    ranges = sorted(
        (r.key_min, r.key_max)
        for r in file_stats(spark, path, key="o_orderkey").collect()
    )
    assert len(ranges) > 1  # actually split into multiple files
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo  # disjoint, ordered key ranges across files


def test_clustered_write_prunes_rowgroups(spark, tmp_path):
    """The physical payoff: a point predicate on the cluster key reads fewer
    rows than the table under pyarrow row-group statistics filtering."""
    import pyarrow.dataset as ds

    path = str(tmp_path / "clustered")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    clustered_write(li, path, cluster_by=["l_orderkey"], target_files=8)
    dataset = ds.dataset(path, format="parquet")
    frags = list(dataset.get_fragments(filter=ds.field("l_orderkey") == 1))
    matching_files = {
        f.path
        for f in frags
        if any(
            rg.statistics["l_orderkey"]["min"] <= 1 <= rg.statistics["l_orderkey"]["max"]
            for rg in f.row_groups
        )
    }
    all_files = {f.path for f in dataset.get_fragments()}
    assert len(all_files) >= 4
    assert len(matching_files) <= 2  # key 1 lives in the first range only


def test_file_stats_reports_fragmentation(spark, tmp_path):
    path, n = _fragmented_copy(spark, tmp_path, n_fragments=10)
    st = file_stats(spark, path).collect()
    assert len(st) >= 10
    assert sum(r.n_rows for r in st) == n


def test_zorder_write_prunes_both_dimensions(spark, tmp_path):
    """Z-order must give file-skipping on BOTH cluster columns, where
    single-key clustering serves only its leading column."""
    from personal_data_lakehouse_spark.operators.maintenance import zorder_write

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n = li.count()
    zpath, spath = str(tmp_path / "zorder"), str(tmp_path / "single")
    zorder_write(li, zpath, cluster_by=["l_orderkey", "l_partkey"], target_files=16)
    clustered_write(li, spath, cluster_by=["l_orderkey"], target_files=16)
    assert spark.read.parquet(zpath).count() == n

    def hit_fraction(path, key, value):
        rows = file_stats(spark, path, key=key).collect()
        hits = sum(1 for r in rows if r.key_min <= value <= r.key_max)
        return hits / len(rows), len(rows)

    # leading-key pruning: both layouts skip most files on l_orderkey
    z_ok, z_files = hit_fraction(zpath, "l_orderkey", 42)
    s_ok, s_files = hit_fraction(spath, "l_orderkey", 42)
    assert z_files >= 8 and s_files >= 8
    assert s_ok <= 2 / s_files  # single-key: near-perfect on its key
    assert z_ok <= 0.5  # z-order: still skips most files on dim 1
    # second-dimension pruning: z-order skips, single-key cannot
    z_pk, _ = hit_fraction(zpath, "l_partkey", 42)
    s_pk, _ = hit_fraction(spath, "l_partkey", 42)
    assert z_pk <= 0.5, f"z-order should skip on partkey, hit {z_pk}"
    assert s_pk >= 0.9, "single-key layout can't skip on the second dim"


def test_zorder_write_empty_input_falls_back(spark, tmp_path):
    """Empty input has all-NULL min/max stats; zorder_write must degrade to a
    plain write instead of faulting on None arithmetic."""
    from personal_data_lakehouse_spark.operators.maintenance import zorder_write

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    empty = li.filter(F.lit(False))
    path = str(tmp_path / "zempty")
    zorder_write(empty, path, cluster_by=["l_orderkey", "l_partkey"])
    assert spark.read.parquet(path).count() == 0


def test_zorder_write_null_cluster_values_sentinel_bucket(spark, tmp_path):
    """NULL cluster values land in the lowest z-bucket (sentinel 0), not an
    unclustered NULL range partition: row count is preserved and non-NULL
    key ranges stay prunable."""
    from personal_data_lakehouse_spark.operators.maintenance import zorder_write

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(5000)
    with_nulls = li.withColumn(
        "l_partkey",
        F.when(F.col("l_orderkey") % 7 == 0, F.lit(None)).otherwise(
            F.col("l_partkey")
        ),
    )
    n = with_nulls.count()
    path = str(tmp_path / "znulls")
    zorder_write(with_nulls, path, cluster_by=["l_orderkey", "l_partkey"], target_files=8)
    back = spark.read.parquet(path)
    assert back.count() == n
    assert back.filter(F.col("l_partkey").isNull()).count() == with_nulls.filter(
        F.col("l_partkey").isNull()
    ).count()


def test_write_versioned_claims_version_exclusively(spark, tmp_path):
    """Two writers that race to the same max+1 cannot clobber each other:
    the directory claim is an exclusive mkdir, so a pre-existing v2 pushes
    the next writer to v3 and both snapshots survive."""
    import os

    from personal_data_lakehouse_spark.catalog import (
        read_versioned,
        write_versioned,
    )

    path = str(tmp_path / "vt")
    df1 = spark.range(10).withColumnRenamed("id", "k")
    assert write_versioned(df1, path, keep=5) == 1
    # simulate a concurrent writer having already claimed v2
    os.mkdir(os.path.join(path, "v2"))
    v = write_versioned(df1.withColumn("k", F.col("k") + 100), path, keep=5)
    assert v == 3  # skipped the claimed v2, did not overwrite it
    assert read_versioned(spark, path).filter(F.col("k") >= 100).count() == 10
    assert read_versioned(spark, path, version=1).count() == 10


def test_manifest_skipping_prunes_files_and_preserves_results(spark, tmp_path):
    """clustered_write + write_manifest: a narrow key range plans a strict
    subset of files from the manifest alone, and the pruned read equals the
    full-scan filter exactly; an empty range reads zero rows."""
    from personal_data_lakehouse_spark.operators.maintenance import (
        clustered_write,
        plan_skipping,
        read_skipping,
        write_manifest,
    )

    path = str(tmp_path / "clustered")
    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    clustered_write(df, path, ["k"], target_files=10)
    n_recorded = write_manifest(spark, path, "k")
    assert n_recorded >= 5

    files, total = plan_skipping(spark, path, "k", lo=2_000, hi=2_999)
    assert total == n_recorded
    assert 0 < len(files) < total  # actually pruned

    got = read_skipping(spark, path, "k", lo=2_000, hi=2_999)
    want = spark.read.parquet(path).filter(F.col("k").between(2_000, 2_999))
    assert got.count() == want.count() == 1_000
    assert got.exceptAll(want).count() == 0

    none_files, _ = plan_skipping(spark, path, "k", lo=50_000)
    assert none_files == []
    assert read_skipping(spark, path, "k", lo=50_000).count() == 0


def test_manifest_skipping_rejects_wrong_key(spark, tmp_path):
    import pytest

    from personal_data_lakehouse_spark.operators.maintenance import (
        clustered_write,
        plan_skipping,
        write_manifest,
    )

    path = str(tmp_path / "clustered2")
    df = spark.range(0, 100).select(F.col("id").alias("k"), F.col("id").alias("v"))
    clustered_write(df, path, ["k"], target_files=2)
    write_manifest(spark, path, "k")
    with pytest.raises(ValueError, match="covers key"):
        plan_skipping(spark, path, "v", lo=1)


def test_manifest_staleness_guard_sees_appended_files(spark, tmp_path):
    """Files appended AFTER write_manifest must not be silently excluded
    from pruned reads (ADVICE r4): on any manifest/directory divergence the
    planner falls back to on-the-fly stats and the read stays complete."""
    import os

    from personal_data_lakehouse_spark.operators.maintenance import (
        clustered_write,
        plan_skipping,
        read_skipping,
        write_manifest,
    )

    path = str(tmp_path / "clustered3")
    df = spark.range(0, 1_000).select(F.col("id").alias("k"), F.col("id").alias("v"))
    clustered_write(df, path, ["k"], target_files=4)
    write_manifest(spark, path, "k")

    # a later writer appends rows the manifest has never seen
    extra = spark.range(5_000, 5_100).select(
        F.col("id").alias("k"), F.col("id").alias("v")
    )
    staging = str(tmp_path / "staging")
    extra.coalesce(1).write.parquet(staging)
    part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    os.rename(
        os.path.join(staging, part), os.path.join(path, f"appended-{part}")
    )

    files, total = plan_skipping(spark, path, "k", lo=5_000, hi=5_099)
    assert any("appended-" in f for f in files)  # fell back to live stats
    assert read_skipping(spark, path, "k", lo=5_000, hi=5_099).count() == 100

    # divergence the other way (a manifest-recorded file deleted) also
    # triggers the fallback instead of planning a read of a missing file
    live = [
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    os.remove(os.path.join(path, live[0]))
    files2, _ = plan_skipping(spark, path, "k")
    assert all(os.path.basename(f) != live[0] for f in files2)

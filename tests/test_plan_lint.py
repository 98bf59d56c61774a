"""Registry-wide physical-plan lint: every registered query's executed plan
is checked for the four patterns that kill a plan at 100 TB, against an
explicit per-query budget measured from the tuned plans.

The four lint patterns, and why each is (usually) a scale bug:

- ``BatchEvalPython`` / ``BatchEvalPythonUDTF`` (``py_row``): row-at-a-time
  pickled Python evaluation — 10-100× slower than Arrow-batched eval. The
  session factory turns on Arrow for both UDFs and UDTFs
  (`session.py`), so the budget for this pattern is EMPTY: any appearance
  anywhere in the registry is a regression.
- ``CartesianProduct`` (``cartesian``): an unbounded n×m join with no
  broadcast bound. Budget is EMPTY — even the deliberate cross join
  (`q_cross_join`) compiles to a BroadcastNestedLoopJoin over the tiny
  side, never a partitioned cartesian.
- ``BroadcastNestedLoopJoin`` (``bnlj``): legitimate ONLY when one side is
  provably tiny — a 1-row scalar aggregate (q_scalar_subquery,
  q_benford_digits, q11's threshold row), a k-row query-vector sample
  (s_* similarity family), a calendar spine (q_gap_fill_calendar), or a
  bounded domain table (t_mix_*). Each budgeted occurrence below was
  inspected to be one of those; a NEW un-budgeted BNLJ means Spark fell
  off an equi-join condition and is about to do corpus × corpus work.
- ``Exchange SinglePartition`` (``single_part``): a global funnel into one
  task. Legitimate only when the funneled input is already tiny (final
  scalar totals, per-table checksum rows, funnel-stage counts, a global
  quota row for water-filling). Budgeted occurrences were inspected; a
  new one on a corpus-sized intermediate is the classic
  accidental-global-window bug.

Queries NOT in the budget must lint completely clean. Budgets are upper
bounds, so removing a funnel never fails the lint; adding one does.

The 7 streaming-in-query entries execute a real micro-batch stream inside
the callable and return a scan of the file sink — their interesting plans
run inside the streaming engine (pinned by `tests/test_streaming.py` and
the goldens), so linting the returned batch tail would only re-lint a
FileScan; they are skipped here to keep the sweep plan-only.
(q_tumbling_window is NOT in this set: despite the name it is the pure
BATCH form of the window aggregate and lints like any other query.)
"""

from __future__ import annotations

import re

import __spark_entry__  # noqa: F401  — populates REGISTRY
from personal_data_lakehouse_spark.plans.registry import REGISTRY
from tests.conftest import SF_DIR

PATTERNS = {
    "py_row": re.compile(r"BatchEvalPython"),
    "cartesian": re.compile(r"CartesianProduct"),
    "bnlj": re.compile(r"BroadcastNestedLoopJoin"),
    "single_part": re.compile(r"Exchange SinglePartition"),
}

# Executes a Structured Streaming job in-query; returned DF is a sink scan.
STREAM_EXEC = {
    "q_stream_dedup",
    "q_stream_jsonl_intake",
    "q_stream_semdedup_admit",
    "q_stream_semdedup_admit_v2",
    "q_stream_session_agg",
    "q_stream_sliding_agg",
    "q_stream_static_enrich",
    "q_stream_stream_join",
    "q_stream_substring_spans",
    "q_stream_text_intake",
    "q_stream_tumbling_agg",
}

# Measured upper bounds from the tuned plans (see module docstring for the
# per-family justification). Keys absent from a query's entry are 0.
BUDGET: dict[str, dict[str, int]] = {
    "q06_revenue_forecast": {"single_part": 1},
    "q11_important_stock": {"bnlj": 1, "single_part": 1},
    "q15_top_supplier": {"single_part": 1},
    "q17_small_qty_revenue": {"single_part": 1},
    "q19_disjunctive_revenue": {"single_part": 1},
    "q22_idle_customers": {"single_part": 4},
    "q_benford_digits": {"bnlj": 1, "single_part": 1},
    "q_bloom_semi_join": {"bnlj": 1, "single_part": 1},
    "q_cross_join": {"bnlj": 1},
    "q_dbt_schema_tests": {"single_part": 8},
    "q_decile_histogram": {"single_part": 1},
    "q_drift_chisq": {"bnlj": 1, "single_part": 1},
    "q_drift_tvd": {"bnlj": 1, "single_part": 2},
    "q_funnel": {"single_part": 1},
    "q_funnel_latency": {"bnlj": 1, "single_part": 1},
    "q_funnel_time_bound": {"bnlj": 2, "single_part": 3},
    "q_gap_fill_calendar": {"bnlj": 1, "single_part": 1},
    "q_gapfill_locf": {"bnlj": 1, "single_part": 1},
    "q_not_in_null_semantics": {"single_part": 3},
    "q_open_order_concurrency": {"single_part": 1},
    "q_range_join": {"bnlj": 1},
    "q_revenue_concentration": {"bnlj": 1, "single_part": 2},
    "q_scalar_subquery": {"bnlj": 1, "single_part": 1},
    "q_skew_diagnosis": {"single_part": 1},
    "q_table_checksum": {"single_part": 3},
    "q_table_profile": {"single_part": 1},
    "q_watermark_incremental": {"single_part": 2},
    "s_ann_recall_eval": {"bnlj": 6},
    # broadcast-codebook cell assignment on each side (query probes +
    # candidate cells), the s_ivf_ann_topk shape over chunk vectors
    "s_chunk_ann_topk": {"bnlj": 2},
    # r12: the chunk-recall eval = the s_chunk_ann_topk chain (2) + the
    # brute-force ground truth's broadcast query set (1) + the exact
    # side's 8-row query spine re-joined for the zero-fill (1) — every
    # broadcast side is k-row (codebook or query chunks), never corpus
    "s_chunk_ann_recall": {"bnlj": 4},
    # r12: two IVF variants (2 bnlj each: cell assignment + probe
    # assignment), the kmeans variant's 2 Lloyd assignment rounds whose
    # 8-row codebook BroadcastExchange prints once per downstream
    # consumer REFERENCE (the textual over-count the r10 budget note
    # documents), plus the brute-force ground truth — all broadcast
    # sides are the 8-row codebook or 8-row query set
    "s_ivf_kmeans_codebook": {"bnlj": 14},
    "s_cosine_topk": {"bnlj": 1},
    "s_ivf_ann_topk": {"bnlj": 2},
    "s_ivf_pq_topk": {"bnlj": 4},
    "s_knn_graph": {"bnlj": 2},
    "s_knn_incremental": {"bnlj": 2},
    "s_pq_adc_topk": {"bnlj": 3},
    "t_curriculum_order": {"single_part": 1},
    "t_embed_neardup": {"bnlj": 2},
    "t_intake_funnel": {"single_part": 1},
    "t_mix_temperature": {"bnlj": 1, "single_part": 1},
    "t_mix_waterfill": {"bnlj": 3, "single_part": 3},
    "t_pack_sequences": {"single_part": 1},
    "t_pmi_collocations": {"bnlj": 1, "single_part": 1},
    "t_sample_token_budget": {"single_part": 1},
    # Catalyst-injected runtime bloom-filter pushdown for the final
    # corpus-labeling join: a scalar bloom_filter_agg build (bounded at
    # spark.sql.optimizer.runtime.bloomFilter.maxNumBytes), not a data
    # funnel.
    "t_semdedup_clusters": {"single_part": 1},
    # rebalance_stage's temperature thresholds: a ONE-row global-min agg
    # (single_part) broadcast-cross-joined onto the |sources|-row counts
    # (bnlj) — the t_mix_temperature scalar pattern, rows bounded by the
    # source cardinality, never the corpus.
    "t_corpus_pipeline_e2e": {"bnlj": 1, "single_part": 1},
    # same rebalance_stage scalar pattern, over the merged survivor
    # skeleton (the incremental run recomputes the thresholds — see the
    # query docstring's derived-decisions contract)
    "t_corpus_pipeline_incremental": {"bnlj": 1, "single_part": 1},
    # same scalar pattern again, over the stream-carried state's rollup
    "t_stream_corpus_increments": {"bnlj": 1, "single_part": 1},
    # r10: the v2 (semantic-stage) pipelines inherit the identical
    # rebalance_stage scalar pattern — one-row global-min agg
    # (single_part) broadcast-cross-joined onto the |sources|-row counts
    # (bnlj); the semantic additions themselves lint clean (broadcast
    # HASH join on cell, sparse-edge union collected by the adaptive
    # closure at plan build)
    "t_corpus_pipeline_sem_e2e": {"bnlj": 1, "single_part": 1},
    "t_corpus_pipeline_incremental_v2": {"bnlj": 1, "single_part": 1},
    # same scalar pattern once more, over the v2 stream-carried state's
    # rollup (the per-batch funnel runs inside foreachBatch and never
    # prints in the returned plan — the t_stream_corpus_increments shape)
    "t_stream_corpus_increments_v2": {"bnlj": 1, "single_part": 1},
    # two textual prints per swept k (the t_embed_neardup precedent:
    # the persisted cell frame's broadcast-codebook crossJoin re-prints
    # per self-join reference while EXECUTING once per k) × 2 ks
    "s_ivf_codebook_sweep": {"bnlj": 4},
    # one ivf_blocked_neardup call (bnlj × 2, t_embed_neardup precedent)
    # feeding a ONE-row global aggregate (single_part)
    "s_ivf_auto_codebook": {"bnlj": 2, "single_part": 1},
    # Catalyst-injected runtime bloom-filter pushdown for the final
    # roster-labeling join (the t_semdedup_clusters precedent): a scalar
    # bloom_filter_agg build over media ids, not a data funnel.
    "m_media_neardup": {"single_part": 1},
    "t_split_leakage_audit": {"single_part": 2},
    "t_tfidf_topterms": {"bnlj": 1, "single_part": 1},
    # r12 second wave: the coverage curve joins the |vocab|-row spectrum
    # against a 4-row broadcast target list (inequality join → bnlj) and
    # a 1-row total (cross ×2); the rank/cumsum window is the documented
    # |vocab|-row single-partition sort, textual count doubled by the
    # spectrum's two consumers (pick + coverage join) — all bounded by
    # the spectrum, never the corpus. (t_countmin_heavyhitters lints
    # clean: TakeOrdered candidates + broadcast 256-row sketch.)
    "t_vocab_coverage": {"bnlj": 3, "single_part": 4},
}


def test_registry_plans_within_lint_budget(spark):
    """Single sweep over every non-streaming registry entry; all budget
    violations are collected and reported together."""
    violations: list[str] = []
    for name, q in sorted(REGISTRY.items()):
        if name in STREAM_EXEC:
            continue
        spark.catalog.clearCache()
        df = q.fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        allowed = BUDGET.get(name, {})
        for key, pat in PATTERNS.items():
            n = len(pat.findall(plan))
            if n > allowed.get(key, 0):
                violations.append(
                    f"{name}: {key} x{n} (budget {allowed.get(key, 0)})"
                )
    spark.catalog.clearCache()
    assert not violations, "plan-lint violations:\n" + "\n".join(violations)


def test_budget_keys_are_registered():
    """A renamed/removed query must not leave a stale budget row behind."""
    stale = sorted(set(BUDGET) - set(REGISTRY))
    assert not stale, f"budget rows for unregistered queries: {stale}"
    assert not (set(BUDGET) & STREAM_EXEC)
    # a renamed/removed streaming query must not leave a stale skip row
    # (which would silently exempt a future batch query of the same name)
    assert not sorted(STREAM_EXEC - set(REGISTRY))

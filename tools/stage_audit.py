"""Registry-wide STAGE-COUNT audit: execute every registered query under a
vanilla (default-partitioned) session and report stages whose task count
exceeds one-task-per-core — the runtime signature of a cached plan pinning
a 200-partition shuffle layout (persist()/cache() gets NO AQE coalescing:
`spark.sql.optimizer.canChangeCachedPlanOutputPartitioning` defaults
false, verified empirically on this Spark).

Why runtime counts and not plan text: `explain` prints an
InMemoryRelation's child plan once per REFERENCE and a textual
"200-partition exchange inside a cached block" grep over-matches
neighboring plan sections — the r7 sweep flagged 6 queries textually, of
which FIVE were false positives; the StatusTracker ground truth found the
one real offender (t_crossdoc_spans' dropDuplicates-pinned gram cache,
six 200-task stages). Run this after any round that adds persist() sites.

Usage: python tools/stage_audit.py [query ...]   (default: all batch)
Exit 1 if any stage exceeds the per-core budget.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

SF = os.environ.get("STAGE_AUDIT_SF_DIR", "/root/testdata/sf0.01")

# Streaming-in-query entries run micro-batch jobs whose stage counts are
# batch-size artifacts, and the two BPE trainers drive a driver-side merge
# loop; both are excluded like in tests/test_plan_lint.py.
SKIP = {
    "q_stream_dedup",
    "q_stream_jsonl_intake",
    "q_stream_semdedup_admit",
    "q_stream_session_agg",
    "q_stream_sliding_agg",
    "q_stream_static_enrich",
    "q_stream_stream_join",
    "q_stream_substring_spans",
    "q_stream_text_intake",
    "q_stream_tumbling_agg",
}

# Inspected, DELIBERATE over-budget caches (reported but not counted as
# failures): m_pagerank_top20's 200-partition edge cache carries
# hashpartitioning(src) that every iteration's join REUSES — coalescing
# it would trade task-count overhead for extra edge-list shuffles per
# iteration and lose at scale. Full-registry audit 2026-08-15: 201
# queries, this was the ONLY over-budget entry.
ALLOW = {"m_pagerank_top20"}


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("stage-audit")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    budget = sc.defaultParallelism * 2  # map stages over many files are fine

    import __spark_entry__  # noqa: F401 — populates REGISTRY
    from personal_data_lakehouse_spark.plans.registry import REGISTRY

    # Stage ids are assigned sequentially; probe a window past the highest
    # id seen so far and extend until a full empty tail confirms the end —
    # a fixed 0..20000 range silently stopped attributing stages in long
    # audit sessions (r7 ADVICE).
    probe_hi = [20000]

    def all_stage_ids() -> list[int]:
        ids: list[int] = []
        lo = 0
        while True:
            ids.extend(
                i
                for i in range(lo, probe_hi[0])
                if tracker.getStageInfo(i) is not None
            )
            if not ids or ids[-1] < probe_hi[0] - 2000:
                return ids
            lo, probe_hi[0] = probe_hi[0], probe_hi[0] * 2

    only = set(sys.argv[1:])
    names = [
        n
        for n in sorted(REGISTRY)
        if n not in SKIP and (not only or n in only)
    ]
    seen = set(all_stage_ids())
    bad = 0
    for name in names:
        spark.catalog.clearCache()
        try:
            REGISTRY[name].fn(spark, SF).count()
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            print(f"{name:28s} ERROR {type(e).__name__}: {e}")
            bad += 1
            continue
        cur = all_stage_ids()
        new = [i for i in cur if i not in seen]
        seen = set(cur)
        big = [
            (i, tracker.getStageInfo(i).numTasks)
            for i in new
            if tracker.getStageInfo(i).numTasks > budget
        ]
        if big:
            if name in ALLOW:
                print(f"{name:28s} over budget, ALLOWED (inspected) {big}")
            else:
                bad += 1
                print(f"{name:28s} OVER-BUDGET stages {big}")
    print(f"{len(names)} queries audited, {bad} over budget "
          f"(budget = {budget} tasks/stage)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

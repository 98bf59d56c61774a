"""Registry-wide CONSTRUCTION-EAGERNESS audit: invoke every registered
query's callable WITHOUT consuming the returned DataFrame and count the
eager Spark jobs it ran, via a per-query job group on StatusTracker.

Why this matters at 100 TB: a registry callable is supposed to BUILD a
lazy plan — the engine's contract is that execution happens when the
consumer acts. An eager job at construction time is driver-side work
paid on every plan build (scheduler round-trips, materializations the
optimizer can't see past), and it is invisible to both the plan lint
(which inspects the returned plan) and the stage audit (which measures
consumption). This sweep makes every construction-time job EXPLICIT:
each one must be a documented design decision — a bounded O(K) collect,
a written static artifact, an in-query streaming run — or it is a bug.

Budgets are per-query eager-JOB upper bounds. Queries absent from
ALLOW must construct with ZERO jobs. The allowlist records the reason
inline so the next reader can re-adjudicate.

Usage: python tools/eager_audit.py [query ...]   (default: all)
Exit 1 if any query exceeds its budget. Run queries twice per entry and
budget the SECOND (warm) build: fixture/artifact manufacture is once per
process by design (streaming/windows.source_fixture_dir), so only
steady-state construction cost is held to budget.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

SF = os.environ.get("EAGER_AUDIT_SF_DIR", "/root/testdata/sf0.01")

# Documented construction-time work (warm-build eager-job budgets).
# Families, with the design decision each rides on:
#  - closure consumers: adjacency checkpoint + the bounded limit(cap+1)
#    collect of the adaptive closure (dedup/cluster.py) — O(K) by
#    construction; AQE may split the checkpoint into a few jobs.
#  - iterative algorithms: k-means / PageRank / BPE run their loops at
#    build time (each round is a checkpoint or a driver fold) — the
#    loop IS the operator; counts scale with the fixed iteration count,
#    never with rows.
#  - O(K) driver collects: sampling thresholds, PQ codebooks, literal
#    centroid injection, calendar bounds — the anti-pattern sweep's
#    accepted collects (VERDICT r7), now counted.
#  - streaming-in-query: the availableNow run + sentinel/read-back jobs.
#  - maintenance/versioned-table ops: O(files) manifest work.
# Budgets sit just above the 2026-08-15 measured warm counts (in
# parens). Known instrument limit: Structured Streaming executes on its
# own threads, which do NOT inherit the driver thread's job group — the
# q_stream_* counts here cover only driver-thread jobs (fixture probes,
# sentinel read-backs); the stream's own micro-batch jobs are measured
# by the differential/bench harnesses instead. Several documented O(K)
# collects (PQ codebooks, waterfill caps, MV manifests) measured ZERO at
# build time — they fire at consumption — so they carry no entry; if a
# refactor moves one to build time this audit flags it for
# re-adjudication.
ALLOW: dict[str, int] = {
    # --- adaptive-closure consumers: adjacency checkpoint (AQE may
    #     split it) + the bounded limit(cap+1) collect ---
    "t_dedup_clusters": 8,  # (7)
    "t_dedup_cluster_stats": 10,  # (7)
    "t_dedup_keep_best": 8,  # (7)
    "t_semdedup_clusters": 6,  # (4)
    "t_corpus_pipeline_e2e": 12,  # (9)
    # the incremental run pays the SAME closure-family build jobs over
    # the merged edge table (adjacency checkpoint + bounded collect),
    # plus the O(1) threshold agg on the first build of a process
    "t_corpus_pipeline_incremental": 16,  # (13)
    # r10 v2 (semantic) family: the same closure-family build jobs, now
    # over the merged lexical∪semantic edge table, plus the semantic
    # edge-union the adaptive closure collects at build; the incremental
    # flavor adds the stored-index probe materializations
    "t_corpus_pipeline_sem_e2e": 14,  # (11)
    "t_corpus_pipeline_incremental_v2": 20,  # (17)
    # closure consumer over media-feature pairs (adjacency checkpoint +
    # bounded collect); the Python decode itself is lazy (persist
    # materializes at consumption)
    "m_media_neardup": 6,  # (4)
    # --- iterative algorithms: per-process-cached loop outputs make the
    #     warm build cheap; the loop itself is the cold build ---
    "m_kmeans_centroids": 4,  # (1)
    "m_pagerank_top20": 4,  # (0 warm / 2 cold — cache build)
    # --- documented O(files) manifest work at build ---
    "q_time_travel_diff": 6,  # (4)
    # --- streaming-in-query driver-thread jobs (see note above) ---
    "q_stream_dedup": 8,
    "q_stream_jsonl_intake": 8,
    "q_stream_semdedup_admit": 8,  # (3)
    # warm build = the empty decisions-sink seed write (one job); the
    # foreachBatch micro-batches run on stream threads (see note above)
    "q_stream_semdedup_admit_v2": 3,  # (1)
    # the delta stream runs at build; its foreachBatch increments run on
    # stream threads (not job-group-attributed, see note above) — the
    # measured driver-thread jobs are the final rollup's closure build
    "t_stream_corpus_increments": 8,  # (3)
    # the v2 sibling: same delta stream at build (stream threads escape
    # attribution), driver-thread jobs are the v2 rollup's closure build
    "t_stream_corpus_increments_v2": 8,  # (4)
    "q_stream_session_agg": 8,
    "q_stream_sliding_agg": 8,
    "q_stream_static_enrich": 8,
    "q_stream_stream_join": 8,
    "q_stream_substring_spans": 8,
    "q_stream_text_intake": 8,
    "q_stream_tumbling_agg": 8,  # (2)
}


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("eager-audit")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    tracker = sc.statusTracker()

    import __spark_entry__  # noqa: F401 — populates REGISTRY
    from personal_data_lakehouse_spark.plans.registry import REGISTRY

    only = set(sys.argv[1:])
    names = [n for n in sorted(REGISTRY) if not only or n in only]
    bad = 0
    for name in names:
        counts = []
        try:
            for rep in range(2):
                group = f"eager:{name}:{rep}"
                sc.setJobGroup(group, group)
                try:
                    REGISTRY[name].fn(spark, SF)  # build only — NOT consumed
                finally:
                    sc.setJobGroup(None, None)
                counts.append(len(tracker.getJobIdsForGroup(group) or []))
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            print(f"{name:28s} ERROR {type(e).__name__}: {e}")
            bad += 1
            continue
        warm = counts[-1]
        budget = ALLOW.get(name, 0)
        flag = "OK " if warm <= budget else "OVER"
        if warm > budget:
            bad += 1
        if warm or counts[0]:
            print(
                f"{name:28s} {flag} cold={counts[0]:3d} warm={warm:3d} "
                f"budget={budget}"
            )
    print(f"\n{len(names)} queries audited, {bad} over construction budget")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

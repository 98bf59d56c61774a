"""Round-10 registered queries: the SEMANTIC (embedding) stage landed in
the incremental corpus state — closing r9 VERDICT "What's missing #1".

The v1 capstone's persisted ``CorpusState`` was lexical only (fingerprint
ledger + LSH index): a daily-delta deployment wanting SemDeDup in the
funnel had to re-embed-and-re-pair the whole corpus even though the
ONLINE form of semantic index maintenance already existed
(``round9_ops.online_semdedup_admit``). The v2 state
(``corpus_incremental.CorpusStateV2``) persists exactly the artifacts
the online loop maintains per-batch — the vector cell index and the
verified semantic edge table — and ``apply_increment_v2`` runs
embed-probe-verify for the BATCH only, with the derived closure merging
lexical ∪ semantic edges.

Proof technique is r9's verbatim: ONE composed full-recompute oracle
(the r8 e2e oracle extended with the semantic edge CTEs via
``round8_ops.corpus_pipeline_oracle`` — inject-time composition, zero
drift) shared by BOTH the full-recompute query and the incremental
query, plus idempotent-replay / cross-family-bridge / increment-equals-
rebuild pytests (tests/test_corpus_incremental_v2.py).

Reference parity: the incremental-semantic generalization of
transforme_stock_silver.py:41-97 (watermark increment) +
ingest_stocks.py:84-100 (MERGE-maintained dedup key set), with the
dedup key set now a VECTOR index.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# round9_ops must be imported FIRST: this module shares its incremental
# fixtures (the materialized lexical base state + the 80/20 id split)
import personal_data_lakehouse_spark.plans.round9_ops as round9_ops  # noqa: E501
from personal_data_lakehouse_spark.plans.registry import (
    REGISTRY,
    query,
    read_parquet_cached,
    t,
)

# ---------------------------------------------------------------------------
# Full-recompute sibling: the v2 pipeline as ONE hashed rollup


@query("t_corpus_pipeline_sem_e2e", oracle=None)  # composed + injected below
def t_corpus_pipeline_sem_e2e(spark, sf_dir):
    """END-TO-END corpus pipeline WITH THE SEMANTIC DEDUP STAGE, hashed as
    one rollup — the full-recompute sibling ``t_corpus_pipeline_
    incremental_v2`` must land on exactly: intake gates → exact dedup →
    LEXICAL near-dup edges (MinHash-LSH, verified Jaccard ≥ 0.5) AND
    SEMANTIC near-dup edges (survivors' embeddings IVF-cell-blocked,
    rounded cosine ≥ 0.3) → ONE transitive closure over the merged edge
    set (a doc lexically near A and semantically near B fuses A's and
    B's clusters — the cross-family merge only a unified closure sees) →
    keep cluster minima → temperature rebalance → 80/10/10 split →
    sequence packing → per-(source, split) rollup.

    This is the SemDeDup shape (Abbas et al. 2023) composed INTO the
    funnel rather than run beside it (``t_semdedup_clusters`` is the
    standalone decision): the closure unions ``corpus.dedup_near_stage``
    edges with ``corpus_incremental._sem_pairs`` edges and everything
    downstream is the shared v1 rollup (``state_rollup`` verbatim via
    ``state_rollup_v2`` — the two pipelines cannot drift in the derived
    stages).

    Scale: inherits the audited v1 shape; the semantic addition is one
    broadcast-codebook cell assignment over survivors (map-side), Σ|cell|²
    cell-local pair work (never corpus²), and a sparse-edge union into
    the same closure. The oracle recomputes the whole composition —
    ``round8_ops.corpus_pipeline_oracle`` extended with the semantic
    CTEs built from the SAME ``_cos``/centroid fragments the ``s_*``
    oracles use.

    Reference parity: pipelines/run_pipeline.py composition +
    transforme_stock_silver.py:41-97 semantics; SURVEY §2 G1/G4 × the
    dedup/similarity extension families.
    """
    from personal_data_lakehouse_spark.corpus_incremental import (
        build_state_v2,
        state_rollup_v2,
    )
    from personal_data_lakehouse_spark.plans.similarity_ops import (
        _CENTROID_IDS,
    )
    from personal_data_lakehouse_spark.similarity.ivf import pick_centroids

    docs = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")
    cents = pick_centroids(emb, _CENTROID_IDS)
    return state_rollup_v2(build_state_v2(docs, emb, cents))


# ---------------------------------------------------------------------------
# The incremental v2 run against a materialized seven-table state

_V2_STATE_NAMES = ("cells", "sem_edges")


def _materialized_base_state_v2(spark, sf_dir, base_docs):
    """The SEVEN stage tables of the v2 base state: the five lexical
    artifacts are SHARED with ``t_corpus_pipeline_incremental`` (same
    split, same build — ``round9_ops._materialized_base_state``); the two
    semantic artifacts derive from the materialized lexical state's
    skeleton ids + the embeddings table (no text re-read), the honesty
    split as ever — production keeps exactly these on disk between
    increments, so warm invocations time the INCREMENT."""
    from personal_data_lakehouse_spark.corpus_incremental import (
        CorpusStateV2,
        _doc_cells,
        _sem_pairs,
    )
    from personal_data_lakehouse_spark.plans.similarity_ops import (
        _CENTROID_IDS,
    )
    from personal_data_lakehouse_spark.similarity.ivf import pick_centroids
    from personal_data_lakehouse_spark.streaming.windows import (
        source_fixture_dir,
    )

    lex = round9_ops._materialized_base_state(spark, sf_dir, base_docs)
    emb = t(spark, sf_dir, "embeddings")
    cents = pick_centroids(emb, _CENTROID_IDS)
    dirs: dict[str, str] = {}
    missing: list[str] = []
    for n in _V2_STATE_NAMES:
        d, ready = source_fixture_dir(f"corpinc2_{n}", sf_dir)
        dirs[n] = d
        if not ready:
            missing.append(n)
    if missing:
        npart = spark.sparkContext.defaultParallelism
        cells = (
            _doc_cells(lex.skeleton.select("doc_id"), emb, cents)
            .coalesce(npart)
            .persist()
        )
        if "cells" in missing:
            cells.write.mode("overwrite").parquet(dirs["cells"])
        if "sem_edges" in missing:
            _sem_pairs(cells, cells).coalesce(npart).write.mode(
                "overwrite"
            ).parquet(dirs["sem_edges"])
        cells.unpersist()
    return CorpusStateV2(
        lex=lex,
        cells=read_parquet_cached(spark, dirs["cells"]),
        sem_edges=read_parquet_cached(spark, dirs["sem_edges"]),
    )


@query("t_corpus_pipeline_incremental_v2", oracle=None)  # shared, below
def t_corpus_pipeline_incremental_v2(spark, sf_dir):
    """INCREMENTAL corpus-pipeline run WITH THE SEMANTIC STAGE, hashed
    equal to the v2 FULL RECOMPUTE (``t_corpus_pipeline_sem_e2e``'s
    oracle, shared verbatim): the base corpus (bottom ~80% of the id
    range) is a one-time materialized SEVEN-table state — the five
    lexical tables (shared artifacts with the v1 incremental query) plus
    the vector cell index and the semantic edge table; the new-docs
    batch (top ~20%) flows through intake → exact dedup (ledger
    anti-join) → lexical near-dup (batch-only shingling, stored-band
    probe) → SEMANTIC near-dup (batch-only cell assignment, STORED cell
    index probe for batch×corpus pairs + batch×batch self-join, exact
    rounded-cosine verify) — insert-only MERGE into all seven tables —
    and the derived decisions recompute from the merged sparse state
    with the closure over lexical ∪ semantic edges. A missed semantic
    bridge (a batch doc whose vector is near an existing cluster while
    its TEXT is not), a stale cell row, or a double-counted edge all
    move the hash; both incremental pair generators fire NATURALLY at
    both gate SFs (measured: 48 batch×corpus + 5 batch×batch semantic
    pairs at sf0.01; see ``corpus_incremental.SEM_THRESHOLD``).

    Scale: the v1 contract extended to vectors — only batch text is read
    AND only batch vectors are assigned; corpus vectors are touched once
    per document lifetime (their stored (vector, norm, cell) rows ARE
    the probe side). Batch×corpus candidates are cell-local against the
    stored index (broadcast at fixture scale, hash join on cell at
    100 TB); the closure still runs on a sparse edge union. A 0.1%
    daily delta with SemDeDup in the funnel costs ~0.1% of rebuild
    embed+pair work plus sparse-state maintenance.

    Reference parity: transforme_stock_silver.py:41-97 +
    ingest_stocks.py:84-100, the dedup key set generalized to a vector
    index; the persisted artifacts are the ones the ONLINE admit loop
    (round9_ops.online_semdedup_admit) maintains per-batch.
    """
    from personal_data_lakehouse_spark.corpus_incremental import (
        apply_increment_v2,
        state_rollup_v2,
    )
    from personal_data_lakehouse_spark.plans.similarity_ops import (
        _CENTROID_IDS,
    )
    from personal_data_lakehouse_spark.similarity.ivf import pick_centroids

    docs = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")
    thr = round9_ops._inc_threshold(spark, sf_dir, docs)
    base = docs.filter(F.col("doc_id") < thr)
    batch = docs.filter(F.col("doc_id") >= thr)
    cents = pick_centroids(emb, _CENTROID_IDS)
    state = _materialized_base_state_v2(spark, sf_dir, base)
    # the batch's vectors arrive WITH the batch in production; here the
    # shared embeddings fixture stands in for them, pre-filtered to the
    # batch id range so the scan is parquet-pruned (PushedFilters) — the
    # O(batch) vector claim is plan-pinned alongside the text claim
    # (tests/test_corpus_incremental_v2.py)
    emb_batch = emb.filter(F.col("vec_id") >= thr)
    return state_rollup_v2(apply_increment_v2(state, batch, emb_batch, cents))


def _inject_sem_pipeline_oracle() -> None:
    """ONE composed oracle for both v2 queries: the r8 full-recompute
    pipeline oracle with (a) the semantic cell/edge CTEs spliced in —
    built from the same ``_cos``/centroid fragments as the ``s_*``
    oracles — and (b) the closure re-pointed at lexical ∪ semantic
    (UNION dedupes, matching the Spark side's dropDuplicates)."""
    from personal_data_lakehouse_spark.corpus_incremental import (
        SEM_THRESHOLD,
    )
    from personal_data_lakehouse_spark.plans.round8_ops import (
        corpus_pipeline_oracle,
    )
    from personal_data_lakehouse_spark.plans.similarity_ops import (
        _CENT_LIST,
        _cos,
    )

    extra = f"""
    sem_cells AS (
        SELECT vec_id, e, cid AS cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY csim DESC, cid) AS crnk
            FROM (SELECT s.vec_id, s.e, c.cid, {_cos('s.e', 'c.ce')} AS csim
                  FROM (SELECT e.vec_id, e.embedding AS e FROM embeddings e
                        JOIN exact_kept k ON e.vec_id = k.doc_id) s,
                       (SELECT vec_id AS cid, embedding AS ce
                        FROM embeddings
                        WHERE vec_id IN ({_CENT_LIST})) c))
        WHERE crnk = 1
    ),
    sem_edges AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM sem_cells a JOIN sem_cells b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE ROUND({_cos('a.e', 'b.e')}, 6) >= {SEM_THRESHOLD}
    ),
    all_edges AS (
        SELECT id_a, id_b FROM edges
        UNION
        SELECT id_a, id_b FROM sem_edges
    ),"""
    oracle = corpus_pipeline_oracle(extra_ctes=extra, edges_src="all_edges")
    REGISTRY["t_corpus_pipeline_sem_e2e"].oracle = oracle
    REGISTRY["t_corpus_pipeline_incremental_v2"].oracle = oracle


_inject_sem_pipeline_oracle()

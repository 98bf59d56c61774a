"""Incremental corpus-pipeline runs: MERGE a new-docs batch through the
full intake → exact-dedup → near-dedup funnel against EXISTING stage
tables, with the merged end state provably equal to a full recompute
over the union.

This is the reference's defining semantic — watermark-incremental
processing (pipelines/stock_api/transforme_stock_silver.py:41-97) and
dedup-on-append MERGE (ingest_stocks.py:84-100) — applied to the
capstone ``corpus.corpus_pipeline``: a daily crawl delta must flow
through the same gates and dedup decisions WITHOUT re-shingling or
re-fingerprinting the existing corpus.

The persisted state is five stage tables (``CorpusState``):

* ``fp``        — (fp, keep_id): the exact-dedup fingerprint ledger;
* ``shingles``  — (doc_id, shingles): the LSH Jaccard-verify side;
* ``bands``     — (doc_id, band, bucket): the LSH band probe index;
* ``edges``     — (id_a, id_b): verified near-dup edges (id_a < id_b);
* ``skeleton``  — (doc_id, source, tok): exact-kept survivors with
  their stored whitespace-token counts — every downstream stage
  (closure, rebalance, split, pack, rollup) runs on this id+int
  skeleton, never re-reading text.

Incrementality contract (the append-only id invariant): every batch
doc_id must EXCEED every id already in the state. Under that invariant
the merged state equals the state a full rebuild over (base ∪ batch)
would produce, because every pipeline decision is a min-id/threshold
function that appends cannot retro-flip at the STAGE-TABLE level:

* exact dedup keeps MIN doc_id per fingerprint — a later id can never
  displace a stored keeper, so the ledger only gains rows (insert-only
  MERGE), and a batch doc whose fp is already in the ledger is dropped
  exactly as the full rebuild drops it;
* LSH banding is a pure per-document function — the stored band index
  rows for base docs are what a rebuild would recompute; new candidate
  pairs are exactly the pairs a rebuild would add (batch×corpus via the
  stored index, batch×batch via self-join), so the edge table also only
  gains rows;
* what CAN flip is the DERIVED canonical decision (a batch doc bridging
  two existing clusters merges them, re-pointing cluster minima) and
  the rebalance thresholds (global per-source counts move) — so those
  are recomputed from the merged SPARSE state (edge closure + skeleton
  counts) per run, never stored as if append-stable.

Work per increment: O(batch text) for gates/fingerprints/shingles, O(new
candidate pairs) for verification, O(total edges) for the closure (the
adaptive ``connected_components`` — edges are the sparse edge-incident
subgraph, not the corpus), O(survivor ids) for rebalance/split/pack. The
100 TB corpus' TEXT is touched exactly once per document, at the
increment that ingested it.

Reference parity: transforme_stock_silver.py:41-97 (incremental filter),
ingest_stocks.py:84-100 (MERGE dedup-on-append); SURVEY.md §2 P3/J1/J2
composed with the LLM-pipeline extension family.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from personal_data_lakehouse_spark.corpus import (
    dedup_exact_stage,
    intake,
    packed_docs,
    pipeline_rollup,
    rebalance_stage,
    split_stage,
)
from personal_data_lakehouse_spark.dedup.cluster import dedup_clusters
from personal_data_lakehouse_spark.dedup.exact import exact_dedup
from personal_data_lakehouse_spark.dedup.minhash import lsh_index
from personal_data_lakehouse_spark.functions.text import (
    token_count_whitespace,
)
from personal_data_lakehouse_spark.operators.merge import merge_insert_only

NEAR_THRESHOLD = 0.5  # verified-Jaccard keep bound, same as corpus.py


@dataclass
class CorpusState:
    """The five persisted stage tables of an incremental corpus deploy."""

    fp: DataFrame
    shingles: DataFrame
    bands: DataFrame
    edges: DataFrame
    skeleton: DataFrame

    def frames(self) -> dict[str, DataFrame]:
        return {
            "fp": self.fp,
            "shingles": self.shingles,
            "bands": self.bands,
            "edges": self.edges,
            "skeleton": self.skeleton,
        }


# MERGE keys per stage table (all insert-only: see module docstring for
# why the stored tables only ever gain rows under the append-only id
# invariant — derived decisions that CAN flip are recomputed, not stored).
STATE_KEYS: dict[str, list[str]] = {
    "fp": ["fp"],
    "shingles": ["doc_id"],
    "bands": ["doc_id", "band"],
    "edges": ["id_a", "id_b"],
    "skeleton": ["doc_id"],
}


def _skeleton(kept: DataFrame) -> DataFrame:
    return kept.select(
        "doc_id",
        "source",
        token_count_whitespace("text").alias("tok"),
    )


def _verified_pairs(cand: DataFrame, threshold: float) -> DataFrame:
    """Exact shingle-Jaccard verification over candidate rows carrying
    both shingle arrays — the same round-then-compare expression
    ``dedup_near_stage`` filters on, so incremental and full-rebuild
    edges agree bit-exactly."""
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    j = F.round(inter.cast("double") / union, 6)
    return cand.filter(j >= F.lit(threshold)).select("id_a", "id_b")


def build_state(docs: DataFrame) -> CorpusState:
    """Full pipeline run over the BASE corpus, returning the stage tables
    an incremental deployment persists. One-time (or backfill) cost."""
    base = intake(docs)
    fp = exact_dedup(base).select("fp", "keep_id")
    kept = dedup_exact_stage(base)
    lsh_docs, banded = lsh_index(kept)
    shingles = lsh_docs.select("doc_id", "shingles")
    # verified base×base edges from the same single index build
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .join(
            shingles.select(
                F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a")
            ),
            "id_a",
        )
        .join(
            shingles.select(
                F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b")
            ),
            "id_b",
        )
    )
    edges = _verified_pairs(cand, NEAR_THRESHOLD)
    return CorpusState(
        fp=fp,
        shingles=shingles,
        bands=banded.select("doc_id", "band", "bucket"),
        edges=edges,
        skeleton=_skeleton(kept),
    )


def apply_increment(
    state: CorpusState, batch_docs: DataFrame, threshold: float = NEAR_THRESHOLD
) -> CorpusState:
    """Process ONE new-docs batch against the existing state and return
    the MERGED state (all five tables via insert-only MERGE).

    Only the batch's text is gated/fingerprinted/shingled; the corpus
    side is the stored index. Idempotent: re-applying a batch whose
    fingerprints are already in the ledger inserts nothing anywhere
    (the replay property ``tests/test_corpus_incremental.py`` pins).
    """
    from personal_data_lakehouse_spark.functions.text import fingerprint

    b_in = intake(batch_docs)
    # exact dedup vs the ledger: fingerprints already present keep their
    # stored (smaller-id) keeper; genuinely new fingerprints keep the
    # batch-min id — together exactly the union's min-id-per-fp rule.
    b_fpd = b_in.withColumn("fp", fingerprint("text"))
    b_new = b_fpd.join(state.fp.select("fp"), "fp", "left_anti")
    b_keep = b_new.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    b_kept = b_new.join(
        b_keep.select(F.col("keep_id").alias("doc_id")), "doc_id"
    ).drop("fp")

    # LSH: index the batch survivors only; probe stored bands for
    # batch×corpus candidates, self-join for batch×batch.
    b_docs, b_banded = lsh_index(b_kept)
    b_sh = b_docs.select("doc_id", "shingles")
    bc = (
        state.bands.select(
            F.col("doc_id").alias("id_a"), "band", "bucket"
        )
        .join(
            b_banded.select(F.col("doc_id").alias("id_b"), "band", "bucket"),
            ["band", "bucket"],
        )
        # under the append-only contract every stored id < every batch id,
        # so this filter is a no-op — it is defense in depth against a
        # CONTRACT VIOLATION (a replayed/overlapping batch whose ids are
        # already in the band index) manufacturing self-edges
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    a, b = b_banded.alias("a"), b_banded.alias("b")
    bb = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # bc (corpus id_a) and bb (both batch) are disjoint by the append-only
    # id invariant, so plain unionByName — no dedup shuffle needed
    all_sh = state.shingles.unionByName(b_sh)
    cand = (
        bc.unionByName(bb)
        .join(
            all_sh.select(
                F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a")
            ),
            "id_a",
        )
        .join(
            b_sh.select(
                F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b")
            ),
            "id_b",
        )
    )
    new_edges = _verified_pairs(cand, threshold)

    return CorpusState(
        fp=merge_insert_only(state.fp, b_keep, STATE_KEYS["fp"]),
        shingles=merge_insert_only(
            state.shingles, b_sh, STATE_KEYS["shingles"]
        ),
        bands=merge_insert_only(
            state.bands,
            b_banded.select("doc_id", "band", "bucket"),
            STATE_KEYS["bands"],
        ),
        edges=merge_insert_only(state.edges, new_edges, STATE_KEYS["edges"]),
        skeleton=merge_insert_only(
            state.skeleton, _skeleton(b_kept), STATE_KEYS["skeleton"]
        ),
    )


def state_rollup(state: CorpusState, budget: int = 512) -> DataFrame:
    """Recompute the DERIVED pipeline decisions from the merged state and
    roll up the end state per (source, split) — the same hashed surface
    as ``t_corpus_pipeline_e2e`` (``corpus.pipeline_rollup``).

    Derived per run because appends CAN flip them: the near-dup closure
    (a batch doc may bridge two existing clusters, re-pointing cluster
    minima — previously-canonical base docs lose the flag) and the
    temperature-rebalance thresholds (global per-source counts moved).
    Both run on the sparse state: the closure on the edge table, the
    rest on the id+int skeleton — no text is read here."""
    labels = dedup_clusters(state.skeleton.select("doc_id"), state.edges)
    survivors = state.skeleton.join(
        labels.filter(F.col("is_canonical")).select("doc_id"), "doc_id"
    )
    staged = split_stage(rebalance_stage(survivors))
    return pipeline_rollup(packed_docs(staged, budget=budget, tok_col="tok"))


# ---------------------------------------------------------------------------
# Managed-table flavor: the reference's MERGE-into-warehouse shape


def init_state_tables(
    spark: SparkSession, base_docs: DataFrame, namespace: str = "corpus_inc"
) -> None:
    """Materialize the base state as managed stage tables under
    ``namespace`` (the production backfill)."""
    import re

    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", namespace):
        raise ValueError(f"invalid namespace {namespace!r}")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {namespace}")
    for name, frame in build_state(base_docs).frames().items():
        frame.write.mode("overwrite").saveAsTable(f"{namespace}.{name}")


def run_increment(
    spark: SparkSession, batch_docs: DataFrame, namespace: str = "corpus_inc"
) -> dict[str, int]:
    """MERGE one batch into the persisted stage tables and return the
    per-table row counts after the merge (the increment's funnel).

    Uses ``merge_into_table`` per stage table — the reference's
    ingest_stocks.py:84-100 MERGE shape (Delta-native when delta-spark is
    on the classpath, staged-swap parquet otherwise). Idempotent: a
    replayed batch inserts nothing (every key already present).

    Clears the SQL cache on entry: a PREVIOUS increment's internal
    persists (the LSH batch index) captured pre-swap file listings of the
    stage tables, and the CacheManager substitutes them into THIS run's
    structurally-identical plans — serving stale rows (or
    FAILED_READ_FILE once the old files are dropped) even after
    refreshTable. The persisted intermediates are single-invocation-
    scoped by the registry cache contract, so dropping them is free;
    callers holding unrelated cached frames should re-cache after an
    increment (the table swap invalidated anything reading these tables
    anyway)."""
    spark.catalog.clearCache()
    state = CorpusState(
        **{
            n: spark.read.table(f"{namespace}.{n}")
            for n in STATE_KEYS
        }
    )
    merged = apply_increment(state, batch_docs)
    from personal_data_lakehouse_spark.operators.merge import merge_into_table

    # Sever lineage BEFORE any table swap: the merged frames read the
    # stage tables lazily BY NAME, so swapping table 1 would silently
    # change what frames 2..5 compute (e.g. the edge frame re-reading an
    # already-updated fp ledger finds no new fingerprints). With Delta on
    # the classpath the native transactional MERGE reads the source
    # eagerly inside one commit and this is a no-op safeguard.
    frames = {
        n: f.localCheckpoint() for n, f in merged.frames().items()
    }
    counts: dict[str, int] = {}
    for name, frame in frames.items():
        # the merged frame = stored table ∪ inserts; re-merging it keyed on
        # the table's keys writes exactly the insert-only MERGE result
        merge_into_table(
            spark,
            f"{namespace}.{name}",
            frame,
            STATE_KEYS[name],
            insert_only=True,
        )
        counts[name] = spark.read.table(f"{namespace}.{name}").count()
    return counts

"""Round-8 registered queries: the end-to-end corpus pipeline proven as
ONE driver-hashed rollup, plus the two missing streaming siblings —
online semantic-dedup admission and streaming JSONL intake.

Closes r7 verdict items 2/3/4: the capstone corpus composition
(intake → exact dedup → LSH canonicalization → temperature rebalance →
split → packing) had pytest-only proof while every stage was
individually hashed; semantic dedup lacked its streaming probe (the
lexical and exact-substring families got theirs in r6/r7); and
``read_jsonl_docs`` was batch-only while crawl dumps arrive as growing
JSONL directories.

Reference capability: the reference's pipeline story is a bronze→silver
model DAG over API intake (pipelines/stock_api/ingest_stocks.py:61-111,
transforme_stock_silver.py:41-149); these queries are the LLM-corpus
analogue — the same medallion composition with dedup/rebalance/split
stages, and the same at-ingest dedup decision made ONLINE.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# round7_ops must be registered first: the streaming intake pair shares
# its batch oracles verbatim (inject-time composition), and importing
# this module standalone (tests, tools) must not depend on
# __spark_entry__'s import order
import personal_data_lakehouse_spark.plans.round7_ops  # noqa: F401
from personal_data_lakehouse_spark.plans.registry import query, t

# ---------------------------------------------------------------------------
# End-to-end corpus pipeline rollup (intake → dedup → rebalance → split →
# pack), hashed as one query


@query("t_corpus_pipeline_e2e", oracle=None)  # oracle composed + injected below
def t_corpus_pipeline_e2e(spark, sf_dir):
    """END-TO-END training-corpus pipeline (``corpus.py``) proven as ONE
    driver-hashed query: the exact stage functions the managed-table
    pipeline runs — intake gates (length / language / token-count) →
    exact dedup (min-id per md5 fingerprint) → MinHash-LSH near-dup
    canonicalization (verified Jaccard ≥ 0.5, transitive closure, keep
    cluster-min) → temperature-α=0.5 domain rebalance (md5 coin vs
    floor(65536·√(min_n/n_s))) → deterministic 80/10/10 split (md5 coin)
    → per-(source, split) sequence packing — composed lazily and rolled
    up to one row per (source, split): surviving docs, whitespace-token
    mass, packed-bin count, and a 40-bit-md5 id-set fingerprint. Every
    stage decision moves the hash: a doc wrongly kept/dropped shifts
    n_docs AND id_fp; a packing drift shifts n_bins.

    The oracle recomputes the full funnel in DuckDB, composed at inject
    time from the SAME fragments the per-stage oracles use
    (``cluster_ops._lsh_ctes`` for the LSH index/pairs, ``text_ops``
    norm/token fragments), so pipeline and stage proofs cannot drift —
    the ``t_semdedup_clusters`` composition technique applied to a
    six-stage chain. This catches inter-stage CONTRACT drift (column
    renames, filter reordering, a stage fed the wrong predecessor)
    that ten individually-green stage queries never see.

    Scale: inherits each stage's audited shape — map-side gates first,
    one fingerprint shuffle, banded LSH (id-only candidates, never
    corpus²), sparse-label closure, broadcast rebalance thresholds,
    coin split map-side, per-slice packing window (the sharded two-pass
    ``t_pack_sequences_sharded`` is the skew path and composes here
    unchanged); the final rollup is one groupBy on (source, split).
    Cross-engine float discipline: the only float is √(min_n/n_s) —
    IEEE-correctly-rounded sqrt of an exact ratio, multiplied and
    floored identically on both engines; everything hashed is integer.

    Reference parity: pipelines/daily_pipeline composition
    (run_pipeline.py) — the corpus DAG is its LLM-data counterpart;
    SURVEY.md §2 G1/G4 + the §2-extension dedup/mixing/packing family.
    """
    from personal_data_lakehouse_spark.corpus import (
        dedup_exact_stage,
        dedup_near_stage,
        intake,
        packed_docs,
        pipeline_rollup,
        rebalance_stage,
        split_stage,
    )

    docs = t(spark, sf_dir, "documents")
    # r12 optimization (guide §1.2/§2.4/§5): persist the two survivor
    # frames each consumed by several downstream branches — without the
    # caches Catalyst re-executes the whole upstream subtree once per
    # branch (measured on the before-plan: 12 documents FileScans in one
    # invocation, i.e. the corpus text re-gated/re-fingerprinted ~12×
    # per run; after: the intake→exact and near-dedup subtrees execute
    # once each). ``kept`` feeds the LSH index build, the closure's node
    # set and the canonical join-back; ``near`` feeds the rebalance
    # count/threshold branches and the keep join. At 100 TB these are
    # exactly the stage tables the managed pipeline (corpus_pipeline)
    # writes between stages — the persist is the lazy-composition form
    # of that written intermediate (SCALE.md §13 precedent).
    kept = dedup_exact_stage(intake(docs)).persist()
    near = dedup_near_stage(kept).persist()
    staged = split_stage(rebalance_stage(near))
    # the rollup (40-bit md5 id fingerprint + doc/token/bin counts) is the
    # shared corpus.pipeline_rollup — expression-identical to the r8 plan,
    # now also the incremental query's hashed surface
    return pipeline_rollup(packed_docs(staged))


def corpus_pipeline_oracle(
    extra_ctes: str = "", edges_src: str = "edges"
) -> str:
    """The composed full-recompute corpus-pipeline oracle, parameterized
    (r10) so the SEMANTIC variant (``plans/round10_ops``) extends the
    SAME text instead of forking it: ``extra_ctes`` is spliced after the
    lexical ``edges`` CTE (leading comma included by the caller), and
    ``edges_src`` names the CTE the transitive closure consumes (the v2
    pipeline points it at the lexical ∪ semantic union). Defaults
    reproduce the r8 oracle shared by ``t_corpus_pipeline_e2e`` /
    ``t_corpus_pipeline_incremental`` / ``t_stream_corpus_increments``."""
    from personal_data_lakehouse_spark.corpus import (
        LANGS,
        MIN_CHARS,
        MIN_TOKENS,
    )
    from personal_data_lakehouse_spark.plans.cluster_ops import _lsh_ctes
    from personal_data_lakehouse_spark.plans.text_ops import _NORM, _TOKS

    langs = ", ".join(f"'{lang}'" for lang in LANGS)
    # the shared LSH index/pair CTEs read FROM documents; the pipeline
    # runs them over the exact-deduped survivors
    lsh = _lsh_ctes().replace("FROM documents", "FROM exact_kept")
    coin = "substr(md5(CAST(d.doc_id AS VARCHAR) || '{salt}'), 1, 4)"
    return f"""
    WITH RECURSIVE
    base AS (
        SELECT doc_id, text, lang, source FROM documents
        WHERE n_chars >= {MIN_CHARS} AND lang IN ({langs})
          AND len({_TOKS}) >= {MIN_TOKENS}
    ),
    exact_kept AS (
        SELECT d.* FROM base d
        JOIN (SELECT md5({_NORM}) AS fp, MIN(doc_id) AS keep_id
              FROM base GROUP BY 1) k
          ON d.doc_id = k.keep_id
    ),
    {lsh},
    edges AS (
        SELECT id_a, id_b FROM lsh_pairs
        WHERE CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
              / len(list_distinct(list_concat(sh_a, sh_b))) >= 0.5
    ),{extra_ctes}
    symm AS MATERIALIZED (
        -- MATERIALIZED (r10; the r9 q_stream_semdedup_admit_v2 lesson):
        -- DuckDB INLINES every non-recursive CTE the recursive term
        -- references, re-executing its whole upstream once per
        -- iteration. Harmless while the upstream was the cheap LSH edge
        -- chain (~5 s at sf0.1), but the v2 variant's upstream includes
        -- the semantic all-pairs cosine — measured 138 s inlined vs
        -- seconds materialized at sf0.1. Identical results either way.
        SELECT id_a AS a, id_b AS b FROM {edges_src}
        UNION
        SELECT id_b AS a, id_a AS b FROM {edges_src}
    ),
    reach(rsrc, rdst) AS (
        SELECT doc_id, doc_id FROM exact_kept
        UNION
        SELECT r.rsrc, s.b FROM reach r JOIN symm s ON r.rdst = s.a
    ),
    cc AS (
        SELECT rsrc AS doc_id, MIN(rdst) AS cluster_id FROM reach GROUP BY 1
    ),
    near_kept AS (
        SELECT d.* FROM exact_kept d
        JOIN cc ON d.doc_id = cc.doc_id AND cc.doc_id = cc.cluster_id
    ),
    counts AS (SELECT source, COUNT(*) AS n_s FROM near_kept GROUP BY 1),
    minn AS (SELECT MIN(n_s) AS min_n FROM counts),
    thr AS (
        SELECT source, n_s, min_n,
               CAST(floor(65536 * sqrt(CAST(min_n AS DOUBLE) / n_s))
                    AS BIGINT) AS th
        FROM counts, minn
    ),
    mixed AS (
        SELECT d.* FROM near_kept d JOIN thr USING (source)
        WHERE n_s = min_n
           OR {coin.format(salt=":cmix")} < lpad(lower(hex(th)), 4, '0')
    ),
    split_docs AS (
        SELECT d.*,
               CASE WHEN {coin.format(salt=":csplit")} < 'cccd' THEN 'train'
                    WHEN {coin.format(salt=":csplit")} < 'e666' THEN 'val'
                    ELSE 'test' END AS split
        FROM mixed d
    ),
    toks AS (
        SELECT doc_id, source, split, len({_TOKS}) AS tok FROM split_docs
    ),
    packed AS (
        SELECT doc_id, source, split, tok,
               (SUM(tok) OVER (PARTITION BY source, split ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - tok) // 512
                   AS seq_id
        FROM toks
    )
    SELECT source, split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT seq_id) AS BIGINT) AS n_bins,
           CAST(SUM(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 10))
                         AS BIGINT)) AS BIGINT) AS id_fp
    FROM packed GROUP BY 1, 2
    """


def _inject_corpus_pipeline_oracle() -> None:
    from personal_data_lakehouse_spark.plans.registry import REGISTRY

    REGISTRY["t_corpus_pipeline_e2e"].oracle = corpus_pipeline_oracle()


_inject_corpus_pipeline_oracle()


# ---------------------------------------------------------------------------
# Streaming JSONL intake (quarantine contract across micro-batches)


@query("q_stream_jsonl_intake", oracle=None)  # oracle shared with batch, below
def q_stream_jsonl_intake(spark, sf_dir):
    """STREAMING JSONL corpus intake proven batch-equal under the
    driver's hash: the SAME fixture directory ``q_jsonl_intake`` reads
    (to_json-serialized documents + three injected malformed lines) is
    consumed as a LIVE STREAM — ``readStream`` with the identical
    explicit-DDL PERMISSIVE schema, ``maxFilesPerTrigger=3`` so the
    8-file fixture is forced through MULTIPLE micro-batches (a
    single-batch run would let per-batch bugs degenerate away) — the
    stateless parse/quarantine/bucket projection runs inside each
    micro-batch, lands append-mode in a parquet file sink, and the
    sink's rows roll up through the same per-language aggregation. Must
    hash-equal the batch oracle: the quarantine contract (count, raw
    line preserved, typed fields null) survives micro-batching exactly.

    This is the production shape for crawl-dump ingestion: the dump dir
    grows, the file-source ledger admits new files per trigger, rejects
    land in the same quarantine bucket the batch funnel counts.

    Scale: per-batch work is O(new files) — JVM Jackson parse in-scan,
    line-splittable, stateless (no state store at any stream length);
    the rollup aggregation here runs once over the bounded sink for
    parity, and per-batch in ``foreachBatch`` upsert form in production.

    Reference parity: ingest_stocks.py:61-100 (incremental bronze
    intake); SURVEY.md §2 S6+ streaming extension; sibling of
    ``q_stream_substring_spans`` (plans/round7_ops.py:207).
    """
    from personal_data_lakehouse_spark.io.readers import (
        read_jsonl_docs_stream,
    )
    from personal_data_lakehouse_spark.plans.round7_ops import (
        JSONL_DOC_SCHEMA,
        jsonl_doc_projection,
        jsonl_fixture,
        jsonl_intake_rollup,
    )
    from personal_data_lakehouse_spark.streaming.windows import (
        drain_stream_to_parquet,
        stream_work_dir,
    )

    src = jsonl_fixture(spark, sf_dir)
    work = stream_work_dir("jsonlstream")
    stream = read_jsonl_docs_stream(
        spark, src, JSONL_DOC_SCHEMA, max_files_per_trigger=3
    )
    drained = drain_stream_to_parquet(jsonl_doc_projection(stream), work)
    return jsonl_intake_rollup(drained)


def _inject_stream_jsonl_oracle() -> None:
    from personal_data_lakehouse_spark.plans.registry import REGISTRY

    # byte-identical input directory + identical projection/rollup ⇒ the
    # batch oracle IS the streaming oracle (no-drift composition)
    REGISTRY["q_stream_jsonl_intake"].oracle = REGISTRY[
        "q_jsonl_intake"
    ].oracle


_inject_stream_jsonl_oracle()


@query("q_stream_text_intake", oracle=None)  # oracle shared with batch, below
def q_stream_text_intake(spark, sf_dir):
    """STREAMING raw-text corpus intake proven batch-equal under the
    driver's hash — completing the intake streaming PAIR (the JSONL
    sibling is ``q_stream_jsonl_intake``): the SAME 8-file text fixture
    ``q_text_intake`` reads is consumed as a LIVE STREAM through
    ``read_text_docs_stream`` (identical md5 content-id projection,
    blank-line drop) with ``maxFilesPerTrigger=3`` forcing MULTIPLE
    micro-batches, lands append-mode in a parquet sink, and rolls up
    through the same exact-dedup + quality-gate funnel. Must hash-equal
    the batch oracle: content-addressed ids make the rollup independent
    of which micro-batch delivered each copy — duplicate counts ACROSS
    batch boundaries still collapse to one row per unique document.

    This is the production shape for dump-directory ingestion: the dir
    grows, the file-source ledger admits new files per trigger, and the
    dedup/gate funnel downstream never needs to know rows arrived
    incrementally.

    Scale: per-batch work is O(new files) — line-splittable scan,
    map-side md5, stateless projection (no state store at any stream
    length); the funnel aggregation here runs once over the bounded sink
    for parity, and in ``foreachBatch`` MERGE form in production
    (``streaming/windows.merge_sink`` — the reference's dedup-on-append).

    Reference parity: ingest_stocks.py:61-100 (incremental bronze
    intake); SURVEY.md §2 S6+ streaming extension; sibling of
    ``q_stream_jsonl_intake`` above.
    """
    from personal_data_lakehouse_spark.io.readers import (
        read_text_docs_stream,
    )
    from personal_data_lakehouse_spark.plans.round7_ops import (
        text_fixture,
        text_intake_rollup,
    )
    from personal_data_lakehouse_spark.streaming.windows import (
        drain_stream_to_parquet,
        stream_work_dir,
    )

    src = text_fixture(spark, sf_dir)
    work = stream_work_dir("textstream")
    stream = read_text_docs_stream(spark, src, max_files_per_trigger=3)
    drained = drain_stream_to_parquet(stream, work)
    return text_intake_rollup(drained)


def _inject_stream_text_oracle() -> None:
    from personal_data_lakehouse_spark.plans.registry import REGISTRY

    # byte-identical input directory + identical projection/rollup ⇒ the
    # batch oracle IS the streaming oracle (no-drift composition)
    REGISTRY["q_stream_text_intake"].oracle = REGISTRY[
        "q_text_intake"
    ].oracle


_inject_stream_text_oracle()


# ---------------------------------------------------------------------------
# Online semantic-dedup admission (streaming SemDeDup)

# Stream/corpus split for the admission parity: centroid ids (8..15) stay
# corpus-side by the >= 16 bound, so the static cell index is intact.
_SEM_STREAM_PRED = "vec_id >= 16 AND vec_id % 10 = 3"


@query("q_stream_semdedup_admit", oracle=None)  # oracle injected below
def q_stream_semdedup_admit(spark, sf_dir):
    """ONLINE semantic-dedup admission (streaming SemDeDup) — the third
    dedup family's streaming sibling, completing the triad: lexical
    MinHash has ``neardup_candidate_stream``, exact-substring has
    ``q_stream_substring_spans``, and this is the embedding-space form.
    A LIVE STREAM of embedding vectors is probed against the STATIC
    corpus artifacts (IVF cell index + closed semantic clusters from
    ``t_semdedup_clusters``' exact pipeline over the non-stream split):
    each arriving vector is assigned its nearest cell statelessly
    (literal-injected centroids, bit-identical to batch ``assign_cells``
    — the zero-norm → -inf guard included), scored against its
    cell-mates, and ADMITTED iff no corpus neighbor reaches the near-dup
    threshold; rejected vectors are assigned the min cluster id among
    their matches. One row per streamed vector: (vec_id, admitted,
    cluster_id, n_matches).

    Must hash-equal the pure-batch SQL over the same stream/corpus
    split — cell argmax, rounded-cosine threshold, corpus closure and
    the admit/assign decision are all differentially checked.

    Scale: per-event work is O(dim · k_cells) map-side + one
    stream-static join against the cell index (broadcast when it fits);
    state stays EMPTY at any stream length (pinned by
    ``test_stream_semdedup_probe_is_stateless``). The corpus-side
    artifacts (cell index + cluster labels) are materialized ONCE per
    (sf, process) as parquet — exactly what a production deployment
    keeps on disk and maintains incrementally — so warm invocations
    measure the online probe + admit assembly, not a from-scratch corpus
    re-clustering; the final labeling join is candidate-bounded, never
    corpus-sized.

    Reference parity: the online form of ingest_stocks.py:84-100's
    dedup-before-append MERGE, applied to the SemDeDup decision
    (BASELINE.json north star); sibling of round7_ops.py:207-264.
    """
    from personal_data_lakehouse_spark.dedup.cluster import dedup_clusters
    from personal_data_lakehouse_spark.plans.similarity_ops import (
        _CENTROID_IDS,
        _N_QUERIES,
        _NEARDUP_THRESHOLD,
    )
    from personal_data_lakehouse_spark.similarity.ivf import (
        ann_candidate_stream,
        assign_cells,
        ivf_blocked_neardup,
        pick_centroids,
    )
    from personal_data_lakehouse_spark.streaming.windows import (
        drain_stream_to_parquet,
        source_fixture_dir,
        stream_work_dir,
    )

    emb = t(spark, sf_dir, "embeddings")
    cand = emb.filter(F.col("vec_id") >= _N_QUERIES)
    pred = F.expr(_SEM_STREAM_PRED)
    corpus = cand.filter(~pred)
    arrivals = cand.filter(pred)
    cents = pick_centroids(emb, _CENTROID_IDS)

    # Static corpus artifacts — the cell index and the closed semantic
    # clusters — are MATERIALIZED once per (sf, process) as parquet:
    # exactly the artifacts a production deployment keeps on disk and
    # maintains incrementally, so the timed region measures the ONLINE
    # PROBE, not a from-scratch corpus re-clustering per invocation (the
    # same honesty split as the r8 source-fixture change). Pure
    # functions of the fixture tables ⇒ a stale complete artifact is
    # byte-identical; _SUCCESS gates completeness.
    npart = spark.sparkContext.defaultParallelism
    cells_dir, cells_ready = source_fixture_dir("semadmit_cells", sf_dir)
    if not cells_ready:
        assign_cells(corpus, cents, "vec_id", "embedding", n=1).coalesce(
            npart
        ).write.mode("overwrite").parquet(cells_dir)
    cells = spark.read.parquet(cells_dir)
    labels_dir, labels_ready = source_fixture_dir("semadmit_labels", sf_dir)
    if not labels_ready:
        pairs = ivf_blocked_neardup(
            corpus, cents, threshold=_NEARDUP_THRESHOLD
        ).select("id_a", "id_b")
        dedup_clusters(
            corpus.select("vec_id"), pairs, id_col="vec_id"
        ).select("vec_id", "cluster_id").coalesce(npart).write.mode(
            "overwrite"
        ).parquet(labels_dir)
    labels = spark.read.parquet(labels_dir).select(
        F.col("vec_id").alias("corpus_id"), "cluster_id"
    )

    work = stream_work_dir("semadmit")
    src, ready = source_fixture_dir("semadmit_src", sf_dir)
    if not ready:
        arrivals.select("vec_id", "embedding").write.mode(
            "overwrite"
        ).parquet(src)
    stream_vecs = spark.readStream.schema(
        "vec_id bigint, embedding array<float>"
    ).parquet(src)

    drained = drain_stream_to_parquet(
        ann_candidate_stream(stream_vecs, cells, cents, nprobe=1), work
    )
    matches = (
        drained.filter(F.col("cosine") >= F.lit(_NEARDUP_THRESHOLD))
        .join(labels, drained.cand_id == labels.corpus_id)
        .groupBy("qid")
        .agg(
            F.min("cluster_id").alias("_mcl"),
            F.count(F.lit(1)).cast("long").alias("_nm"),
        )
    )
    roster = arrivals.select("vec_id")
    return roster.join(
        matches, roster.vec_id == matches.qid, "left"
    ).select(
        "vec_id",
        F.col("_mcl").isNull().alias("admitted"),
        F.coalesce(F.col("_mcl"), F.col("vec_id")).alias("cluster_id"),
        F.coalesce(F.col("_nm"), F.lit(0)).cast("long").alias("n_matches"),
    )


def _inject_stream_semdedup_oracle() -> None:
    from personal_data_lakehouse_spark.plans.registry import REGISTRY
    from personal_data_lakehouse_spark.plans.similarity_ops import (
        _CELLS_SQL,
        _cos,
        _N_QUERIES,
        _NEARDUP_THRESHOLD,
    )

    # the shared cell-assignment CTE, restricted to the corpus split (the
    # inject-time composition that keeps the cell/cosine SQL single-source)
    cells_sql = _CELLS_SQL.replace(
        f"WHERE vec_id >= {_N_QUERIES}",
        f"WHERE vec_id >= {_N_QUERIES} AND NOT ({_SEM_STREAM_PRED})",
    )
    REGISTRY["q_stream_semdedup_admit"].oracle = f"""
    WITH RECURSIVE {cells_sql},
    edges AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM cells a JOIN cells b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE ROUND({_cos('a.e', 'b.e')}, 6) >= {_NEARDUP_THRESHOLD}
    ), symm AS (
        SELECT id_a AS a, id_b AS b FROM edges
        UNION
        SELECT id_b AS a, id_a AS b FROM edges
    ), reach(rsrc, rdst) AS (
        SELECT vec_id, vec_id FROM embeddings
        WHERE vec_id >= {_N_QUERIES} AND NOT ({_SEM_STREAM_PRED})
        UNION
        SELECT r.rsrc, s.b FROM reach r JOIN symm s ON r.rdst = s.a
    ), cc AS (
        SELECT rsrc AS vec_id, MIN(rdst) AS cluster_id FROM reach GROUP BY 1
    ), strm AS (
        SELECT vec_id AS qid, embedding AS qe FROM embeddings
        WHERE vec_id >= {_N_QUERIES} AND ({_SEM_STREAM_PRED})
    ), qasg AS (
        SELECT qid, qe, cid, {_cos('qe', 'ce')} AS csim FROM strm, cents
    ), probes AS (
        SELECT qid, qe, cid AS cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                ORDER BY csim DESC, cid) AS crnk FROM qasg)
        WHERE crnk = 1
    ), m AS (
        SELECT qid, MIN(cc.cluster_id) AS mcl,
               CAST(COUNT(*) AS BIGINT) AS nm
        FROM probes
        JOIN cells ON probes.cell = cells.cell
        JOIN cc ON cells.vec_id = cc.vec_id
        WHERE ROUND({_cos('qe', 'cells.e')}, 6) >= {_NEARDUP_THRESHOLD}
        GROUP BY qid
    )
    SELECT s.qid AS vec_id,
           m.mcl IS NULL AS admitted,
           COALESCE(m.mcl, s.qid) AS cluster_id,
           COALESCE(m.nm, 0) AS n_matches
    FROM strm s LEFT JOIN m ON s.qid = m.qid
    """


_inject_stream_semdedup_oracle()

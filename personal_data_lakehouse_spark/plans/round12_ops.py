"""Round-12 registered queries and oracle retirements (VERDICT r11
directives #3/#4/#5/#6):

* **deterministic k-means codebook** (`s_ivf_kmeans_codebook`) — the
  executable witness for SCALE.md §9's "at 100 TB the codebook is a
  k-means job", scored as recall-vs-lowest-id against the exact ground
  truth;
* **incremental decontamination** (`t_decontaminate_incremental`) — the
  stored train-spine artifact + probe-only increments the
  `t_eval_decontaminate` docstring promised, hash-equal to the full
  recompute;
* **chunk-granular ANN recall** (`s_chunk_ann_recall`) — the RAG path's
  recall measured (IVF@nprobe=2 vs brute force over the same chunk
  vectors), not asserted;
* **BPE oracle retirement** — the r8 "sequential merge fold is not
  SQL-expressible" rationale falls to a wrapped-symbol replace chain:
  the greedy left-to-right merge fold over a symbol array is EXACTLY
  DuckDB's left-to-right non-overlapping ``replace`` over a
  ``\\x02sym\\x03``-wrapped symbol string (the wrapping prevents both
  cross-symbol matches and boundary-sharing overlaps), and the 8
  data-dependent training rounds unroll into 8 argmax CTE stages whose
  merge pair feeds the next stage's replace via a CROSS JOIN scalar.
  `t_bpe_merges`, `t_bpe_encode` and `t_tokenizer_fertility` move from
  rows-only to exact DuckDB hashes, leaving `q_hll_mv` and the two
  Spark-sketch queries as the only engine-specific rows-only entries.

Reference parity: all engine-internal extensions (the reference
delegates tokenization/search hygiene to its warehouse); SURVEY §2
similarity/text-analysis extension families.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from personal_data_lakehouse_spark.plans.registry import REGISTRY, query, t
from personal_data_lakehouse_spark.plans.round11_ops import (
    _chunk_ann_oracle,
    _chunk_query_cand,
    _CHUNK_VEC,
    _CHUNK_STRIDE,
    _N_QUERY_DOCS,
    _coin_col,
)
from personal_data_lakehouse_spark.plans.similarity_ops import (
    _CENTROID_IDS,
    _N_QUERIES,
    _cos,
)
from personal_data_lakehouse_spark.plans.text_ops import _NORM, _P, _TOKS

# ---------------------------------------------------------------------------
# Deterministic k-means codebook + recall-vs-lowest-id (VERDICT r11 #3)

_KM_ITERS = 2


def _kmeans_cents_sql(iters: int = _KM_ITERS) -> str:
    """CTE chain replaying similarity.ivf.kmeans_codebook: fixed lowest-id
    init, *iters* rounds of (cosine assignment, quantized-mean update).
    The quantized mean — sum(floor(v·10⁶)) / (n·10⁶) — is integer-exact
    up to one correctly-rounded double division, so both engines derive
    bit-identical centroids in any partition/row order."""
    ids = ", ".join(str(i) for i in _CENTROID_IDS)
    blocks = [
        f"""
    kcand AS (SELECT vec_id, embedding AS e FROM embeddings
              WHERE vec_id >= {_N_QUERIES}),
    kc0 AS (SELECT vec_id AS cid,
                   list_transform(embedding, x -> x::DOUBLE) AS ce
            FROM embeddings WHERE vec_id IN ({ids}))"""
    ]
    for it in range(1, iters + 1):
        p = it - 1
        blocks.append(
            f"""
    ka{it} AS (SELECT vec_id, e, cid AS cell FROM (
                  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                      ORDER BY csim DESC, cid) AS crnk
                  FROM (SELECT c.vec_id, c.e, n.cid,
                               {_cos('c.e', 'n.ce')} AS csim
                        FROM kcand c, kc{p} n))
              WHERE crnk = 1),
    ku{it} AS (SELECT cell AS cid, pos,
                      SUM(CAST(floor(e[pos]::DOUBLE * 1000000) AS BIGINT))
                          AS s,
                      COUNT(*) AS n
               FROM ka{it}, unnest(range(1, len(e) + 1)) AS u(pos)
               GROUP BY cell, pos),
    km{it} AS (SELECT cid,
                      list(s::DOUBLE / (n * 1000000.0) ORDER BY pos) AS me
               FROM ku{it} GROUP BY cid),
    kc{it} AS (SELECT c.cid, COALESCE(m.me, c.ce) AS ce
               FROM kc{p} c LEFT JOIN km{it} m USING (cid))"""
        )
    return ",".join(blocks)


def _ivf_topk_sql(cents_cte: str, k: int = 5, nprobe: int = 2) -> str:
    """IVF probe/re-rank over an arbitrary centroid CTE (cid, ce) — the
    same shape as the registered s_ivf_ann_topk oracle."""
    return f"""
    SELECT qid, rnk, vec_id, ROUND(sim, 6) AS cosine FROM (
        SELECT qid, vec_id, sim,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY sim DESC, vec_id) AS rnk
        FROM (
            SELECT p.qid, c.vec_id, {_cos('p.qe', 'c.e')} AS sim
            FROM (SELECT vec_id, e, cid AS cell FROM (
                      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                          ORDER BY csim DESC, cid) AS crnk
                      FROM (SELECT c.vec_id, c.e, n.cid,
                                   {_cos('c.e', 'n.ce')} AS csim
                            FROM kcand c, {cents_cte} n))
                  WHERE crnk = 1) c
            JOIN (SELECT qid, qe, cid AS cell FROM (
                      SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                          ORDER BY csim DESC, cid) AS crnk
                      FROM (SELECT q.qid, q.qe, n.cid,
                                   {_cos('q.qe', 'n.ce')} AS csim
                            FROM (SELECT vec_id AS qid, embedding AS qe
                                  FROM embeddings
                                  WHERE vec_id < {_N_QUERIES}) q,
                                 {cents_cte} n))
                  WHERE crnk <= {nprobe}) p USING (cell)
        )
    ) WHERE rnk <= {k}
    """


def _kmeans_recall_oracle() -> str:
    exact = REGISTRY["s_cosine_topk"].oracle
    low = REGISTRY["s_ivf_ann_topk"].oracle
    return f"""
    WITH {_kmeans_cents_sql()},
    exact AS ({exact}),
    lowid AS ({low}),
    km AS ({_ivf_topk_sql(f"kc{_KM_ITERS}")}),
    hits AS (
        SELECT 'ivf_kmeans' AS method, e.qid, COUNT(a.vec_id) AS n_hit
        FROM exact e LEFT JOIN km a
          ON a.qid = e.qid AND a.vec_id = e.vec_id
        GROUP BY e.qid
        UNION ALL
        SELECT 'ivf_lowid', e.qid, COUNT(a.vec_id)
        FROM exact e LEFT JOIN lowid a
          ON a.qid = e.qid AND a.vec_id = e.vec_id
        GROUP BY e.qid
    )
    SELECT method, qid, CAST(n_hit AS BIGINT) AS n_hit,
           CAST(n_hit * 200 AS BIGINT) AS recall_millis
    FROM hits
    """


@query("s_ivf_kmeans_codebook", oracle=None)  # composed at import, below
def s_ivf_kmeans_codebook(spark, sf_dir):
    """Recall@5 of IVF under a REAL (deterministic Lloyd) k-means
    codebook next to the lowest-id stand-in every other IVF operator
    uses, both against the exact brute-force ground truth — VERDICT r11
    directive #3's executable witness that SCALE.md §9's "the codebook
    is a k-means job at 100 TB" changes recall, not dataflow. Init is
    the same 8 lowest-id member vectors (seed-free), 2 fixed Lloyd
    rounds with the quantized-mean update (integer-exact per dim up to
    one closing division — see ``similarity.ivf.kmeans_codebook``), so
    the DuckDB oracle replays the ENTIRE training loop bit-identically;
    both index variants then search with the same nprobe=2 probe and
    exact re-rank. Output: per (method, query) hit count against the
    exact top-5 and recall_millis = 1000·|∩|/5 in integer arithmetic —
    the per-query comparison rows the directive asked for.

    Scale: each Lloyd round is a map-only broadcast-codebook assignment
    plus ONE (cid, pos) hash aggregate over N·dim rows — no driver
    collect anywhere (the next round's codebook is a broadcast
    subplan); the eval joins are k·|queries| rows. At 100 TB, k grows
    by the √N rule (s_ivf_auto_codebook) and iters to production depth
    with the identical shape.

    Reference parity: engine-internal (reference delegates search);
    SURVEY §2 similarity extension × cluster_ops' Lloyd iteration.
    """
    from personal_data_lakehouse_spark.similarity.brute_force import (
        cosine_topk,
    )
    from personal_data_lakehouse_spark.similarity.ivf import (
        ivf_topk,
        kmeans_codebook,
        pick_centroids,
    )

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    cand = emb.filter(F.col("vec_id") >= _N_QUERIES)
    # coalesce before persist — the s_ann_recall_eval precedent: nothing
    # downstream reuses the qid-window's 200-partition hash layout
    exact = (
        cosine_topk(queries, cand, k=5)
        .select("qid", "vec_id")
        .coalesce(spark.sparkContext.defaultParallelism)
        .persist()
    )
    qids = exact.select("qid").distinct()
    variants = (
        ("ivf_lowid", pick_centroids(emb, _CENTROID_IDS)),
        ("ivf_kmeans", kmeans_codebook(cand, _CENTROID_IDS, iters=_KM_ITERS)),
    )
    parts = []
    for method, cents in variants:
        approx = ivf_topk(queries, cand, cents, k=5, nprobe=2).select(
            "qid", "vec_id"
        )
        hits = (
            exact.join(approx, ["qid", "vec_id"])
            .groupBy("qid")
            .agg(F.count(F.lit(1)).alias("n_hit"))
        )
        parts.append(
            qids.join(hits, "qid", "left").select(
                F.lit(method).alias("method"),
                "qid",
                F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            )
        )
    out = parts[0].unionByName(parts[1])
    return out.withColumn(
        "recall_millis", (F.col("n_hit") * 200).cast("long")
    )


REGISTRY["s_ivf_kmeans_codebook"].oracle = _kmeans_recall_oracle()


# ---------------------------------------------------------------------------
# Chunk-granular ANN recall (VERDICT r11 #5)


def _chunk_recall_oracle() -> str:
    qbound = _N_QUERY_DOCS * _CHUNK_STRIDE
    return f"""
    WITH ivf AS ({_chunk_ann_oracle()}),
    cvecs AS (
        SELECT doc_id * {_CHUNK_STRIDE} + chunk_id AS cid, {_CHUNK_VEC} AS e
        FROM (SELECT doc_id,
                     substr(text, CAST(chunk_id * 150 + 1 AS INT), 200)
                         AS chunk,
                     chunk_id
              FROM (SELECT doc_id, text,
                           unnest(range(((greatest(length(text), 1) - 1)
                                         // 150) + 1)) AS chunk_id
                    FROM documents))
    ),
    bq AS (SELECT cid AS qid, e AS qe FROM cvecs WHERE cid < {qbound}),
    bc AS (SELECT cid, e FROM cvecs WHERE cid >= {qbound}),
    exact AS (
        SELECT qid, cid FROM (
            SELECT qid, cid,
                   ROW_NUMBER() OVER (PARTITION BY qid
                       ORDER BY {_cos('qe', 'e')} DESC, cid) AS rnk
            FROM bq, bc
        ) WHERE rnk <= 3
    ),
    hits AS (
        SELECT e.qid, COUNT(a.vid) AS n_hit
        FROM exact e LEFT JOIN ivf a
          ON a.qid = e.qid AND a.vid = e.cid
        GROUP BY e.qid
    )
    SELECT qid, CAST(n_hit AS BIGINT) AS n_hit,
           CAST(1000 * n_hit // 3 AS BIGINT) AS recall_millis
    FROM hits
    """


@query("s_chunk_ann_recall", oracle=None)  # composed at import, below
def s_chunk_ann_recall(spark, sf_dir):
    """Recall@3 of the chunk-level IVF retrieval (`s_chunk_ann_topk`'s
    exact plan) against brute-force cosine over the SAME chunk vectors —
    VERDICT r11 directive #5: the RAG path's recall measured per query
    chunk, not asserted. `s_ann_recall_eval` is doc-granular over the
    embeddings fixture; this is the chunk-granular sibling, so the
    whole ingestion chain (chunk → embed → index → probe) sits under a
    measured recall bound. recall_millis = 1000·|∩| div 3 in integer
    arithmetic; a retrieval regression (wrong cell assignment, probe
    list, or re-rank) moves the hash.

    Scale: ground truth is |Q|·|C| dots — at 100 TB this runs on a
    SAMPLED query set (exactly what the first-five-docs query set
    models); the IVF side inherits `ivf_topk`'s audited shape. The eval
    join is 3·|Q| rows.

    Reference parity: engine-internal; SURVEY §2 similarity extension.
    """
    ivf = REGISTRY["s_chunk_ann_topk"].fn(spark, sf_dir).select(
        "qid", "vid"
    )
    queries, cand = _chunk_query_cand(spark, sf_dir)
    from personal_data_lakehouse_spark.similarity.brute_force import (
        cosine_topk,
    )

    exact = (
        cosine_topk(queries, cand, k=3, cand_id="vid", cand_vec="e")
        .select("qid", "vid")
        .coalesce(spark.sparkContext.defaultParallelism)
        .persist()
    )
    hits = (
        exact.join(ivf, ["qid", "vid"])
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        exact.select("qid")
        .distinct()
        .join(hits, "qid", "left")
        .select(
            "qid",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
        )
        .withColumn(
            "recall_millis",
            F.expr("CAST(1000 * n_hit div 3 AS BIGINT)"),
        )
    )


REGISTRY["s_chunk_ann_recall"].oracle = _chunk_recall_oracle()


# ---------------------------------------------------------------------------
# Incremental decontamination: stored train-spine artifact (VERDICT r11 #4)


def _decon_shingled(d):
    """(doc_id, split, s): the md5-coined split label + exploded 3-word
    shingles — the decon family's one tokenization, shared verbatim by
    the full recompute, the incremental probe, and the live stream so
    the three can never drift."""
    from personal_data_lakehouse_spark.functions.text import (
        tokens,
        word_shingles,
    )

    return d.select(
        "doc_id",
        _coin_col().alias("split"),
        F.explode(word_shingles(tokens("text"))).alias("s"),
    )


def _decon_base_artifacts(spark, sf_dir, docs, thr):
    """The stored decon state: the base corpus' train∪val shingle SPINE
    and its test-doc shingle table, materialized once per (sf, process)
    as parquet (the persist-once / probe-incrementally artifact pattern)
    and probed by both the incremental and the streaming sibling —
    shared artifacts, zero extra manufacture. Returns (spine, test_sh)
    as cached parquet reads."""
    from personal_data_lakehouse_spark.operators.partitioning import spread
    from personal_data_lakehouse_spark.plans.registry import (
        read_parquet_cached,
    )
    from personal_data_lakehouse_spark.streaming.windows import (
        source_fixture_dir,
    )

    spine_dir, spine_ready = source_fixture_dir("deconspine", sf_dir)
    test_dir, test_ready = source_fixture_dir("decontest", sf_dir)
    if not (spine_ready and test_ready):
        base_sh = _decon_shingled(
            spread(docs.filter(F.col("doc_id") < thr))
        )
        npart = spark.sparkContext.defaultParallelism
        base_sh.filter(F.col("split") != "test").select(
            "s"
        ).distinct().coalesce(npart).write.mode("overwrite").parquet(
            spine_dir
        )
        base_sh.filter(F.col("split") == "test").select(
            "doc_id", "s"
        ).coalesce(npart).write.mode("overwrite").parquet(test_dir)
    return (
        read_parquet_cached(spark, spine_dir),
        read_parquet_cached(spark, test_dir),
    )


def _decon_report(test_all, spine_all):
    """The probe: every test shingle against the merged spine (shingle-
    keyed left join), rolled up per eval doc with the integer ≥50%
    contamination flag — byte-identical to t_eval_decontaminate's
    report stage."""
    joined = test_all.join(
        spine_all.withColumn("__hit", F.lit(1)), "s", "left"
    )
    hits = F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
    n = F.count(F.lit(1))
    return joined.groupBy("doc_id").agg(
        n.alias("n_shingles"),
        hits.cast("long").alias("n_hit"),
        F.round(hits.cast("double") / n, 6).alias("hit_frac"),
        (hits * 2 >= n).cast("long").alias("contaminated"),
    )


@query("t_decontaminate_incremental", oracle=None)  # shared, injected below
def t_decontaminate_incremental(spark, sf_dir):
    """INCREMENTAL eval-set decontamination, hash-equal to the
    `t_eval_decontaminate` full recompute (the two share one oracle
    verbatim — the established no-drift technique): the base corpus
    (bottom ~80% of the doc_id range, the corpus-incremental split) has
    its train∪val 3-shingle spine and its test-doc shingle table
    MATERIALIZED ONCE as parquet artifacts — the persist-once /
    probe-incrementally pattern the r11 docstring promised and VERDICT
    r11 directive #4 ordered. The new-docs batch (top ~20%) then:

    * MERGEs its train∪val shingles into the stored spine (insert-only
      anti-join — the spine is a DISTINCT set);
    * appends its test-doc shingles to the stored test table;
    * re-probes ALL test shingles against the merged spine (the join IS
      the probe; a base-era eval doc must flip to contaminated when the
      batch adds the train text it overlaps — which is exactly why the
      report re-probes instead of caching per-doc verdicts).

    The batch's text is the ONLY text read: both artifact reads are
    parquet probes, and the documents scan carries the batch filter —
    pinned by the executed-plan test
    (tests/test_round12_ops.py::test_decontaminate_incremental_reads_only_batch_text).

    Scale: a daily 0.1% delta re-shingles 0.1% of the corpus; the spine
    MERGE is |batch shingles| against the stored DISTINCT set (shingle-
    hash-keyed); the probe join is |test shingles| × spine on the
    shingle key. The full recompute pays the corpus-wide explode +
    DISTINCT every run — this pays it once.

    Reference parity: watermark-incremental processing
    (transforme_stock_silver.py:41-97) + dedup-on-append MERGE
    (ingest_stocks.py:84-100) applied to the decontamination spine;
    SURVEY §2 text-analysis extension × the split family.
    """
    from personal_data_lakehouse_spark.operators.partitioning import spread
    from personal_data_lakehouse_spark.plans.round9_ops import (
        _inc_threshold,
    )

    docs = t(spark, sf_dir, "documents")
    thr = _inc_threshold(spark, sf_dir, docs)
    spine, test_sh = _decon_base_artifacts(spark, sf_dir, docs, thr)
    batch_sh = _decon_shingled(spread(docs.filter(F.col("doc_id") >= thr)))
    new_spine = (
        batch_sh.filter(F.col("split") != "test")
        .select("s")
        .distinct()
        .join(spine, "s", "left_anti")
    )
    spine_all = spine.unionByName(new_spine)
    test_all = test_sh.unionByName(
        batch_sh.filter(F.col("split") == "test").select("doc_id", "s")
    )
    return _decon_report(test_all, spine_all)


# increments must land exactly on the full-recompute report — one shared
# oracle, zero drift (the corpus-incremental trio's technique)
REGISTRY["t_decontaminate_incremental"].oracle = REGISTRY[
    "t_eval_decontaminate"
].oracle


@query("t_stream_decontaminate", oracle=None)  # shared, injected below
def t_stream_decontaminate(spark, sf_dir):
    """The decontamination spine maintained from a LIVE STREAM OF
    DELTAS — completing the recompute ≡ increment ≡ stream symmetry the
    corpus-pipeline trio established, now for the eval-decontamination
    family: `t_eval_decontaminate` (full recompute) ≡
    `t_decontaminate_incremental` (one stored-artifact batch) ≡ this
    query (the same batch as three ascending id-range delta files,
    `maxFilesPerTrigger=1`). All three share ONE oracle verbatim.

    The base spine/test artifacts load once (the SAME parquet artifacts
    the incremental sibling materializes — shared manufacture); every
    micro-batch then MERGEs its train∪val shingles into the carried
    spine (insert-only anti-join — the spine is a DISTINCT set, so
    chained merges land exactly on the one-batch merge) and appends its
    test-doc shingles, both carried frames localCheckpoint'ed per batch
    so the plan never grows with stream length. The final report
    re-probes ALL test shingles against the final spine — probing after
    the last batch is semantically REQUIRED (train text arriving in
    batch 3 must flip an eval doc appended in batch 1), and it is the
    identical shingle-keyed join the siblings run.

    Scale: per-batch shingle work is O(batch); the carried spine is the
    published train n-gram index — at warehouse scale it lives as a
    managed table and the foreachBatch body becomes the insert-only
    `merge_sink` shape (streaming/windows.py), exactly the
    t_stream_corpus_increments pattern. The probe is deferred to
    report time, so the stream's steady-state cost is the MERGE alone.

    Reference parity: ingest_stocks.py:84-100 (dedup-on-append MERGE per
    increment) applied to the decon spine; SURVEY §2 S6+/J1 × the §2.9
    streaming extension × the split family.
    """
    from personal_data_lakehouse_spark.plans.round9_ops import (
        _inc_threshold,
        delta_stream_source,
    )
    from personal_data_lakehouse_spark.streaming.windows import (
        drain_stream_foreach,
        stream_work_dir,
    )

    docs = t(spark, sf_dir, "documents")
    thr = _inc_threshold(spark, sf_dir, docs)
    spine0, test0 = _decon_base_artifacts(spark, sf_dir, docs, thr)
    src, doc_schema = delta_stream_source(
        spark, sf_dir, docs.filter(F.col("doc_id") >= thr)
    )
    carried = {"spine": spine0, "test": test0}

    def process_batch(batch, _bid):
        b_sh = _decon_shingled(batch)
        new_spine = (
            b_sh.filter(F.col("split") != "test")
            .select("s")
            .distinct()
            .join(carried["spine"], "s", "left_anti")
        )
        # sever lineage per batch (the t_stream_corpus_increments
        # contract): an unbounded stream would otherwise grow both
        # carried plans by one increment per batch
        carried["spine"] = (
            carried["spine"].unionByName(new_spine).localCheckpoint()
        )
        carried["test"] = (
            carried["test"]
            .unionByName(
                b_sh.filter(F.col("split") == "test").select(
                    "doc_id", "s"
                )
            )
            .localCheckpoint()
        )

    stream = (
        spark.readStream.schema(doc_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    drain_stream_foreach(
        stream, stream_work_dir("deconstream"), process_batch
    )
    return _decon_report(carried["test"], carried["spine"])


# three chained spine merges land exactly on the full-recompute report —
# the same shared oracle, zero drift
REGISTRY["t_stream_decontaminate"].oracle = REGISTRY[
    "t_eval_decontaminate"
].oracle


# ---------------------------------------------------------------------------
# BPE oracle retirement (VERDICT r11 #6): the train/encode replay in SQL

_N_BPE_MERGES = 8

# Symbol-string representation: each symbol wrapped \x02sym\x03. A merge
# (l, r) -> lr is replace('\x02l\x03\x02r\x03' -> '\x02lr\x03'):
# left-to-right, non-overlapping, never matching inside a symbol or
# across a replacement boundary — exactly the greedy fold semantics of
# functions.bpe._merge_pair (DuckDB's replace scans left to right and
# resumes AFTER the replacement, like the fold's accumulator). Verified
# bit-equal to the Spark trainer at sf0.001/0.01/0.1.
_BPE_WRAP = (
    "chr(2) || array_to_string(string_split(w, ''), chr(3) || chr(2)) "
    "|| chr(3)"
)


def _bpe_train_blocks() -> str:
    """WITH-blocks: wd (doc_id, word), vocab, v0..vN (wrapped vocab after
    k merges), m1..mN (the k-th merge as (l, r, pc) — argmax weighted
    pair count, ties count DESC then (l, r) ASC, min_count 2)."""
    blocks = [
        f"""
    wdoc AS (SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS w
             FROM documents),
    wd AS (SELECT doc_id, w FROM wdoc WHERE length(w) > 0),
    vocab AS (SELECT w, COUNT(*) AS cnt FROM wd GROUP BY w),
    v0 AS (SELECT w, cnt, {_BPE_WRAP} AS s FROM vocab)"""
    ]
    for k in range(1, _N_BPE_MERGES + 1):
        p = k - 1
        blocks.append(
            f"""
    p{k} AS (SELECT sy[i] AS l, sy[i+1] AS r, SUM(cnt) AS pc
             FROM (SELECT cnt, string_split(s[2:-2], chr(3) || chr(2))
                          AS sy FROM v{p}),
                  unnest(range(1, len(sy))) AS u(i)
             GROUP BY 1, 2 HAVING SUM(cnt) >= 2),
    m{k} AS (SELECT l, r, pc FROM p{k} ORDER BY pc DESC, l, r LIMIT 1),
    v{k} AS (SELECT w, cnt,
                    replace(s, chr(2) || m.l || chr(3) || chr(2) || m.r
                               || chr(3),
                            chr(2) || m.l || m.r || chr(3)) AS s
             FROM v{p} CROSS JOIN m{k} m)"""
        )
    return ",".join(blocks)


_BPE_ENC_BLOCKS = f"""
    enc AS (SELECT w, length(s) - length(replace(s, chr(2), ''))
                       AS n_sym
            FROM v{_N_BPE_MERGES}),
    perdoc AS (SELECT wd.doc_id, COUNT(*) AS n_words,
                      SUM(e.n_sym) AS n_bpe_tokens
               FROM wd JOIN enc e USING (w) GROUP BY wd.doc_id)"""


def _inject_bpe_oracles() -> None:
    """Retire the three BPE rows-only entries (VERDICT r11 directive #6
    asked for fertility; the same train-replay CTEs give the trainer and
    the encoder their oracles for free). The sequential-reference pytest
    pins (tests/test_bpe.py) remain the independent algebra check the
    differential gate can't provide."""
    train = _bpe_train_blocks()
    merge_sel = " UNION ALL ".join(
        f'SELECT {k} AS rank, l AS "left", r AS "right", '
        f"CAST(pc AS BIGINT) AS pair_count FROM m{k}"
        for k in range(1, _N_BPE_MERGES + 1)
    )
    REGISTRY["t_bpe_merges"].oracle = f"""
    WITH {train}
    SELECT * FROM ({merge_sel})
    """
    REGISTRY["t_bpe_encode"].oracle = f"""
    WITH {train},{_BPE_ENC_BLOCKS}
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(n_bpe_tokens AS BIGINT) AS n_bpe_tokens
    FROM perdoc
    """
    REGISTRY["t_tokenizer_fertility"].oracle = f"""
    WITH {train},{_BPE_ENC_BLOCKS}
    SELECT d.lang, COUNT(*) AS n_docs,
           CAST(SUM(p.n_words) AS BIGINT) AS total_words,
           CAST(SUM(p.n_bpe_tokens) AS BIGINT) AS total_bpe_tokens,
           CAST(1000 * SUM(p.n_bpe_tokens) // SUM(p.n_words) AS BIGINT)
               AS fertility_millis
    FROM perdoc p JOIN documents d USING (doc_id)
    GROUP BY d.lang
    """


_inject_bpe_oracles()


# ---------------------------------------------------------------------------
# Mergeable frequency sketch: count-min heavy hitters (second wave)

_CMS_D = 4  # hash rows
_CMS_W = 64  # buckets per row
_CMS_K = 15  # heavy-hitter candidates reported


def _dd_fold(expr: str) -> str:
    """Scalar DuckDB twin of dedup.minhash._base_hash: the 60-bit md5
    fold mod p over an arbitrary VARCHAR expression (text_ops._XS is the
    same fold mapped over a list)."""
    return (
        "list_reduce(list_transform(range(1, 16), "
        f"i -> (strpos('0123456789abcdef', md5({expr})[i]) - 1)::BIGINT), "
        f"(a, b) -> a * 16 + b) % {_P}"
    )


def _token_vocab(docs):
    """(w, c): exact token counts — the map-side-combinable groupBy both
    spectrum consumers (CMS, coverage curve) start from."""
    from personal_data_lakehouse_spark.functions.text import tokens

    return (
        docs.select(F.explode(tokens("text")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _cms_bucket(col_j, col_w):
    """Row-salted bucket id: the engine-neutral md5 fold of 'j|token'
    mod W — dedup.minhash._base_hash, the minhash/SRP idiom."""
    from personal_data_lakehouse_spark.dedup.minhash import _base_hash

    return _base_hash(
        F.concat(col_j.cast("string"), F.lit("|"), col_w)
    ) % F.lit(_CMS_W)


def _cms_sketch(vocab):
    """The d×w sketch as (j, b, bc) rows from exact token counts —
    algebraically identical to per-partition sketch arrays merged
    cell-wise (bucket sums are linear in the counts), which
    test_countmin_sketch_is_mergeable pins."""
    rows = F.array([F.lit(j) for j in range(_CMS_D)])
    return (
        vocab.select("w", "c", F.explode(rows).alias("j"))
        .withColumn("b", _cms_bucket(F.col("j"), F.col("w")))
        .groupBy("j", "b")
        .agg(F.sum("c").alias("bc"))
    )


@query(
    "t_countmin_heavyhitters",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS w FROM documents),
    tk AS (SELECT w FROM tok WHERE length(w) > 0),
    vocab AS (SELECT w, COUNT(*) AS c FROM tk GROUP BY w),
    hj AS (SELECT w, c, j,
                  {_dd_fold("j::VARCHAR || '|' || w")} % {_CMS_W} AS b
           FROM vocab, unnest([0, 1, 2, 3]) AS u(j)),
    sketch AS (SELECT j, b, SUM(c) AS bc FROM hj GROUP BY j, b),
    cand AS (SELECT w, c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rnk
             FROM vocab ORDER BY c DESC, w LIMIT {_CMS_K}),
    est AS (SELECT cand.w, cand.c, cand.rnk, MIN(s.bc) AS cms
            FROM cand JOIN hj ON hj.w = cand.w
            JOIN sketch s ON s.j = hj.j AND s.b = hj.b
            GROUP BY cand.w, cand.c, cand.rnk)
    SELECT CAST(rnk AS BIGINT) AS rank, w AS token,
           CAST(c AS BIGINT) AS exact_count,
           CAST(cms AS BIGINT) AS cms_count,
           CAST(cms - c AS BIGINT) AS overestimate
    FROM est
    """,
)
def t_countmin_heavyhitters(spark, sf_dir):
    """Count-min sketch over the token stream, scored against exact
    counts for the top-15 heavy hitters — the MERGEABLE frequency
    sketch the streaming/approx family was missing (HLL answers "how
    many distinct", CMS answers "how often is X" in O(d·w) memory with
    a one-sided error: estimates only ever OVERCOUNT, which the
    ``overestimate`` column exposes per hitter). Every piece is
    deterministic — the d=4 hash rows reuse the engine-neutral 60-bit
    md5 fold (dedup.minhash._base_hash, the minhash/SRP idiom) salted
    by the row index — so DuckDB replays the EXACT sketch: bucket sums,
    min-over-rows estimates, and overestimates all hash-match, making
    this the exact-oracle sibling of the rows-only `q_hll_mv`
    (a Spark-internal sketch no external engine can replay).

    Dataflow: token counts (map-side-combinable groupBy, the
    t_token_count shape) → the 256-cell sketch as a (row, bucket) SUM —
    algebraically identical to per-partition sketch arrays merged
    cell-wise, which is the production form (a fixed-size array
    aggregate, mergeable across partitions/days, the same
    persist-once/probe-incrementally story as the HLL MV) → candidates
    via distributed TakeOrdered top-15 → estimate = min over the 4
    broadcast-joined bucket sums. No shuffle exceeds |vocab| rows; the
    sketch itself is 256 rows broadcast back. At 100 TB the exact-count
    column is dropped and the sketch IS the answer store — here it is
    the measured error witness.

    Reference parity: engine-internal extension (the reference's
    warehouse delegates approximate aggregation); SURVEY §2 A+
    approx family × the text-analysis extension.
    """
    from pyspark.sql import Window

    # persist the spectrum (the LSH/IVF small-intermediate pattern):
    # sketch, top-k, and estimate branches all consume vocab — without
    # the cache each branch re-scans the corpus (measured: 3 FileScans,
    # AQE exchange reuse only deduped one). COALESCE first: a cached
    # plan keeps its shuffle partitioning and AQE cannot re-coalesce
    # it, so a vanilla 200-partition driver session would otherwise pay
    # 200 near-empty tasks per downstream stage (the q_anomaly_mad
    # lesson)
    vocab = (
        _token_vocab(t(spark, sf_dir, "documents"))
        .coalesce(spark.sparkContext.defaultParallelism)
        .persist()
    )
    sketch = _cms_sketch(vocab)
    rows = F.array([F.lit(j) for j in range(_CMS_D)])
    top = vocab.orderBy(F.desc("c"), "w").limit(_CMS_K)
    cand = top.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("c"), "w"))
    )
    cand_h = cand.select(
        "w", "c", "rnk", F.explode(rows).alias("j")
    ).withColumn("b", _cms_bucket(F.col("j"), F.col("w")))
    est = (
        cand_h.join(F.broadcast(sketch), ["j", "b"])
        .groupBy("w", "c", "rnk")
        .agg(F.min("bc").alias("cms"))
    )
    return est.select(
        F.col("rnk").cast("long").alias("rank"),
        F.col("w").alias("token"),
        F.col("c").cast("long").alias("exact_count"),
        F.col("cms").cast("long").alias("cms_count"),
        (F.col("cms") - F.col("c")).cast("long").alias("overestimate"),
    )


# ---------------------------------------------------------------------------
# Tokenizer vocab sizing: the frequency-spectrum coverage curve

_COVERAGE_TARGETS = [500, 900, 950, 990]  # millis of the token stream


@query(
    "t_vocab_coverage",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS w FROM documents),
    tk AS (SELECT w FROM tok WHERE length(w) > 0),
    vocab AS (SELECT w, COUNT(*) AS c FROM tk GROUP BY w),
    spec AS (SELECT ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rnk,
                    SUM(c) OVER (ORDER BY c DESC, w
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cum
             FROM vocab),
    tot AS (SELECT SUM(c) AS t FROM vocab),
    tgt AS (SELECT unnest([{", ".join(str(m) for m in _COVERAGE_TARGETS)}])
                   AS target_millis),
    pick AS (SELECT target_millis, MIN(rnk) AS vocab_size
             FROM tgt, spec, tot WHERE 1000 * cum >= target_millis * t
             GROUP BY target_millis)
    SELECT CAST(p.target_millis AS BIGINT) AS target_millis,
           CAST(p.vocab_size AS BIGINT) AS vocab_size,
           CAST(1000 * s.cum // t.t AS BIGINT) AS coverage_millis
    FROM pick p JOIN spec s ON s.rnk = p.vocab_size CROSS JOIN tot t
    """,
)
def t_vocab_coverage(spark, sf_dir):
    """Vocabulary coverage curve — the tokenizer-sizing question ("how
    many types cover 99% of the token stream?") answered from the
    frequency spectrum: rank the vocabulary by count (ties broken by
    token, so the curve is engine-deterministic), cumulate, and report
    for each coverage target the MINIMAL vocab size reaching it plus
    the exact coverage attained there. All comparisons are integer
    (1000·cum ≥ target·total; coverage_millis = 1000·cum div total), so
    the picks are exact — no float threshold can flip a row. The
    complement of `t_bpe_merges`' bottom-up answer to the same design
    question and the direct consumer of `t_token_count`'s stream.

    Scale: the token groupBy is map-side combinable over the corpus;
    everything after runs on the SPECTRUM, which Heaps' law keeps at
    ~|corpus|^0.5 — the global rank/cumsum window is a sort of |vocab|
    rows (the q_decile_histogram note: at 100 TB make it a two-phase
    prefix sum — per-range partial sums broadcast back — with identical
    output; the 4-target probe is a broadcast cross-filter either way).

    Reference parity: engine-internal extension; SURVEY §2 A+/window
    family × the text-analysis extension.
    """
    from pyspark.sql import Window

    # persist the spectrum: rank/cumsum, total, and the pick-back join
    # are four consumers of one |vocab|-row aggregate (measured without
    # the cache: 5 corpus FileScans, only 3 deduped by AQE reuse);
    # coalesced so the cached partitioning stays driver-session-neutral
    vocab = (
        _token_vocab(t(spark, sf_dir, "documents"))
        .coalesce(spark.sparkContext.defaultParallelism)
        .persist()
    )
    order = Window.orderBy(F.desc("c"), "w")
    spec = vocab.select(
        F.row_number().over(order).alias("rnk"),
        F.sum("c")
        .over(order.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    tot = vocab.agg(F.sum("c").alias("t"))
    targets = spark.range(1).select(
        F.explode(
            F.array([F.lit(m) for m in _COVERAGE_TARGETS])
        ).alias("target_millis")
    )
    pick = (
        spec.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(targets),
            F.expr("1000 * cum >= target_millis * t"),
        )
        .groupBy("target_millis")
        .agg(F.min("rnk").alias("vocab_size"))
    )
    return (
        pick.join(spec, pick.vocab_size == spec.rnk)
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("target_millis").cast("long").alias("target_millis"),
            F.col("vocab_size").cast("long").alias("vocab_size"),
            F.expr("CAST(1000 * cum div t AS BIGINT)").alias(
                "coverage_millis"
            ),
        )
    )

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
from personal_data_lakehouse_spark.plans.text_ops import _NORM

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
    from personal_data_lakehouse_spark.functions.text import (
        tokens,
        word_shingles,
    )
    from personal_data_lakehouse_spark.operators.partitioning import spread
    from personal_data_lakehouse_spark.plans.registry import (
        read_parquet_cached,
    )
    from personal_data_lakehouse_spark.plans.round9_ops import (
        _inc_threshold,
    )
    from personal_data_lakehouse_spark.streaming.windows import (
        source_fixture_dir,
    )

    docs = t(spark, sf_dir, "documents")
    thr = _inc_threshold(spark, sf_dir, docs)

    def _shingled(d):
        return d.select(
            "doc_id",
            _coin_col().alias("split"),
            F.explode(word_shingles(tokens("text"))).alias("s"),
        )

    spine_dir, spine_ready = source_fixture_dir("deconspine", sf_dir)
    test_dir, test_ready = source_fixture_dir("decontest", sf_dir)
    if not (spine_ready and test_ready):
        base_sh = _shingled(
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

    spine = read_parquet_cached(spark, spine_dir)
    test_sh = read_parquet_cached(spark, test_dir)
    batch_sh = _shingled(spread(docs.filter(F.col("doc_id") >= thr)))
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


# increments must land exactly on the full-recompute report — one shared
# oracle, zero drift (the corpus-incremental trio's technique)
REGISTRY["t_decontaminate_incremental"].oracle = REGISTRY[
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

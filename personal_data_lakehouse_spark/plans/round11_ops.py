"""Round-11 registered queries: eval-set DECONTAMINATION (the partial
n-gram overlap check every LLM training pipeline runs before publishing a
corpus) and the SCD TYPE-2 merge (dbt snapshots as DataFrame algebra —
completing the MERGE family beyond insert-only/upsert/CDC).

Both carry exact DuckDB oracles built from the established shared
fragments (text_ops' shingle/token SQL, the md5 split coins of
t_train_val_test_split).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from personal_data_lakehouse_spark.functions.text import (
    tokens,
    word_shingles,
)
from personal_data_lakehouse_spark.operators.merge import scd2_merge
from personal_data_lakehouse_spark.operators.partitioning import spread
from personal_data_lakehouse_spark.plans.registry import query, t
from personal_data_lakehouse_spark.plans.text_ops import _SHINGLES, _TOKS

# The md5 split coin shared with t_train_val_test_split /
# t_leakage_safe_split / t_split_leakage_audit (round4_ops): first two hex
# chars of md5(doc_id) — < 'cd' train (~80%), < 'e6' val (~10%), else test.
_COIN_SQL = (
    "CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' "
    "THEN 'train' "
    "WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val' "
    "ELSE 'test' END"
)


def _coin_col():
    c = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return (
        F.when(c < "cd", F.lit("train"))
        .when(c < "e6", F.lit("val"))
        .otherwise(F.lit("test"))
    )


@query(
    "t_eval_decontaminate",
    oracle=f"""
    WITH lab AS (SELECT doc_id, text, {_COIN_SQL} AS split FROM documents),
    sh AS (SELECT doc_id, split, unnest({_SHINGLES}) AS s
           FROM (SELECT doc_id, split, {_TOKS} AS w FROM lab)),
    tr AS (SELECT DISTINCT s FROM sh WHERE split <> 'test'),
    te AS (SELECT doc_id, s FROM sh WHERE split = 'test')
    SELECT te.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN tr.s IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit,
           ROUND(CAST(SUM(CASE WHEN tr.s IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS hit_frac,
           CAST(CASE WHEN SUM(CASE WHEN tr.s IS NOT NULL THEN 1 ELSE 0
                              END) * 2 >= COUNT(*)
                     THEN 1 ELSE 0 END AS BIGINT) AS contaminated
    FROM te LEFT JOIN tr ON te.s = tr.s
    GROUP BY te.doc_id
    """,
)
def t_eval_decontaminate(spark, sf_dir):
    """Eval-set DECONTAMINATION report: for every TEST-split document, the
    fraction of its distinct 3-word shingles that also occur anywhere in
    the train∪val side of the SAME md5-coined split the pipeline's split
    operators publish (t_train_val_test_split's coins, verbatim) — the
    partial n-gram overlap check (the GPT-3/PaLM "13-gram collision"
    decontamination rule, at the fixture's 3-gram granularity) that
    exact-duplicate leakage audits miss: ``t_split_leakage_audit`` only
    catches byte-identical documents straddling the boundary, while a
    test doc PARAPHRASED from a train doc shares most of its n-grams and
    none of its fingerprint. The OPPOSITE direction of
    ``t_contamination`` (which flags TRAIN docs carrying grams of a
    small held-out benchmark — the dataset-cleaning sweep, absolute
    shared-count threshold): this one scores each EVAL doc by the
    FRACTION of its own content already seen in training — the
    "can we trust this eval number" report, normalized per doc and run
    on the pipeline's real split coins rather than a modulus. Emits
    (n_shingles, n_hit, hit_frac) per test
    doc plus the integer ``contaminated`` flag at the ≥50% overlap
    threshold — the flag compares integers (2·hits ≥ total), never a
    rounded float, so the decision is engine-exact. Test docs with no
    3-word shingle (< 3 tokens) are absent, matching the oracle's
    unnest-of-empty-list semantics.

    Scale: one shingle explode over the corpus, a map-side-combinable
    DISTINCT on the train side (the published "train n-gram index"
    artifact — in production it persists once and every new eval suite
    probes it WITHOUT re-reading train text, the stored-index pattern of
    the incremental pipeline), and a shingle-keyed left join of only the
    test slice (~10% of docs) against that spine, then a doc_id rollup.
    Hot boilerplate shingles fan the probe join but not the aggregate;
    at 100 TB cap them with the t_boilerplate_spans hot-gram guard first
    (the t_ngram_novelty note).

    Reference parity: engine-internal (the reference delegates corpus
    hygiene to its warehouse); SURVEY §2 text-analysis/dedup extension ×
    the split family (round4_ops coins).
    """
    lab = spread(t(spark, sf_dir, "documents")).select(
        "doc_id", "text", _coin_col().alias("split")
    )
    sh = lab.select(
        "doc_id",
        "split",
        F.explode(word_shingles(tokens("text"))).alias("s"),
    )
    train_spine = (
        sh.filter(F.col("split") != "test").select("s").distinct()
    )
    te = sh.filter(F.col("split") == "test").select("doc_id", "s")
    joined = te.join(
        train_spine.withColumn("__hit", F.lit(1)), "s", "left"
    )
    hits = F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
    n = F.count(F.lit(1))
    return joined.groupBy("doc_id").agg(
        n.alias("n_shingles"),
        hits.cast("long").alias("n_hit"),
        F.round(hits.cast("double") / n, 6).alias("hit_frac"),
        (hits * 2 >= n).cast("long").alias("contaminated"),
    )


# --------------------------------------------------------------------------
# Chunk-level ANN retrieval (RAG ingestion: chunk → embed → index → top-k)

_CHUNK_P = 2147483647  # the engine-neutral md5-fold modulus (dedup.minhash)
# Chunk-id stride: cid = doc_id * STRIDE + chunk_id. 100k (r12, r11
# ADVICE: the old ×10 stride collided once a doc reached 10 chunks —
# text ≥ ~1501 chars — making centroid selection engine-nondeterministic;
# 100k supports ~15 MB/doc at the 150-char chunk step, far past any
# corpus this engine chunks in one array) keeps ids dense enough for
# BIGINT (doc_id up to ~9e13) while making collisions structurally
# impossible at fixture AND production text lengths.
_CHUNK_STRIDE = 100_000
_N_QUERY_DOCS = 5  # the first five documents' chunks are the query set

# DuckDB replay of the deterministic chunk "embedding": dim d of a chunk
# is ((md5-fold of chunk||'|'||d) mod 2001) - 1000, cast to DOUBLE —
# integer arithmetic end-to-end, so both engines derive bit-identical
# vectors (the _XS fold of text_ops, parameterized by the dim suffix).
_CHUNK_FOLD = (
    "list_reduce(list_transform(range(1, 16), "
    "i -> (strpos('0123456789abcdef', md5(chunk || '|' || "
    "CAST(d AS VARCHAR))[i]) - 1)::BIGINT), "
    f"(a, b) -> a * 16 + b) % {_CHUNK_P}"
)
_CHUNK_VEC = (
    f"list_transform(range(0, 8), d -> CAST(({_CHUNK_FOLD}) % 2001 - 1000 "
    "AS DOUBLE))"
)


def _chunk_vectors(spark, sf_dir):
    """(vid, e): every document chunk's deterministic 8-dim embedding —
    the shared ingestion front half of the chunk-ANN queries (topk +
    recall eval). cid = doc_id * _CHUNK_STRIDE + chunk_id; all integer
    arithmetic, bit-identical to the ``_CHUNK_VEC`` DuckDB replay."""
    docs = t(spark, sf_dir, "documents")
    n_chunks = F.expr(
        "cast((greatest(length(text), 1) - 1) div 150 as int)"
    )
    chunk = F.expr("substring(text, chunk_id * 150 + 1, 200)")
    p = F.lit(_CHUNK_P).cast("long")
    dims = []
    for d in range(8):
        fold = (
            F.conv(
                F.substring(
                    F.md5(F.concat(chunk, F.lit(f"|{d}"))), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % p
        )
        dims.append((fold % 2001 - 1000).cast("double"))
    return docs.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0), n_chunks)).alias("chunk_id"),
    ).select(
        (F.col("doc_id") * _CHUNK_STRIDE + F.col("chunk_id"))
        .cast("long")
        .alias("vid"),
        F.array(*dims).alias("e"),
    )


def _chunk_query_cand(spark, sf_dir):
    """The chunk-ANN query/candidate split: the first ``_N_QUERY_DOCS``
    documents' chunks are the queries, everything else the corpus."""
    vecs = _chunk_vectors(spark, sf_dir)
    bound = _N_QUERY_DOCS * _CHUNK_STRIDE
    queries = vecs.filter(F.col("vid") < bound).select(
        F.col("vid").alias("qid"), F.col("e").alias("qe")
    )
    return queries, vecs.filter(F.col("vid") >= bound)


def _chunk_ann_oracle() -> str:
    from personal_data_lakehouse_spark.plans.similarity_ops import _cos

    return f"""
    WITH c AS (
        SELECT doc_id, text,
               unnest(range(((greatest(length(text), 1) - 1) // 150) + 1))
                   AS chunk_id
        FROM documents
    ),
    ch AS (SELECT doc_id * {_CHUNK_STRIDE} + chunk_id AS cid,
                  substr(text, CAST(chunk_id * 150 + 1 AS INT), 200)
                      AS chunk
           FROM c),
    vecs AS (SELECT cid, {_CHUNK_VEC} AS e FROM ch),
    q AS (SELECT cid AS qid, e AS qe FROM vecs
          WHERE cid < {_N_QUERY_DOCS * _CHUNK_STRIDE}),
    cand AS (SELECT cid, e FROM vecs
             WHERE cid >= {_N_QUERY_DOCS * _CHUNK_STRIDE}),
    cents AS (SELECT cid AS ccid, e AS ce FROM (
                  SELECT cid, e, ROW_NUMBER() OVER (ORDER BY cid) AS rn
                  FROM cand) WHERE rn <= 8),
    asg AS (SELECT c.cid, c.e, n.ccid, {_cos('c.e', 'n.ce')} AS csim
            FROM cand c, cents n),
    cells AS (SELECT cid, e, ccid AS cell FROM (
                  SELECT *, ROW_NUMBER() OVER (PARTITION BY cid
                      ORDER BY csim DESC, ccid) AS crnk FROM asg)
              WHERE crnk = 1),
    qasg AS (SELECT qid, qe, n.ccid, {_cos('qe', 'n.ce')} AS csim
             FROM q, cents n),
    probes AS (SELECT qid, qe, ccid AS cell FROM (
                   SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                       ORDER BY csim DESC, ccid) AS crnk FROM qasg)
               WHERE crnk <= 2),
    s AS (SELECT qid, cid, {_cos('qe', 'e')} AS sim
          FROM cells JOIN probes USING (cell)),
    r AS (SELECT qid, cid, sim,
                 ROW_NUMBER() OVER (PARTITION BY qid
                                    ORDER BY sim DESC, cid) AS rnk
          FROM s)
    SELECT qid, rnk, cid AS vid, ROUND(sim, 6) AS cosine
    FROM r WHERE rnk <= 3
    """


@query("s_chunk_ann_topk", oracle=_chunk_ann_oracle())
def s_chunk_ann_topk(spark, sf_dir):
    """RAG INGESTION + RETRIEVAL as one hashed plan: fixed-window chunking
    (the ``t_chunk_documents`` 200/150 windows) → a DETERMINISTIC 8-dim
    chunk embedding (dim d = md5-fold(chunk||'|'||d) mod 2001 − 1000, all
    integer arithmetic → bit-identical across engines; the honest
    stand-in for a real encoder, same dataflow) → IVF index over the
    chunk vectors (codebook = the 8 lowest candidate chunk ids, built as
    a LIMIT subplan — no driver collect) → the first five documents'
    chunks retrieve their top-3 nearest corpus chunks at nprobe=2 with
    exact cosine re-rank. This is chunk-granular similarity search —
    every other ANN query here is doc-granular over the embeddings
    fixture — and it exercises the full ingestion chain a retrieval
    pipeline runs (chunk ids, per-chunk vectors, cell index, probe).

    Scale: chunking is a narrow map stage; embedding is map-side (a real
    encoder slots in as a Pandas-UDF stage with the same schema); the
    index/probe inherit ``ivf_topk``'s audited shape — candidates
    shuffle once on cell, queries broadcast with their probe lists,
    norms computed once below the window barrier. At 100 TB the chunk
    table is ~5× the corpus rows but each stage stays linear; the
    codebook LIMIT becomes the k-means job (k ∝ √N, SCALE.md §9).

    Reference parity: engine-internal (the reference delegates search to
    its warehouse); SURVEY §2 similarity extension × t_chunk_documents.
    """
    from personal_data_lakehouse_spark.similarity.brute_force import (
        norm_col,
    )
    from personal_data_lakehouse_spark.similarity.ivf import ivf_topk

    queries, cand = _chunk_query_cand(spark, sf_dir)
    # codebook = the 8 lowest candidate chunk ids, as a PLAN (LIMIT →
    # broadcast), not a driver collect — pick_centroids needs literal
    # ids, which chunk ids aren't until runtime
    cents = (
        cand.orderBy("vid")
        .limit(8)
        .select(
            F.col("vid").alias("cid"),
            F.col("e").alias("ce"),
            norm_col("e").alias("_cen"),
        )
    )
    return ivf_topk(
        queries,
        cand,
        cents,
        k=3,
        nprobe=2,
        query_id="qid",
        query_vec="qe",
        cand_id="vid",
        cand_vec="e",
    )


@query(
    "q_merge_scd2",
    oracle="""
    WITH dim AS (
        SELECT c_custkey, c_mktsegment,
               CAST(c_acctbal AS DOUBLE) AS c_acctbal,
               DATE '1992-01-01' AS valid_from,
               CAST(NULL AS DATE) AS valid_to,
               CAST(1 AS BIGINT) AS is_current
        FROM customer
    ),
    upd AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 15 = 0 THEN 'AUTOMOBILE'
                    ELSE c_mktsegment END AS c_mktsegment,
               CASE WHEN c_custkey % 10 = 0
                    THEN CAST(c_acctbal AS DOUBLE) + 100.0
                    ELSE CAST(c_acctbal AS DOUBLE) END AS c_acctbal
        FROM customer WHERE c_custkey % 5 = 0
        UNION ALL
        SELECT c_custkey + 1000000, 'BUILDING', 0.0
        FROM customer WHERE c_custkey % 50 = 0
    ),
    chg AS (
        SELECT u.* FROM upd u
        JOIN dim d ON u.c_custkey = d.c_custkey AND d.is_current = 1
        WHERE u.c_mktsegment IS DISTINCT FROM d.c_mktsegment
           OR u.c_acctbal IS DISTINCT FROM d.c_acctbal
    ),
    ins AS (
        SELECT u.* FROM upd u
        WHERE u.c_custkey NOT IN (SELECT c_custkey FROM dim
                                  WHERE is_current = 1)
    )
    SELECT d.c_custkey, d.c_mktsegment, d.c_acctbal, d.valid_from,
           CASE WHEN d.is_current = 1
                     AND d.c_custkey IN (SELECT c_custkey FROM chg)
                THEN DATE '1998-09-02' ELSE d.valid_to END AS valid_to,
           CAST(CASE WHEN d.is_current = 1
                          AND d.c_custkey IN (SELECT c_custkey FROM chg)
                     THEN 0 ELSE d.is_current END AS BIGINT) AS is_current
    FROM dim d
    UNION ALL
    SELECT c_custkey, c_mktsegment, c_acctbal,
           DATE '1998-09-02' AS valid_from, CAST(NULL AS DATE) AS valid_to,
           CAST(1 AS BIGINT) AS is_current
    FROM (SELECT * FROM chg UNION ALL SELECT * FROM ins)
    """,
)
def q_merge_scd2(spark, sf_dir):
    """SCD TYPE-2 MERGE (``operators.merge.scd2_merge``) — dimension
    HISTORY maintenance, the dbt-snapshot materialization the reference's
    project declares (dbt_project.yml:14 ``snapshot-paths``) expressed as
    DataFrame algebra, completing the MERGE family (J1 insert-only, J2
    upsert, CDC apply_changes → J2+ versioning). The customer dimension
    is versioned on (mktsegment, acctbal): an update batch touching 20%
    of keys — some changing balance, some segment, some BOTH, some a
    NO-OP (all tracked values equal: must leave the dimension untouched,
    the idempotency contract), plus genuinely new keys (first versions) —
    yields closed rows (``valid_to`` stamped, ``is_current`` 0), new open
    versions, and untouched history, all in one pass. A no-op update
    producing a spurious version, a history row re-closed, or a new key
    missing its first version all move the hash.

    Scale: change detection is ONE equi-join of the update batch against
    the dimension's CURRENT slice (the batch broadcasts in the common
    incremental case); closing/keeping is a broadcast left join of the
    changed-key set against the dimension — the 100 TB dimension history
    never shuffles. Bucket the dimension by key for repeated merges, as
    with the other MERGE shapes.

    Reference parity: dbt snapshot-paths (dbt_project.yml:14) +
    the unique_key incremental idiom (models/silver/daily_stocks.sql:2-5)
    generalized from overwrite to versioning; SURVEY §2 J1/J2.
    """
    cust = t(spark, sf_dir, "customer")
    dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
        F.lit("1992-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(1).cast("long").alias("is_current"),
    )
    bal = F.col("c_acctbal").cast("double")
    upd = cust.filter(F.col("c_custkey") % 5 == 0).select(
        "c_custkey",
        F.when(F.col("c_custkey") % 15 == 0, F.lit("AUTOMOBILE"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        F.when(F.col("c_custkey") % 10 == 0, bal + 100.0)
        .otherwise(bal)
        .alias("c_acctbal"),
    )
    new_keys = cust.filter(F.col("c_custkey") % 50 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.lit("BUILDING").alias("c_mktsegment"),
        F.lit(0.0).alias("c_acctbal"),
    )
    updates = upd.unionByName(new_keys).withColumn(
        "eff_date", F.lit("1998-09-02").cast("date")
    )
    return scd2_merge(
        dim,
        updates,
        keys=["c_custkey"],
        tracked=["c_mktsegment", "c_acctbal"],
        eff_col="eff_date",
    )

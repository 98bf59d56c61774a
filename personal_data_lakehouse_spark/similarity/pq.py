"""Product-quantization ANN: encode vectors as M sub-space codebook codes,
score queries by asymmetric distance computation (ADC) — the IVF-PQ memory
layout (Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011) expressed as pure DataFrame plans.

Why PQ at 100 TB: a 64-dim float32 vector is 256 bytes; its M=8 × K=16
PQ code is 8 NIBBLES. The candidate side of a billion-vector search stops
being IO-bound — scans read codes (32×+ smaller), and each query scores a
candidate with M table lookups instead of D multiplies. Recall is bounded
by quantization error; the standard production topology is IVF for
candidate pruning (similarity/ivf.py) + PQ codes for in-cell scoring +
exact re-rank of the short list (similarity/brute_force.py). All three
now exist here.

Determinism discipline (same as plans/cluster_ops k-means): components
quantize to ints via floor(x·1e6) BEFORE any distance math, so every
distance is an exact BIGINT, argmins tie-break on the first minimal index
(`array_position(d, array_min(d))`), and Spark/DuckDB agree bit-for-bit —
which is what makes the ADC top-k oracle-hashable.

Codebooks here are anchor-sampled (every 31st vector), not Lloyd-trained:
codebook QUALITY is orthogonal to the engine dataflow under test, and
`plans/cluster_ops.m_kmeans_centroids` already proves distributed Lloyd
iterations; swap its output in for trained codebooks.

Dataflow/scale:
- codebooks collapse to ONE row (collect_list over ≤K anchors) and attach
  to both sides via broadcast cross join — the bitmap-broadcast pattern
  from operators/bloomjoin.py; nothing vector-count-proportional moves.
- encoding is map-only (argmin over K per subspace, JVM higher-order
  functions, no Python);
- scoring joins the tiny query side (codes + per-query LUTs) to encoded
  candidates via broadcast, then one per-query top-k window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

M_SUBSPACES = 8
SUB_DIM = 8
K_CODES = 16
QSCALE = 1_000_000

_CB_COL = "__pq_codebook"  # array<array<bigint>> — K anchor vectors, quantized


def _quantized(vec: str | Column) -> Column:
    """floor(x·1e6) per component, WIDENED TO DOUBLE FIRST: the inputs are
    float32, and float32 × int literal stays float32 in Spark's type
    promotion — a different floor near representation boundaries than the
    oracle's double math. float→double widening is exact, so after the
    cast both engines floor the identical product."""
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(
        v,
        lambda x: F.floor(x.cast("double") * F.lit(float(QSCALE))).cast("long"),
    )


def _sub_expr(arr: str, m: str) -> str:
    """SQL slice of quantized vector *arr* for 0-based subspace index *m*."""
    return f"slice({arr}, {m} * {SUB_DIM} + 1, {SUB_DIM})"


_D2 = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
    "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
)


def build_codebook(vectors: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """One-row codebook frame: the K anchor vectors (every 31st by vec_id,
    first K in id order), quantized. Subspace views are sliced lazily at
    encode/score time, so one array column serves all M subspaces."""
    anchors = (
        vectors.filter(F.col("vec_id") % 31 == 0)
        .orderBy("vec_id")
        .limit(K_CODES)
        .select("vec_id", _quantized(vec_col).alias("qv"))
    )
    return anchors.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("vec_id", "qv"))),
            lambda s: s["qv"],
        ).alias(_CB_COL)
    )


def encode(
    vectors: DataFrame, codebook: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Attach ``codes: array<int>`` (M entries, 1-based codebook indices).

    Map-only: the one-row codebook broadcasts; per subspace the code is
    the first argmin of K exact integer L2 distances.
    """
    with_cb = vectors.withColumn("__qv", _quantized(vec_col)).crossJoin(
        F.broadcast(codebook)
    )
    d2 = _D2.format(a=f"{_sub_expr('a', 'm')}", b=_sub_expr("__qv", "m"))
    codes = F.expr(
        f"transform(sequence(0, {M_SUBSPACES - 1}), m -> "
        f"CAST(array_position("
        f"  transform({_CB_COL}, a -> {d2}), "
        f"  array_min(transform({_CB_COL}, a -> {d2}))"
        f") AS INT))"
    )
    return with_cb.withColumn("codes", codes).drop("__qv", _CB_COL)


# ADC score: codes are 1-based (array_position); element_at is the
# 1-based accessor ([] would be 0-based in Spark SQL)
ADC_SCORE = (
    "aggregate(zip_with(__lut, codes, (t, c) -> element_at(t, c)), "
    "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
)


def with_luts(
    queries: DataFrame,
    codebook: DataFrame,
    query_vec: str = "qe",
    keep_quantized: bool = False,
) -> DataFrame:
    """Attach ``__lut: array<array<bigint>>`` (M×K exact L2² of the query's
    subvectors to every codebook entry) — the per-query table ADC scoring
    reads instead of touching raw candidate vectors. ``keep_quantized``
    additionally retains ``__qq`` for an exact re-rank stage downstream."""
    q = queries.withColumn("__qq", _quantized(query_vec)).crossJoin(
        F.broadcast(codebook)
    )
    lut_d2 = _D2.format(a=_sub_expr("a", "m"), b=_sub_expr("__qq", "m"))
    luts = F.expr(
        f"transform(sequence(0, {M_SUBSPACES - 1}), m -> "
        f"transform({_CB_COL}, a -> {lut_d2}))"
    )
    q = q.withColumn("__lut", luts).drop(_CB_COL, query_vec)
    return q if keep_quantized else q.drop("__qq")


def adc_topk(
    queries: DataFrame,
    candidates: DataFrame,
    codebook: DataFrame,
    k: int = 5,
    query_id: str = "qid",
    query_vec: str = "qe",
    cand_id: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k: exact query subvectors against candidate
    codes. Each query carries its M×K lookup table (exact BIGINT L2 to
    every codebook entry per subspace); a candidate's distance is the sum
    of M LUT lookups selected by its codes. Ties (same quantized distance)
    break on candidate id."""
    q = with_luts(queries, codebook, query_vec).select(query_id, "__lut")
    scored = candidates.crossJoin(F.broadcast(q)).withColumn(
        "adc_dist_q", F.expr(ADC_SCORE)
    )
    w = Window.partitionBy(query_id).orderBy("adc_dist_q", cand_id)
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id, "rnk", cand_id, "adc_dist_q")
    )


def ivf_pq_topk(
    queries: DataFrame,
    candidates: DataFrame,
    cents: DataFrame,
    codebook: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    shortlist: int = 30,
    query_id: str = "qid",
    query_vec: str = "qe",
    cand_id: str = "vec_id",
    cand_vec: str = "embedding",
) -> DataFrame:
    """The full production ANN topology in one plan: IVF coarse pruning →
    PQ/ADC in-cell scoring → exact re-rank of the shortlist.

    1. candidates shuffle ONCE on their nearest coarse cell (IVF); queries
       probe ``nprobe`` cells — the pair space shrinks by ~k_cells/nprobe;
    2. inside probed cells, pairs are scored by M LUT lookups against the
       candidates' PQ codes (no raw candidate vectors touched);
    3. the per-query ``shortlist`` best ADC candidates get an exact
       integer-L2 re-rank, producing the final top-k.

    At 100 TB stage 2 reads only codes (32× smaller scans) and stage 3
    touches ``shortlist`` rows per query. Every distance is an exact
    BIGINT with id tie-breaks, so the whole cascade is oracle-replayable.
    """
    from personal_data_lakehouse_spark.similarity.ivf import assign_cells

    cells = assign_cells(candidates, cents, cand_id, cand_vec, n=1)
    enc = encode(cells, codebook, vec_col=cand_vec).withColumn(
        "__cq", _quantized(cand_vec)
    )
    probes = assign_cells(queries, cents, query_id, query_vec, n=nprobe)
    qside = with_luts(probes, codebook, query_vec, keep_quantized=True).select(
        query_id, "cell", "__lut", "__qq"
    )
    scored = enc.join(F.broadcast(qside), on="cell").withColumn(
        "adc_dist_q", F.expr(ADC_SCORE)
    )
    w_short = Window.partitionBy(query_id).orderBy("adc_dist_q", cand_id)
    short = scored.withColumn("srnk", F.row_number().over(w_short)).filter(
        F.col("srnk") <= shortlist
    )
    rerank = short.withColumn(
        "d2_q",
        F.expr(
            "aggregate(zip_with(__cq, __qq, (x, y) -> (x - y) * (x - y)), "
            "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ),
    )
    w_final = Window.partitionBy(query_id).orderBy("d2_q", cand_id)
    return (
        rerank.withColumn("rnk", F.row_number().over(w_final))
        .filter(F.col("rnk") <= k)
        .select(query_id, "rnk", cand_id, "d2_q")
    )

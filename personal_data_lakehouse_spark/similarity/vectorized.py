"""Arrow-batched vectorized cosine scoring (mapInPandas + NumPy).

The JVM-side fold in ``brute_force`` is the *oracle-exact* path: its
left-to-right summation is replayable by an external engine. This module
is the *throughput* path for when exactness-of-last-bit doesn't matter
(recall-oriented ANN candidate generation): each Arrow batch of candidate
vectors becomes one NumPy matrix, and scoring against the broadcast query
matrix is a single BLAS GEMM — hundreds of rows per matmul instead of one
expression eval per pair.

Numerical note: BLAS uses pairwise/blocked summation, so the low bits can
differ from the sequential fold (~1e-12 relative). Results are therefore
NOT registered with a value-hash oracle; the differential test asserts
agreement with the exact path to 1e-6 and identical top-k id sets.

Scale: queries broadcast once per executor (Spark broadcast variable);
candidates stream through in Arrow batches — a map-only stage with no
shuffle, trivially data-parallel at 100 TB. Batch size is controlled by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

SCORE_SCHEMA = T.StructType(
    [
        T.StructField("qid", T.LongType()),
        T.StructField("vec_id", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ]
)


def cosine_topk_vectorized(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    query_id: str = "qid",
    query_vec: str = "qe",
    cand_id: str = "vec_id",
    cand_vec: str = "embedding",
) -> DataFrame:
    """Exact-math top-k via per-batch GEMM; ties broken by candidate id.

    The query matrix is collected to the driver (top-k search presumes a
    small query set) and closed over — Spark serializes it into the
    Python workers once per executor, not per batch.
    """
    q_rows = queries.select(query_id, query_vec).collect()
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    qmat = np.array([r[1] for r in q_rows], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[cand_id].to_numpy(dtype=np.int64)
            cmat = np.array(list(pdf[cand_vec]), dtype=np.float64)
            if len(cmat) == 0:
                continue
            sims = (qmat @ cmat.T) / np.outer(qnorm, np.linalg.norm(cmat, axis=1))
            n_q, n_c = sims.shape
            yield pd.DataFrame(
                {
                    "qid": np.repeat(qids, n_c),
                    "vec_id": np.tile(ids, n_q),
                    "cosine": sims.ravel(),
                }
            )

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    scored = candidates.select(cand_id, cand_vec).mapInPandas(
        score, schema=SCORE_SCHEMA
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "rnk", "vec_id", F.round("cosine", 6).alias("cosine"))
    )

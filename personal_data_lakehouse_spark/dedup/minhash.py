"""MinHash + LSH near-duplicate detection, expressed as built-in
higher-order array expressions (shingle → minhash → band → bucket-join).

Design (standard MinHash/LSH — Broder 1997; Leskovec et al., "Mining of
Massive Datasets" ch.3):

* hash family: ``h_i(s) = md5(i || ':' || s)`` compared lexicographically —
  seed-salted md5 gives k independent permutations and is reproducible in
  any engine (the DuckDB oracle runs the identical formula).
* signature: per document, ``sig[i] = min over shingles of h_i`` — computed
  with ``transform``/``array_min`` entirely inside the row (a narrow map
  stage: NO explode, NO shuffle for signatures).
* banding: k=16 minhashes → b=4 bands × r=4 rows; bucket key =
  md5(band values). P(candidate) ≈ 1-(1-j^4)^4 — the usual S-curve with
  ~50% crossover near Jaccard 0.72.

Scale: signatures are embarrassingly parallel; the only shuffle is the
band-bucket self-join, whose keys are md5 values (uniform → no skew). For
100 TB corpora raise k/b and pre-partition by bucket; identical buckets
co-locate, so the join is a per-bucket local product of tiny groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from personal_data_lakehouse_spark.functions.text import tokens, word_shingles


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, shingles, sig[k]) — signature computed row-locally."""
    sh = word_shingles(tokens(text_col), n=shingle_n)
    out = df.select(F.col(id_col), sh.alias("shingles"))
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.array_min(
            F.transform(
                F.col("shingles"),
                lambda s: F.md5(F.concat(i.cast("string"), F.lit(":"), s)),
            )
        ),
    )
    return out.withColumn("sig", sig)


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) with exact shingle Jaccard.

    Explodes each doc into ``bands`` bucket keys, self-joins on
    (band, bucket), then verifies candidates with the exact Jaccard of the
    full shingle sets (array_intersect/array_union sizes — still no UDF).
    """
    rows = k // bands
    sigs = minhash_signatures(df, text_col, id_col, k=k, shingle_n=shingle_n)
    band_col = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.md5(
                    F.concat_ws(
                        "",
                        *[
                            F.element_at(F.col("sig"), b * rows + r + 1)
                            for r in range(rows)
                        ],
                    )
                ).alias("bucket"),
            ),
        )
    )
    banded = sigs.select(
        F.col(id_col), F.col("shingles"), band_col.alias("bb")
    ).select(id_col, "shingles", "bb.band", "bb.bucket")

    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return pairs.select(
        "id_a",
        "id_b",
        F.round(inter.cast("double") / union, 6).alias("jaccard"),
    )

"""Pandas-UDF query surface (SURVEY §2.10) — the Arrow-batched Python
boundary exercised through the driver contract.

The engine keeps ALL relational hot paths JVM-side; these queries prove
the three sanctioned Python shapes work end-to-end and can still be
oracle-exact when their math is integer-only:

* grouped-map ``applyInPandas``   → q_applyinpandas_rank (oracle-exact)
* iterator ``mapInPandas``        → q_mapinpandas_tokens (oracle-exact)
* grouped-agg ``pandas_udf``      → covered by the vectorized similarity
  path (similarity/vectorized.py, float → asserted vs exact path in tests
  instead of value-hashed)

Worker functions are self-contained closures (pickled by value): workers
never need this package importable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from personal_data_lakehouse_spark.plans.registry import query, t
from personal_data_lakehouse_spark.plans.text_ops import _TOKS


@query(
    "q_applyinpandas_rank",
    oracle="""
    SELECT doc_id, lang, n_chars,
           CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                   ORDER BY n_chars, doc_id) AS INT)
               AS size_rank,
           CAST(COUNT(*) OVER (PARTITION BY lang) AS INT) AS n_in_lang
    FROM documents
    """,
)
def q_applyinpandas_rank(spark, sf_dir):
    """Grouped-map applyInPandas: per-language size ranking computed in
    pandas (integer argsort — exact, so the oracle can hash it). One
    shuffle on the grouping key; each group is one Arrow batch in Python.
    The JVM window-function form of the same query is the faster plan —
    this exists to exercise the grouped-map boundary the way a custom
    per-group algorithm (model scoring, curve fitting) would use it."""
    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def rank_group(pdf):
        pdf = pdf.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
        pdf["size_rank"] = range(1, len(pdf) + 1)
        pdf["n_in_lang"] = len(pdf)
        return pdf

    return d.groupBy("lang").applyInPandas(
        rank_group,
        schema="doc_id long, lang string, n_chars long, "
        "size_rank int, n_in_lang int",
    )


@query(
    "q_mapinpandas_tokens",
    oracle=r"""
    SELECT doc_id,
           CAST(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ',
               'g')), ' ')) AS INT) AS n_tokens,
           CAST(length(text) AS INT) AS n_chars_py
    FROM documents
    """,
)
def q_mapinpandas_tokens(spark, sf_dir):
    """Iterator mapInPandas: per-batch Python tokenization (whitespace
    split over the same normalization the JVM path uses) — integer counts,
    so oracle-exact. Map-only: no shuffle, Arrow batch in/out; the shape
    real pipelines use for tokenizer libraries that only exist in Python."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")

    def count_tokens(batches):
        import re as _re

        import pandas as _pd

        for pdf in batches:
            norm = pdf["text"].map(
                lambda s: _re.sub(r"\s+", " ", str(s).lower()).strip()
            )
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": norm.map(lambda s: len(s.split(" "))).astype(
                        "int32"
                    ),
                    "n_chars_py": pdf["text"].map(len).astype("int32"),
                }
            )

    return d.mapInPandas(
        count_tokens, schema="doc_id long, n_tokens int, n_chars_py int"
    )


# Silence the unused-import linter: F is part of the module's public shape
# for future queries.
_ = F


@query(
    "t_udtf_word_windows",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_TOKS} AS w FROM documents)
    SELECT doc_id, CAST(i AS INT) AS chunk_id,
           array_to_string(w[CAST(i * 50 + 1 AS INT):CAST((i + 1) * 50 AS INT)], ' ')
               AS piece
    FROM (SELECT doc_id, w,
                 unnest(range(0, ((len(w) - 1) // 50) + 1)) AS i
          FROM w)
    """,
)
def t_udtf_word_windows(spark, sf_dir):
    """Python UDTF (Spark 4 user-defined TABLE function) splitting each
    document into 50-token windows via a LATERAL call — the row-expanding
    Python shape that grouped-map/mapInPandas can't express (one input row
    → many typed output rows, schema declared on the class). Executed
    per-partition with Arrow transfer; the lateral correlation keeps it a
    pipelined map stage (no shuffle, no state). The self-contained class
    pickles by value — workers never import this package."""
    from pyspark.sql.functions import udtf

    from personal_data_lakehouse_spark.functions.text import normalize_text

    @udtf(returnType="chunk_id int, piece string", useArrow=True)
    class WordWindows:
        def eval(self, text: str):
            toks = text.split(" ")
            for i in range(0, len(toks), 50):
                yield i // 50, " ".join(toks[i : i + 50])

    spark.udtf.register("word_windows", WordWindows)
    t(spark, sf_dir, "documents").select(
        "doc_id", normalize_text("text").alias("nt")
    ).createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, s.chunk_id, s.piece "
        "FROM __udtf_docs d, LATERAL word_windows(nt) s"
    )

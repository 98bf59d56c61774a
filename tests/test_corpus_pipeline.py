"""End-to-end corpus pipeline: the LLM-data DAG counterpart of
test_pipeline_e2e — retention funnel monotonicity, split integrity, and
full-run determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from personal_data_lakehouse_spark.corpus import corpus_pipeline
from personal_data_lakehouse_spark.plans.registry import t
from tests.conftest import SF_DIR


def test_corpus_pipeline_funnel_and_determinism(spark):
    docs = t(spark, SF_DIR, "documents")
    stages = corpus_pipeline(spark, docs, namespace="corpus_t")
    # the funnel only ever removes documents (packing changes granularity)
    order = ["raw", "intake", "dedup_exact", "dedup_near", "rebalanced"]
    for a, b in zip(order, order[1:]):
        assert stages[b] <= stages[a], (a, b, stages)
    assert stages["split"] == stages["rebalanced"]  # split labels, drops none
    assert stages["packed_sequences"] >= 1
    assert stages["intake"] >= 1  # gates must not be vacuous-empty

    # split partitions the rebalanced corpus
    split = spark.table("corpus_t.split")
    assert set(
        r["split"] for r in split.select("split").distinct().collect()
    ) <= {"train", "val", "test"}
    assert split.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0

    # packing conserves tokens of the split corpus
    from personal_data_lakehouse_spark.functions.text import (
        token_count_whitespace,
    )

    want_toks = (
        split.select(token_count_whitespace("text").alias("tk"))
        .agg(F.sum("tk"))
        .first()[0]
    )
    got_toks = (
        spark.table("corpus_t.packed").agg(F.sum("total_tokens")).first()[0]
    )
    assert got_toks == want_toks

    # a full re-run reproduces every stage count (pure function of input)
    again = corpus_pipeline(spark, docs, namespace="corpus_t2")
    assert again == stages


def test_cli_corpus_subcommand(spark, capsys):
    import json

    from personal_data_lakehouse_spark.__main__ import main

    rc = main(
        [
            "corpus",
            "--docs",
            f"{SF_DIR}/documents.parquet",
            "--namespace",
            "corpus_cli",
        ]
    )
    assert rc == 0
    stages = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stages["raw"] >= stages["intake"] >= stages["rebalanced"]

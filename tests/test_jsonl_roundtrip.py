"""Losslessness of the JSONL round trip that q_jsonl_intake's oracle
rests on: the oracle recomputes its rollup from the SOURCE view, which is
only valid if to_json -> text file -> read_jsonl_docs reproduces the text
column exactly. Adversarial fixed strings plus hypothesis-driven random
text cover the cases that break naive line formats: embedded
newlines/CR (escaped by to_json, so the one-object-per-LINE invariant
survives), quotes, backslashes, JSON-looking payloads, unicode including
the astral plane, tabs, and leading/trailing whitespace."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from personal_data_lakehouse_spark.io.readers import read_jsonl_docs

ADVERSARIAL = [
    'line one\nline "two"\r\nthree',
    "back\\slash and \ttab",
    '{"looks": "like json"}',
    "中文 and emoji \U0001f600 and combining é",
    "  leading/trailing  ",
    "control  char and null-ish ",
]


@settings(max_examples=5, deadline=None)
@given(texts=st.lists(st.text(min_size=0, max_size=60), min_size=1, max_size=6))
def test_jsonl_roundtrip_is_lossless_for_arbitrary_text(spark, tmp_path_factory, texts):
    rows = [(i, t) for i, t in enumerate(ADVERSARIAL + texts)]
    src = str(tmp_path_factory.mktemp("jsonl_rt"))
    spark.createDataFrame(rows, "doc_id bigint, text string").select(
        F.to_json(F.struct("doc_id", "text")).alias("value")
    ).coalesce(1).write.mode("overwrite").text(src)
    back = {
        r["doc_id"]: r["text"]
        for r in read_jsonl_docs(
            spark, src, "doc_id bigint, text string"
        ).collect()
    }
    assert back == dict(rows)

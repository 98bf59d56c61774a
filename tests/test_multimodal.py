"""Multimodal column plumbing: binary payload + metadata schema, JVM-side
metadata filters, Arrow-batched mapInPandas feature extraction, stubbed
real decoder."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from personal_data_lakehouse_spark.multimodal.columns import (
    FEATURE_SCHEMA,
    attach_fake_media,
    decode_image,
    extract_features,
)
from personal_data_lakehouse_spark.plans.registry import t
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    return attach_fake_media(t(spark, SF_DIR, "documents"))


def test_media_schema(media):
    fields = {f.name: f.dataType.simpleString() for f in media.schema.fields}
    assert fields["payload"] == "binary"
    assert fields["width"] == "int" and fields["height"] == "int"


def test_metadata_filter_prunes_before_python(media):
    # The filter is on metadata columns only — plan stays JVM-side (no
    # Python eval in the optimized plan before mapInPandas).
    filtered = media.filter((F.col("width") >= 128) & (F.col("mime") == "image/fake"))
    plan = filtered._jdf.queryExecution().optimizedPlan().toString()
    assert "pythonUDF" not in plan.lower()
    assert filtered.count() > 0


def test_extract_features_batch_shape(spark, media):
    feats = extract_features(media.limit(50))
    assert feats.schema == FEATURE_SCHEMA
    rows = {r.media_id: r for r in feats.collect()}
    docs = {r.doc_id: r.text for r in t(spark, SF_DIR, "documents").limit(50).collect()}
    assert set(rows) == set(docs)
    for doc_id, text in docs.items():
        payload = text.encode("utf-8")
        assert rows[doc_id].n_bytes == len(payload)
        assert rows[doc_id].payload_sha == hashlib.sha256(payload).hexdigest()
        assert rows[doc_id].mean_byte == pytest.approx(sum(payload) / len(payload))


def test_real_decoder_is_clearly_stubbed():
    with pytest.raises(NotImplementedError, match="pillow|image"):
        decode_image(b"\x89PNG fake")


def test_binaryfile_ingestion_and_length_pushdown(spark, tmp_path):
    """binaryFile on-ramp: bytes round-trip exactly, and a length predicate
    prunes files at the SOURCE (PushedFilters in the scan, not a post-read
    filter on content)."""
    import os

    from personal_data_lakehouse_spark.multimodal.columns import read_media_dir

    d = str(tmp_path / "media")
    os.makedirs(d)
    blobs = {f"img_{i}.bin": bytes([i]) * (100 * (i + 1)) for i in range(4)}
    for name, payload in blobs.items():
        with open(os.path.join(d, name), "wb") as f:
            f.write(payload)

    media = read_media_dir(spark, d, glob="*.bin")
    got = {r.file_name: bytes(r.payload) for r in media.collect()}
    assert got == blobs  # exact byte round-trip
    small = media.filter(F.col("n_bytes") <= 200)
    assert {r.file_name for r in small.collect()} == {"img_0.bin", "img_1.bin"}
    plan = small._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "length" in plan

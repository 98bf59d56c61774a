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


def test_resize_media_nearest_neighbor_exact(spark):
    """The resize stage must reproduce a driver-side numpy reference
    exactly (same tiling decode, same nearest-neighbor index math), be
    deterministic across partition layouts, and emit the target dims."""
    import hashlib

    import numpy as np

    from personal_data_lakehouse_spark.multimodal.columns import (
        attach_fake_media,
        resize_media,
    )
    from personal_data_lakehouse_spark.plans.registry import t
    from tests.conftest import SF_DIR

    docs = t(spark, SF_DIR, "documents").limit(40)
    media = attach_fake_media(docs)
    out = {r["media_id"]: r for r in resize_media(media, 16, 8).collect()}
    ref_rows = media.collect()
    assert len(out) == len(ref_rows)
    for r in ref_rows:
        w, h = r["width"], r["height"]
        buf = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
        raster = np.resize(buf, w * h).reshape(h, w)
        ys = (np.arange(8) * h) // 8
        xs = (np.arange(16) * w) // 16
        small = raster[ys][:, xs]
        got = out[r["media_id"]]
        assert (got["out_w"], got["out_h"]) == (16, 8)
        assert got["pixel_sum"] == int(small.sum(dtype=np.int64))
        assert got["raster_sha"] == hashlib.sha256(small.tobytes()).hexdigest()
    # partition-layout independence
    re_out = {
        r["media_id"]: r["raster_sha"]
        for r in resize_media(media.repartition(7), 16, 8).collect()
    }
    assert re_out == {k: v["raster_sha"] for k, v in out.items()}


def test_resample_audio_linear_interp_exact(spark):
    """The resample stage must reproduce a driver-side numpy reference
    exactly (same synthetic PCM decode, same linear-interp positions,
    same fixed-point quantization) and halve the sample count at 2:1."""
    import hashlib

    import numpy as np

    from personal_data_lakehouse_spark.multimodal.columns import (
        attach_fake_media,
        resample_audio,
    )
    from personal_data_lakehouse_spark.plans.registry import t
    from tests.conftest import SF_DIR

    docs = t(spark, SF_DIR, "documents").limit(25)
    media = attach_fake_media(docs)
    out = {r["media_id"]: r for r in resample_audio(media, 16000, 8000).collect()}
    for r in media.collect():
        sig = np.frombuffer(bytes(r["payload"]), dtype=np.uint8).astype(np.float64)
        if len(sig) == 0:
            sig = np.zeros(1)
        n_out = max(1, (len(sig) * 8000) // 16000)
        pos = (
            np.arange(n_out) * (len(sig) - 1) / max(1, n_out - 1)
            if n_out > 1
            else np.zeros(1)
        )
        lo = np.floor(pos).astype(np.int64)
        hi = np.minimum(lo + 1, len(sig) - 1)
        frac = pos - lo
        q = np.round((sig[lo] * (1.0 - frac) + sig[hi] * frac) * 256.0).astype(
            np.int64
        )
        got = out[r["media_id"]]
        assert got["n_samples"] == n_out
        assert abs(got["n_samples"] - len(sig) // 2) <= 1
        assert got["sample_sum"] == int(q.sum())
        assert got["signal_sha"] == hashlib.sha256(q.tobytes()).hexdigest()


def test_sample_frames_uniform_stride_exact(spark):
    """The frame-sampling stage must reproduce a driver-side numpy
    reference exactly (same tiling decode, same uniform-stride index
    rule), keep ranks dense 0..k-1 even when clips are shorter than k
    (repeated frames), and be partition-layout independent."""
    import hashlib

    import numpy as np

    from personal_data_lakehouse_spark.multimodal.columns import (
        attach_fake_media,
        sample_frames,
    )
    from personal_data_lakehouse_spark.plans.registry import t
    from tests.conftest import SF_DIR

    docs = t(spark, SF_DIR, "documents").limit(30)
    # small frames so fixtures span MANY frames; a second tiny-payload
    # media row exercises the n_frames < k repeat path
    media = attach_fake_media(docs).withColumn(
        "width", F.lit(8)
    ).withColumn("height", F.lit(4))
    out = sample_frames(media, k=6).collect()
    by_media = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append(r)
    ref_rows = media.collect()
    assert len(by_media) == len(ref_rows)
    for m in ref_rows:
        rows = sorted(by_media[m["media_id"]], key=lambda r: r["sample_rank"])
        assert [r["sample_rank"] for r in rows] == list(range(6))
        buf = np.frombuffer(bytes(m["payload"]), dtype=np.uint8)
        fsz = 8 * 4
        n_frames = max(1, -(-len(buf) // fsz))
        clip = np.resize(buf, n_frames * fsz).reshape(n_frames, 4, 8)
        for r in rows:
            idx = (r["sample_rank"] * n_frames) // 6
            assert r["frame_idx"] == idx
            assert r["n_frames"] == n_frames
            frame = clip[idx]
            assert r["pixel_sum"] == int(frame.sum(dtype=np.int64))
            assert r["frame_sha"] == hashlib.sha256(frame.tobytes()).hexdigest()
    # n_frames < k: a 1-frame clip must repeat frame 0 across all ranks
    one = attach_fake_media(
        spark.createDataFrame([(999, "tiny")], "doc_id long, text string")
    ).withColumn("width", F.lit(8)).withColumn("height", F.lit(4))
    rows = sample_frames(one, k=6).collect()
    assert len(rows) == 6
    assert {r["frame_idx"] for r in rows} == {0}
    assert len({r["frame_sha"] for r in rows}) == 1
    # partition-layout independence
    re_out = {
        (r["media_id"], r["sample_rank"]): r["frame_sha"]
        for r in sample_frames(media.repartition(7), k=6).collect()
    }
    assert re_out == {
        (r["media_id"], r["sample_rank"]): r["frame_sha"] for r in out
    }


def test_media_feature_vectors_known_payload(spark):
    """The decode+downsample kernel on a hand-computable payload: bytes
    0..N tiled into a w×h raster, sampled at ys[r]=(r·h)//g,
    xs[c]=(c·w)//g — the exact index math the m_media_neardup oracle
    replays in SQL, pinned here against a numpy-free reference."""
    from personal_data_lakehouse_spark.multimodal.columns import (
        media_feature_vectors,
    )

    w, h, g = 10, 6, 4
    payload = bytes(range(17))  # tiles: raster[y][x] = (y*w + x) % 17
    media = spark.createDataFrame(
        [(1, "image/fake", w, h, payload)],
        "media_id bigint, mime string, width int, height int, payload binary",
    )
    [row] = media_feature_vectors(media, grid=g).collect()
    want = [
        float(((r * h // g) * w + (c * w // g)) % 17)
        for r in range(g)
        for c in range(g)
    ]
    assert row["media_id"] == 1
    assert list(row["fe"]) == want

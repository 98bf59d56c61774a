"""Multimodal columns: image/audio/video as opaque ``binary`` + metadata.

Pattern for 100 TB media pipelines on Spark:

* payload column is BinaryType; typed metadata (mime/width/height/duration)
  travels in ordinary columns so filters/pruning stay JVM-side — you filter
  on ``width >= 512`` without touching a single payload byte;
* decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages — the only place Python touches the data, one
  serialization per batch (not per row);
* heavy stages repartition first (`spread`) so decode parallelism matches
  cores, not input file count.

The container ships no image/audio libraries, so the real decoders are
STUBBED behind import probes (NotImplementedError with a clear message);
a deterministic fake decoder exercises the full Spark-side plumbing —
schema, batching, partitioning — which is what the tests verify.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from personal_data_lakehouse_spark.operators.partitioning import spread

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("payload_sha", T.StringType(), False),
        T.StructField("mean_byte", T.DoubleType(), False),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media: payload = utf-8 bytes of the text, metadata
    derived from its length. Stands in for real image bytes so every
    downstream stage (filter on metadata, batch decode) is exercised."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image/fake").alias("mime"),
        (F.length(text_col) % 1024 + 64).cast("int").alias("width"),
        (F.length(text_col) % 768 + 64).cast("int").alias("height"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def decode_image(payload: bytes) -> "object":
    """Real image decode — STUB: pillow/opencv are not in this container.

    On a cluster with the libs installed this becomes
    ``PIL.Image.open(io.BytesIO(payload))`` inside the same mapInPandas
    batch loop; the Spark-side plumbing does not change.
    """
    try:
        import PIL.Image  # type: ignore  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires pillow/opencv (not in this container); "
            "the deterministic fake path exercises the Spark plumbing"
        ) from exc
    raise NotImplementedError("real decoder wiring lands with the image libs")


def decode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas decode stage (deterministic fake): per Arrow batch,
    compute byte stats + content hash. Real decoders drop in here."""
    for pdf in it:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "n_bytes": payloads.map(len).astype("int32"),
                "payload_sha": payloads.map(
                    lambda b: hashlib.sha256(bytes(b)).hexdigest()
                ),
                "mean_byte": payloads.map(
                    lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                ),
            }
        )


def extract_features(media: DataFrame) -> DataFrame:
    """Batch feature extraction over the binary column.

    Metadata filters should be applied BEFORE this call (JVM-side, payload
    untouched); this stage is the Python boundary.

    Ships a self-contained closure (stdlib/pandas only) so cloudpickle
    serializes it by value — workers don't need this package on their
    sys.path (a module-level function would be shipped by reference)."""

    def decode(it):
        import hashlib as _hl

        import pandas as _pd

        for pdf in it:
            payloads = pdf["payload"]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "payload_sha": payloads.map(
                        lambda b: _hl.sha256(bytes(b)).hexdigest()
                    ),
                    "mean_byte": payloads.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                }
            )

    return spread(media).mapInPandas(decode, schema=FEATURE_SCHEMA)


def read_media_dir(spark, path: str, glob: str = "*") -> DataFrame:
    """Ingest raw media files via Spark's built-in ``binaryFile`` source —
    the on-ramp from an object-store bucket of images/audio into the
    binary-column layout the rest of this module operates on.

    Emits (path, modificationTime, length, content) per file; we project
    to the module's payload/metadata shape. File-level metadata filters
    (size caps, path patterns) are pushed to the source — a ``length <
    10MB`` predicate prunes oversized blobs WITHOUT reading their bytes
    (binaryFile supports pushdown on path/length/modificationTime). At
    100 TB, pair with ``spark.sql.files.maxPartitionBytes`` so many small
    files bin-pack into tasks; one task per tiny file is scheduler death.
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return raw.select(
        F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1).alias("file_name"),
        F.col("length").alias("n_bytes"),
        F.col("modificationTime").alias("modified_at"),
        F.col("content").alias("payload"),
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("pixel_sum", T.LongType()),
        T.StructField("raster_sha", T.StringType()),
    ]
)


def resize_media(
    media: DataFrame, target_w: int = 32, target_h: int = 32
) -> DataFrame:
    """Arrow-batched resize stage: decode each payload into its
    width×height raster (synthetic codec: the payload bytes tiled into
    the grid — with real image libs the decode line becomes
    ``PIL.Image.open``), nearest-neighbor downsample to
    (target_w, target_h) with pure numpy index math, and emit the
    resized raster's dimensions, pixel sum, and content hash.

    The nearest-neighbor index math (ys = arange(th)·h // th) is the
    REAL resize kernel — only the decode line is synthetic, so the whole
    Spark-side contract (metadata-first pruning upstream, Arrow batch
    shape, schema, spread() for unsplittable inputs, closure shipped by
    value) is exercised and carries over unchanged when the codec lands.
    Scale: embarrassingly parallel map; the payload bytes cross the
    Python boundary once, already batched by Arrow."""
    tw, th = int(target_w), int(target_h)

    def rz(it):
        import hashlib as _hl

        import numpy as _np
        import pandas as _pd

        for pdf in it:
            rows = []
            for mid, w, h, payload in zip(
                pdf["media_id"], pdf["width"], pdf["height"], pdf["payload"]
            ):
                w, h = int(w), int(h)
                buf = _np.frombuffer(bytes(payload), dtype=_np.uint8)
                # synthetic decode: tile payload bytes into the raster
                raster = _np.resize(buf, w * h).reshape(h, w)
                ys = (_np.arange(th) * h) // th
                xs = (_np.arange(tw) * w) // tw
                small = raster[ys][:, xs]
                rows.append(
                    (
                        int(mid),
                        tw,
                        th,
                        int(small.sum(dtype=_np.int64)),
                        _hl.sha256(small.tobytes()).hexdigest(),
                    )
                )
            yield _pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "out_w",
                    "out_h",
                    "pixel_sum",
                    "raster_sha",
                ],
            )

    return spread(media).mapInPandas(rz, schema=RESIZE_SCHEMA)


MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("fe", T.ArrayType(T.DoubleType())),
    ]
)


def media_feature_vectors(media: DataFrame, grid: int = 8) -> DataFrame:
    """Arrow-batched media → FEATURE VECTOR stage: decode each payload
    into its width×height raster (synthetic codec — payload bytes tiled
    into the grid, same decode line as ``resize_media``; with real image
    libs it becomes ``PIL.Image.open``), nearest-neighbor downsample to
    grid×grid with the same pure-numpy index math, and emit the FLATTENED
    raster as a grid²-dim double vector — the bridge from the multimodal
    kernels into the similarity stack (``m_media_neardup`` feeds these
    straight into the IVF near-dup decision).

    Values are exact small integers (bytes) widened to double, so the
    downstream cosine folds are bit-reproducible against an external
    oracle. Scale: embarrassingly parallel map, payload bytes cross the
    Python boundary once per Arrow batch; output is a fixed grid² doubles
    per item regardless of payload size — feature extraction is the
    volume cliff, which is why it runs before any pairwise stage.
    """
    g = int(grid)

    def fv(it):
        import numpy as _np
        import pandas as _pd

        for pdf in it:
            rows = []
            for mid, w, h, payload in zip(
                pdf["media_id"], pdf["width"], pdf["height"], pdf["payload"]
            ):
                w, h = int(w), int(h)
                buf = _np.frombuffer(bytes(payload), dtype=_np.uint8)
                raster = _np.resize(buf, w * h).reshape(h, w)
                ys = (_np.arange(g) * h) // g
                xs = (_np.arange(g) * w) // g
                small = raster[ys][:, xs].astype(_np.float64)
                rows.append((int(mid), small.reshape(-1).tolist()))
            yield _pd.DataFrame(rows, columns=["media_id", "fe"])

    return spread(media).mapInPandas(fv, schema=MEDIA_FEATURE_SCHEMA)


RESAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("out_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("sample_sum", T.LongType()),
        T.StructField("signal_sha", T.StringType()),
    ]
)


def resample_audio(
    media: DataFrame, src_rate: int = 16000, dst_rate: int = 8000
) -> DataFrame:
    """Arrow-batched audio resample stage — the 1-D analog of
    resize_media: decode each payload into a PCM signal (synthetic
    codec: payload bytes as unsigned 8-bit samples — with real audio
    libs the decode line becomes ``soundfile.read``/ffmpeg), then
    linear-interpolation resample from src_rate to dst_rate with pure
    numpy index math (the real DSP kernel, up to anti-alias filtering
    which rides with the codec), emitting length, sample sum, and
    content hash of the int32-rounded output.

    Same contract as resize_media: metadata pruning upstream, Arrow
    batch shape, spread(), closure by value. Embarrassingly parallel."""
    sr, dr = int(src_rate), int(dst_rate)

    def rs(it):
        import hashlib as _hl

        import numpy as _np
        import pandas as _pd

        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                sig = _np.frombuffer(bytes(payload), dtype=_np.uint8).astype(
                    _np.float64
                )
                if len(sig) == 0:
                    sig = _np.zeros(1)
                n_out = max(1, (len(sig) * dr) // sr)
                # linear-interp positions in source index space
                pos = _np.arange(n_out) * (len(sig) - 1) / max(1, n_out - 1) \
                    if n_out > 1 else _np.zeros(1)
                lo = _np.floor(pos).astype(_np.int64)
                hi = _np.minimum(lo + 1, len(sig) - 1)
                frac = pos - lo
                out = sig[lo] * (1.0 - frac) + sig[hi] * frac
                q = _np.round(out * 256.0).astype(_np.int64)  # fixed-point
                rows.append(
                    (
                        int(mid),
                        dr,
                        int(n_out),
                        int(q.sum()),
                        _hl.sha256(q.tobytes()).hexdigest(),
                    )
                )
            yield _pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "out_rate",
                    "n_samples",
                    "sample_sum",
                    "signal_sha",
                ],
            )

    return spread(media).mapInPandas(rs, schema=RESAMPLE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rank", T.IntegerType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("pixel_sum", T.LongType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)


def sample_frames(media: DataFrame, k: int = 8) -> DataFrame:
    """Arrow-batched VIDEO frame-sampling stage — the temporal member of
    the decode/feature/resize/resample family: decode each payload into
    a (n_frames, height, width) clip (synthetic codec: payload bytes
    tiled into whole frames, n_frames = ceil(len/(w·h)) ≥ 1 — with real
    video libs the decode line becomes PyAV/ffmpeg frame iteration),
    select ``k`` frames by UNIFORM TEMPORAL STRIDE (frame_idx =
    (rank · n_frames) // k, the standard clip-sampling rule video models
    train on), and emit one row per sampled frame with its pixel sum and
    content hash.

    When n_frames < k the stride repeats frames (ranks stay dense 0..k-1
    — the fixed-length-clip contract video batching needs) rather than
    shrinking the sample; downstream dedup can drop repeats by
    (media_id, frame_idx) if it wants distinct frames.

    The frame index math and the per-frame slicing are the REAL kernel —
    only the decode line is synthetic, same contract as
    resize_media/resample_audio (metadata pruning upstream, Arrow batch
    shape, spread() for unsplittable inputs, closure shipped by value).
    Scale: embarrassingly parallel map; output fan-out is a fixed k rows
    per clip, so the stage's output volume is k·|media|, independent of
    clip length — the whole point of sampling before feature
    extraction."""
    kk = int(k)

    def sf(it):
        import hashlib as _hl

        import numpy as _np
        import pandas as _pd

        for pdf in it:
            rows = []
            for mid, w, h, payload in zip(
                pdf["media_id"], pdf["width"], pdf["height"], pdf["payload"]
            ):
                w, h = int(w), int(h)
                buf = _np.frombuffer(bytes(payload), dtype=_np.uint8)
                fsz = w * h
                n_frames = max(1, -(-len(buf) // fsz))  # ceil, ≥1
                clip = _np.resize(buf, n_frames * fsz).reshape(n_frames, h, w)
                for rank in range(kk):
                    idx = (rank * n_frames) // kk
                    frame = clip[idx]
                    rows.append(
                        (
                            int(mid),
                            rank,
                            int(idx),
                            int(n_frames),
                            int(frame.sum(dtype=_np.int64)),
                            _hl.sha256(frame.tobytes()).hexdigest(),
                        )
                    )
            yield _pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sample_rank",
                    "frame_idx",
                    "n_frames",
                    "pixel_sum",
                    "frame_sha",
                ],
            )

    return spread(media).mapInPandas(sf, schema=FRAME_SCHEMA)

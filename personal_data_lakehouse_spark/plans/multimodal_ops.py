"""Multimodal-column query surface: binary payloads + typed metadata.

The fixture set ships no real media, so payloads are synthesized
deterministically (utf-8 bytes of the document text — the same fake the
``multimodal.columns`` plumbing uses), which keeps every byte-level result
oracle-checkable. The pattern under test is the 100 TB media-pipeline
shape: payload stays an opaque ``binary`` column, all filtering/sampling
logic runs on typed metadata columns JVM-side, and only an explicit decode
stage (``multimodal.columns.extract_features``, Arrow-batched) ever touches
payload bytes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from personal_data_lakehouse_spark.plans.registry import query, t


@query(
    "m_binary_meta",
    oracle="""
    SELECT doc_id,
           'image/fake' AS mime,
           CAST(length(text) % 1024 + 64 AS INT) AS width,
           CAST(length(text) % 768 + 64 AS INT) AS height,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           sha256(text) AS payload_sha,
           substring(hex(encode(text)), 1, 8) AS magic_hex
    FROM documents
    """,
)
def m_binary_meta(spark, sf_dir):
    """Binary-column metadata extraction: byte length, content hash, magic
    prefix — all computed on the binary payload JVM-side (no Python, no
    decode). The metadata columns are what downstream filters prune on."""
    d = t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.lit("image/fake").alias("mime"),
        (F.length("text") % 1024 + 64).cast("int").alias("width"),
        (F.length("text") % 768 + 64).cast("int").alias("height"),
        F.octet_length(payload).cast("int").alias("n_bytes"),
        F.sha2(payload, 256).alias("payload_sha"),
        F.substring(F.hex(payload), 1, 8).alias("magic_hex"),
    )


@query(
    "m_frame_sample",
    oracle="""
    SELECT doc_id, n_frames, unnest(range(0, n_frames, 16)) AS frame_idx,
           unnest(range(0, n_frames, 16)) * 250 AS ts_ms
    FROM (SELECT doc_id, CAST((n_chars % 120 + 1) * 4 AS INT) AS n_frames
          FROM documents)
    """,
)
def m_frame_sample(spark, sf_dir):
    """Video frame sampling driven purely by metadata: every 16th frame
    index of a (synthetic) duration×fps frame count, generated with
    sequence+explode — rows fan out map-side, payload untouched. The real
    decoder then fetches only the sampled frames (mapInPandas stage)."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        ((F.col("n_chars") % 120 + 1) * 4).cast("int").alias("n_frames"),
    )
    return d.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(16))
        ).alias("frame_idx"),
    ).withColumn("ts_ms", F.col("frame_idx") * 250)

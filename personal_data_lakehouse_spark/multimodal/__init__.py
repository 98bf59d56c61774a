"""Multimodal columns: opaque binary payloads + typed metadata."""

from personal_data_lakehouse_spark.multimodal.columns import (
    MEDIA_SCHEMA,
    attach_fake_media,
    decode_batch,
    extract_features,
)

__all__ = ["MEDIA_SCHEMA", "attach_fake_media", "decode_batch", "extract_features"]

"""transformWithStateInPandas rolling features: single-batch equivalence to
the exact batch window, and cross-micro-batch state continuity (ListState
tail reaching back into the previous batch)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from personal_data_lakehouse_spark.plans.registry import t
from personal_data_lakehouse_spark.streaming.stateful_v2 import (
    rolling_features_stream,
    transform_with_state_available,
)
from personal_data_lakehouse_spark.streaming.windows import stream_events
from tests.conftest import SF_DIR

pytestmark = pytest.mark.skipif(
    not transform_with_state_available(),
    reason="transformWithState needs protobuf in the Python workers "
    "(not installable in this sandbox — no package-index route; "
    "see stateful_v2 docstring)",
)

WINDOW = 5


def _batch_rolling(events_df):
    """The exact batch twin: 5-row rolling sum ordered by (ts_us, event_id)."""
    e = events_df.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.floor(F.col("value") * F.lit(1e6)).cast("long").alias("vq"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-(WINDOW - 1), 0)
    )
    return e.select(
        "user_id",
        "event_id",
        "ts_us",
        F.sum("vq").over(w).alias("roll_sum_q"),
        F.count(F.lit(1)).over(w).alias("roll_n"),
    )


def _drain(df, name):
    q = df.writeStream.outputMode("update").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _as_map(rows):
    return {(r.user_id, r.event_id): (r.roll_sum_q, r.roll_n) for r in rows}


def test_single_batch_matches_exact_batch_window(spark):
    streamed = rolling_features_stream(
        stream_events(spark, f"{SF_DIR}/events.parquet"), window=WINDOW
    )
    _drain(streamed, "twr_single")
    got = _as_map(spark.sql("SELECT * FROM twr_single").collect())
    want = _as_map(_batch_rolling(t(spark, SF_DIR, "events")).collect())
    assert len(got) == len(want) > 0
    assert got == want


def test_state_carries_across_micro_batches(spark, tmp_path):
    """Split the fixture at the time median into two files; with
    maxFilesPerTrigger=1 the second micro-batch's early rows must reach
    back into ListState from the first — equal to the batch window over
    the union."""
    ev = t(spark, SF_DIR, "events")
    median_us = ev.select(
        F.unix_micros("ts").alias("us")
    ).approxQuantile("us", [0.5], 0.0)[0]
    median_ts = F.timestamp_micros(F.lit(int(median_us)))
    d = str(tmp_path / "two_batches")
    os.makedirs(d, exist_ok=True)
    # lexicographic file order = processing order for the file source
    ev.filter(F.col("ts") <= median_ts).coalesce(1).write.parquet(f"{d}/b=0")
    ev.filter(F.col("ts") > median_ts).coalesce(1).write.parquet(f"{d}/b=1")

    schema = spark.read.parquet(d).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    streamed = rolling_features_stream(src, window=WINDOW)
    _drain(streamed, "twr_split")
    got = _as_map(spark.sql("SELECT * FROM twr_split").collect())
    want = _as_map(_batch_rolling(ev).collect())
    assert len(got) == len(want) > 0
    assert got == want

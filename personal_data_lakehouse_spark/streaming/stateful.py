"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in windowed aggregations (streaming/windows.py) cover
time-bucketed rollups; this module is the escape hatch for *arbitrary*
per-key state machines — the Spark-native replacement for what the
reference's batch pipeline cannot express at all (its incrementality is a
single watermark literal, transforme_stock_silver.py:41-83).

Operator here: per-user running activity tracker — event count, value
total, and last-seen timestamp — with an idle timeout that emits a final
"session closed" row and drops the state. The pattern generalizes to
sessionization with custom close conditions, CDC dedup keyed on
business keys, online feature accumulation, etc.

Scale: state lives in the state store partitioned by the grouping key
(shuffle on user_id); watermark + timeout bound its size. On a real
cluster back it with RocksDB
(``spark.sql.streaming.stateStore.providerClass``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen_ms", T.LongType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen_ms", T.LongType()),
    ]
)


def user_activity_stream(
    events: DataFrame, idle_timeout_ms: int | None = 30 * 60 * 1000
) -> DataFrame:
    """Wire the stateful tracker over a streaming events frame.

    One shuffle on user_id routes each key's Arrow batches (plus its
    state) to a single task per micro-batch.

    ``idle_timeout_ms`` closes a user's state after that much processing
    time without events (emitting a final ``closed=True`` row). Note a
    live timeout keeps the query scheduling micro-batches to fire expiry,
    so an ``availableNow`` run never self-terminates — pass ``None``
    (NoTimeout) for bounded batch-drain runs.

    The state function is a self-contained closure (only stdlib/pandas
    references) so cloudpickle ships it BY VALUE — Python workers never
    need this package importable on their own sys.path (a module-level
    function would be pickled by reference and break when the driver
    process imports the engine from a path the workers don't share).
    """

    def track(key, batches, state):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            n, total, last = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [total],
                    "last_seen_ms": [last],
                    "closed": [True],
                }
            )
            return

        n, total, last = state.get if state.exists else (0, 0.0, 0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
            last = max(last, int(pdf["ts"].astype("int64").max() // 1_000_000))
        state.update((n, total, last))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "last_seen_ms": [last],
                "closed": [False],
            }
        )

    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout_conf,
    )


ANOMALY_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("x", T.LongType()),
        T.StructField("n_prior", T.LongType()),
        T.StructField("flagged", T.BooleanType()),
    ]
)

ANOMALY_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("sx", T.LongType()),
        T.StructField("sxx", T.LongType()),
    ]
)


def anomaly_flag_stream(events: DataFrame) -> DataFrame:
    """Live counterpart of q_running_zscore_flags: per-user running
    (n, Σx, Σx²) state; each arriving event is scored against the state
    BEFORE being folded in (the 1-PRECEDING baseline), flagged via the
    same cross-multiplied integer inequality. The in-batch arithmetic is
    Python ints (exact at any magnitude), but the PERSISTED state triple
    is int64, so the stored Σx² bounds the operator's headroom:
    n·x_max² < 2^63 ≈ 9.2e18 — at 1e6-cent values that is ~9e6 events
    per single user, narrower than the batch query's decimal(19,0)
    window path (whose binding term allows x_max·n < ~1.3e19). Past
    that, widen the state schema to DecimalType(38,0) (Arrow ships
    decimals fine) — int64 is kept while it holds because the state
    store round-trips three fixed longs per user per micro-batch.
    Events are sorted by (ts, event_id) within each micro-batch; with an
    in-order source (or one availableNow batch) the emitted flags replay
    the batch query bit-for-bit — the parity test pins exactly that.

    Scale: state is three longs per user in the state store (shuffle on
    user_id); no growth with history length. Same closure-by-value rule
    as user_activity_stream."""
    from pyspark.sql import functions as F

    prepared = events.filter(F.col("value").isNotNull()).select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.floor(F.col("value") * 100).cast("long").alias("x"),
    )

    def score(key, batches, state):
        import pandas as pd

        (user_id,) = key
        n, sx, sxx = state.get if state.exists else (0, 0, 0)
        pdf = pd.concat(list(batches))
        pdf = pdf.sort_values(["ts", "event_id"])
        rows = []
        for r in pdf.itertuples(index=False):
            x = int(r.x)
            flagged = bool(
                n >= 10 and (x * n - sx) ** 2 > 9 * (n * sxx - sx * sx)
            )
            rows.append(
                (int(user_id), int(r.event_id), r.event_type, x, n, flagged)
            )
            n += 1
            sx += x
            sxx += x * x
        state.update((n, sx, sxx))
        yield pd.DataFrame(
            rows,
            columns=[
                "user_id",
                "event_id",
                "event_type",
                "x",
                "n_prior",
                "flagged",
            ],
        )

    return prepared.groupBy("user_id").applyInPandasWithState(
        score,
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

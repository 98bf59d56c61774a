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

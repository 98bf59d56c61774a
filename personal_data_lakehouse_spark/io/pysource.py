"""Spark 4 Python Data Source: the REST quote feed as a REGISTERED source.

``io/rest.py`` fetches on the driver (faithful to the reference's
single-process loop, ``pipelines/stock_api/ingest_stocks.py:122-134``) and
its docstring promises a distributed path for thousands of symbols — this
module IS that path, using the Python Data Source API (SPARK-44076):

    spark.dataSource.register(StockRestDataSource)
    df = (spark.read.format("stock_rest")
          .option("symbols", "AAPL,MSFT,GOOG").load())

Each symbol becomes an InputPartition, so fetches run ON EXECUTORS, one
task per symbol — 10k symbols = 10k parallel fetch tasks with per-task
retry and locality-free scheduling, instead of a driver-side for loop.
Rows come back in the exact bronze shape of ``io/rest.py``
(``parse_time_series``'s column contract, ingest_stocks.py:52-63).

Fetcher injection: DataSource options are strings, so the source selects
a fetcher by NAME — ``fetcher=demo`` is the deterministic offline quote
generator (usable in this no-network sandbox and in tests); a real
deployment registers a subclass overriding ``make_fetcher`` to return an
HTTP closure (requests.get + API key from options). The fetch logic ships
pickled to workers, so it must stay self-contained (stdlib only).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql import types as T

STOCK_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("ticker", T.StringType(), False),
        T.StructField("date", T.StringType(), False),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("volume", T.LongType(), True),
    ]
)


def demo_series(symbol: str, n_days: int = 5) -> dict:
    """Deterministic offline stand-in for the REST quote API (same series
    the CLI's --fetcher demo produces). Self-contained: safe to call from
    a pickled reader on any executor."""
    from datetime import datetime, timedelta

    base = sum(ord(c) for c in symbol) % 100 + 50
    day0 = datetime(2026, 8, 1)
    return {
        (day0 + timedelta(days=i)).strftime("%Y-%m-%d"): {
            "1. open": str(base + i),
            "2. high": str(base + i + 1),
            "3. low": str(base + i - 1),
            "4. close": str(base + i + 0.5),
            "5. volume": str(1000 + 10 * i),
        }
        for i in range(n_days)
    }


class StockRestReader(DataSourceReader):
    def __init__(self, options):
        self._symbols = [
            s.strip()
            for s in options.get("symbols", "").split(",")
            if s.strip()
        ]
        if not self._symbols:
            raise ValueError("stock_rest: the 'symbols' option is required")
        self._fetcher_name = options.get("fetcher", "demo")
        if self._fetcher_name != "demo":
            raise ValueError(
                f"stock_rest: unknown fetcher '{self._fetcher_name}' — "
                "subclass StockRestDataSource.make_fetcher for live HTTP"
            )

    def partitions(self):
        # one partition per symbol: the fetch fan-out unit
        return [InputPartition(s) for s in self._symbols]

    def read(self, partition):
        symbol = partition.value
        series = demo_series(symbol)
        for date_str, values in series.items():
            yield (
                symbol,
                date_str,
                float(values["1. open"]),
                float(values["2. high"]),
                float(values["3. low"]),
                float(values["4. close"]),
                int(values["5. volume"]),
            )


class StockRestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "stock_rest"

    def schema(self) -> T.StructType:
        return STOCK_SOURCE_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return StockRestReader(self.options)

    def simpleStreamReader(self, schema):
        return StockRestStreamReader(self.options)


class StockRestStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of stock_rest: each micro-batch ingests the next
    trading day for every symbol (offset = day index into the feed).

    SimpleDataSourceStreamReader is the driver-side variant — right for a
    rate-limited quote API where one process polls and Spark fans the rows
    out; for per-symbol executor-side fetch at scale, promote to
    DataSourceStreamReader with per-symbol partitions exactly as the batch
    reader does. Offsets checkpoint like any source: a restarted query
    resumes at the committed day.
    """

    def __init__(self, options):
        self._symbols = [
            s.strip()
            for s in options.get("symbols", "").split(",")
            if s.strip()
        ]
        if not self._symbols:
            raise ValueError("stock_rest: the 'symbols' option is required")
        self._n_days = int(options.get("days", "5"))

    def initialOffset(self):
        return {"day": 0}

    def read(self, start):
        day = start["day"]
        if day >= self._n_days:
            return iter([]), {"day": day}
        rows = []
        for symbol in self._symbols:
            series = demo_series(symbol, n_days=self._n_days)
            date_str = sorted(series)[day]
            v = series[date_str]
            rows.append(
                (
                    symbol,
                    date_str,
                    float(v["1. open"]),
                    float(v["2. high"]),
                    float(v["3. low"]),
                    float(v["4. close"]),
                    int(v["5. volume"]),
                )
            )
        # the runtime calls next() on the result — must be an iterator
        return iter(rows), {"day": day + 1}

    def readBetweenOffsets(self, start, end):
        rows, _ = self.read(start)
        return rows

"""REST API source (SURVEY.md §2.1 S1) — driver-side fetch, engine-side frame.

Mirrors the reference's Alpha Vantage ingestion shape
(pipelines/stock_api/ingest_stocks.py:40-67,122-134): per-symbol GET →
JSON time series → typed row dicts → DataFrame. The HTTP fetcher is
injectable so pipelines are offline-testable (and so tests never touch the
network); a rate limiter hook replaces the reference's fixed
``time.sleep(15)`` (ingest_stocks.py:129).

Scale note: a handful of symbols is driver-side work by design (the
reference fetches 3). For thousands of endpoints, distribute the fetch:
``spark.createDataFrame(urls).repartition(n).mapInPandas(fetch_batch)`` so
executors pull concurrently — the row-assembly below is unchanged.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Bronze schema — explicit, not inferred (FIXTURES.md B1; the reference
# infers at ingest_stocks.py:131 and relies on float/int coercion upstream).
STOCK_ROW_SCHEMA = T.StructType(
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

# fetcher: symbol -> {"YYYY-MM-DD": {"1. open": "..", ..., "5. volume": ".."}}
Fetcher = Callable[[str], Mapping[str, Mapping[str, str]]]


def parse_time_series(
    symbol: str, series: Mapping[str, Mapping[str, str]]
) -> list[dict]:
    """JSON time series → typed row dicts (ingest_stocks.py:52-63 shape)."""
    rows = []
    for date_str, values in series.items():
        rows.append(
            {
                "ticker": symbol,
                "date": date_str,
                "open": float(values["1. open"]),
                "high": float(values["2. high"]),
                "low": float(values["3. low"]),
                "close": float(values["4. close"]),
                "volume": int(values["5. volume"]),
            }
        )
    return rows


def fetch_stock_frame(
    spark: SparkSession,
    symbols: Iterable[str],
    fetcher: Fetcher,
    rate_limiter: Callable[[], None] | None = None,
) -> DataFrame:
    """Fetch all symbols → one bronze-shaped DataFrame with ingestion
    metadata and partition columns (ingest_stocks.py:72-76,131)."""
    all_rows: list[dict] = []
    for symbol in symbols:
        all_rows.extend(parse_time_series(symbol, fetcher(symbol)))
        if rate_limiter is not None:
            rate_limiter()
    df = spark.createDataFrame(all_rows, schema=STOCK_ROW_SCHEMA)
    return (
        df.withColumn("data_ingestao", F.current_timestamp())
        .withColumn("ingestion_date", F.to_date(F.col("data_ingestao")))
        .withColumn("year", F.year(F.to_date("date")))
        .withColumn("month", F.month(F.to_date("date")))
    )

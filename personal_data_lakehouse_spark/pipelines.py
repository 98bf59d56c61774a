"""End-to-end medallion pipeline: ingest → bronze MERGE → silver → gold.

The reference's daily lifecycle (airflow_home/dags/daily_lakehouse_pipeline.py:88
``ingest >> dbt``) as one in-process composition:

1. **ingest** — REST time-series → typed frame (io/rest.py, injectable
   fetcher; ingest_stocks.py:122-134 shape);
2. **bronze** — insert-only MERGE on (ticker, date) into
   ``bronze.raw_stock_daily`` — replayed batches insert nothing
   (ingest_stocks.py:84-100 semantics);
3. **silver + gold** — the translated dbt models run in ref-graph order by
   the ModelRunner (full refresh CTAS or incremental unique-key MERGE).

Running the whole pipeline twice with the same payload is a no-op by
construction — the idempotency property the reference needs for its
1-retry daily schedule (daily_lakehouse_pipeline.py:27-37).

Scale: step 1 is driver-side only for a handful of symbols (distribute via
mapInPandas for thousands — io/rest.py docstring); steps 2-3 are keyed
equi-joins and aggregations whose physical plans are covered in SCALE.md
§6. Nothing here collects data to the driver.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import SparkSession

from personal_data_lakehouse_spark.catalog import ensure_layers, read_table
from personal_data_lakehouse_spark.io.rest import Fetcher, fetch_stock_frame
from personal_data_lakehouse_spark.operators.merge import merge_into_table
from personal_data_lakehouse_spark.plans.models import ModelRunner
from personal_data_lakehouse_spark.plans.reference_models import (
    DAILY_STOCKS,
    MONTHLY_SUMMARY,
)

BRONZE_TABLE = "bronze.raw_stock_daily"
MERGE_KEYS = ("ticker", "date")


def ingest_to_bronze(
    spark: SparkSession, symbols: Iterable[str], fetcher: Fetcher
) -> int:
    """Fetch + dedup-merge into the bronze table; returns bronze row count."""
    ensure_layers(spark)
    frame = fetch_stock_frame(spark, symbols, fetcher)
    merge_into_table(
        spark, BRONZE_TABLE, frame, keys=MERGE_KEYS, insert_only=True
    )
    return read_table(spark, BRONZE_TABLE).count()


def run_models(spark: SparkSession, full_refresh: bool = False) -> None:
    """silver → gold in dependency order (the dbt-run step)."""
    ModelRunner(spark, [DAILY_STOCKS, MONTHLY_SUMMARY]).run(
        full_refresh=full_refresh
    )


def daily_pipeline(
    spark: SparkSession,
    symbols: Iterable[str],
    fetcher: Fetcher,
    full_refresh: bool = False,
) -> dict[str, int]:
    """The reference's whole daily DAG, returning per-layer row counts."""
    bronze_rows = ingest_to_bronze(spark, symbols, fetcher)
    run_models(spark, full_refresh=full_refresh)
    return {
        "bronze": bronze_rows,
        "silver": read_table(spark, DAILY_STOCKS.target).count(),
        "gold": read_table(spark, MONTHLY_SUMMARY.target).count(),
    }

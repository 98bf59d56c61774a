"""Medallion catalog: bronze/silver/gold namespaces over Spark's catalog.

The reference organizes data as Delta paths on GCS plus BigQuery datasets
``{}_bronze/{}_silver/{}_gold`` (README.md:50-54, dbt_project.yml:26-32).
Spark-native equivalent: three schemas in the session catalog backed by the
warehouse directory, Parquet-managed tables (Delta-managed when delta-spark
is on the classpath).

Scale: partitioned managed tables get Hive-style partition pruning; writers
below choose partition columns per the reference's layout
(ingest_stocks.py:79,108 — partition by low-cardinality key + year + month).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

LAYERS = ("bronze", "silver", "gold")


def ensure_layers(spark: SparkSession) -> None:
    for layer in LAYERS:
        spark.sql(f"CREATE SCHEMA IF NOT EXISTS {layer}")


def table_exists(spark: SparkSession, name: str) -> bool:
    return spark.catalog.tableExists(name)


def write_table(
    df: DataFrame,
    name: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    merge_schema: bool = False,
) -> None:
    """Create/replace or append a managed table.

    ``merge_schema`` mirrors the reference's evolving-silver write
    (transforme_stock_silver.py:146 mergeSchema=true): new columns are
    allowed to appear across writes.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if merge_schema:
        writer = writer.option("mergeSchema", "true")
    writer.saveAsTable(name)


def read_table(spark: SparkSession, name: str) -> DataFrame:
    return spark.read.table(name)

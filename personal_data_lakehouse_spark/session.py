"""SparkSession factory.

Mirrors the reference's session bootstrap (pipelines/stock_api/
ingest_stocks.py:28-38: Delta extension + AQE on) but Spark-first: Delta is
optional (gated behind an import probe — not present in this container), AQE
and Arrow are always on, and the session timezone is pinned to UTC so results
are comparable against a DuckDB oracle (DuckDB timestamps are UTC-naive).

Scale notes
-----------
- ``spark.sql.shuffle.partitions`` defaults to the local core count here; on
  a real cluster it should be ~2-3× total executor cores (or left to AQE
  coalescing, which is enabled).
- AQE (+ skew-join handling + partition coalescing) is on so runtime
  statistics re-plan joins and fix skew without manual salting in the common
  case.
- ``maxPartitionBytes`` kept at the 128 MB default: at 100 TB that yields
  ~800k input splits, which is the right granularity for a 1000-executor
  cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def delta_available() -> bool:
    """Probe for the optional delta-spark package (not in this container)."""
    try:
        import delta  # noqa: F401

        return True
    except Exception:
        return False


def get_spark(
    app_name: str = "personal_data_lakehouse_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    warehouse_dir: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Deterministic-comparison settings (UTC session timezone, ANSI off so
    divide-by-zero yields NULL like BigQuery's SAFE_DIVIDE fallback path) are
    part of the engine's defined semantics — see SURVEY.md §7 "what's hard".
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python UDTFs evaluate through Arrow batches (ArrowEvalPythonUDTF)
        # instead of row-at-a-time pickling (BatchEvalPythonUDTF) — same
        # rows, ~10× less serialization overhead on wide corpus scans; the
        # registry-wide lint (tests/test_plan_lint.py) forbids the row path.
        .config("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if warehouse_dir:
        builder = builder.config("spark.sql.warehouse.dir", warehouse_dir)
    if delta_available():
        # Same two configs the reference sets for Dataproc (ingest_stocks.py:32-33).
        builder = builder.config(
            "spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension"
        ).config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

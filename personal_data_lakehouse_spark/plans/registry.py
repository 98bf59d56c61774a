"""Query registry plumbing.

Each registered query is a (spark, sf_dir) -> DataFrame callable plus an
optional equivalent ANSI-SQL string a DuckDB oracle can run over the same
parquet tables. The driver's correctness gate compares the two at sf0.01
(row count + schema + order-insensitive value hash), so every computed
column is aliased identically on both sides, and float-producing
aggregations are expressed through exact decimal arithmetic (associative →
bit-identical across engines) with any final float derived by a single
deterministic scalar operation.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver records a weaker rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; colocates the Spark implementation with its oracle."""

    def deco(fn):
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table (columnar parquet; Catalyst prunes/pushes down).

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; read it as nanos-since-epoch and truncate to
    microsecond TimestampType (same truncation DuckDB applies casting
    TIMESTAMP_NS → TIMESTAMP, so oracle comparisons stay exact).
    """
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Temp-view all fixture tables so queries can use Spark SQL directly."""
    for name in TABLES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()``
exposes every implemented operator from SURVEY.md §2 as
(spark, sf_dir) -> DataFrame; ``oracle_sql()`` gives the DuckDB-equivalent
ANSI SQL per query for the differential correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Importing the plan modules populates the registry.
import personal_data_lakehouse_spark.plans.relational  # noqa: F401,E402

try:  # extension waves land incrementally; keep the contract importable
    import personal_data_lakehouse_spark.plans.text_ops  # noqa: F401,E402
except ImportError:
    pass
try:
    import personal_data_lakehouse_spark.plans.similarity_ops  # noqa: F401,E402
except ImportError:
    pass
try:
    import personal_data_lakehouse_spark.plans.advanced  # noqa: F401,E402
except ImportError:
    pass
try:
    import personal_data_lakehouse_spark.plans.extras  # noqa: F401,E402
except ImportError:
    pass
try:
    import personal_data_lakehouse_spark.plans.multimodal_ops  # noqa: F401,E402
except ImportError:
    pass
try:
    import personal_data_lakehouse_spark.plans.tpch_subqueries  # noqa: F401,E402
except ImportError:
    pass
try:
    import personal_data_lakehouse_spark.plans.cluster_ops  # noqa: F401,E402
except ImportError:
    pass
try:
    import personal_data_lakehouse_spark.plans.tpch_remaining  # noqa: F401,E402
except ImportError:
    pass
try:
    import personal_data_lakehouse_spark.plans.udf_ops  # noqa: F401,E402
except ImportError:
    pass

from personal_data_lakehouse_spark.plans.registry import REGISTRY  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary — scan→filter→agg→sort) at sf0.001."""
    return REGISTRY["q01_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}

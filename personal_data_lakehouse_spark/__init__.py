"""personal_data_lakehouse_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference lakehouse (victorsabino36/personal-data-lakehouse): a medallion
(bronze/silver/gold) table model, incremental/MERGE materialization, the
cleaning/typing operator set, grouped rollups — re-expressed Spark-first
(DataFrame / Spark SQL / Catalyst / Structured Streaming) — plus the
large-scale training-data-pipeline extensions (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB operation.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API, the public reference repo, and published papers.
"""

__version__ = "0.1.0"

from personal_data_lakehouse_spark.session import get_spark  # noqa: F401

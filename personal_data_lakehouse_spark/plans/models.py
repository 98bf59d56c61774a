"""Model runner — dbt-equivalent materialization on Spark SQL (SURVEY §3.3).

A model = a Spark-SQL SELECT + config (materialization, unique_key), using
the reference's template surface (dbt/lakehouse_models/models/*):

* ``{{ source('schema', 'table') }}``  → catalog table (schema.yml:4-7)
* ``{{ ref('model') }}``               → that model's target table
* ``{{ this }}``                       → own target table
* ``{% if is_incremental() %} ... {% endif %}`` → predicate included only on
  incremental runs (daily_stocks.sql:29-32, monthly_stock_summary.sql:26-31)

Materializations:
* ``table``        → CREATE-or-REPLACE (overwrite saveAsTable)
* ``view``         → catalog view over the rendered SELECT
* ``incremental``  → first run creates; later runs compute the increment
  and MERGE on ``unique_key`` (update-or-insert — dbt's BigQuery merge
  strategy, daily_stocks.sql:2-5) or append when keyless.

Run order is the topological order of the ``ref`` graph (G1 — the Airflow
``ingest >> dbt`` edge plus dbt's internal model DAG).

Scale: the incremental predicate is rendered as a scalar subquery against
the target — Catalyst executes it first and binds the result, so the source
scan prunes partitions/files by the watermark instead of re-reading history.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from graphlib import TopologicalSorter

from pyspark.sql import DataFrame, SparkSession

from personal_data_lakehouse_spark.operators.merge import merge_into_table

_SOURCE_RE = re.compile(r"\{\{\s*source\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)\s*\}\}")
_REF_RE = re.compile(r"\{\{\s*ref\(\s*'([^']+)'\s*\)\s*\}\}")
_THIS_RE = re.compile(r"\{\{\s*this\s*\}\}")
_INCR_RE = re.compile(
    r"\{%\s*if\s+is_incremental\(\)\s*%\}(.*?)\{%\s*endif\s*%\}", re.DOTALL
)


@dataclass
class Model:
    name: str  # model name (ref target)
    sql: str  # templated SELECT
    target: str  # catalog table, e.g. "silver.daily_stocks"
    materialization: str = "table"  # table | view | incremental | insert_overwrite
    unique_key: list[str] = field(default_factory=list)
    partition_by: list[str] = field(default_factory=list)

    def refs(self) -> list[str]:
        return _REF_RE.findall(self.sql)


def render(
    model: Model, models_by_name: dict[str, Model], is_incremental: bool
) -> str:
    """Resolve source/ref/this and strip or keep the incremental block."""
    sql = _SOURCE_RE.sub(lambda m: f"{m.group(1)}.{m.group(2)}", model.sql)
    sql = _REF_RE.sub(lambda m: models_by_name[m.group(1)].target, sql)
    sql = _THIS_RE.sub(model.target, sql)
    sql = _INCR_RE.sub(lambda m: m.group(1) if is_incremental else "", sql)
    return sql


class ModelRunner:
    def __init__(self, spark: SparkSession, models: list[Model]):
        self.spark = spark
        self.models = {m.name: m for m in models}

    def run_order(self, selected: list[str] | None = None) -> list[str]:
        graph = {
            name: [r for r in m.refs() if r in self.models]
            for name, m in self.models.items()
        }
        order = list(TopologicalSorter(graph).static_order())
        return [n for n in order if selected is None or n in selected]

    def run(self, selected: list[str] | None = None, full_refresh: bool = False) -> None:
        for name in self.run_order(selected):
            self.run_model(self.models[name], full_refresh)

    def run_model(self, model: Model, full_refresh: bool = False) -> None:
        exists = self.spark.catalog.tableExists(model.target)
        incremental_run = (
            model.materialization in ("incremental", "insert_overwrite")
            and exists
            and not full_refresh
        )
        sql = render(model, self.models, incremental_run)
        if model.materialization == "view":
            self.spark.sql(f"CREATE OR REPLACE VIEW {model.target} AS {sql}")
            return
        result: DataFrame = self.spark.sql(sql)
        if not incremental_run:
            writer = result.write.mode("overwrite").option("overwriteSchema", "true")
            if model.partition_by:
                writer = writer.partitionBy(*model.partition_by)
            writer.saveAsTable(model.target)
        elif model.materialization == "insert_overwrite":
            # dbt's insert_overwrite materialization: replace exactly the
            # partitions present in the increment, leave the rest untouched —
            # the idempotent-backfill pattern (re-running a day rewrites that
            # day, never duplicates it). Requires partition_by; dynamic mode
            # scopes the overwrite to partitions the increment writes.
            if not model.partition_by:
                raise ValueError(
                    f"model {model.name}: insert_overwrite needs partition_by"
                )
            conf = "spark.sql.sources.partitionOverwriteMode"
            prev = self.spark.conf.get(conf, "static")
            self.spark.conf.set(conf, "dynamic")
            try:
                # insertInto is position-based: align to the target's layout
                cols = self.spark.table(model.target).columns
                result.select(*cols).write.mode("overwrite").insertInto(
                    model.target
                )
            finally:
                self.spark.conf.set(conf, prev)
        elif model.unique_key:
            merge_into_table(self.spark, model.target, result, model.unique_key)
        else:
            result.write.mode("append").saveAsTable(model.target)

"""Declarative data-quality validation with quarantine routing.

The reference's quality controls are implicit filters buried in the silver
transform (transforme_stock_silver.py:109-131 drops malformed rows inline)
and dbt's empty tests directory shows where expectations were meant to live.
This operator makes them explicit, the way Delta Live Tables expectations or
dbt tests do: each rule is a named passing-predicate Column; every row is
evaluated against ALL rules in one codegen'd projection (no per-rule passes,
no shuffle), then split into a passing stream and a quarantine stream that
carries the full list of failed rule names for triage.

At scale this is the right shape: one map stage regardless of rule count,
both output branches share the same scan when written in one job
(``persist()`` the validated frame before splitting if both sides are
consumed), and the quarantine table stays small relative to the corpus.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_validation(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Append ``failed_rules array<string>`` (sorted rule names whose passing
    predicate is false or null) and ``n_failed int``. NULL predicate results
    count as failures — an unevaluable rule must not wave a row through."""
    flags = [
        F.when(F.coalesce(rule.cast("boolean"), F.lit(False)), None).otherwise(
            F.lit(name)
        )
        for name, rule in rules.items()
    ]
    failed = F.array_sort(F.array_compact(F.array(*flags)))
    return df.withColumn("failed_rules", failed).withColumn(
        "n_failed", F.size("failed_rules")
    )


def validate(
    df: DataFrame, rules: Mapping[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Split *df* into (passing, quarantined-with-reasons). Both branches
    derive from one validated projection; persist it upstream if both are
    materialized in the same job to share the scan."""
    v = with_validation(df, rules)
    passing = v.filter(F.col("n_failed") == 0).drop("failed_rules", "n_failed")
    quarantined = v.filter(F.col("n_failed") > 0)
    return passing, quarantined

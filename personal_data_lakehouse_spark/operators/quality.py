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


def observed_write(
    df: DataFrame,
    rules: Mapping[str, Column],
    writer,
    observation_name: str = "quality",
) -> dict[str, int]:
    """Write *df* while collecting quality metrics IN THE SAME PASS via
    ``df.observe`` — the scale-correct form of a post-write count gate.

    A classic gate (`write; if table.count() < floor: fail`) re-scans the
    output; at 100 TB that second scan costs as much as the write.
    ``observe`` accumulates the metrics on the task side during the write
    job itself (Spark's Observation API), so the gate is free: returns
    ``{"n_rows": ..., "n_failed_rows": ..., "failed_<rule>": ...}`` for
    the caller to assert on (e.g. ``pipelines``' count gate, A4).

    *writer* is a callable invoked with the observed DataFrame; it must
    trigger exactly one action (e.g. ``lambda d: d.write.parquet(path)``).
    """
    from pyspark.sql import Observation

    v = with_validation(df, rules)
    obs = Observation(observation_name)
    metrics = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("n_failed") > 0).cast("long")).alias("n_failed_rows"),
    ]
    metrics += [
        F.sum(F.array_contains("failed_rules", name).cast("long")).alias(
            f"failed_{name}"
        )
        for name in rules
    ]
    observed = v.observe(obs, *metrics).drop("failed_rules", "n_failed")
    writer(observed)
    got = obs.get
    return {k: int(v or 0) for k, v in got.items()}

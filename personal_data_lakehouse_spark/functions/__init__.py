"""Scalar function library (SURVEY.md §2.8 F1-F12, plus engine helpers).

Every function here is a thin, composable Column expression built from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd. No Python UDFs
in this module: these are the hot-path scalar ops.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference casts every price/volume to decimal(30,8)
# (transforme_stock_silver.py:118-122).
MONEY_DECIMAL = "decimal(30,8)"
# Engine-standard output type for aggregated money columns: explicit on both
# the Spark side and the oracle SQL side so schemas and values match exactly.
AGG_DECIMAL = "decimal(38,6)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def safe_divide(num: Column | str, den: Column | str) -> Column:
    """BigQuery SAFE_DIVIDE semantics: NULL (not error/inf) when den = 0.

    Reference: dbt/lakehouse_models/models/silver/daily_stocks.sql:18.
    Spark with ANSI off already yields NULL for x/0, but the explicit guard
    makes the semantics independent of the ANSI flag.
    """
    num, den = _c(num), _c(den)
    return F.when(den != F.lit(0), num / den)


def money(col: Column | str) -> Column:
    """Cast to the reference's money type decimal(30,8)
    (transforme_stock_silver.py:118-122)."""
    return _c(col).cast(MONEY_DECIMAL)


def dec(col: Column | str, precision: int = 18, scale: int = 4) -> Column:
    """Small-width decimal cast used inside exact aggregations.

    Keeping intermediate widths small means decimal multiplication stays
    within 38 digits of precision in both Spark and DuckDB (DuckDB silently
    converts to DOUBLE past width 38, which would break exactness).
    """
    return _c(col).cast(f"decimal({precision},{scale})")


def dsum(col: Column, alias: str) -> Column:
    """Exact decimal SUM normalized to the engine's agg type."""
    return F.sum(col).cast(AGG_DECIMAL).alias(alias)


def davg(col: Column, alias: str) -> Column:
    """Deterministic average: exact decimal SUM, then one double division.

    Decimal addition is associative, so the sum is bit-identical regardless
    of partitioning; the single float division afterwards is deterministic.
    (A plain double SUM's value depends on partition merge order.)
    """
    return (F.sum(col).cast("double") / F.count(col)).alias(alias)


def normalize_symbol(col: Column | str) -> Column:
    """upper(trim(x)) — the reference's ticker normalization
    (transforme_stock_silver.py:112)."""
    return F.upper(F.trim(_c(col)))


def normalize_text(col: Column | str) -> Column:
    """Whitespace-collapsed, trimmed, lowercased text — canonical form used
    by fingerprinting and exact dedup."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def month_start(col: Column | str) -> Column:
    """DATE_TRUNC(d, MONTH) → first day of month as DATE
    (monthly_stock_summary.sql:12; note Spark's arg order differs from BQ)."""
    return F.date_trunc("month", _c(col)).cast("date")

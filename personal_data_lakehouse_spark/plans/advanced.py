"""Advanced operator surface: as-of join, batch session/sliding windows,
deterministic statistical moments, distinct counts, timezone conversion.

Each query mirrors a capability class the reference implies but never
spells out (SURVEY §2.3 J3, §2.5, §2.9) — expressed Spark-first with exact
DuckDB oracles (DuckDB's native ASOF JOIN is the oracle for ours).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from personal_data_lakehouse_spark.functions import dec
from personal_data_lakehouse_spark.operators.asof import asof_join
from personal_data_lakehouse_spark.plans.registry import query, t


@query(
    "q_asof_join",
    oracle="""
    WITH p AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS pts, MAX(value) AS pvalue
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, CAST(ts AS TIMESTAMP)
    ), e AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ets
        FROM events WHERE event_type = 'error'
    )
    SELECT e.event_id, e.user_id,
           epoch_us(e.ets) AS error_ts_us,
           epoch_us(p.pts) AS matched_ts_us,
           p.pvalue        AS matched_value
    FROM e ASOF LEFT JOIN p
      ON e.user_id = p.user_id AND e.ets >= p.pts
    """,
)
def q_asof_join(spark, sf_dir):
    """As-of join: each error event picks the latest prior-or-equal purchase
    by the same user — union+window implementation, oracle = DuckDB's
    native ASOF JOIN."""
    events = t(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("ets")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("value").alias("pvalue")
    )
    out = asof_join(
        errors, purchases, on="user_id", left_ts="ets", right_ts="pts",
        value_cols=["pvalue"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ets").alias("error_ts_us"),
        F.unix_micros("matched_ts").alias("matched_ts_us"),
        F.col("matched_pvalue").alias("matched_value"),
    )


@query(
    "q_session_window",
    oracle="""
    WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
    ), m AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM e
    ), s AS (
        SELECT user_id, ts, value,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM m
    )
    SELECT user_id,
           epoch_us(MIN(ts)) AS session_start_us,
           epoch_us(MAX(ts) + INTERVAL 30 MINUTE) AS session_end_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS total_value
    FROM s GROUP BY user_id, sid
    """,
)
def q_session_window(spark, sf_dir):
    """Session windows (30-min gap) per user — batch form of the streaming
    operator; oracle = classic lag/gap/cumsum sessionization SQL."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value", 18, 6)).cast("decimal(38,6)").alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("session_start_us"),
            F.unix_micros("session_window.end").alias("session_end_us"),
            "n_events",
            "total_value",
        )
    )


@query(
    "q_sliding_window",
    oracle="""
    SELECT CAST(epoch(bucket) AS BIGINT) AS window_start,
           event_type, COUNT(*) AS n_events
    FROM (
        SELECT event_type,
               unnest([time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)),
                       time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
                           - INTERVAL 1 HOUR]) AS bucket
        FROM events
    )
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
)
def q_sliding_window(spark, sf_dir):
    """Sliding window (2h length, 1h slide): every event lands in 2 windows."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp("window.start").alias("window_start"),
            "event_type",
            "n_events",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "q_stats_moments",
    oracle="""
    WITH s AS (
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(value AS DECIMAL(18,6))
                        * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s2,
               MIN(value) AS min_value, MAX(value) AS max_value
        FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND(s1 / n, 6) AS mean_value,
           ROUND((s2 - s1 * s1 / n) / (n - 1), 6) AS var_value,
           ROUND(sqrt((s2 - s1 * s1 / n) / (n - 1)), 6) AS stddev_value,
           min_value, max_value
    FROM s ORDER BY event_type
    """,
)
def q_stats_moments(spark, sf_dir):
    """Mean/variance/stddev per group computed deterministically: exact
    decimal power sums, float math only on the final scalars. (A plain
    double SUM/STDDEV is partition-order dependent — unusable against an
    oracle and nondeterministic between runs at scale.)"""
    e = t(spark, sf_dir, "events")
    v = dec("value", 18, 6)
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).cast("double").alias("s1"),
        F.sum((v * v)).cast("double").alias("s2"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    return s.select(
        "event_type",
        "n",
        F.round(s1 / n, 6).alias("mean_value"),
        F.round((s2 - s1 * s1 / n) / (n - 1), 6).alias("var_value"),
        F.round(F.sqrt((s2 - s1 * s1 / n) / (n - 1)), 6).alias("stddev_value"),
        "min_value",
        "max_value",
    ).orderBy("event_type")


@query(
    "q_distinct_counts",
    oracle="""
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q_distinct_counts(spark, sf_dir):
    """Exact COUNT DISTINCT (expand+two-phase agg in Spark). The approximate
    companion (approx_count_distinct / HLL) is q_approx_distinct —
    rows-only checked, since sketches are engine-specific."""
    c = t(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .orderBy("c_mktsegment")
    )


@query("q_approx_distinct", oracle=None)  # sketch values are engine-specific
def q_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++): the scale path for distinct
    counting — no expand, mergeable sketches, bounded memory. Rows-only
    check here; tests/test_advanced.py bounds its relative error vs exact."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
    )


@query(
    "q_timezone_convert",
    oracle="""
    SELECT CAST(CAST(ts AS TIMESTAMP) - INTERVAL 3 HOUR AS DATE) AS local_date,
           COUNT(*) AS n
    FROM events
    GROUP BY 1 ORDER BY local_date
    """,
)
def q_timezone_convert(spark, sf_dir):
    """from_utc_timestamp to America/Sao_Paulo (UTC-3, no DST since 2019 —
    fixture events are 2024, so the IANA rule equals the fixed offset the
    oracle uses). Reference: transforme_stock_silver.py:123-126."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.to_date(
                F.from_utc_timestamp(F.col("ts"), "America/Sao_Paulo")
            ).alias("local_date")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("local_date")
    )


@query("q_approx_percentile", oracle=None)  # sketch values are engine-specific
def q_approx_percentile(spark, sf_dir):
    """Streaming-sketch percentiles (Greenwald-Khanna): the 100 TB path for
    q_percentiles' exact sort-based form — single pass, bounded memory,
    mergeable across partitions. Accuracy bounded by the error test in
    tests/test_advanced.py, not an oracle hash (sketches are
    engine-specific)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", 0.5, 10000).alias("qty_p50_approx"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias(
            "price_p50_approx"
        ),
    )


# ---------------------------------------------------------------------------
# VARIANT semi-structured shredding (Spark 4 open variant type)


@query(
    "q_variant_shred",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS k_sum,
           CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS k_min,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS k_max
    FROM events
    GROUP BY event_type
    """,
)
def q_variant_shred(spark, sf_dir):
    """Semi-structured payload shredding via Spark 4's open VARIANT type:
    ``parse_json`` builds the binary variant once, ``variant_get`` extracts
    typed paths with no per-row JSON re-parse downstream — the engine-level
    replacement for string get_json_object (q_json_extract keeps the
    legacy form). Variant decode is expression-level (codegen, no Python),
    and at 100 TB shredded variants store columnar-substructure, so the
    extraction cost moves from query time toward write time. Aggregation
    is the standard one-shuffle grouped form."""
    e = t(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )

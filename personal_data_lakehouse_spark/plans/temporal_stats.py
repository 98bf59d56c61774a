"""Temporal / statistical operator surface, wave 6.

CDC changelog application (the operational heart of a lakehouse — the
reference's MERGE at ingest_stocks.py:84-100 is the I/U half; this adds
ordered U-vs-U conflict resolution and deletes), interval-overlap
concurrency via the sweep-line trick, integer-exact z-score outlier
detection, and exact weighted medians.

Determinism notes are per-query; the common discipline: no reassociable
float reductions (quantize → integer/decimal sums), every window ordered by
a unique key, scale-0 decimal products sized so Spark's precision cap never
forces a scale reduction (the value fits 38 digits; DuckDB runs the same
math in HUGEINT which is exact to ~1.7e38).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from personal_data_lakehouse_spark.plans.registry import query, t

# ---------------------------------------------------------------------------
# CDC changelog application


@query(
    "q_cdc_apply",
    oracle="""
    WITH snap AS (SELECT o_orderkey, o_totalprice FROM orders)
    SELECT o_orderkey, o_totalprice FROM snap
    WHERE o_orderkey % 10 NOT IN (3, 7)
    UNION ALL
    SELECT o_orderkey, o_totalprice + 200 FROM snap WHERE o_orderkey % 10 = 7
    UNION ALL
    SELECT o_orderkey + 10000000, o_totalprice FROM snap WHERE o_orderkey % 10 = 1
    """,
)
def q_cdc_apply(spark, sf_dir):
    """Apply an ordered I/U/D changelog to a snapshot via
    operators.merge.apply_changes (DLT apply_changes / Debezium-consumer
    semantics). The synthetic changelog carries a delete stream (keys %10=3),
    two conflicting updates for the same keys (%10=7 — seq 2 must win over
    seq 1), and an insert stream of new keys; the oracle states the final
    snapshot those changes must produce. The snapshot is never shuffled:
    latest-per-key collapses the (small) changelog, whose key set then
    broadcast-anti-joins the snapshot."""
    from personal_data_lakehouse_spark.operators.merge import apply_changes

    snap = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    k = F.col("o_orderkey")
    upd1 = (
        snap.filter(k % 10 == 7)
        .withColumn("o_totalprice", F.col("o_totalprice") + 100)
        .withColumn("op", F.lit("U"))
        .withColumn("seq", F.lit(1))
    )
    upd2 = (
        snap.filter(k % 10 == 7)
        .withColumn("o_totalprice", F.col("o_totalprice") + 200)
        .withColumn("op", F.lit("U"))
        .withColumn("seq", F.lit(2))
    )
    dels = (
        snap.filter(k % 10 == 3)
        .withColumn("op", F.lit("D"))
        .withColumn("seq", F.lit(1))
    )
    ins = (
        snap.filter(k % 10 == 1)
        .withColumn("o_orderkey", k + 10000000)
        .withColumn("op", F.lit("I"))
        .withColumn("seq", F.lit(1))
    )
    changes = upd1.unionByName(upd2).unionByName(dels).unionByName(ins)
    return apply_changes(snap, changes, keys=["o_orderkey"])


# ---------------------------------------------------------------------------
# Interval-overlap concurrency (sweep line)


@query(
    "q_open_order_concurrency",
    oracle="""
    WITH span AS (
        SELECT o.o_orderkey,
               CAST(o.o_orderdate AS DATE) AS s,
               CAST(MAX(l.l_shipdate) AS DATE) AS e
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
    ),
    deltas AS (
        SELECT s AS d, 1 AS delta FROM span
        UNION ALL
        SELECT e + 1, -1 FROM span
    ),
    daily AS (SELECT d, SUM(delta) AS net FROM deltas GROUP BY d)
    SELECT d, CAST(SUM(net) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS open_orders
    FROM daily
    """,
)
def q_open_order_concurrency(spark, sf_dir):
    """How many orders are open on each day — interval-overlap counting via
    the sweep line: +1 at each order's start, −1 the day after its last
    shipment, cumulative-summed over the date axis. The naive form is an
    interval×calendar range join (O(orders × days)); the sweep is O(orders)
    with one tiny aggregation keyed on date — THE scalable shape for
    concurrency/occupancy/active-sessions metrics at 100 TB. The cumulative
    window runs over |distinct dates| rows (thousands), not the fact table."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    span = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("s"))
        .agg(F.max(F.to_date("l_shipdate")).alias("e"))
    )
    deltas = span.select(F.col("s").alias("d"), F.lit(1).alias("delta")).unionAll(
        span.select(F.date_add("e", 1).alias("d"), F.lit(-1).alias("delta"))
    )
    daily = deltas.groupBy("d").agg(F.sum("delta").alias("net"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "d", F.sum("net").over(w).cast("long").alias("open_orders")
    )


# ---------------------------------------------------------------------------
# Integer-exact z-score outliers


@query(
    "q_zscore_outliers",
    oracle="""
    WITH q AS (
        SELECT event_id, event_type,
               CAST(round(value * 1000000) AS BIGINT) AS vq
        FROM events
    ),
    st AS (
        SELECT event_type,
               CAST(COUNT(*) AS HUGEINT) AS cnt,
               CAST(SUM(CAST(vq AS HUGEINT)) AS HUGEINT) AS s,
               CAST(SUM(CAST(vq AS HUGEINT) * CAST(vq AS HUGEINT)) AS HUGEINT) AS ss
        FROM q GROUP BY event_type
    )
    SELECT q.event_id, q.event_type, q.vq,
           CAST(st.cnt * q.vq - st.s AS BIGINT) AS dev_num
    FROM q JOIN st USING (event_type)
    WHERE 4 * (st.cnt * q.vq - st.s) * (st.cnt * q.vq - st.s)
          > 9 * (st.cnt * st.ss - st.s * st.s)
    """,
)
def q_zscore_outliers(spark, sf_dir):
    """Events more than 1.5 standard deviations from their type's mean,
    decided entirely in integer arithmetic: |v−μ|>1.5σ ⇔
    4·(n·v−Σ)² > 9·(n·Σv²−Σ²) (since z = (n·v−Σ)/√(n·Σv²−Σ²)) — no
    division, no sqrt, no float accumulation, so the answer is bit-identical
    on any engine and any partition order (Spark runs it in scale-0 decimals
    sized under the 38-digit cap; DuckDB in int128). One aggregation over
    the events (map-side combinable) producing a per-type stats row that
    broadcast-joins back — the two-pass shape every sane distributed
    anomaly detector uses."""
    ev = t(spark, sf_dir, "events")
    q = ev.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 1000000, 0).cast("long").alias("vq"),
    )
    vq_d = F.col("vq").cast("decimal(18,0)")
    st = q.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("vq").alias("s"),
        F.sum(vq_d * F.col("vq").cast("decimal(19,0)")).alias("ss"),
    )
    j = q.join(F.broadcast(st), "event_type")
    # dev = n·v − Σ fits a BIGINT (≤ ~1e14 at sf1); its square and the RHS
    # run in DECIMAL(38,0) where the true values stay ≤ ~1e28.
    dev = F.col("cnt") * F.col("vq") - F.col("s")
    dev_sq = dev.cast("decimal(18,0)") * dev.cast("decimal(19,0)")
    rhs = F.lit(9).cast("decimal(2,0)") * (
        F.col("cnt").cast("decimal(9,0)") * F.col("ss")
        - F.col("s").cast("decimal(18,0)") * F.col("s").cast("decimal(19,0)")
    )
    lhs = F.lit(4).cast("decimal(2,0)") * dev_sq
    return (
        j.filter(lhs > rhs)
        .select("event_id", "event_type", "vq", dev.cast("long").alias("dev_num"))
    )


# ---------------------------------------------------------------------------
# Exact weighted median


@query(
    "q_weighted_median",
    oracle="""
    WITH r AS (
        SELECT l_returnflag AS flag, l_extendedprice AS price,
               CAST(l_quantity AS BIGINT) AS w,
               l_orderkey, l_linenumber
        FROM lineitem
    ),
    c AS (
        SELECT flag, price,
               SUM(w) OVER (PARTITION BY flag
                            ORDER BY price, l_orderkey, l_linenumber
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cumw,
               SUM(w) OVER (PARTITION BY flag) AS total
        FROM r
    )
    SELECT flag, MIN(price) AS weighted_median
    FROM c WHERE cumw * 2 >= total GROUP BY flag
    """,
)
def q_weighted_median(spark, sf_dir):
    """Quantity-weighted median price per return flag: the price at which
    cumulative shipped quantity crosses half the total — exact, via one
    sort-based window per group (integer weights, so the running sum is
    order-exact with the unique (price, orderkey, linenumber) ordering).
    Weighted quantiles are what sketches approximate; this is the exact
    reference implementation, one shuffle on the group key with the sort
    reused by both windows."""
    li = t(spark, sf_dir, "lineitem")
    r = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("long").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    win = Window.partitionBy("flag").orderBy(
        "price", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = Window.partitionBy("flag")
    c = r.select(
        "flag",
        "price",
        F.sum("w").over(win).alias("cumw"),
        F.sum("w").over(tot).alias("total"),
    )
    return (
        c.filter(F.col("cumw") * 2 >= F.col("total"))
        .groupBy("flag")
        .agg(F.min("price").alias("weighted_median"))
    )


# ---------------------------------------------------------------------------
# Hypertable-style continuous-aggregate cascade


@query(
    "q_hypertable_rollup",
    oracle="""
    SELECT CAST(ts AS DATE) AS d, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY CAST(ts AS DATE), event_type
    """,
)
def q_hypertable_rollup(spark, sf_dir):
    """Hypertable continuous-aggregate cascade (TimescaleDB-style): raw
    events → 15-minute buckets → hourly → daily, each level aggregating the
    one below, with the oracle computing daily DIRECTLY from raw events —
    verifying the cascade is lossless. That's only true because the partial
    states are decomposable (counts add; sums run in exact decimal, so
    re-aggregation order can't perturb them) — the same property that lets
    a real deployment serve any resolution from the finest materialized
    level and refresh incrementally, touching only the buckets the new data
    lands in. Each level's input is |buckets| rows, so the cascade costs
    three shuffles of collapsing size: O(rows) → O(15-min buckets) →
    O(hours) → O(days)."""
    ev = t(spark, sf_dir, "events")
    m15 = (
        ev.select(
            F.timestamp_seconds(
                (F.unix_timestamp("ts") / 900).cast("long") * 900
            ).alias("bucket15"),
            "event_type",
            F.col("value").cast("decimal(18,6)").alias("v"),
        )
        .groupBy("bucket15", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("v").alias("total_v"))
    )
    hourly = (
        m15.groupBy(
            F.date_trunc("hour", "bucket15").alias("bucket_h"), "event_type"
        )
        .agg(F.sum("n_events").alias("n_events"), F.sum("total_v").alias("total_v"))
    )
    return (
        hourly.groupBy(F.to_date("bucket_h").alias("d"), "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_v").cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Time-bounded conversion funnel


@query(
    "q_funnel_time_bound",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(epoch_us(ts)) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click'
          AND epoch_us(e.ts) > v.t_view
          AND epoch_us(e.ts) <= v.t_view + 3600000000
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase'
          AND epoch_us(e.ts) > c.t_click
          AND epoch_us(e.ts) <= c.t_click + 86400000000
        GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click_1h,
           (SELECT COUNT(*) FROM p) AS n_purchase_24h
    """,
)
def q_funnel_time_bound(spark, sf_dir):
    """Attribution-window funnel: first view → earliest click within ONE
    HOUR of it → earliest purchase within 24 HOURS of that click. Unlike
    q_funnel's unbounded first-touch ordering, each step must land inside
    its window — the semantics ad-attribution actually bills on. Three
    chained aggregations all keyed on user_id: with the first aggregation's
    output co-partitioned on the join key, the follow-up joins reuse the
    partitioning (no re-shuffle of the big side at scale; each step's
    survivor set also shrinks monotonically). Timestamps compared as epoch
    micros — integer math, engine-exact."""
    e = t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    ev = e.select("user_id", "event_type", us.alias("us"))
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("us") > F.col("t_view"))
            & (F.col("us") <= F.col("t_view") + 3_600_000_000)
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("us") > F.col("t_click"))
            & (F.col("us") <= F.col("t_click") + 86_400_000_000)
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("t_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_1h")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_24h")))
    )


# ---------------------------------------------------------------------------
# Rolling time-series features (exact integer arithmetic)


@query(
    "q_rolling_features",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
               CAST(floor(value * 1e6) AS BIGINT) AS vq
        FROM events WHERE user_id % 50 = 0
    )
    SELECT user_id, event_id, ts_us,
           CAST(SUM(vq) OVER w5 AS BIGINT) AS roll_sum_q,
           CAST(COUNT(*) OVER w5 AS BIGINT) AS roll_n,
           CAST(MIN(vq) OVER w5 AS BIGINT) AS roll_min_q,
           CAST(MAX(vq) OVER w5 AS BIGINT) AS roll_max_q,
           ts_us - lag(ts_us) OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_id) AS gap_us
    FROM e
    WINDOW w5 AS (PARTITION BY user_id ORDER BY ts_us, event_id
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def q_rolling_features(spark, sf_dir):
    """Per-entity rolling features — 5-event moving sum/min/max and
    inter-event gaps — the feature-engineering shape behind sessionized
    activity scoring. ONE shuffle keyed on user_id serves every window
    (same partitioning, two frame specs); values are quantized with
    floor(v·1e6) so the rolling sums are exact integers (no reassociable
    float reduction — floor of an identical IEEE product is identical on
    any engine), and every ORDER BY carries the unique event_id tiebreak
    so frames are deterministic under ts collisions. At 100 TB user_id
    cardinality scales with the data — no skew, no single-partition
    window."""
    e = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id") % 50 == 0)
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            F.floor(F.col("value") * F.lit(1e6)).cast("long").alias("vq"),
        )
    )
    order = [F.col("ts_us"), F.col("event_id")]
    w5 = (
        Window.partitionBy("user_id").orderBy(*order).rowsBetween(-4, 0)
    )
    wlag = Window.partitionBy("user_id").orderBy(*order)
    return e.select(
        "user_id",
        "event_id",
        "ts_us",
        F.sum("vq").over(w5).cast("long").alias("roll_sum_q"),
        F.count(F.lit(1)).over(w5).cast("long").alias("roll_n"),
        F.min("vq").over(w5).cast("long").alias("roll_min_q"),
        F.max("vq").over(w5).cast("long").alias("roll_max_q"),
        (F.col("ts_us") - F.lag("ts_us").over(wlag)).alias("gap_us"),
    )


# ---------------------------------------------------------------------------
# Incremental materialized-view maintenance (algebraic state merge)


@query(
    "q_incremental_mv",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS total_price,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                / COUNT(*) AS DOUBLE) AS avg_price,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS max_price
    FROM orders
    GROUP BY 1
    """,
)
def q_incremental_mv(spark, sf_dir):
    """Incremental MV refresh proven equal to a full recompute: orders
    split into a deterministic 'history' batch (md5 coin on o_orderkey,
    ~75%) and a 'new' batch; each aggregates into an algebraic state
    (COUNT / decimal SUM / MAX per month) and the states MERGE — the full
    recompute the oracle runs never happens on the Spark side. Derived
    AVG comes off the merged state. Refresh cost is O(batch + |groups|):
    at 100 TB only the new batch and the group-cardinality state table
    are touched, and the state merge shuffles rows proportional to
    months, not orders. Exactness: decimal sums are reassociation-proof,
    so merge(partial(A), partial(B)) is bit-equal to aggregate(A ∪ B)."""
    from personal_data_lakehouse_spark.functions import dec
    from personal_data_lakehouse_spark.operators.incremental import (
        merge_states,
        partial_state,
    )

    orders = t(spark, sf_dir, "orders").withColumn(
        "month", F.date_trunc("month", "o_orderdate").cast("date")
    )
    coin = F.substring(
        F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(":mv")).cast("binary")),
        1,
        2,
    )
    history = orders.filter(coin < "c0")
    fresh = orders.filter(coin >= "c0")

    measures = {
        "n_orders": ("count", "*"),
        "total_dec": ("sum", "p_dec"),
        "max_dec": ("max", "p_dec"),
    }

    def prep(df):
        return df.withColumn("p_dec", dec("o_totalprice"))

    state = partial_state(prep(history), ["month"], measures)
    delta = partial_state(prep(fresh), ["month"], measures)
    refreshed = merge_states(state, delta, ["month"], measures)
    return refreshed.select(
        "month",
        "n_orders",
        F.col("total_dec").cast("double").alias("total_price"),
        (F.col("total_dec").cast("double") / F.col("n_orders"))
        .cast("double")
        .alias("avg_price"),
        F.col("max_dec").cast("double").alias("max_price"),
    )


@query("q_hll_mv")  # rows-only: sketch estimates are engine-specific
def q_hll_mv(spark, sf_dir):
    """Incremental MV with a MERGEABLE DISTINCT-COUNT state: per-month
    approx distinct customers via Apache DataSketches HLL. Exact distinct
    is NOT algebraic (it can't merge from per-batch partials without the
    raw keys), which is why q_incremental_mv scopes it out — HLL sketches
    restore mergeability: each batch aggregates to a binary sketch state
    (hll_sketch_agg), refresh unions states (hll_union_agg), estimates
    come off the merged sketch. Same O(batch + groups) refresh cost as
    the algebraic measures, ~1-2% standard error, engine-pinned values
    (DataSketches ≠ DuckDB's approx_distinct, hence rows-only — the
    merge-equals-full property and the error bound are pinned in
    tests/test_incremental.py instead)."""
    orders = t(spark, sf_dir, "orders").withColumn(
        "month", F.date_trunc("month", "o_orderdate").cast("date")
    )
    coin = F.substring(
        F.md5(
            F.concat(F.col("o_orderkey").cast("string"), F.lit(":mv")).cast(
                "binary"
            )
        ),
        1,
        2,
    )
    batches = [orders.filter(coin < "c0"), orders.filter(coin >= "c0")]
    states = [
        b.groupBy("month").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.hll_sketch_agg("o_custkey").alias("cust_sketch"),
        )
        for b in batches
    ]
    merged = (
        states[0]
        .unionByName(states[1])
        .groupBy("month")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.hll_union_agg("cust_sketch").alias("cust_sketch"),
        )
    )
    return merged.select(
        "month",
        "n_orders",
        F.hll_sketch_estimate("cust_sketch").alias("approx_distinct_customers"),
    ).orderBy("month")


# ---------------------------------------------------------------------------
# Distribution drift (total-variation distance, logarithm-free)


@query(
    "q_drift_tvd",
    oracle="""
    WITH e AS (
        SELECT CAST(floor(value / 50) AS BIGINT) AS bucket,
               substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < '8' AS in_a
        FROM events
    ),
    b AS (
        SELECT bucket,
               CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
        FROM e GROUP BY bucket
    ),
    tot AS (SELECT CAST(SUM(n_a) AS BIGINT) AS ta,
                   CAST(SUM(n_b) AS BIGINT) AS tb FROM b)
    SELECT bucket, n_a, n_b,
           CAST(n_a AS DOUBLE) / ta AS p_a,
           CAST(n_b AS DOUBLE) / tb AS p_b,
           CAST(abs(CAST(n_a AS HUGEINT) * tb - CAST(n_b AS HUGEINT) * ta)
                AS DOUBLE) / (CAST(ta AS DOUBLE) * tb) AS abs_diff,
           CAST(CAST(SUM(abs(CAST(n_a AS HUGEINT) * tb
                             - CAST(n_b AS HUGEINT) * ta)) OVER ()
                     AS DOUBLE) / (2.0 * ta * tb) AS DOUBLE) AS tvd
    FROM b, tot
    """,
)
def q_drift_tvd(spark, sf_dir):
    """Distribution-drift monitor between two deterministic halves of the
    event stream (md5-coin split — in production: yesterday vs today, or
    holdout vs candidate corpus): per-bucket counts, probabilities, and
    the total-variation distance ½·Σ|p−q|. TVD instead of PSI/KL on
    purpose — it needs no logarithm; and the Σ runs over the INTEGER
    numerators |n_a·tb − n_b·ta| (one double division at the end), so no
    float reduction exists whose order could differ between engines (a
    window SUM of doubles is partition-order-dependent — that exact miss
    was caught building this query). The numerators are computed in 128-bit
    integer space — DECIMAL(38,0) Spark-side, HUGEINT in the oracle —
    because at the 100 TB scale this targets (counts ~1e12, totals ~1e13)
    the BIGINT product n_a·tb exceeds 2^63; int128 is exact to ~1.7e38.
    One grouped count over the stream + a 10-row window for the scalar; at
    100 TB the bucket histogram is the only shuffle and it's map-side
    combined."""
    e = t(spark, sf_dir, "events").select(
        F.floor(F.col("value") / 50).cast("long").alias("bucket"),
        (
            F.substring(
                F.md5(F.col("event_id").cast("string").cast("binary")), 1, 1
            )
            < "8"
        ).alias("in_a"),
    )
    b = e.groupBy("bucket").agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(1)).cast("long").alias("n_b"),
    )
    tot = b.agg(
        F.sum("n_a").cast("long").alias("ta"),
        F.sum("n_b").cast("long").alias("tb"),
    )
    j = b.crossJoin(F.broadcast(tot))
    p_a = F.col("n_a").cast("double") / F.col("ta")
    p_b = F.col("n_b").cast("double") / F.col("tb")
    # decimal(19,0) operands -> decimal(38,0) products/difference: the whole
    # numerator stays in exact int128 space (no BIGINT wrap, no float drift)
    dec = "decimal(19,0)"
    num = F.abs(
        F.col("n_a").cast(dec) * F.col("tb").cast(dec)
        - F.col("n_b").cast(dec) * F.col("ta").cast(dec)
    )
    w = Window.partitionBy()
    denom = F.col("ta").cast("double") * F.col("tb").cast("double")
    return j.select(
        "bucket",
        "n_a",
        "n_b",
        p_a.alias("p_a"),
        p_b.alias("p_b"),
        (num.cast("double") / denom).alias("abs_diff"),
        (F.sum(num).over(w).cast("double") / (F.lit(2.0) * denom))
        .cast("double")
        .alias("tvd"),
    )

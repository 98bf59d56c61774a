"""Analytics / lakehouse operator surface, wave 3.

CDC snapshot diffing, calendar gap-fill, distribution windows
(ntile/percent_rank/cume_dist, first/last/nth_value frames), exact medians,
deterministic mode, OLS regression, latest-row-per-key snapshots,
skew-resistant two-stage aggregation, windowed event dedup, and three more
training-data ops (document chunking, PII scrubbing, rarity-ranked terms).

Same discipline as every other plans module: built-in DataFrame expressions
only (JVM-side, codegen'd), exact DuckDB oracle per query, money math in
decimal (associative, partition-order independent) with DOUBLE presentation
via registry.finalize, every window ORDER BY ending in a unique tie-break
key, timestamps surfaced as DATE or epoch BIGINT.

Reference parity notes: the reference's lakehouse has no CDC/window/stat
surface of its own (SURVEY §2.5 "None", §2.3 joins "None"); these extend the
engine the way its BigQuery+dbt layer would grow — snapshot diffs are the
dbt "snapshot" materialization (SCD bookkeeping), gap-fill is the reporting
layer's date spine, latest-per-key is `transforme_stock_silver.py`'s
overwrite semantics done incrementally.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from personal_data_lakehouse_spark.functions import dec
from personal_data_lakehouse_spark.functions.text import tokens
from personal_data_lakehouse_spark.plans.registry import query, t
from personal_data_lakehouse_spark.plans.text_ops import _TOKS

# ---------------------------------------------------------------------------
# CDC snapshot diff


@query(
    "q_snapshot_diff",
    oracle="""
    WITH old_snap AS (
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 <> 0
    ),
    new_snap AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 7 <> 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           o.o_totalprice AS old_price,
           n.o_totalprice AS new_price
    FROM old_snap o FULL JOIN new_snap n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_totalprice <> n.o_totalprice
    """,
)
def q_snapshot_diff(spark, sf_dir):
    """CDC-style snapshot diff: full-outer join two table versions on the
    key and classify each row insert/delete/update (unchanged rows dropped).
    The dbt-snapshot / Delta CDF shape done relationally. Key filters push
    to the scan; the join shuffles both sides on the key once — at 100 TB
    that single co-partitioned shuffle is the floor for any diff. The price
    perturbation is one exact IEEE add, so both engines see identical
    doubles."""
    orders = t(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 10 != 0).select(
        F.col("o_orderkey").alias("old_key"),
        F.col("o_totalprice").alias("old_price"),
    )
    new = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("new_key"),
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")).alias("new_price"),
    )
    j = old.join(new, old.old_key == new.new_key, "full_outer")
    change = (
        F.when(F.col("old_key").isNull(), F.lit("insert"))
        .when(F.col("new_key").isNull(), F.lit("delete"))
        .when(F.col("old_price") != F.col("new_price"), F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(
            F.coalesce("old_key", "new_key").alias("o_orderkey"),
            change.alias("change_type"),
            "old_price",
            "new_price",
        )
        .filter(F.col("change_type") != "unchanged")
    )


# ---------------------------------------------------------------------------
# Calendar gap-fill (date spine)


@query(
    "q_gap_fill_calendar",
    oracle="""
    WITH bounds AS (
        SELECT date_trunc('month', MIN(CAST(o_orderdate AS DATE))) AS mn,
               date_trunc('month', MAX(CAST(o_orderdate AS DATE))) AS mx
        FROM orders
    ),
    months AS (
        SELECT CAST(unnest(generate_series(CAST(mn AS TIMESTAMP),
                                           CAST(mx AS TIMESTAMP),
                                           INTERVAL 1 MONTH)) AS DATE) AS month
        FROM bounds
    ),
    counts AS (
        SELECT n_name, date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
               COUNT(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2
    )
    SELECT s.n_name, s.month, COALESCE(c.n_orders, 0) AS n_orders
    FROM (SELECT n_name, month FROM nation CROSS JOIN months) s
    LEFT JOIN counts c ON s.n_name = c.n_name AND s.month = c.month
    """,
)
def q_gap_fill_calendar(spark, sf_dir):
    """Time-series gap fill: build the complete (nation × month) date spine
    from the data's own bounds, left-join the monthly order counts, zero-fill
    the gaps. The reporting-layer idiom the reference's gold model would need
    the first month a ticker doesn't trade. The spine is tiny (dims × months)
    and broadcast; the only real shuffle is the grouped count."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    bounds = orders.agg(
        F.trunc(F.min(F.col("o_orderdate").cast("date")), "month").alias("mn"),
        F.trunc(F.max(F.col("o_orderdate").cast("date")), "month").alias("mx"),
    )
    months = bounds.select(
        F.explode(
            F.expr("sequence(mn, mx, interval 1 month)")
        ).alias("month")
    )
    spine = nat.select("n_name").crossJoin(F.broadcast(months))
    counts = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy(
            "n_name",
            F.trunc(F.col("o_orderdate").cast("date"), "month").alias("month"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return spine.join(counts, ["n_name", "month"], "left").select(
        "n_name",
        "month",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Distribution windows


@query(
    "q_ntile_cume",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def q_ntile_cume(spark, sf_dir):
    """Distribution windows: quartile bucket, percent_rank, cume_dist per
    market segment. ORDER BY ends in the unique custkey so ranks are total —
    percent_rank/cume_dist then reduce to single IEEE divisions, identical
    across engines. One shuffle on the partition key."""
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "q_first_last_frames",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice) OVER w AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_first_last_frames(spark, sf_dir):
    """Navigation over an explicit full-partition frame: each order carries
    its customer's first/last/second order price. The frame makes last_value
    well-defined (the default frame stops at CURRENT ROW — a classic silent
    bug); unique tie-break key keeps positions deterministic."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


# ---------------------------------------------------------------------------
# Exact median / deterministic mode / OLS


@query(
    "q_median_exact",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n,
           quantile_cont(CAST(l_quantity AS BIGINT), 0.5) AS median_qty,
           quantile_cont(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                              AS BIGINT), 0.5) / 100 AS median_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_median_exact(spark, sf_dir):
    """Exact interpolated median per group, done on integers so the answer
    is bit-deterministic: quantities are integral, prices become exact cents
    via a decimal cast. The midpoint of two bigints < 2^52 is exact in
    double, and the final /100 is one correctly-rounded op — so Spark's
    percentile() and DuckDB's quantile_cont agree bit-for-bit. Exact
    percentile needs a per-group sort; at 100 TB swap in approx_percentile
    (q_approx_percentile) — this is the audit-grade path."""
    li = t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    cents = (dec("l_extendedprice", 12, 2) * 100).cast("long")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile(qty, F.lit(0.5)).alias("median_qty"),
        (F.percentile(cents, F.lit(0.5)) / 100).alias("median_price"),
    )


@query(
    "q_mode_per_group",
    oracle="""
    SELECT c_mktsegment, o_orderpriority AS mode_priority, cnt
    FROM (
        SELECT c_mktsegment, o_orderpriority, COUNT(*) AS cnt,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment, o_orderpriority
    ) m WHERE rn = 1
    """,
)
def q_mode_per_group(spark, sf_dir):
    """Deterministic mode: most frequent order priority per market segment,
    ties broken lexicographically (built-in mode() leaves ties undefined —
    unusable under a differential oracle). Aggregate first (tiny frame),
    then one window over ~(segments × priorities) rows."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    g = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("cnt").desc(), "o_orderpriority"
    )
    return (
        g.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("o_orderpriority").alias("mode_priority"),
            "cnt",
        )
    )


@query(
    "q_regr_slope",
    oracle="""
    SELECT l_returnflag, n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n,
                 6) AS intercept
    FROM (
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))
                        * CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))
                        * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag
    ) g
    """,
)
def q_regr_slope(spark, sf_dir):
    """OLS regression (price on quantity) per group from exact decimal
    co-moments — the regr_slope/regr_intercept surface without float-sum
    nondeterminism. Same pattern as q_corr: associative decimal sums, then
    one fixed double formula; both engines evaluate the identical expression
    tree, so the rounded results match exactly. Single map-side-combinable
    shuffle."""
    li = t(spark, sf_dir, "lineitem")
    x = dec("l_quantity", 8, 2)
    y = dec("l_extendedprice", 12, 2)
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    slope = (n * F.col("sxy") - sx * sy) / (n * F.col("sxx") - sx * sx)
    return g.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# Latest-row-per-key snapshot


@query(
    "q_latest_per_key",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS latest_date,
           o_totalprice
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate DESC,
                                              o_orderkey DESC) AS rn
        FROM orders
    ) o WHERE rn = 1
    """,
)
def q_latest_per_key(spark, sf_dir):
    """Current-snapshot view: each customer's most recent order via one
    row_number window (desc, keyed tie-break). The batch equivalent of the
    reference's silver overwrite (transforme_stock_silver.py:140-149) done
    incrementally — and Catalyst compiles rn=1 filters into a top-1-per-key
    WindowGroupLimit, so no full sort materializes."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("latest_date"),
            "o_totalprice",
        )
    )


# ---------------------------------------------------------------------------
# Skew-resistant two-stage aggregation


@query(
    "q_salted_two_stage_agg",
    oracle="""
    SELECT l_returnflag,
           SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS total_price,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_salted_two_stage_agg(spark, sf_dir):
    """Skew-resistant aggregation: pre-aggregate on (key, salt) — 16 salts
    from a hash of the row key — then combine per key. Result is identical
    to the direct groupBy (decimal sums are associative), but the first
    shuffle fans the 3 hot returnflag keys across 48 reducers instead of 3.
    This is the hand-rolled form of what AQE skew handling can't do for
    aggregations (it only splits skewed JOIN partitions); at 100 TB with a
    hot key this is the difference between one straggler and even spread.
    See operators/partitioning.py:salted_join for the join-side variant."""
    li = t(spark, sf_dir, "lineitem")
    partial = (
        li.withColumn("salt", F.pmod(F.col("l_orderkey"), F.lit(16)))
        .groupBy("l_returnflag", "salt")
        .agg(
            F.sum(dec("l_extendedprice", 12, 2)).alias("ps"),
            F.count(F.lit(1)).alias("pc"),
        )
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("ps").alias("total_price"), F.sum("pc").alias("n")
    )


# ---------------------------------------------------------------------------
# Windowed event dedup


@query(
    "q_event_dedup",
    oracle="""
    SELECT user_id, event_type,
           CAST(epoch(time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)))
                AS BIGINT) AS bucket_start,
           event_id, value
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY user_id, event_type,
                                time_bucket(INTERVAL '5 minutes',
                                            CAST(ts AS TIMESTAMP))
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        FROM events
    ) e WHERE rn = 1
    """,
)
def q_event_dedup(spark, sf_dir):
    """Windowed event dedup: keep the earliest event per (user, type,
    5-minute bucket) — the batch form of streaming dropDuplicates within
    watermark. Bucketing is integer floor-division of epoch micros (same
    epoch-aligned boundaries as DuckDB's time_bucket), dedup is one
    row_number window on the composite key. Batch-streaming parity: the
    streaming path is dropDuplicatesWithinWatermark in
    streaming/windows.py."""
    e = t(spark, sf_dir, "events")
    bucket = (F.unix_micros("ts") / F.lit(300_000_000)).cast("long")
    e = e.withColumn("bucket_start", bucket * 300)
    w = Window.partitionBy("user_id", "event_type", "bucket_start").orderBy(
        "ts", "event_id"
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "bucket_start", "event_id", "value")
    )


# ---------------------------------------------------------------------------
# Document chunking


@query(
    "t_chunk_documents",
    oracle="""
    WITH c AS (
        SELECT doc_id, text,
               unnest(range(((greatest(length(text), 1) - 1) // 150) + 1))
                   AS chunk_id
        FROM documents
    )
    SELECT doc_id, chunk_id,
           substr(text, CAST(chunk_id * 150 + 1 AS INT), 200) AS chunk,
           CAST(length(substr(text, CAST(chunk_id * 150 + 1 AS INT), 200))
                AS INT) AS chunk_len
    FROM c
    """,
)
def t_chunk_documents(spark, sf_dir):
    """Fixed-window document chunking with overlap: 200-char windows on a
    150-char stride (50-char overlap) — the context-window prep step of an
    embedding/RAG pipeline. Pure per-row explode (sequence → substring), no
    shuffle at all; at 100 TB this is a narrow map stage whose output
    partitioning inherits the scan's."""
    docs = t(spark, sf_dir, "documents")
    n_chunks = F.expr("cast((greatest(length(text), 1) - 1) div 150 as int)")
    chunk = F.expr("substring(text, chunk_id * 150 + 1, 200)")
    return (
        docs.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0), n_chunks)).alias("chunk_id"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            chunk.alias("chunk"),
            F.length(chunk).cast("int").alias("chunk_len"),
        )
    )


# ---------------------------------------------------------------------------
# PII scrubbing


@query(
    "t_pii_scrub",
    oracle="""
    SELECT doc_id,
           substr(regexp_replace(text, '[0-9]+', '#', 'g'), 1, 120)
               AS scrubbed_head,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT)
               AS n_digit_runs
    FROM documents
    """,
)
def t_pii_scrub(spark, sf_dir):
    """PII-style scrubbing: replace every digit run with '#' and count the
    redactions — the shape of email/phone/SSN masking in corpus prep (the
    production version swaps in the richer patterns; the plan is the same
    regexp_replace + regexp_count map stage). Zero shuffles, pushes nothing,
    pure codegen'd per-row work."""
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.substring(
            F.regexp_replace("text", "[0-9]+", "#"), 1, 120
        ).alias("scrubbed_head"),
        F.regexp_count("text", F.lit("[0-9]+")).cast("int").alias("n_digit_runs"),
    )


# ---------------------------------------------------------------------------
# Rarity-ranked terms (IDF ranking without floats)


@query(
    "t_doc_term_rarity",
    oracle=f"""
    WITH dt AS (
        SELECT DISTINCT doc_id, term FROM (
            SELECT doc_id, unnest({_TOKS}) AS term FROM documents
        ) u WHERE length(term) >= 4
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM dt GROUP BY term)
    SELECT doc_id, term, df, rk FROM (
        SELECT d.doc_id, d.term, f.df,
               CAST(ROW_NUMBER() OVER (PARTITION BY d.doc_id
                                       ORDER BY f.df, d.term) AS BIGINT) AS rk
        FROM dt d JOIN dfreq f ON d.term = f.term
    ) r WHERE rk <= 3
    """,
)
def t_doc_term_rarity(spark, sf_dir):
    """Rarity-ranked terms: each document's 3 rarest terms by corpus
    document frequency — IDF-style distinctive-term extraction in pure
    integer math (no log(), whose libm rounding differs across engines).
    Explode → distinct → df count → join back → top-3 window. At 100 TB the
    df table is small relative to the corpus and broadcasts; the heavy
    explode stays a map stage."""
    docs = t(spark, sf_dir, "documents")
    dt = (
        docs.select("doc_id", F.explode(tokens("text")).alias("term"))
        .filter(F.length("term") >= 4)
        .distinct()
    )
    dfreq = dt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "term")
    return (
        dt.join(dfreq, "term")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "df", "rk")
    )

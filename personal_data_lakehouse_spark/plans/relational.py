"""Core relational query surface (SURVEY.md §2.1-2.8).

Scans, projections/filters, joins (broadcast + shuffle, semi/anti/outer),
grouped aggregation, windows, sorts/top-k, set ops, MERGE semantics,
incremental watermark predicates, scalar functions — each exercised over the
driver's star-schema fixtures and checked against a DuckDB oracle.

Scale notes are inline per query: dimension joins broadcast; fact-fact joins
shuffle on their keys under AQE; aggregations rely on Spark's partial
(map-side) aggregation — nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from personal_data_lakehouse_spark.functions import (
    AGG_DECIMAL,
    davg,
    dec,
    dsum,
    money,
    normalize_symbol,
    safe_divide,
)
from personal_data_lakehouse_spark.operators.merge import (
    merge_insert_only,
    merge_upsert,
)
from personal_data_lakehouse_spark.plans.registry import query, register_views, t

# ---------------------------------------------------------------------------
# Shared SQL fragments for the DuckDB oracle side. Decimal widths are chosen
# so every intermediate stays under width 38 in BOTH engines (DuckDB silently
# converts to DOUBLE past 38, Spark reduces scale — either would break
# exactness).
# ---------------------------------------------------------------------------
_QTY = "CAST(l_quantity AS DECIMAL(18,4))"
_PRICE = "CAST(l_extendedprice AS DECIMAL(18,4))"
_DISC = "CAST(l_discount AS DECIMAL(8,4))"
_OMD = "CAST(1 - CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(8,4))"
_OPT = "CAST(1 + CAST(l_tax AS DECIMAL(8,4)) AS DECIMAL(8,4))"
_DISC_PRICE = f"CAST({_PRICE} * {_OMD} AS DECIMAL(22,8))"
_CHARGE = f"CAST({_DISC_PRICE} * {_OPT} AS DECIMAL(30,12))"


def _sp_qty():
    return dec("l_quantity")


def _sp_price():
    return dec("l_extendedprice")


def _sp_disc_price():
    omd = (F.lit(1) - dec("l_discount", 8, 4)).cast("decimal(8,4)")
    return (dec("l_extendedprice") * omd).cast("decimal(22,8)")


def _sp_charge():
    opt = (F.lit(1) + dec("l_tax", 8, 4)).cast("decimal(8,4)")
    return (_sp_disc_price() * opt).cast("decimal(30,12)")


# ---------------------------------------------------------------------------
# Aggregation pipeline (reference gold-model shape; TPC-H Q1 class)
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({_QTY}) AS DECIMAL(38,6))        AS sum_qty,
           CAST(SUM({_PRICE}) AS DECIMAL(38,6))      AS sum_base_price,
           CAST(SUM({_DISC_PRICE}) AS DECIMAL(38,6)) AS sum_disc_price,
           CAST(SUM({_CHARGE}) AS DECIMAL(38,6))     AS sum_charge,
           CAST(SUM({_QTY}) AS DOUBLE) / COUNT(l_quantity)       AS avg_qty,
           CAST(SUM({_PRICE}) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM({_DISC}) AS DOUBLE) / COUNT(l_discount)      AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark, sf_dir):
    """Pricing summary: 2-key grouped agg, 8 aggregates, ordered output.

    The reference's grouped-rollup shape (monthly_stock_summary.sql:15-18,
    A3/O2) at TPC-H Q1 scale. Spark executes partial+final hash aggregation
    with whole-stage codegen; only the shipdate filter and the 7 needed
    columns reach the scan.
    """
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(_sp_qty(), "sum_qty"),
            dsum(_sp_price(), "sum_base_price"),
            dsum(_sp_disc_price(), "sum_disc_price"),
            dsum(_sp_charge(), "sum_charge"),
            davg(_sp_qty(), "avg_qty"),
            davg(_sp_price(), "avg_price"),
            davg(dec("l_discount", 8, 4), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q02_monthly_rollup",
    oracle=f"""
    SELECT l_returnflag AS sigla,
           CAST(year(l_shipdate) AS INT)  AS ano,
           CAST(month(l_shipdate) AS INT) AS mes,
           CAST(date_trunc('month', l_shipdate) AS DATE) AS data_inicio_mes,
           CAST(SUM({_QTY}) AS DECIMAL(38,6)) AS volume_total_mensal,
           CAST(SUM({_PRICE}) AS DOUBLE) / COUNT(l_extendedprice)
               AS preco_medio_fechamento_mensal,
           CAST(MAX({_PRICE}) AS DECIMAL(38,6)) AS maximo_mensal,
           CAST(MIN({_PRICE}) AS DECIMAL(38,6)) AS minimo_mensal
    FROM lineitem
    GROUP BY 1, 2, 3, 4
    ORDER BY sigla, ano, mes
    """,
)
def q02_monthly_rollup(spark, sf_dir):
    """Monthly rollup — the reference's gold model semantics
    (monthly_stock_summary.sql:7-39: EXTRACT year/month, DATE_TRUNC month,
    SUM/AVG/MAX/MIN, ORDER BY) re-keyed onto lineitem."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.col("l_returnflag").alias("sigla"),
            F.year("l_shipdate").cast("int").alias("ano"),
            F.month("l_shipdate").cast("int").alias("mes"),
            F.date_trunc("month", F.col("l_shipdate")).cast("date").alias("data_inicio_mes"),
        )
        .agg(
            dsum(_sp_qty(), "volume_total_mensal"),
            davg(_sp_price(), "preco_medio_fechamento_mensal"),
            F.max(_sp_price()).cast(AGG_DECIMAL).alias("maximo_mensal"),
            F.min(_sp_price()).cast(AGG_DECIMAL).alias("minimo_mensal"),
        )
        .orderBy("sigla", "ano", "mes")
    )


@query(
    "q06_revenue_forecast",
    oracle=f"""
    SELECT CAST(SUM(CAST({_PRICE} * {_DISC} AS DECIMAL(22,8))) AS DECIMAL(38,6))
               AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
)
def q06_revenue_forecast(spark, sf_dir):
    """Selective filter + single global aggregate (TPC-H Q6 class).

    All three predicates push into the parquet scan (PushedFilters); the
    aggregation is a two-stage partial/final with one row of shuffle."""
    li = t(spark, sf_dir, "lineitem")
    filtered = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    )
    revenue = (dec("l_extendedprice") * dec("l_discount", 8, 4)).cast("decimal(22,8)")
    return filtered.agg(
        dsum(revenue, "revenue"), F.count(F.lit(1)).alias("n_rows")
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "q03_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({_DISC_PRICE}) AS DECIMAL(38,6)) AS revenue,
           CAST(o_orderdate AS DATE) AS o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q03_shipping_priority(spark, sf_dir):
    """3-way join + grouped agg + top-k (TPC-H Q3 class).

    customer is a dimension → broadcast; orders⋈lineitem shuffles on the
    order key. The final ORDER BY ... LIMIT becomes TakeOrderedAndProject
    (no global sort materialization). Deterministic tiebreak on l_orderkey
    because revenue is exact decimal."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_sp_disc_price(), "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q04_order_priority(spark, sf_dir):
    """EXISTS as a left-semi join (TPC-H Q4 class).

    Semi joins carry no payload from the probe side across the shuffle —
    the cheapest join flavor for existence checks at scale."""
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    big_items = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(big_items, orders.o_orderkey == big_items.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q05_region_revenue",
    oracle=f"""
    SELECT n_name,
           CAST(SUM({_DISC_PRICE}) AS DECIMAL(38,6)) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q05_region_revenue(spark, sf_dir):
    """6-table star join (TPC-H Q5 class).

    region/nation/supplier/customer are dimensions → broadcast hash joins;
    only orders⋈lineitem shuffles. The r_name filter prunes before the
    broadcast, so the broadcast side is minimal."""
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = t(spark, sf_dir, "nation")
    supplier = t(spark, sf_dir, "supplier")
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (li.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_sp_disc_price(), "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "q_left_join_nulls",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS n_rows,
           COUNT(o_orderkey) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,6))
               AS total_spend,
           SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS n_customers_no_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q_left_join_nulls(spark, sf_dir):
    """Left outer join with NULL-aware aggregation (COUNT(col) vs COUNT(*))."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    joined = cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
    return (
        joined.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("o_orderkey").alias("n_orders"),
            dsum(dec("o_totalprice"), "total_spend"),
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias(
                "n_customers_no_orders"
            ),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q_anti_join",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers_without_orders
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_anti_join(spark, sf_dir):
    """NOT EXISTS as a left-anti join."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers_without_orders"))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# MERGE semantics (J1/J2) — the reference's correctness-critical primitives
# ---------------------------------------------------------------------------

_MERGE_CTES = """
    WITH tgt AS (
        SELECT o_orderkey,
               CAST(o_totalprice AS DECIMAL(18,4)) AS val,
               o_orderstatus AS status
        FROM orders WHERE o_orderkey % 3 = 0
    ), src AS (
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 2 AS DECIMAL(18,4)) AS val,
               'U' AS status
        FROM orders WHERE o_orderkey % 2 = 0
    )
"""


def _merge_frames(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    tgt = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        dec("o_totalprice").alias("val"),
        F.col("o_orderstatus").alias("status"),
    )
    src = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        (dec("o_totalprice") * 2).cast("decimal(18,4)").alias("val"),
        F.lit("U").alias("status"),
    )
    return tgt, src


@query(
    "q_merge_upsert",
    oracle=_MERGE_CTES
    + """
    SELECT t.o_orderkey, t.val, t.status FROM tgt t
    WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.o_orderkey = t.o_orderkey)
    UNION ALL
    SELECT o_orderkey, val, status FROM src
    """,
)
def q_merge_upsert(spark, sf_dir):
    """Upsert MERGE (J2): dbt incremental unique_key semantics
    (daily_stocks.sql:2-5) — update-or-insert, source wins on key match.
    Runs the engine's join-algebra merge operator."""
    tgt, src = _merge_frames(spark, sf_dir)
    return merge_upsert(tgt, src, ["o_orderkey"])


@query(
    "q_merge_insert_only",
    oracle=_MERGE_CTES
    + """
    SELECT o_orderkey, val, status FROM tgt
    UNION ALL
    SELECT s.o_orderkey, s.val, s.status FROM src s
    WHERE NOT EXISTS (SELECT 1 FROM tgt t WHERE t.o_orderkey = s.o_orderkey)
    """,
)
def q_merge_insert_only(spark, sf_dir):
    """Insert-only dedup MERGE (J1): whenNotMatchedInsertAll semantics
    (ingest_stocks.py:84-100) — append only keys absent from the target."""
    tgt, src = _merge_frames(spark, sf_dir)
    return merge_insert_only(tgt, src, ["o_orderkey"])


# ---------------------------------------------------------------------------
# Incremental watermark (P3/P7/A1/A2)
# ---------------------------------------------------------------------------


@query(
    "q_watermark_incremental",
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n_rows,
           CAST(SUM({_QTY}) AS DECIMAL(38,6)) AS sum_qty
    FROM lineitem
    WHERE l_shipdate > (SELECT MAX(o_orderdate) FROM orders
                        WHERE o_orderstatus = 'F')
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_watermark_incremental(spark, sf_dir):
    """Incremental watermark predicate with a scalar subquery.

    The reference's incremental pattern (transforme_stock_silver.py:80-83;
    daily_stocks.sql:29-32): MAX(key) from one table bounds the scan of
    another. Catalyst plans the subquery as a one-row broadcast; on a
    partitioned/Delta table the bound literal enables file skipping."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,6))
                   AS sum_qty
        FROM lineitem
        WHERE l_shipdate > (SELECT MAX(o_orderdate) FROM orders
                            WHERE o_orderstatus = 'F')
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


# ---------------------------------------------------------------------------
# Reference silver-model semantics (P4/P5/P6 + F5/F6/F7/F8)
# ---------------------------------------------------------------------------


@query(
    "q_silver_cleaning",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_shipdate AS DATE)  AS data_pregao,
           UPPER(TRIM(l_returnflag)) AS sigla_empresa,
           CAST(l_extendedprice AS DECIMAL(30,8)) AS valor_abertura,
           CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                * CAST(1 - CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(8,4))
                AS DECIMAL(30,8)) AS valor_fechamento,
           CAST(l_quantity AS DECIMAL(30,8)) AS volume_negociado,
           CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                     * CAST(1 - CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(8,4))
                     AS DECIMAL(30,8))
                - CAST(l_extendedprice AS DECIMAL(30,8))
                AS DECIMAL(30,8)) AS variacao_dia_abs,
           ROUND(CASE WHEN l_extendedprice <> 0
                      THEN (CAST(l_extendedprice AS DOUBLE) * (1 - l_discount)
                            - l_extendedprice) / l_extendedprice
                 END, 6) AS variacao_dia_perc,
           CASE WHEN l_discount <> 0
                THEN ROUND(l_quantity / l_discount, 6) END AS qty_por_desconto
    FROM lineitem
    WHERE l_quantity > 0 AND l_extendedprice > 0
    """,
)
def q_silver_cleaning(spark, sf_dir):
    """The reference's silver cleaning model (daily_stocks.sql:7-27 +
    transforme_stock_silver.py:109-127): projection+rename, quality filter
    (volume>0 AND close>0), decimal(30,8) money casts, string normalization,
    close-open variation, and SAFE_DIVIDE null-on-zero semantics — re-keyed
    onto lineitem. Row-level (no aggregation), so the oracle checks every
    row's cleaned values."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
    )
    abertura = money("l_extendedprice")
    fechamento = _sp_disc_price().cast("decimal(30,8)")
    variacao = (fechamento - abertura).cast("decimal(30,8)")
    # Float-path variation ratio: plain double math (deterministic — one
    # expression tree, no aggregation), rounded to 6dp on both sides.
    perc = F.round(
        safe_divide(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            - F.col("l_extendedprice"),
            F.col("l_extendedprice"),
        ),
        6,
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_shipdate").cast("date").alias("data_pregao"),
        normalize_symbol("l_returnflag").alias("sigla_empresa"),
        abertura.alias("valor_abertura"),
        fechamento.alias("valor_fechamento"),
        money("l_quantity").alias("volume_negociado"),
        variacao.alias("variacao_dia_abs"),
        perc.alias("variacao_dia_perc"),
        F.round(safe_divide("l_quantity", "l_discount"), 6).alias("qty_por_desconto"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / distinct / set ops
# ---------------------------------------------------------------------------


@query(
    "q_sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q_sort_limit(spark, sf_dir):
    """Global top-k: Catalyst compiles ORDER BY+LIMIT to
    TakeOrderedAndProject — per-partition heaps, no full sort/shuffle."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@query(
    "q_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def q_distinct(spark, sf_dir):
    """DISTINCT = hash aggregation on all columns (map-side partials)."""
    return t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@query(
    "q_set_ops",
    oracle="""
    WITH a AS (SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 6000),
         b AS (SELECT s_nationkey AS nk FROM supplier)
    SELECT 'union' AS op, nk FROM (SELECT nk FROM a UNION SELECT nk FROM b)
    UNION ALL
    SELECT 'intersect' AS op, nk FROM (SELECT nk FROM a INTERSECT SELECT nk FROM b)
    UNION ALL
    SELECT 'except' AS op, nk FROM (SELECT nk FROM a EXCEPT SELECT nk FROM b)
    """,
)
def q_set_ops(spark, sf_dir):
    """UNION / INTERSECT / EXCEPT (distinct set semantics).

    Spark plans these as aggregations/joins on the full row — at scale,
    INTERSECT/EXCEPT shuffle both sides on all columns."""
    a = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 6000)
        .select(F.col("c_nationkey").alias("nk"))
    )
    b = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return (
        a.union(b).distinct().withColumn("op", F.lit("union"))
        .unionByName(a.intersect(b).withColumn("op", F.lit("intersect")))
        .unionByName(a.subtract(b).withColumn("op", F.lit("except")))
        .select("op", "nk")
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "q_window_topk",
    oracle="""
    SELECT l_suppkey, rnk, l_orderkey, l_linenumber, l_extendedprice
    FROM (
        SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
               ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                  ORDER BY l_extendedprice DESC,
                                           l_orderkey, l_linenumber) AS rnk
        FROM lineitem
    ) WHERE rnk <= 3
    """,
)
def q_window_topk(spark, sf_dir):
    """Top-k per group via ROW_NUMBER — one shuffle on the partition key;
    Spark 3.5+ pushes the rnk<=3 predicate into the window sort (window
    group limit), so only k rows per group survive the sort."""
    w = Window.partitionBy("l_suppkey").orderBy(
        F.desc("l_extendedprice"), "l_orderkey", "l_linenumber"
    )
    return (
        t(spark, sf_dir, "lineitem")
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
        .select("l_suppkey", "rnk", "l_orderkey", "l_linenumber", "l_extendedprice")
    )


@query(
    "q_window_running_lag",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER (
                PARTITION BY l_suppkey
                ORDER BY l_shipdate, l_orderkey, l_linenumber,
                         l_quantity, l_extendedprice
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DECIMAL(38,6)) AS running_qty,
           CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                - LAG(CAST(l_extendedprice AS DECIMAL(18,4))) OVER (
                    PARTITION BY l_suppkey
                    ORDER BY l_shipdate, l_orderkey, l_linenumber,
                             l_quantity, l_extendedprice)
             AS DECIMAL(19,4)) AS price_delta
    FROM lineitem
    """,
)
def q_window_running_lag(spark, sf_dir):
    """Running SUM + LAG delta (the reference computes day-over-day variation
    arithmetically, daily_stocks.sql:17-18 — windows give it directly).
    The ORDER BY ends with the value columns: (orderkey, linenumber) is NOT
    unique in the fixtures (118k dup pairs at sf0.1), so rows tying on all
    ordering columns must be interchangeable for the running sum and lag to
    be engine-deterministic."""
    w = Window.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber",
        "l_quantity", "l_extendedprice",
    )
    price = dec("l_extendedprice")
    return t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(_sp_qty())
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast(AGG_DECIMAL)
        .alias("running_qty"),
        (price - F.lag(price).over(w)).cast("decimal(19,4)").alias("price_delta"),
    )


# ---------------------------------------------------------------------------
# Pivot / rollup / grouping sets
# ---------------------------------------------------------------------------


@query(
    "q_pivot",
    oracle=f"""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN {_QTY} END)
                AS DECIMAL(38,6)) AS qty_open,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN {_QTY} END)
                AS DECIMAL(38,6)) AS qty_filled
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_pivot(spark, sf_dir):
    """PIVOT on a known value domain — compiles to conditional aggregation
    (one pass, no extra shuffle vs. the groupBy)."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(_sp_qty()))
        .select(
            "l_returnflag",
            F.col("O").cast(AGG_DECIMAL).alias("qty_open"),
            F.col("F").cast(AGG_DECIMAL).alias("qty_filled"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_rollup",
    oracle="""
    SELECT r_name, n_name,
           CAST(GROUPING(r_name) AS INT) AS g_region,
           CAST(GROUPING(n_name) AS INT) AS g_nation,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def q_rollup(spark, sf_dir):
    """ROLLUP hierarchy totals with GROUPING indicators — Spark expands to
    grouping sets inside a single hash aggregation."""
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.grouping("r_name").cast("int").alias("g_region"),
        F.grouping("n_name").cast("int").alias("g_nation"),
        F.count(F.lit(1)).alias("n_customers"),
        dsum(dec("c_acctbal"), "total_bal"),
    ).select("r_name", "n_name", "g_region", "g_nation", "n_customers", "total_bal")


# ---------------------------------------------------------------------------
# Scalar function surface (F1-F12) + JSON + time bucketing
# ---------------------------------------------------------------------------


@query(
    "q_date_functions",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT)    AS yr,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(month(o_orderdate) AS INT)   AS mo,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           MIN(CAST(o_orderdate AS DATE)) AS first_day,
           MAX(CAST(o_orderdate AS DATE)) AS last_day,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1, 2, 3, 4
    ORDER BY yr, mo
    """,
)
def q_date_functions(spark, sf_dir):
    """Date/time scalar surface: year/quarter/month extraction, DATE_TRUNC,
    date casts (SURVEY F1/F2/F9/F10)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.quarter("o_orderdate").cast("int").alias("qtr"),
            F.month("o_orderdate").cast("int").alias("mo"),
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        )
        .agg(
            F.min(F.col("o_orderdate").cast("date")).alias("first_day"),
            F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("yr", "mo")
    )


@query(
    "q_string_functions",
    oracle=r"""
    SELECT p_partkey,
           UPPER(p_brand)  AS brand_uc,
           LOWER(p_type)   AS type_lc,
           TRIM(p_name)    AS name_trim,
           SUBSTRING(p_name, 1, 8) AS name_prefix,
           CAST(LENGTH(p_name) AS INT) AS name_len,
           CONCAT_WS('|', p_brand, p_type) AS brand_type,
           REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS name_novowel,
           CAST(LEN(STRING_SPLIT(p_name, ' ')) AS INT) AS n_words,
           REPLACE(p_type, ' ', '_') AS type_snake
    FROM part
    """,
)
def q_string_functions(spark, sf_dir):
    """String scalar surface: case folding, trim, substring, length, concat,
    regex replace, split (SURVEY F5/F11 class)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        F.lower("p_type").alias("type_lc"),
        F.trim("p_name").alias("name_trim"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("int").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
        F.size(F.split("p_name", " ")).cast("int").alias("n_words"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
    )


@query(
    "q_case_null_handling",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS tier,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(masked)') AS segment_masked,
           CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END AS bal_is_null,
           LEAST(c_acctbal, 1000.0)    AS bal_capped,
           GREATEST(c_acctbal, 0.0)    AS bal_floor
    FROM customer
    """,
)
def q_case_null_handling(spark, sf_dir):
    """CASE/COALESCE/NULLIF/LEAST/GREATEST — the null-handling scalar set."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("(masked)")).alias(
            "segment_masked"
        ),
        F.when(F.col("c_acctbal").isNull(), 1).otherwise(0).alias("bal_is_null"),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).alias("bal_capped"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor"),
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS total_value
    FROM events
    GROUP BY 1
    ORDER BY k_mod
    """,
)
def q_json_extract(spark, sf_dir):
    """JSON scalar access over a string column (events.props) — the
    reference parses API JSON driver-side (ingest_stocks.py:51-63); in-engine
    the same capability is get_json_object/from_json."""
    e = t(spark, sf_dir, "events")
    return (
        e.select(
            (F.get_json_object("props", "$.k").cast("int") % 10).alias("k_mod"),
            F.col("value"),
        )
        .groupBy("k_mod")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(dec("value", 18, 6), "total_value"),
        )
        .orderBy("k_mod")
    )


@query(
    "q_tumbling_window",
    oracle="""
    SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))) AS BIGINT)
               AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
)
def q_tumbling_window(spark, sf_dir):
    """Tumbling 1-hour event-time window (batch form of the streaming
    operator — same F.window used under readStream + withWatermark in
    personal_data_lakehouse_spark.streaming)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(dec("value", 18, 6), "total_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )

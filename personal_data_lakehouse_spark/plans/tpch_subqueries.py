"""TPC-H subquery-heavy shapes adapted to the fixture schema (Q13 / Q16 /
Q17 / Q19 / Q21 / Q22 analogues).

These exercise the decorrelation and null-aware paths the rest of the
suite doesn't: filtered LEFT JOIN + double aggregation (Q13), NOT IN with
a null-free key set (Q16), a correlated scalar aggregate subquery (Q17),
disjunctive multi-column join predicates (Q19), EXISTS + NOT EXISTS on the
same correlated relation (Q21), and a scalar-threshold + anti-join combo
(Q22).  The fixture schema (FIXTURES.md §A) lacks `l_receiptdate`,
`l_commitdate`, `p_container` and `partsupp`, so the selective predicates
are re-expressed over columns that exist: `l_returnflag` substitutes the
late-delivery flag in Q21, the part-supplier relation is derived through
`lineitem`, and Q22's "no recent orders" uses a plain NOT EXISTS.

Determinism rules (registry docstring): money sums in DECIMAL; Q17's
quantity threshold is exact because fixture quantities are integral
doubles (verified: no fractional l_quantity), so AVG is an exact-integer
sum over a count; Q22 avoids cross-engine AVG typing by comparing
`bal * count > sum` in pure decimal arithmetic.

Reference parity anchors (SURVEY §2.3 J3-J∀, §2.4): the reference itself
has no joins or subqueries — these are the implied engine surface cited at
`pipelines/ativos_financeiro_csv/README.md:24` (dimensional/fact model) —
so each is built Spark-first and checked against a DuckDB oracle.

Scale notes: Q13's left join shuffles on custkey (both sides big — fine);
Q16 broadcasts the negative-balance supplier keyset for a null-free
anti-join; Q17/Q21's correlated subqueries decorrelate into aggregate +
self-join on the correlation key (orderkey/partkey — the natural shuffle
key, co-partitioned with the probe side); Q19's disjunction stays inside
one scan's pushed filter; Q22's scalar aggregates broadcast.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from personal_data_lakehouse_spark.functions import AGG_DECIMAL, dec, dsum
from personal_data_lakehouse_spark.plans.registry import query, t

# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (filtered LEFT JOIN, agg-of-agg)


@query(
    "q13_custdist",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey) x
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_custdist(spark, sf_dir):
    """TPC-H Q13 shape: how many customers placed k non-urgent orders —
    the join predicate (not a WHERE) keeps order-less customers as
    c_count=0; second aggregation is tiny (distinct counts)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q16 — supplier count per part attribute, NOT IN exclusion


@query(
    "q16_supplier_cnt",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#21'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_cnt(spark, sf_dir):
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size) bucket,
    excluding one brand and suppliers in deficit.  The NOT IN key set is
    null-free, so it lowers to a broadcast anti-join (no null-aware
    fallback); the part-supplier relation is derived through lineitem
    (fixtures carry no partsupp table)."""
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#21")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    li = t(spark, sf_dir, "lineitem")
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity revenue via correlated scalar aggregate subquery


@query(
    "q17_small_qty_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,6))
               AS small_qty_revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue from orders far below a part's average
    quantity.  Expressed as a correlated scalar subquery so Catalyst
    decorrelates it into an aggregate + join on l_partkey; exact across
    engines because fixture quantities are integral (AVG = exact-integer
    sum / count, identical IEEE division both sides)."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("x_q17_li")
    t(spark, sf_dir, "part").createOrReplaceTempView("x_q17_p")
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                    AS DECIMAL(38,6)) AS small_qty_revenue,
               COUNT(*) AS n_items
        FROM x_q17_li JOIN x_q17_p ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                            FROM x_q17_li l2 WHERE l2.l_partkey = p_partkey)
        """
    )


# ---------------------------------------------------------------------------
# Q19 — disjunctive multi-column predicate over a fact-dim join


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
               * CAST(1 - CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(8,4))
               AS DECIMAL(22,8))) AS DECIMAL(38,6)) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: revenue under three OR'd brand/size/quantity
    windows.  Catalyst extracts the common sub-predicates per side
    (brand+size → part scan, quantity bounds → lineitem scan) so both
    scans still push filters despite the disjunction."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    rev = (
        dec("l_extendedprice")
        * (F.lit(1) - dec("l_discount", 8, 4)).cast("decimal(8,4)")
    ).cast("decimal(22,8)")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dsum(rev, "revenue"), F.count("*").alias("n_items"))
    )


# ---------------------------------------------------------------------------
# Q21 — EXISTS + NOT EXISTS on the same correlated relation


@query(
    "q21_sole_return_supplier",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q21_sole_return_supplier(spark, sf_dir):
    """TPC-H Q21 shape: suppliers solely responsible for the returned item
    on finalized multi-supplier orders (l_returnflag stands in for the
    reference schema's receipt-after-commit delay — fixtures carry no
    l_receiptdate).  EXISTS lowers to a left-semi and NOT EXISTS to a
    left-anti join, both shuffled on l_orderkey — the same key as the
    orders join, so AQE coalesces into one exchange."""
    t(spark, sf_dir, "supplier").createOrReplaceTempView("x_q21_s")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("x_q21_li")
    t(spark, sf_dir, "orders").createOrReplaceTempView("x_q21_o")
    return spark.sql(
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM x_q21_s
        JOIN x_q21_li l1 ON s_suppkey = l1.l_suppkey
        JOIN x_q21_o ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM x_q21_li l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM x_q21_li l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        """
    )


# ---------------------------------------------------------------------------
# Q22 — scalar-threshold + anti-join (idle rich customers)


@query(
    "q22_idle_customers",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(38,6))
               AS totacctbal
    FROM customer
    WHERE CAST(c_acctbal AS DECIMAL(18,4))
            * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0.0)
          > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4)))
             FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
)
def q22_idle_customers(spark, sf_dir):
    """TPC-H Q22 shape: customers with above-average balance and no
    orders, rolled up by nation.  The above-average test is written
    `bal * n > sum` in pure decimal so both engines compare exactly
    (cross-engine AVG would return different types); the two scalar
    aggregates broadcast, NOT EXISTS lowers to a left-anti join on
    custkey."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("x_q22_c")
    t(spark, sf_dir, "orders").createOrReplaceTempView("x_q22_o")
    return spark.sql(
        """
        SELECT c_nationkey, COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(38,6))
                   AS totacctbal
        FROM x_q22_c
        WHERE CAST(c_acctbal AS DECIMAL(18,4))
                * (SELECT COUNT(*) FROM x_q22_c WHERE c_acctbal > 0.0)
              > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4)))
                 FROM x_q22_c WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM x_q22_o WHERE o_custkey = c_custkey)
        GROUP BY c_nationkey
        """
    )

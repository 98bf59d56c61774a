"""SQL-surface operators, wave 5: LATERAL joins, recursive CTEs,
schema-evolution unions, declarative quality quarantine.

The reference's SQL layer is BigQuery via dbt (daily_stocks.sql,
monthly_stock_summary.sql) — plain select/join/aggregate. These queries
prove the engine's Spark SQL dialect carries the *modern* warehouse surface
a user would expect when they outgrow those two models: correlated LATERAL
subqueries (top-n-per-group without a window), WITH RECURSIVE traversals
(hierarchies — Spark 4 feature), unionByName with missing-column fill (the
schema-evolution read path matching Delta's mergeSchema write path, SURVEY
§1.4), and rule-based quarantine (the explicit form of the silver filter at
transforme_stock_silver.py:109-131).

Dialect note: Spark SQL and DuckDB SQL differ (integer division is ``div``
vs ``//``), so the Spark side is its own SQL text run through
``spark.sql`` over registered temp views — this module intentionally
exercises the SQL front door rather than the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from personal_data_lakehouse_spark.plans.registry import query, register_views, t

# ---------------------------------------------------------------------------
# LATERAL correlated subquery


@query(
    "q_lateral_topn",
    oracle="""
    SELECT n.n_name, c.c_name, c.c_acctbal
    FROM nation n, LATERAL (
        SELECT c_name, c_acctbal FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_name LIMIT 2
    ) c
    """,
)
def q_lateral_topn(spark, sf_dir):
    """Top-2 customers per nation through a correlated LATERAL subquery —
    the per-row-driven form of top-n-per-group (vs the window-function
    form in q_window_topk; both surfaces must exist for SQL parity).
    Catalyst decorrelates the lateral into a join + per-key limit, so the
    physical plan is the same shuffle-once shape the window gives — no
    nested-loop re-execution per outer row."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, c.c_name, c.c_acctbal
        FROM nation n, LATERAL (
            SELECT c_name, c_acctbal FROM customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_name LIMIT 2
        ) c
        """
    )


# ---------------------------------------------------------------------------
# Recursive CTE (hierarchy traversal)


@query(
    "q_recursive_hierarchy",
    oracle="""
    WITH RECURSIVE chain AS (
        SELECT s_suppkey, CAST(1 AS BIGINT) AS depth
        FROM supplier WHERE s_suppkey = 0
        UNION ALL
        SELECT s.s_suppkey, c.depth + 1
        FROM supplier s JOIN chain c ON s.s_suppkey // 10 = c.s_suppkey
        WHERE s.s_suppkey <> 0
    )
    SELECT depth, COUNT(*) AS n_nodes,
           CAST(MIN(s_suppkey) AS BIGINT) AS min_key,
           CAST(MAX(s_suppkey) AS BIGINT) AS max_key
    FROM chain GROUP BY depth
    """,
)
def q_recursive_hierarchy(spark, sf_dir):
    """WITH RECURSIVE traversal (Spark 4) of a synthetic supplier tree
    (parent = key div 10): per-depth node counts. Each recursion step is one
    self-join against the previous frontier — on a cluster the frontier is
    small and broadcast, so an L-level hierarchy costs L broadcast joins,
    not L shuffles. The iterative-DataFrame equivalent of the same pattern
    powers t_dedup_clusters (min-label propagation); this is the SQL front
    door for it."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
            SELECT s_suppkey, CAST(1 AS BIGINT) AS depth
            FROM supplier WHERE s_suppkey = 0
            UNION ALL
            SELECT s.s_suppkey, c.depth + 1
            FROM supplier s JOIN chain c ON s.s_suppkey div 10 = c.s_suppkey
            WHERE s.s_suppkey <> 0
        )
        SELECT depth, COUNT(*) AS n_nodes,
               CAST(MIN(s_suppkey) AS BIGINT) AS min_key,
               CAST(MAX(s_suppkey) AS BIGINT) AS max_key
        FROM chain GROUP BY depth
        """
    )


# ---------------------------------------------------------------------------
# Schema-evolution union (unionByName + missing-column fill)


@query(
    "q_union_by_name",
    oracle="""
    SELECT o_orderkey, o_totalprice, CAST(NULL AS DATE) AS o_orderdate
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def q_union_by_name(spark, sf_dir):
    """Read-side schema evolution: an old snapshot (no o_orderdate) unioned
    with a new snapshot by NAME, missing columns null-filled — the read
    path that makes the write path's mergeSchema (SURVEY §1.4, catalog
    write_table) safe to consume. Position-based UNION would silently
    misalign here; unionByName is the only correct tool once schemas
    drift."""
    orders = t(spark, sf_dir, "orders")
    old_snap = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    new_snap = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    return old_snap.unionByName(new_snap, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# Declarative quality quarantine


@query(
    "q_quality_quarantine",
    oracle="""
    SELECT doc_id,
           array_to_string(list_sort(list_filter([
               CASE WHEN NOT coalesce(n_chars >= 150, false) THEN 'too_short' END,
               CASE WHEN NOT coalesce(lang <> 'zh', false) THEN 'non_latin' END,
               CASE WHEN NOT coalesce(source <> 'src0', false) THEN 'blocked_source' END
           ], x -> x IS NOT NULL)), ',') AS failed_rules,
           CAST(len(list_filter([
               CASE WHEN NOT coalesce(n_chars >= 150, false) THEN 'too_short' END,
               CASE WHEN NOT coalesce(lang <> 'zh', false) THEN 'non_latin' END,
               CASE WHEN NOT coalesce(source <> 'src0', false) THEN 'blocked_source' END
           ], x -> x IS NOT NULL)) AS INT) AS n_failed
    FROM documents
    WHERE NOT coalesce(n_chars >= 150, false)
       OR NOT coalesce(lang <> 'zh', false)
       OR NOT coalesce(source <> 'src0', false)
    """,
)
def q_quality_quarantine(spark, sf_dir):
    """Rule-based quarantine over the corpus: every row evaluated against
    all rules in ONE codegen'd projection (operators/quality.py), failing
    rows routed out with the sorted list of violated rule names — Delta
    Live Tables expectations / dbt tests semantics, done as a dataflow
    split instead of a post-hoc assertion. Rules here mirror a latin-script
    training-data intake: minimum length, supported script, source
    allowlist.

    Presentation note (round-4 fix): the driver's canonicalizer hashes
    through pandas and cannot sort object-list columns, so the
    array<string> is joined to one comma-separated string on BOTH sides
    (array_sort upstream makes the join order deterministic)."""
    from personal_data_lakehouse_spark.operators.quality import validate

    docs = t(spark, sf_dir, "documents")
    rules = {
        "too_short": F.col("n_chars") >= 150,
        "non_latin": F.col("lang") != "zh",
        "blocked_source": F.col("source") != "src0",
    }
    _passing, quarantined = validate(docs, rules)
    return quarantined.select(
        "doc_id",
        F.array_join("failed_rules", ",").alias("failed_rules"),
        "n_failed",
    )


# ---------------------------------------------------------------------------
# Explicit cross / semi joins (DataFrame-API forms)


@query(
    "q_cross_join",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def q_cross_join(spark, sf_dir):
    """Explicit Cartesian product of the two smallest dims (5 × 25 rows) —
    the calendar×dimension scaffold shape. Deliberately BOTH-SIDES-TINY:
    a cross join's output is |L|·|R|, so the only scale-safe uses are
    small×small scaffolds (broadcast NL join, no shuffle) or a small side
    against a big side (broadcast); anything else is a design error the
    engine surfaces via spark.sql.crossJoin semantics rather than hides."""
    r = t(spark, sf_dir, "region").select("r_name")
    n = t(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@query(
    "q_semi_join_api",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    """,
)
def q_semi_join_api(spark, sf_dir):
    """DataFrame-API left_semi join (the SQL EXISTS/IN form is covered by
    q21/q_exists_subquery): customers with at least one big order. Semi
    joins ship NO payload from the probe side across the shuffle — at
    100 TB the orders side reduces to a distinct key stream, the cheapest
    possible existence check."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# NOT IN vs NOT EXISTS null semantics


@query(
    "q_not_in_null_semantics",
    oracle="""
    SELECT 'not_in_with_nulls' AS variant, COUNT(*) AS n FROM customer
    WHERE c_custkey NOT IN (
        SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL ELSE o_custkey END
        FROM orders)
    UNION ALL
    SELECT 'not_in_nulls_filtered', COUNT(*) FROM customer
    WHERE c_custkey NOT IN (
        SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL ELSE o_custkey END
        FROM orders
        WHERE CASE WHEN o_orderkey % 100 = 0 THEN NULL
                   ELSE o_custkey END IS NOT NULL)
    UNION ALL
    SELECT 'not_exists', COUNT(*) FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_not_in_null_semantics(spark, sf_dir):
    """The NOT IN null trap, stated as data: against a subquery containing
    ANY null, ``NOT IN`` is three-valued-logic false-or-unknown for every
    row (count = 0), while filtering the nulls or using NOT EXISTS gives
    the intended anti-join. All three variants in one result so the
    semantic contract is hash-verified, not just documented. Physically
    Spark runs the null-aware NOT IN as a null-aware anti join (single
    broadcast when the subquery is small) — same cost class as the anti
    join, with the null check folded in."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT 'not_in_with_nulls' AS variant, COUNT(*) AS n FROM customer
        WHERE c_custkey NOT IN (
            SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL ELSE o_custkey END
            FROM orders)
        UNION ALL
        SELECT 'not_in_nulls_filtered', COUNT(*) FROM customer
        WHERE c_custkey NOT IN (
            SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL ELSE o_custkey END
            FROM orders
            WHERE CASE WHEN o_orderkey % 100 = 0 THEN NULL
                       ELSE o_custkey END IS NOT NULL)
        UNION ALL
        SELECT 'not_exists', COUNT(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """
    )

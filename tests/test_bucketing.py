"""Bucketed co-located join: the shuffle-elimination strategy SCALE.md
prescribes for repeated fact-fact joins — proven by plan inspection, not
assertion by documentation."""

from __future__ import annotations

from pyspark.sql import functions as F

from personal_data_lakehouse_spark.plans.registry import t
from tests.conftest import SF_DIR


def test_bucketed_join_is_shuffle_free(spark):
    orders = t(spark, SF_DIR, "orders")
    li = t(spark, SF_DIR, "lineitem")
    spark.sql("CREATE DATABASE IF NOT EXISTS buckets")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("buckets.orders_b")
    )
    (
        li.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("buckets.lineitem_b")
    )
    # bucketed-side scans must not re-shuffle for the equi-join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("buckets.lineitem_b").join(
            spark.table("buckets.orders_b"), "o_orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and it still computes the right thing
        expected = li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )

"""Quality validation operator: split invariants, null-predicate handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from personal_data_lakehouse_spark.operators.quality import validate, with_validation
from tests.conftest import SF_DIR


def test_validate_partitions_input(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rules = {
        "too_short": F.col("n_chars") >= 150,
        "non_latin": F.col("lang") != "zh",
    }
    passing, quarantined = validate(docs, rules)
    n, p, q = docs.count(), passing.count(), quarantined.count()
    assert p + q == n and q > 0 and p > 0
    # passing branch drops the bookkeeping columns, schema preserved
    assert passing.columns == docs.columns
    # every quarantined row names at least one rule, sorted
    for r in quarantined.select("failed_rules").collect()[:100]:
        assert len(r.failed_rules) >= 1
        assert r.failed_rules == sorted(r.failed_rules)


def test_null_predicate_counts_as_failure(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, -1)], "id int, v int"
    )
    v = with_validation(df, {"v_positive": F.col("v") > 0})
    got = {r.id: r.n_failed for r in v.collect()}
    # NULL comparison result must quarantine, not pass
    assert got == {1: 0, 2: 1, 3: 1}


def test_observed_write_single_pass_metrics(spark, tmp_path):
    """observe() collects the gate metrics during the write action itself —
    values must equal a direct recount, with no second scan issued by the
    operator (the only job is the write)."""
    from pyspark.sql import functions as F

    from personal_data_lakehouse_spark.operators.quality import observed_write
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rules = {
        "long_enough": F.col("n_chars") >= 150,
        "known_source": F.col("source") != "src0",
    }
    out = str(tmp_path / "observed_out")
    metrics = observed_write(
        docs, rules, lambda d: d.write.mode("overwrite").parquet(out)
    )
    n = docs.count()
    n_fail = docs.filter(
        (F.col("n_chars") < 150) | (F.col("source") == "src0")
    ).count()
    assert metrics["n_rows"] == n
    assert metrics["n_failed_rows"] == n_fail
    assert metrics["failed_long_enough"] == docs.filter(
        F.col("n_chars") < 150
    ).count()
    assert metrics["failed_known_source"] == docs.filter(
        F.col("source") == "src0"
    ).count()
    # the written table carries every input row (observation is pass-through)
    assert spark.read.parquet(out).count() == n

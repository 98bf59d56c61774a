"""End-to-end medallion lifecycle: ingest → bronze MERGE → silver → gold,
run twice to prove replay idempotency (the reference's daily-retry
safety property)."""

from __future__ import annotations

from decimal import Decimal

from personal_data_lakehouse_spark.pipelines import daily_pipeline

SERIES = {
    "pETR4": {
        "2024-01-02": {"1. open": "10.0", "2. high": "11.0", "3. low": "9.5",
                       "4. close": "10.5", "5. volume": "1000"},
        "2024-01-03": {"1. open": "10.5", "2. high": "12.0", "3. low": "10.0",
                       "4. close": "11.5", "5. volume": "1500"},
        "2024-02-01": {"1. open": "11.5", "2. high": "11.6", "3. low": "11.0",
                       "4. close": "11.2", "5. volume": "800"},
        # zero volume → silver quality filter drops it
        "2024-02-02": {"1. open": "11.2", "2. high": "11.2", "3. low": "11.2",
                       "4. close": "11.2", "5. volume": "0"},
    },
    "vale3 ": {  # lower/space → silver upper(trim) normalization
        "2024-01-02": {"1. open": "60.0", "2. high": "61.0", "3. low": "59.0",
                       "4. close": "0.0", "5. volume": "5000"},  # close=0 dropped
        "2024-01-03": {"1. open": "60.0", "2. high": "63.0", "3. low": "60.0",
                       "4. close": "62.0", "5. volume": "7000"},
    },
}


def fake_fetcher(symbol: str):
    return SERIES[symbol]


def test_daily_pipeline_end_to_end_and_idempotent(spark):
    # session-scoped warehouse is shared across test modules — start clean
    for tbl in (
        "bronze.raw_stock_daily",
        "silver.daily_stocks",
        "gold.monthly_summary",
    ):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    counts1 = daily_pipeline(spark, list(SERIES), fake_fetcher)
    # bronze keeps raw rows incl. the filtered ones; silver drops 2; gold =
    # distinct (ticker, month) among surviving rows: pETR4 ×2 + VALE3 ×1.
    assert counts1 == {"bronze": 6, "silver": 4, "gold": 3}

    counts2 = daily_pipeline(spark, list(SERIES), fake_fetcher)
    assert counts2 == counts1  # replay inserts/changes nothing

    gold = {
        (r.sigla_empresa, r.ano, r.mes): r
        for r in spark.table("gold.monthly_summary").collect()
    }
    jan = gold[("PETR4", 2024, 1)]
    assert jan.volume_total_mensal == Decimal("2500.00000000")
    assert jan.maximo_mensal == Decimal("12.00000000")
    assert jan.minimo_mensal == Decimal("9.50000000")
    assert abs(float(jan.preco_medio_fechamento_mensal) - 11.0) < 1e-9
    assert ("VALE3", 2024, 1) in gold  # normalized symbol survived
    assert ("VALE3", 2024, 2) not in gold

    silver = spark.table("silver.daily_stocks")
    pct = {
        (r.sigla_empresa, str(r.data_pregao)): r.variacao_dia_perc
        for r in silver.collect()
    }
    assert abs(pct[("PETR4", "2024-01-02")] - 0.05) < 1e-9


def test_streaming_medallion_quality_clustered(spark, tmp_path):
    """Streaming medallion glue: bronze event stream → declarative quality
    split → clustered silver write + quarantine table, all inside one
    foreachBatch — the streaming form of the reference's daily pipeline
    with round-2 operators (quality.validate, maintenance.clustered_write)
    doing the silver step."""
    from pyspark.sql import functions as F

    from personal_data_lakehouse_spark.operators.maintenance import (
        clustered_write,
        file_stats,
    )
    from personal_data_lakehouse_spark.operators.quality import validate
    from personal_data_lakehouse_spark.plans.registry import t
    from personal_data_lakehouse_spark.streaming.windows import stream_events
    from tests.conftest import SF_DIR

    silver = str(tmp_path / "silver")
    quarantine = str(tmp_path / "quarantine")
    rules = {
        "value_present": F.col("value").isNotNull(),
        "value_in_range": F.col("value") < 400.0,
        "known_type": F.col("event_type") != "error",
    }

    def medallion_batch(batch, epoch_id):
        passing, failed = validate(batch, rules)
        clustered_write(passing, silver, cluster_by=["user_id"], target_files=4)
        failed.write.mode("overwrite").parquet(quarantine)

    q = (
        stream_events(spark, f"{SF_DIR}/events.parquet")
        .writeStream.foreachBatch(medallion_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    ev = t(spark, SF_DIR, "events")
    ok = ev.filter(
        F.col("value").isNotNull()
        & (F.col("value") < 400.0)
        & (F.col("event_type") != "error")
    )
    got_silver = spark.read.parquet(silver)
    got_quar = spark.read.parquet(quarantine)
    assert got_silver.count() == ok.count() > 0
    assert got_quar.count() == ev.count() - ok.count() > 0
    # silver came out clustered: disjoint user_id ranges across files
    ranges = sorted(
        (r.key_min, r.key_max)
        for r in file_stats(spark, silver, key="user_id").collect()
    )
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo
    # quarantine rows carry machine-readable reasons
    assert got_quar.filter(F.size("failed_rules") == 0).count() == 0


def test_cli_backfill_runs_range_and_preserves_watermark(spark, tmp_path):
    """`python -m personal_data_lakehouse_spark backfill --start --end`:
    one pipeline run per day in the inclusive range, exit 0, and the
    scheduler watermark in the state file is untouched (backfill re-runs
    history; tick owns progression)."""
    import json

    from personal_data_lakehouse_spark.__main__ import main

    state = tmp_path / "sched.json"
    state.write_text('{"last_success": "2026-08-10T00:00:00+00:00"}')
    rc = main(
        [
            "backfill",
            "--start",
            "2026-08-01",
            "--end",
            "2026-08-02",
            "--state",
            str(state),
        ]
    )
    assert rc == 0
    assert json.loads(state.read_text())["last_success"].startswith("2026-08-10")

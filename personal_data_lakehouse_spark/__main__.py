"""CLI runner: ``python -m personal_data_lakehouse_spark run-daily``.

The operational surface SURVEY §2 G2 scopes out of the engine core — the
reference runs its pipeline under Airflow's @daily/1-retry/no-catchup
policy (``daily_lakehouse_pipeline.py:24-38``); here the same policy lives
in scheduler.SchedulePolicy and this CLI is the tick an external cron (or a
human) invokes:

    python -m personal_data_lakehouse_spark run-daily \
        --state /tmp/sched.json [--catchup] [--retries 1] [--full-refresh]

Each tick loads the scheduler state, runs every due logical date through
the medallion pipeline (idempotent by construction, so crash-rerun is
safe), and writes the state back. ``--fetcher demo`` uses a deterministic
offline quote source so the CLI is runnable in this sandbox; a real
deployment injects an HTTP fetcher (io/rest.py contract).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from datetime import datetime, timezone


def _demo_fetcher(symbol: str):
    """Deterministic offline stand-in for the REST quote API (shared with
    the stock_rest Python data source)."""
    from personal_data_lakehouse_spark.io.pysource import demo_series

    return demo_series(symbol)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="personal_data_lakehouse_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    run = sub.add_parser("run-daily", help="scheduler tick for the daily pipeline")
    bf = sub.add_parser(
        "backfill",
        help="re-run a historical date range (airflow dags backfill parity); "
        "the schedule watermark is not moved",
    )
    for cmd in (run, bf):
        cmd.add_argument("--state", default=None, help="scheduler state JSON path")
        cmd.add_argument("--retries", type=int, default=1)
        cmd.add_argument("--full-refresh", action="store_true")
        cmd.add_argument("--symbols", default="AAPL,MSFT")
        cmd.add_argument("--fetcher", choices=["demo"], default="demo")
        cmd.add_argument("--warehouse", default=None, help="warehouse directory")
    run.add_argument("--catchup", action="store_true")
    run.add_argument("--now", default=None, help="ISO timestamp override (tests)")
    bf.add_argument("--start", required=True, help="first logical date (ISO)")
    bf.add_argument("--end", required=True, help="last logical date (ISO)")
    corpus = sub.add_parser(
        "corpus", help="run the training-corpus DAG over a documents table"
    )
    corpus.add_argument("--docs", required=True, help="documents parquet path")
    corpus.add_argument("--namespace", default="corpus")
    corpus.add_argument("--warehouse", default=None, help="warehouse directory")
    args = p.parse_args(argv)

    from personal_data_lakehouse_spark.pipelines import daily_pipeline
    from personal_data_lakehouse_spark.scheduler import (
        SchedulePolicy,
        ScheduledRunner,
    )
    from personal_data_lakehouse_spark.session import get_spark

    spark = get_spark(app_name="pdl-cli", warehouse_dir=args.warehouse)

    if args.cmd == "corpus":
        from personal_data_lakehouse_spark.corpus import corpus_pipeline

        stages = corpus_pipeline(
            spark, spark.read.parquet(args.docs), namespace=args.namespace
        )
        print(json.dumps(stages))
        return 0

    symbols = [s for s in args.symbols.split(",") if s]

    def task(logical_date: datetime) -> None:
        counts = daily_pipeline(
            spark, symbols, _demo_fetcher, full_refresh=args.full_refresh
        )
        print(f"{logical_date.date()}: {counts}")

    runner = ScheduledRunner(
        task=task,
        policy=SchedulePolicy(
            retries=args.retries, catchup=getattr(args, "catchup", False)
        ),
        # The CLI is a cron-style tick invoker: retry immediately rather
        # than blocking the tick for retry_delay (a daemonized invoker
        # that wants real spacing passes time.sleep — the default).
        sleep=lambda _s: None,
    )
    if args.state and os.path.exists(args.state):
        runner.load_state_json(open(args.state).read())

    def as_utc(s: str) -> datetime:
        # aware inputs are CONVERTED to UTC (replace() would silently
        # reinterpret the wall time and can shift the logical-date floor
        # by a day); naive inputs are taken as UTC
        d = datetime.fromisoformat(s)
        return (
            d.astimezone(timezone.utc)
            if d.tzinfo
            else d.replace(tzinfo=timezone.utc)
        )

    if args.cmd == "backfill":
        reports = runner.backfill(as_utc(args.start), as_utc(args.end))
    else:
        reports = runner.tick(as_utc(args.now) if args.now else None)
    for r in reports:
        print(json.dumps(r.__dict__))
    if args.state:
        with open(args.state, "w") as f:
            f.write(runner.state_json())
    return 1 if any(r.status == "failed" for r in reports) else 0


if __name__ == "__main__":
    sys.exit(main())

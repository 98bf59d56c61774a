"""G2 scheduler semantics: @daily data intervals, no-catchup suppression,
bounded retries, crash-restart state round-trip. Pure-Python (injectable
clock) — no sleeps, no Spark."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from personal_data_lakehouse_spark.scheduler import (
    RunReport,
    SchedulePolicy,
    ScheduledRunner,
)

UTC = timezone.utc


def dt(*args):
    return datetime(*args, tzinfo=UTC)


def test_daily_interval_runs_once_per_elapsed_day():
    runs = []
    r = ScheduledRunner(task=runs.append, last_success=dt(2026, 8, 10))
    # tick mid-day on the 12th: the 11th has fully elapsed, the 12th has not
    reports = r.tick(dt(2026, 8, 12, 9, 30))
    assert [x.status for x in reports] == ["success"]
    assert runs == [dt(2026, 8, 11)]
    # same-day second tick: nothing new is due (idempotent heartbeat)
    assert r.tick(dt(2026, 8, 12, 23, 59)) == []


def test_no_catchup_skips_backlog_runs_latest_only():
    runs = []
    r = ScheduledRunner(task=runs.append, last_success=dt(2026, 8, 1))
    reports = r.tick(dt(2026, 8, 12, 6))  # 10 days of downtime
    statuses = [x.status for x in reports]
    assert statuses[:-1] == ["skipped_no_catchup"] * (len(reports) - 1)
    assert statuses[-1] == "success"
    assert runs == [dt(2026, 8, 11)]  # only the latest elapsed interval


def test_catchup_true_backfills_every_interval():
    runs = []
    r = ScheduledRunner(
        task=runs.append,
        policy=SchedulePolicy(catchup=True),
        last_success=dt(2026, 8, 8),
    )
    reports = r.tick(dt(2026, 8, 12, 6))
    assert [x.status for x in reports] == ["success"] * 3
    assert runs == [dt(2026, 8, 9), dt(2026, 8, 10), dt(2026, 8, 11)]


def test_retry_once_then_succeed():
    calls = []

    def flaky(d):
        calls.append(d)
        if len(calls) == 1:
            raise RuntimeError("transient")

    slept = []
    r = ScheduledRunner(task=flaky, last_success=dt(2026, 8, 10), sleep=slept.append)
    [report] = r.tick(dt(2026, 8, 12))
    assert report.status == "success" and report.attempts == 2
    assert r.last_success == dt(2026, 8, 11)
    # retry_delay applied BETWEEN the two attempts (Airflow semantics)
    assert slept == [300.0]


def test_exhausted_retries_report_failure_and_do_not_advance():
    def always_fails(d):
        raise RuntimeError("boom")

    slept = []
    r = ScheduledRunner(
        task=always_fails, last_success=dt(2026, 8, 10), sleep=slept.append
    )
    [report] = r.tick(dt(2026, 8, 12))
    assert report.status == "failed"
    assert report.attempts == 2  # 1 try + retries=1
    assert report.retry_delay_s == 300.0
    assert slept == [300.0]  # one delay between the two attempts, none after
    assert "boom" in report.error
    assert r.last_success == dt(2026, 8, 10)  # unchanged
    # depends_on_past=False: the NEXT day still runs despite the failure
    runs = []
    r.task = runs.append
    reports = r.tick(dt(2026, 8, 13))
    assert [x.status for x in reports][-1] == "success"


def test_state_roundtrip_survives_restart():
    r1 = ScheduledRunner(task=lambda d: None, last_success=dt(2026, 8, 10))
    r1.tick(dt(2026, 8, 12))
    doc = r1.state_json()
    r2 = ScheduledRunner(task=lambda d: None)
    r2.load_state_json(doc)
    assert r2.last_success == dt(2026, 8, 11)
    assert r2.tick(dt(2026, 8, 12, 18)) == []  # nothing re-runs after crash


def test_first_ever_tick_runs_latest_interval_only():
    runs = []
    r = ScheduledRunner(task=runs.append)
    reports = r.tick(dt(2026, 8, 12, 3))
    assert [x.status for x in reports] == ["success"]
    assert runs == [dt(2026, 8, 11)]


def test_backfill_runs_inclusive_range_without_moving_watermark():
    runs = []
    r = ScheduledRunner(task=runs.append, last_success=dt(2026, 8, 10))
    reports = r.backfill(dt(2026, 8, 1, 7, 15), dt(2026, 8, 3, 22, 0))
    assert [x.status for x in reports] == ["success"] * 3
    assert runs == [dt(2026, 8, 1), dt(2026, 8, 2), dt(2026, 8, 3)]
    # the schedule watermark is owned by tick — a historical backfill must
    # not regress it even though each run "succeeded"
    assert r.last_success == dt(2026, 8, 10)


def test_backfill_failed_interval_does_not_stop_later_ones():
    def flaky(d):
        if d == dt(2026, 8, 2):
            raise RuntimeError("boom")

    naps = []
    r = ScheduledRunner(
        task=flaky,
        policy=SchedulePolicy(retries=1),
        last_success=dt(2026, 8, 10),
        sleep=naps.append,
    )
    reports = r.backfill(dt(2026, 8, 1), dt(2026, 8, 3))
    assert [x.status for x in reports] == ["success", "failed", "success"]
    assert reports[1].attempts == 2 and naps == [300.0]
    assert r.last_success == dt(2026, 8, 10)


def test_backfill_reversed_range_raises():
    import pytest

    r = ScheduledRunner(task=lambda d: None)
    with pytest.raises(ValueError, match="reversed"):
        r.backfill(dt(2026, 8, 3), dt(2026, 8, 1))

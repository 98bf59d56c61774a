"""Schedule/retry runner — the reference DAG's execution policy (§2 G2).

Reproduces the semantics of the reference's Airflow deployment
(``airflow_home/dags/daily_lakehouse_pipeline.py:24-38``): ``@daily``
interval, ``retries=1`` with a retry delay, ``catchup=False``,
``depends_on_past=False`` — as a dependency-free runner the CLI (or a cron
entry / any external scheduler tick) invokes. Deliberately NOT a daemon:
the engine's contract is "given a tick, decide which logical dates are due
and run the pipeline with bounded retries", which is exactly the part of
Airflow the reference relies on; the wall-clock loop belongs to whatever
invokes it.

Semantics implemented (each pinned by tests/test_scheduler.py):

- **@daily logical dates**: a run is due for every UTC midnight boundary
  crossed since the last successful logical date (Airflow's data-interval
  model: the run for day D executes once D has fully elapsed).
- **catchup=False**: when multiple intervals elapsed (downtime), only the
  LATEST due interval runs — earlier ones are recorded as skipped, exactly
  Airflow's no-catchup backfill suppression.
- **retries=N + retry_delay**: a failing task callable re-runs up to N
  times with ``retry_delay`` applied between attempts via an injectable
  ``sleep`` (tests substitute a recording no-op, so they stay instant;
  the delay is also surfaced on the final failed report).
- **depends_on_past=False**: a failed day does not block the next tick.

The task itself is idempotent by construction (pipelines.run_daily replays
MERGE-insert-only + incremental models), which is what makes retry-on-
failure and rerun-after-crash safe — same property the reference's DAG
assumes of its Dataproc + dbt steps.

All state is a single JSON document the caller persists wherever it likes
(a path on DBFS/GCS at scale); the runner never touches global state.
"""

from __future__ import annotations

import json
import time as _time
import traceback
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone
from typing import Callable

DAY = timedelta(days=1)


def _floor_day(ts: datetime) -> datetime:
    return ts.replace(hour=0, minute=0, second=0, microsecond=0)


@dataclass(frozen=True)
class SchedulePolicy:
    """@daily / retries / catchup knobs (reference DAG defaults)."""

    retries: int = 1
    retry_delay: timedelta = timedelta(minutes=5)
    catchup: bool = False

    def due_intervals(
        self, last_success: datetime | None, now: datetime
    ) -> list[datetime]:
        """Logical dates (UTC midnights) whose data interval has fully
        elapsed and which have not run yet, oldest first."""
        horizon = _floor_day(now) - DAY  # latest fully-elapsed day
        if last_success is None:
            return [horizon] if horizon is not None else []
        due = []
        d = _floor_day(last_success) + DAY
        while d <= horizon:
            due.append(d)
            d += DAY
        return due


@dataclass
class RunReport:
    logical_date: str
    status: str  # "success" | "failed" | "skipped_no_catchup"
    attempts: int = 0
    error: str | None = None
    retry_delay_s: float | None = None


@dataclass
class ScheduledRunner:
    """Drives one task callable under a SchedulePolicy.

    ``task(logical_date)`` runs the pipeline for that data interval; state
    round-trips through ``state_json`` so any invoker (CLI, cron, CI) can
    persist it between ticks.
    """

    task: Callable[[datetime], None]
    policy: SchedulePolicy = field(default_factory=SchedulePolicy)
    last_success: datetime | None = None
    # Applied BETWEEN attempts (Airflow retries+retry_delay semantics).
    # Injectable so tests (and cron-style invokers that prefer to reschedule
    # instead of block) can substitute a recording no-op.
    sleep: Callable[[float], None] = field(default=_time.sleep)

    def tick(self, now: datetime | None = None) -> list[RunReport]:
        """One scheduler heartbeat: run everything due at *now*."""
        now = now or datetime.now(timezone.utc)
        due = self.policy.due_intervals(self.last_success, now)
        if not due:
            return []
        reports: list[RunReport] = []
        if not self.policy.catchup and len(due) > 1:
            reports += [
                RunReport(d.isoformat(), "skipped_no_catchup") for d in due[:-1]
            ]
            due = due[-1:]
        for d in due:
            reports.append(self._run_with_retries(d))
        return reports

    def _run_with_retries(self, logical_date: datetime) -> RunReport:
        last_err = None
        for attempt in range(1, self.policy.retries + 2):
            try:
                self.task(logical_date)
                self.last_success = logical_date
                return RunReport(
                    logical_date.isoformat(), "success", attempts=attempt
                )
            except Exception:
                last_err = traceback.format_exc(limit=3)
                if attempt <= self.policy.retries:
                    self.sleep(self.policy.retry_delay.total_seconds())
        return RunReport(
            logical_date.isoformat(),
            "failed",
            attempts=self.policy.retries + 1,
            error=last_err,
            retry_delay_s=self.policy.retry_delay.total_seconds(),
        )

    def backfill(self, start: datetime, end: datetime) -> list[RunReport]:
        """Re-run every daily interval in [start, end] (inclusive, floored
        to UTC midnights) oldest first — ``airflow dags backfill`` parity
        for reprocessing history after a model-logic change.

        The schedule watermark (``last_success``) is deliberately NOT
        moved: backfill targets intervals at or before the watermark
        (tasks are idempotent under the engine's merge contract), and
        ``tick`` remains the sole owner of schedule progression. In
        particular, a backfill of old dates must not REGRESS the watermark
        through the per-run success bookkeeping, so it is saved and
        restored around the loop. Retries apply per interval exactly as in
        a scheduled run; a failed interval does not stop later ones
        (each day's report carries its own status)."""
        d = _floor_day(start)
        stop = _floor_day(end)
        if d > stop:
            # airflow errors on a reversed range too — silently running
            # zero intervals would report success while reprocessing nothing
            raise ValueError(
                f"backfill range is reversed: start {start.isoformat()} is "
                f"after end {end.isoformat()}"
            )
        saved = self.last_success
        try:
            reports: list[RunReport] = []
            while d <= stop:
                reports.append(self._run_with_retries(d))
                d += DAY
            return reports
        finally:
            self.last_success = saved

    # -- state round-trip ---------------------------------------------------

    def state_json(self) -> str:
        return json.dumps(
            {
                "last_success": self.last_success.isoformat()
                if self.last_success
                else None
            }
        )

    def load_state_json(self, doc: str) -> None:
        raw = json.loads(doc).get("last_success")
        self.last_success = datetime.fromisoformat(raw) if raw else None

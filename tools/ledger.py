"""Rotation ledger derived MECHANICALLY from the CORRECTNESS_r*.json
artifacts (r11, VERDICT r10 directive #1).

The correctness gate evaluates the first 50 entries of
``__spark_entry__.queries()`` each round, and rows verified in earlier
rounds stay credited — so the window ROTATES to maximize cumulative
driver-verified freshness. Through r10 the rotation queue was a
hand-maintained list in the entry file, and it drifted from reality: the
queue tracked the r1–r3 backlog correctly but never enqueued the queries
FIRST REGISTERED in r4/r5, so 74 queries silently aged to 6-round-old
evidence while the entry file claimed "nothing older than r8" (the r10
judge's finding). This module replaces the hand-written queue with a
derivation FROM the artifacts themselves, so the queue can never drift
from reality again:

* :func:`latest_green` — latest round with a green driver row per query,
  recomputed from ``CORRECTNESS_r01..rN.json`` (hashable green = rows +
  schema + hash all true, no err; rows-only green = the driver's
  documented weaker check for oracle-less queries, err == 'no_oracle'
  with a recorded row count).
* :func:`latest_row_green` — whether each query's MOST RECENT driver row
  was green (r12, r11 ADVICE): a freshly-regressed query must re-queue
  promptly, not coast on an older green round for a full rotation.
* :func:`rotation_refill` — the refill section of the entry file's
  ``_PRIORITY``: freshly-broken queries first, then
  never-driver-evaluated (registration order), then
  oldest-evidence-first (ties alphabetical), truncated to the slots
  left after the round's NEW and RE-PROOF sections.

``python tools/ledger.py`` prints the evidence-age census and the next
window's refill — the audit trail the entry file used to hand-write.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Iterable, Sequence

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# The driver evaluates queries() in dict order and caps at the first 50.
WINDOW_SLOTS = 50


def _artifact_paths(repo_root: str = REPO_ROOT) -> list[tuple[int, str]]:
    out = []
    for path in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            out.append((int(m.group(1)), path))
    return sorted(out)


def _is_green(rec: object) -> bool:
    """A driver row that counts as evidence.

    Hashable queries: rows + schema + hash all true with no error.
    Oracle-less queries: the driver records err='no_oracle' plus the
    Spark row count — the documented weaker rows-only check; a recorded
    run (spark_rows present) is that check's green.
    """
    if not isinstance(rec, dict):
        return False
    if rec.get("err") == "no_oracle":
        return rec.get("spark_rows") is not None
    return (
        rec.get("err") is None
        and rec.get("rows_match") is True
        and rec.get("schema_match") is True
        and rec.get("hash_match") is True
    )


def latest_green(repo_root: str = REPO_ROOT) -> dict[str, int]:
    """Latest round holding a green driver row, per query name."""
    latest: dict[str, int] = {}
    for rnd, path in _artifact_paths(repo_root):
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            if _is_green(rec):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def latest_row_green(repo_root: str = REPO_ROOT) -> dict[str, bool]:
    """Whether each query's MOST RECENT driver row (green or not) was
    green. A query whose newest artifact row is a hash-miss/error is
    freshly BROKEN — the r11 ADVICE finding: ``latest_green`` alone kept
    crediting its older green round, so a regression waited a full
    rotation instead of being re-queued promptly."""
    status: dict[str, bool] = {}
    for _rnd, path in _artifact_paths(repo_root):
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            status[name] = _is_green(rec)  # ascending rounds: last wins
    return status


def rotation_queue(
    registry_names: Sequence[str],
    exclude: Iterable[str] = (),
    repo_root: str = REPO_ROOT,
) -> list[str]:
    """Full refill queue: freshly-BROKEN queries first (most recent
    driver row non-green — oldest green evidence first, ties
    alphabetical), then never-evaluated (registration order), then
    oldest-evidence-first (ties alphabetical). *exclude* removes names
    already placed in the window's NEW/RE-PROOF sections.
    """
    led = latest_green(repo_root)
    ok = latest_row_green(repo_root)
    skip = set(exclude)
    reg = set(registry_names)
    broken = sorted(
        (led.get(n, 0), n)
        for n, green in ok.items()
        if not green and n in reg and n not in skip
    )
    broken_names = [n for _, n in broken]
    never = [
        n for n in registry_names
        if n not in ok and n not in skip
    ]
    aged = sorted(
        (rnd, n)
        for n, rnd in led.items()
        if n in reg and n not in skip and ok.get(n, False)
    )
    return broken_names + never + [n for _, n in aged]


def rotation_refill(
    registry_names: Sequence[str],
    exclude: Iterable[str] = (),
    slots: int = WINDOW_SLOTS,
    repo_root: str = REPO_ROOT,
) -> list[str]:
    """The refill section of the entry file's ``_PRIORITY``."""
    return rotation_queue(registry_names, exclude, repo_root)[:slots]


def census(repo_root: str = REPO_ROOT) -> dict[int, int]:
    """Evidence-age histogram: latest-green round -> query count."""
    out: dict[int, int] = {}
    for rnd in latest_green(repo_root).values():
        out[rnd] = out.get(rnd, 0) + 1
    return dict(sorted(out.items()))


def main() -> None:
    import sys

    sys.path.insert(0, REPO_ROOT)
    import __spark_entry__ as entry

    names = list(entry.REGISTRY)
    led = latest_green()
    print(f"registered queries: {len(names)}")
    print(f"ever driver-evaluated: {len(led)}")
    print(f"evidence-age census (round -> count): {census()}")
    never = [n for n in names if n not in led]
    if never:
        print(f"never evaluated ({len(never)}): {never}")
    broken = [
        n for n, green in latest_row_green().items()
        if not green and n in set(names)
    ]
    if broken:
        print(f"freshly broken (latest driver row non-green, "
              f"{len(broken)}): {sorted(broken)}")
    head = (
        getattr(entry, "_NEW", [])
        + getattr(entry, "_REPROOF", [])
        + getattr(entry, "_PROMISED", [])
    )
    refill = rotation_refill(names, exclude=head, slots=WINDOW_SLOTS - len(head))
    print(f"\nwindow head (NEW + RE-PROOF, {len(head)}): {head}")
    print(f"refill ({len(refill)} oldest-evidence-first):")
    for n in refill:
        print(f"  {n}  (r{led.get(n, 0) or '—'})")


if __name__ == "__main__":
    main()

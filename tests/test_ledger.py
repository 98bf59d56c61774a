"""The rotation queue is DERIVED, not hand-written (VERDICT r10
directive #1): tools/ledger.py parses the CORRECTNESS_r*.json artifacts
and the entry file's _PRIORITY must equal head-sections + the ledger's
oldest-evidence-first refill. These tests pin (a) the artifact-record
semantics on synthetic artifacts and (b) the live entry file's window
against an independent recomputation — so a future round that edits the
queue by hand (the drift the r10 judge caught) fails here."""

from __future__ import annotations

import json
import os

import __spark_entry__ as entry_mod
from personal_data_lakehouse_spark.plans.registry import REGISTRY
from tools import ledger


def _write(tmp, rnd, data):
    with open(os.path.join(tmp, f"CORRECTNESS_r{rnd:02d}.json"), "w") as f:
        json.dump(data, f)


GREEN = {
    "rows_match": True,
    "schema_match": True,
    "hash_match": True,
    "spark_rows": 1,
    "oracle_rows": 1,
    "err": None,
}
HASH_MISS = dict(GREEN, hash_match=False)
ERRORED = dict(GREEN, err="boom")
ROWS_ONLY = {
    "rows_match": None,
    "schema_match": None,
    "hash_match": None,
    "spark_rows": 3,
    "oracle_rows": None,
    "err": "no_oracle",
}


def test_latest_green_semantics(tmp_path):
    tmp = str(tmp_path)
    _write(tmp, 1, {"a": GREEN, "b": HASH_MISS, "c": GREEN, "e": ERRORED})
    _write(tmp, 2, {"b": GREEN, "d": ROWS_ONLY})
    led = ledger.latest_green(tmp)
    # a green in r1 only; b's r1 hash-miss is NOT evidence, its r2 row is;
    # d's rows-only row counts (the driver's documented weaker check);
    # e's errored row never counts.
    assert led == {"a": 1, "b": 2, "c": 1, "d": 2}


def test_rotation_queue_orders_never_then_oldest(tmp_path):
    tmp = str(tmp_path)
    _write(tmp, 1, {"old1": GREEN, "old2": GREEN})
    _write(tmp, 3, {"old2": GREEN, "new1": GREEN})
    names = ["zz_never", "new1", "old2", "old1", "aa_never"]
    q = ledger.rotation_queue(names, repo_root=tmp)
    # never-evaluated keep REGISTRATION order (not alphabetical); then
    # oldest-evidence-first, ties alphabetical (new1/old2 both r3)
    assert q == ["zz_never", "aa_never", "old1", "new1", "old2"]
    assert ledger.rotation_refill(names, exclude=["zz_never"], slots=2,
                                  repo_root=tmp) == ["aa_never", "old1"]


def test_rotation_queue_requeues_freshly_broken_first(tmp_path):
    """r12 (r11 ADVICE): a query whose MOST RECENT driver row is a
    hash-miss/error must re-enter the queue at the FRONT — its older
    green round is no longer current evidence. A later green row
    restores normal aging."""
    tmp = str(tmp_path)
    _write(tmp, 1, {"a": GREEN, "b": GREEN, "c": GREEN})
    _write(tmp, 2, {"b": HASH_MISS, "c": ERRORED})
    names = ["never1", "a", "b", "c"]
    q = ledger.rotation_queue(names, repo_root=tmp)
    # b and c broke in r2 (ties: both carry r1 green evidence →
    # alphabetical); never1 next; a is the only healthy aged row
    assert q == ["b", "c", "never1", "a"]
    # a re-proof heals: c green again in r3 → back to aging order
    _write(tmp, 3, {"c": GREEN})
    assert ledger.rotation_queue(names, repo_root=tmp) == [
        "b", "never1", "a", "c"
    ]
    # a non-green row for a NEVER-green query ranks as broken (front),
    # with evidence age 0
    _write(tmp, 4, {"d": ERRORED})
    assert ledger.rotation_queue(names + ["d"], repo_root=tmp) == [
        "d", "b", "never1", "a", "c"
    ]


def test_entry_priority_is_ledger_derived():
    head = entry_mod._NEW + entry_mod._REPROOF
    expect = head + ledger.rotation_refill(
        list(REGISTRY),
        exclude=head,
        slots=ledger.WINDOW_SLOTS - len(head),
    )
    assert entry_mod._PRIORITY == expect
    assert len(entry_mod._PRIORITY) == ledger.WINDOW_SLOTS
    assert len(set(entry_mod._PRIORITY)) == ledger.WINDOW_SLOTS
    assert all(n in REGISTRY for n in entry_mod._PRIORITY)


def test_entry_refill_is_oldest_first():
    """The refill section must be monotone in evidence age, and no query
    left OUT of the window may be older than any refill row (the exact
    failure mode the r10 judge found: a 6-round-old class skipped while
    fresher rows were re-proven)."""
    led = ledger.latest_green()
    head = set(entry_mod._NEW + entry_mod._REPROOF)
    refill = [n for n in entry_mod._PRIORITY if n not in head]
    ages = [led.get(n, 0) for n in refill]  # 0 = never evaluated
    assert ages == sorted(ages), "refill not oldest-evidence-first"
    in_window = set(entry_mod._PRIORITY)
    left_out = [
        led[n] for n in REGISTRY if n not in in_window and n in led
    ]
    if left_out and ages:
        assert min(left_out) >= ages[-1], (
            "a query outside the window has older evidence than the "
            "youngest refill row"
        )

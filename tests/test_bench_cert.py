"""The bench cross-run certificate (r12, VERDICT r11 directive #2): the
agreement term that replaced the steal-blind single-run quiet bit. Pure
ledger math — no Spark, no timing."""

from __future__ import annotations

import importlib.util
import json
import os


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_cert_requires_three_agreeing_runs(tmp_path):
    b = _bench()
    root = str(tmp_path)
    # run 1 and 2: no quorum regardless of agreement
    c1 = b.cross_run_certificate("fp1", "0.1", 10.0, 50.0, root=root)
    assert c1["cert_agree"] is False and c1["cert_n_runs"] == 1
    c2 = b.cross_run_certificate("fp1", "0.1", 10.1, 50.0, root=root)
    assert c2["cert_agree"] is False and c2["cert_n_runs"] == 2
    # a wild third run: three runs, but no 3-cluster within 5%
    c3 = b.cross_run_certificate("fp1", "0.1", 19.0, 50.0, root=root)
    assert c3["cert_n_runs"] == 3 and c3["cert_agree"] is False
    # a fourth run near the first two: the best cluster (10.0, 10.1,
    # 10.2) agrees within 2% — certificate granted, outlier ignored
    c4 = b.cross_run_certificate("fp1", "0.1", 10.2, 50.0, root=root)
    assert c4["cert_agree"] is True
    assert c4["cert_cluster"] == [10.0, 10.1, 10.2]
    assert c4["cert_band_pct"] <= 2.1
    # the standing record file carries the same verdict
    with open(os.path.join(root, "BENCH_CERT.json")) as f:
        assert json.load(f)["cert_agree"] is True


def test_cert_isolates_code_fingerprints_and_sf(tmp_path):
    b = _bench()
    root = str(tmp_path)
    for v in (10.0, 10.1, 10.2):
        b.cross_run_certificate("fpA", "0.1", v, 1.0, root=root)
    # a DIFFERENT fingerprint sees none of fpA's runs
    c = b.cross_run_certificate("fpB", "0.1", 10.0, 1.0, root=root)
    assert c["cert_n_runs"] == 1 and c["cert_agree"] is False
    # same fingerprint, different sf: separate series
    c = b.cross_run_certificate("fpA", "0.01", 10.05, 1.0, root=root)
    assert c["cert_n_runs"] == 1 and c["cert_agree"] is False
    # back on (fpA, 0.1) the quorum still stands
    c = b.cross_run_certificate("fpA", "0.1", 10.05, 1.0, root=root)
    assert c["cert_agree"] is True


def test_cert_keeps_only_recent_runs(tmp_path):
    b = _bench()
    root = str(tmp_path)
    # 8 old agreeing runs, then 8 wild ones: the window must slide —
    # ancient agreement cannot certify today's noise
    for v in (10.0,) * b.CERT_KEEP + (11.0, 14.0, 17.0, 20.0, 23.0, 26.0,
                                      29.0, 32.0):
        c = b.cross_run_certificate("fp", "0.1", v, 1.0, root=root)
    assert c["cert_n_runs"] == b.CERT_KEEP
    assert c["cert_agree"] is False


def test_code_fingerprint_is_stable():
    b = _bench()
    assert b.code_fingerprint() == b.code_fingerprint()
    assert len(b.code_fingerprint()) == 16

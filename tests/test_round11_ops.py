"""Round-11 operator semantics beyond the differential gate: SCD2 merge
invariants (idempotent replay, history untouched, version chains) and the
decontamination report's internal consistency (exact-duplicate test docs
must be fully contaminated)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

import __spark_entry__  # noqa: F401 — registers round11_ops
from personal_data_lakehouse_spark.operators.merge import scd2_merge
from personal_data_lakehouse_spark.plans.registry import REGISTRY
from tests.conftest import SF_DIR

EFF = datetime.date(2020, 6, 1)


def _dim(spark, rows):
    return spark.createDataFrame(
        rows,
        "k bigint, seg string, bal double, valid_from date, "
        "valid_to date, is_current bigint",
    )


def _upd(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, seg string, bal double, eff_date date"
    )


D0 = datetime.date(2019, 1, 1)


def test_scd2_merge_versions_and_inserts(spark):
    dim = _dim(
        spark,
        [
            (1, "A", 10.0, D0, None, 1),  # will change
            (2, "B", 20.0, D0, None, 1),  # no-op update
            (3, "C", 30.0, D0, None, 1),  # not in batch
            # key 4: existing HISTORY row + current row; current changes
            (4, "D", 40.0, D0, EFF, 0),
            (4, "D", 41.0, EFF, None, 1),
        ],
    )
    eff2 = datetime.date(2021, 1, 1)
    upd = _upd(
        spark,
        [
            (1, "A", 11.0, eff2),  # balance change
            (2, "B", 20.0, eff2),  # identical → no-op
            (4, "E", 41.0, eff2),  # segment change
            (9, "Z", 0.0, eff2),  # brand-new key
        ],
    )
    out = scd2_merge(
        dim, upd, keys=["k"], tracked=["seg", "bal"], eff_col="eff_date"
    )
    rows = {
        (r["k"], r["valid_from"], r["valid_to"], r["is_current"]): r
        for r in out.collect()
    }
    # changed key 1: closed old + new open version
    assert rows[(1, D0, eff2, 0)]["bal"] == 10.0
    assert rows[(1, eff2, None, 1)]["bal"] == 11.0
    # no-op key 2: single untouched current row
    k2 = [k for k in rows if k[0] == 2]
    assert k2 == [(2, D0, None, 1)]
    # untouched key 3
    assert (3, D0, None, 1) in rows
    # key 4: history row byte-untouched, old current closed, new opened
    assert rows[(4, D0, EFF, 0)]["bal"] == 40.0
    assert rows[(4, EFF, eff2, 0)]["seg"] == "D"
    assert rows[(4, eff2, None, 1)]["seg"] == "E"
    # new key 9: one open first version
    k9 = [k for k in rows if k[0] == 9]
    assert k9 == [(9, eff2, None, 1)]
    assert len(rows) == 5 + 2 + 1  # 5 dim rows kept/closed + 2 new + insert


def test_scd2_merge_replay_is_idempotent(spark):
    dim = _dim(spark, [(1, "A", 10.0, D0, None, 1)])
    upd = _upd(spark, [(1, "A", 99.0, EFF)])
    once = scd2_merge(
        dim, upd, keys=["k"], tracked=["seg", "bal"], eff_col="eff_date"
    )
    twice = scd2_merge(
        once, upd, keys=["k"], tracked=["seg", "bal"], eff_col="eff_date"
    )
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b  # the new current row matches the batch → no-op


def test_scd2_merge_never_shuffles_the_dimension(spark):
    """The SCD2 scale claim as a plan assertion: every Exchange in the
    merge plan is a BROADCAST (the update batch / changed-key set) —
    zero hash-partitioning shuffles, so a 100 TB dimension's history
    never crosses the network. A lost broadcast fails here before it
    fails a benchmark."""
    spark.catalog.clearCache()
    df = REGISTRY["q_merge_scd2"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan.lower(), plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_scd2_merge_rejects_empty_tracked(spark):
    """r12 (r11 ADVICE): tracked=[] left the differs predicate None and
    crashed filter(None) — now an explicit contract error."""
    import pytest

    dim = _dim(spark, [(1, "A", 10.0, D0, None, 1)])
    upd = _upd(spark, [(1, "A", 10.0, EFF)])
    with pytest.raises(ValueError, match="tracked"):
        scd2_merge(dim, upd, keys=["k"], tracked=[], eff_col="eff_date")


def test_scd2_merge_currentless_key_gets_fresh_version(spark):
    """r12 (r11 ADVICE): a key carrying ONLY closed history (deleted and
    re-appearing) was silently dropped by the old all-keys anti-join;
    it must now open a fresh version, leaving the history untouched."""
    dim = _dim(spark, [(1, "A", 10.0, D0, EFF, 0)])  # closed row only
    upd = _upd(spark, [(1, "B", 11.0, datetime.date(2021, 1, 1))])
    out = scd2_merge(
        dim, upd, keys=["k"], tracked=["seg", "bal"], eff_col="eff_date"
    )
    rows = sorted(map(tuple, out.collect()))
    assert rows == [
        (1, "A", 10.0, D0, EFF, 0),  # history byte-untouched
        (1, "B", 11.0, datetime.date(2021, 1, 1), None, 1),
    ]


def _scd2_invariants(rows):
    """Pure-Python SCD2 table invariants, independent of the operator."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for r in rows:
        by_key[r["k"]].append(r)
    for k, vs in by_key.items():
        cur = [r for r in vs if r["is_current"] == 1]
        assert len(cur) == 1, (k, vs)
        assert cur[0]["valid_to"] is None, (k, cur)
        closed = sorted(
            (r for r in vs if r["is_current"] == 0),
            key=lambda r: r["valid_from"],
        )
        # versions chain contiguously: each closed row ends where the
        # next version begins, and the last closed row ends at the
        # current row's start
        chain = closed + cur
        for a, b in zip(chain, chain[1:]):
            assert a["valid_to"] == b["valid_from"], (k, chain)


def test_scd2_merge_random_batches_property(spark):
    """Hypothesis-driven SCD2 invariants over random two-batch update
    sequences: after any sequence of merges at increasing effective
    dates, every key has exactly ONE open current row, closed versions
    chain contiguously (each valid_to = the successor's valid_from),
    and re-applying the last batch is a no-op — the independent
    reference the differential gate can't provide (both engines could
    share an algebra bug; this derives the invariants from the SCD2
    definition, not from the implementation)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    keys = st.integers(1, 6)
    val = st.integers(0, 2)  # small domain → frequent no-op updates

    @given(
        base=st.dictionaries(keys, val, min_size=1, max_size=6),
        b1=st.dictionaries(keys, val, min_size=1, max_size=6),
        b2=st.dictionaries(keys, val, min_size=1, max_size=6),
    )
    @settings(max_examples=8, deadline=None)
    def run(base, b1, b2):
        d0 = datetime.date(2019, 1, 1)
        d1 = datetime.date(2020, 1, 1)
        d2 = datetime.date(2021, 1, 1)
        dim = _dim(
            spark,
            [(k, f"s{v}", float(v), d0, None, 1) for k, v in base.items()],
        )
        for batch, eff in ((b1, d1), (b2, d2)):
            upd = _upd(
                spark,
                [(k, f"s{v}", float(v), eff) for k, v in batch.items()],
            )
            dim = scd2_merge(
                dim, upd, keys=["k"], tracked=["seg", "bal"],
                eff_col="eff_date",
            )
        rows = [r.asDict() for r in dim.collect()]
        _scd2_invariants(rows)
        # every key ever seen is present with its LATEST value current
        latest = dict(base)
        latest.update(b1)
        latest.update(b2)
        cur = {
            r["k"]: r["bal"] for r in rows if r["is_current"] == 1
        }
        assert cur == {k: float(v) for k, v in latest.items()}
        # replaying the final batch changes nothing
        upd2 = _upd(
            spark, [(k, f"s{v}", float(v), d2) for k, v in b2.items()]
        )
        again = scd2_merge(
            dim, upd2, keys=["k"], tracked=["seg", "bal"],
            eff_col="eff_date",
        )
        assert sorted(map(tuple, again.collect())) == sorted(
            map(tuple, dim.collect())
        )

    run()


def test_decontaminate_exact_dups_fully_contaminated(spark):
    """Any test-split doc whose NORMALIZED text also occurs on the
    train∪val side must report hit_frac = 1.0 (all its shingles are in
    the spine) — the cross-check tying this report to the exact-dedup
    family's fingerprint semantics. (Conditional at the fixture SF: the
    sf0.001 corpus happens to have no exact duplicate straddling the
    test boundary; the deterministic planted-contamination case is the
    synthetic test below.)"""
    from personal_data_lakehouse_spark.functions.text import fingerprint
    from personal_data_lakehouse_spark.plans.registry import t as t_
    from personal_data_lakehouse_spark.plans.round11_ops import _coin_col

    out = REGISTRY["t_eval_decontaminate"].fn(spark, SF_DIR)
    docs = t_(spark, SF_DIR, "documents").select(
        "doc_id", fingerprint("text").alias("fp"), _coin_col().alias("sp")
    )
    train_fp = docs.filter(F.col("sp") != "test").select("fp").distinct()
    dup_test = (
        docs.filter(F.col("sp") == "test")
        .join(train_fp, "fp", "left_semi")
        .select("doc_id")
    )
    for r in out.join(dup_test, "doc_id", "left_semi").collect():
        assert r["hit_frac"] == 1.0 and r["contaminated"] == 1, r
    # flag is exactly the integer rule on every row
    for r in out.collect():
        assert r["contaminated"] == int(2 * r["n_hit"] >= r["n_shingles"])


def test_decontaminate_planted_contamination(spark, tmp_path):
    """Deterministic planted-overlap corpus: a test doc COPIED from a
    train doc must flag fully contaminated; a test doc sharing half its
    shingles must report the planted fraction; a novel test doc must
    report zero. The query fn reads documents.parquet from any sf_dir,
    so the corpus is synthesized here and the md5 coins are read back
    from the query's own split expression — no re-derivation that could
    drift."""
    from personal_data_lakehouse_spark.plans.round11_ops import _coin_col

    vocab = [f"w{i:03d}" for i in range(400)]
    rows = [
        (i, " ".join(vocab[(7 * i + j) % 400] for j in range(20)))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    splits = {
        r["doc_id"]: r["sp"]
        for r in df.select("doc_id", _coin_col().alias("sp")).collect()
    }
    train_ids = [i for i, s in splits.items() if s != "test"]
    test_ids = [i for i, s in splits.items() if s == "test"]
    assert len(test_ids) >= 3 and train_ids
    texts = dict(rows)
    # plant: full copy, half-overlap (10 shared words ⇒ 8 shared
    # shingles of 18), and an all-novel doc from out-of-corpus words
    full, half, novel = test_ids[:3]
    tr = texts[train_ids[0]]
    texts[full] = tr
    texts[half] = " ".join(tr.split()[:10] + [f"x{j}" for j in range(10)])
    texts[novel] = " ".join(f"z{j}" for j in range(20))
    spark.createDataFrame(
        sorted(texts.items()), "doc_id bigint, text string"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r["doc_id"]: r
        for r in REGISTRY["t_eval_decontaminate"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out[full]["hit_frac"] == 1.0 and out[full]["contaminated"] == 1
    assert out[novel]["n_hit"] == 0 and out[novel]["contaminated"] == 0
    # the half doc's 18 shingles: the first 8 come verbatim from the
    # train doc; the planted x-words can collide with nothing
    assert out[half]["n_shingles"] == 18
    assert out[half]["n_hit"] == 8
    assert out[half]["contaminated"] == 0

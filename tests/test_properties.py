"""Property-based tests (hypothesis) for the pure-Python kernels whose
invariants the distributed operators depend on."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from personal_data_lakehouse_spark.dedup.minhash import (
    MERSENNE_P,
    hash_family,
)
from personal_data_lakehouse_spark.io.sanitize import sanitize_column_name
from personal_data_lakehouse_spark.similarity.lsh import hyperplanes

VALID = re.compile(r"^[a-z_][a-z0-9_]*$")


@given(name=st.text(max_size=60), idx=st.integers(0, 500))
@settings(max_examples=300, deadline=None)
def test_sanitized_names_are_always_warehouse_legal(name, idx):
    out = sanitize_column_name(name, idx)
    assert VALID.match(out), out


@given(name=st.text(max_size=60), idx=st.integers(0, 500))
@settings(max_examples=300, deadline=None)
def test_sanitizer_is_idempotent(name, idx):
    once = sanitize_column_name(name, idx)
    assert sanitize_column_name(once, idx) == once


@given(k=st.integers(1, 64), seed=st.integers(0, 2**31 - 1))
@settings(max_examples=50, deadline=None)
def test_hash_family_coeffs_stay_exact_in_int64(k, seed):
    # h(x) = (a*x + b) mod p with x < p must not overflow signed 64-bit —
    # the property that lets Spark AND DuckDB evaluate it exactly.
    for a, b in hash_family(k, seed):
        assert 1 <= a < MERSENNE_P and 0 <= b < MERSENNE_P
        assert a * (MERSENNE_P - 1) + b < 2**63


def test_hash_family_and_hyperplanes_are_seed_pinned():
    assert hash_family(16, 42) == hash_family(16, 42)
    assert hyperplanes(64, 8, 42) == hyperplanes(64, 8, 42)
    assert hash_family(16, 1) != hash_family(16, 2)


# ---------------------------------------------------------------------------
# Two-pass sharded global positions vs the naive corpus-global window


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10**6)),  # (bucket, id-ish)
        min_size=1,
        max_size=40,
        unique_by=lambda r: r[1],
    )
)
def test_sharded_positions_equal_naive_global_window(spark, rows):
    """sharded_global_positions must be bit-identical to ROW_NUMBER() over
    the naive global ORDER BY (bucket, skey, id) for any bucket/key data —
    the prefix-shard decomposition may not reorder, drop, or collide."""
    from pyspark.sql import Window

    from personal_data_lakehouse_spark.operators.partitioning import (
        sharded_global_positions,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "bucket int, id long").withColumn(
        "skey", F.md5(F.col("id").cast("string").cast("binary"))
    )
    got = {
        r["id"]: r["pos"]
        for r in sharded_global_positions(df, "bucket", "skey", "id").collect()
    }
    naive_w = Window.orderBy("bucket", "skey", "id")
    want = {
        r["id"]: r["pos"]
        for r in df.withColumn("pos", F.row_number().over(naive_w)).collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),  # bucket
            st.integers(0, 10**6),  # id-ish
            st.integers(0, 500),  # weight (token count)
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda r: r[1],
    )
)
def test_sharded_weighted_prefix_sum_equals_naive_window(spark, rows):
    """With weight_col, sharded_global_positions must be bit-identical to
    SUM(w) OVER (ORDER BY bucket, skey, id ROWS UNBOUNDED PRECEDING) — the
    decomposition the token-budget sampler rides on."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from personal_data_lakehouse_spark.operators.partitioning import (
        sharded_global_positions,
    )

    df = spark.createDataFrame(rows, "bucket int, id long, w long").withColumn(
        "skey", F.md5(F.col("id").cast("string").cast("binary"))
    )
    got = {
        r["id"]: r["pos"]
        for r in sharded_global_positions(
            df, "bucket", "skey", "id", weight_col="w"
        ).collect()
    }
    naive_w = Window.orderBy("bucket", "skey", "id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = {
        r["id"]: r["pos"]
        for r in df.withColumn("pos", F.sum("w").over(naive_w)).collect()
    }
    assert got == want


def test_sharded_positions_keep_null_keys_first(spark):
    """A NULL sort key (or NULL bucket) must rank NULLS FIRST like the
    naive window — not silently drop out of the permutation (the shard
    equi-join would otherwise never match a NULL-derived shard)."""
    from pyspark.sql import functions as F

    from personal_data_lakehouse_spark.operators.partitioning import (
        sharded_global_positions,
    )

    df = spark.createDataFrame(
        [(0, 1, "aa11"), (0, 2, None), (0, 3, "bb22"), (None, 4, "cc33")],
        "bucket int, id long, skey string",
    )
    got = {
        r["id"]: r["pos"]
        for r in sharded_global_positions(df, "bucket", "skey", "id").collect()
    }
    # naive ORDER BY bucket NULLS FIRST, skey NULLS FIRST, id:
    #   (NULL,4), (0,2,NULL-key), (0,1,'aa11'), (0,3,'bb22')
    assert got == {4: 1, 2: 2, 1: 3, 3: 4}


# ---------------------------------------------------------------------------
# asof_join vs pandas merge_asof — an INDEPENDENT oracle (neither Spark
# windows nor DuckDB ASOF), over generated key/timestamp data


@settings(max_examples=10, deadline=None)
@given(
    probes=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)),  # (key, ts)
        min_size=1,
        max_size=25,
    ),
    refs=st.lists(
        st.tuples(
            st.integers(0, 3), st.integers(0, 1000), st.integers(0, 99)
        ),  # (key, ts, val)
        min_size=0,
        max_size=25,
    ),
)
def test_asof_join_matches_pandas_merge_asof(spark, probes, refs):
    import pandas as pd

    from personal_data_lakehouse_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(probes)],
        "pid long, k int, lts long",
    )
    right = spark.createDataFrame(refs, "k int, rts long, val int") if refs else (
        spark.createDataFrame([], "k int, rts long, val int")
    )
    got = {
        r["pid"]: (r["matched_ts"], r["matched_val"])
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            value_cols=["val"],
        ).collect()
    }
    # pandas oracle: dedup refs per (k, ts) by max val — the operator's
    # documented tie rule — then backward merge_asof per key
    lp = pd.DataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(probes)],
        columns=["pid", "k", "lts"],
    ).sort_values("lts", kind="stable")
    rp = (
        pd.DataFrame(refs, columns=["k", "rts", "val"])
        .groupby(["k", "rts"], as_index=False)["val"]
        .max()
        .sort_values("rts", kind="stable")
        if refs
        else pd.DataFrame(
            {c: pd.Series(dtype="int64") for c in ("k", "rts", "val")}
        )
    )
    merged = pd.merge_asof(
        lp,
        rp,
        left_on="lts",
        right_on="rts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    )
    for row in merged.itertuples():
        want_ts = None if pd.isna(row.rts) else int(row.rts)
        want_val = None if pd.isna(row.val) else int(row.val)
        assert got[row.pid] == (want_ts, want_val), (
            row.pid,
            got[row.pid],
            (want_ts, want_val),
        )


# ---------------------------------------------------------------------------
# CDC apply_changes vs a sequential reference model


@settings(max_examples=25, deadline=None)
@given(
    changelog=st.lists(
        st.tuples(
            st.integers(0, 9),                  # key
            st.sampled_from(["I", "U", "D"]),   # op
            st.integers(0, 99),                 # payload
        ),
        max_size=30,
    )
)
def test_apply_changes_matches_sequential_replay(spark, changelog):
    """Applying a changelog set-at-once (latest seq per key wins) must equal
    replaying it sequentially against a dict."""
    target0 = {k: -1 for k in range(0, 5)}  # keys 0-4 pre-exist
    # sequential replay: later entries overwrite earlier ones
    state = dict(target0)
    for k, op, v in changelog:
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    from personal_data_lakehouse_spark.operators.merge import apply_changes

    target = spark.createDataFrame(
        [(k, v) for k, v in target0.items()], "k int, v int"
    )
    if changelog:
        changes = spark.createDataFrame(
            [(k, v, op, seq) for seq, (k, op, v) in enumerate(changelog)],
            "k int, v int, op string, seq int",
        )
        got = {
            r.k: r.v for r in apply_changes(target, changes, keys=["k"]).collect()
        }
    else:
        got = {r.k: r.v for r in target.collect()}
    # deletes remove; inserts/updates take the latest payload
    expected = state
    # exception: a key deleted then never re-added stays gone even if it
    # pre-existed; apply_changes handles this via the latest-op check
    assert got == expected, (changelog, got, expected)


# ---------------------------------------------------------------------------
# Z-order interleave: bijective and locality-preserving


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1))
def test_zorder_interleave_is_bijective(a, b):
    """The Morton key must encode both coordinates losslessly (pure-Python
    mirror of the codegen expression in maintenance.zorder_value)."""

    def morton(a, b, bits=16):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (i * 2) | ((b >> i) & 1) << (i * 2 + 1)
        return z

    z = morton(a, b)
    back_a = sum(((z >> (i * 2)) & 1) << i for i in range(16))
    back_b = sum(((z >> (i * 2 + 1)) & 1) << i for i in range(16))
    assert (back_a, back_b) == (a, b)


# ---------------------------------------------------------------------------
# Waterfill cap search (shared SQL template) vs brute force


@given(
    counts=st.lists(st.integers(0, 10_000), min_size=1, max_size=12),
    budget_frac=st.floats(0.0, 1.2),
)
@settings(max_examples=150, deadline=None)
def test_waterfill_cap_sql_matches_brute_force(counts, budget_frac):
    """Run the exact cap-search SQL the t_mix_waterfill oracle embeds over
    a random counts table and budget, and check the result against a
    brute-force maximal-cap search: feasibility, maximality, and the
    alloc = min(c, T) law. The registered query only ever sees
    budget = total//2; this covers budget 0, budget beyond total,
    all-equal counts, zero-token sources, and singleton mixes."""
    import duckdb

    from personal_data_lakehouse_spark.plans.round5_ops import (
        WATERFILL_CAP_SQL,
    )

    total = sum(counts)
    budget = int(total * budget_frac)
    values = ", ".join(
        f"('s{i}', {c}::BIGINT)" for i, c in enumerate(counts)
    )
    sql = f"""
    WITH c(source, c_tokens) AS (VALUES {values}),
    tot AS (SELECT {total}::BIGINT AS total, {len(counts)}::BIGINT AS m,
                   {budget}::BIGINT AS budget),
    {WATERFILL_CAP_SQL}
    """
    rows = duckdb.sql(sql).fetchall()
    cols = [d[0] for d in duckdb.sql(sql).description]
    rows = [dict(zip(cols, r)) for r in rows]
    assert len(rows) == len(counts)

    t_star = rows[0]["cap_tokens"]
    alloc_total = sum(r["alloc_tokens"] for r in rows)
    if budget >= total:
        # budget covers everything: no cap, full allocation
        assert t_star is None
        assert alloc_total == total
    else:
        assert t_star is not None and t_star >= 0
        # allocation law per source
        for r in rows:
            assert r["alloc_tokens"] == min(r["c_tokens"], t_star)
            assert r["capped"] == (r["c_tokens"] > t_star)
        # feasible
        assert alloc_total <= budget
        # maximal: T+1 must blow the budget
        assert sum(min(c, t_star + 1) for c in counts) > budget

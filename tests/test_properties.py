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

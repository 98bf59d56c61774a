"""Mechanically pin README's query counts to the live registry.

Round-4 verdict item 7: README drifted from the registry twice (139→166→169
eras). Instead of trusting prose, extract the two counts README states and
assert them against ``len(REGISTRY)`` / the oracle-backed subset, so any
round that adds queries fails fast here until the doc is refreshed.
"""

from __future__ import annotations

import os
import re

import __spark_entry__  # noqa: F401 — populates REGISTRY
from personal_data_lakehouse_spark.plans.registry import REGISTRY

README = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md")


def test_readme_registry_count_matches():
    text = open(README).read()
    m = re.search(r"(\d+)-query registry", text)
    assert m, "README no longer states the registry size"
    assert int(m.group(1)) == len(REGISTRY), (
        f"README says {m.group(1)}-query registry but REGISTRY holds "
        f"{len(REGISTRY)} — update README.md"
    )


def test_readme_oracle_count_matches():
    text = open(README).read()
    m = re.search(r"all (\d+)\s+oracle-hashed", text)
    assert m, "README no longer states the oracle-hashed count"
    n_oracle = sum(1 for q in REGISTRY.values() if q.oracle is not None)
    assert int(m.group(1)) == n_oracle, (
        f"README says {m.group(1)} oracle-hashed but the registry has "
        f"{n_oracle} — update README.md"
    )

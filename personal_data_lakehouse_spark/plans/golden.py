"""Physical-plan shape capture for golden-file regression testing.

``normalize_plan`` reduces ``executedPlan().toString()`` to a stable
operator-shape signature: one line per physical node keeping only what a
plan reviewer actually audits — the operator name, whole-stage-codegen
membership, exchange partitioning kind, join type and build side — and
dropping everything run-varying (expression IDs ``#123``, ``plan_id``s,
file paths, statistics, column lists, codegen stage numbers).

The exchange-budget test (tests/test_plan_shapes.py) catches *count*
regressions; goldens catch *shape* regressions the count can't see — a
SortMergeJoin silently replacing a BroadcastHashJoin (same exchange count
after AQE coalescing), a partial aggregate disappearing, a filter
migrating above a join. At 100 TB any one of those is a 10× wall-clock
cliff, so the plans are pinned at review time and drift fails CI.

Regenerate after a DELIBERATE plan change with::

    python tools/gen_plan_goldens.py
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_JOIN_TYPES = (
    "Inner",
    "LeftOuter",
    "RightOuter",
    "FullOuter",
    "LeftSemi",
    "LeftAnti",
    "Cross",
    "ExistenceJoin",
)
_BUILD_SIDES = ("BuildLeft", "BuildRight")
# Exchange flavors worth pinning (hash vs range vs single-partition is a
# scale-behavior difference; the column list inside is not).
_PARTITIONINGS = (
    "hashpartitioning",
    "rangepartitioning",
    "SinglePartition",
    "RoundRobinPartitioning",
    "IdentityBroadcastMode",
    "HashedRelationBroadcastMode",
)

_NODE_RE = re.compile(r"^[\s:+\-]*(?:\*\(\d+\)\s*)?([A-Za-z][A-Za-z0-9_]*)")


def normalize_plan(df: DataFrame) -> str:
    """Operator-shape signature of *df*'s (initial) physical plan."""
    raw = df._jdf.queryExecution().executedPlan().toString()
    out: list[str] = []
    for line in raw.splitlines():
        m = _NODE_RE.match(line)
        if not m:
            continue
        node = m.group(1)
        # continuation/detail lines of formatted output start with field
        # names; physical nodes are CamelCase — keep only the latter
        if not node[0].isupper():
            continue
        codegen = "*" if re.match(r"^[\s:+\-]*\*\(\d+\)", line) else ""
        extras = [w for w in _PARTITIONINGS if w in line]
        extras += [w for w in _JOIN_TYPES if re.search(rf"\b{w}\b", line)]
        extras += [w for w in _BUILD_SIDES if w in line]
        suffix = f" [{' '.join(dict.fromkeys(extras))}]" if extras else ""
        out.append(f"{codegen}{node}{suffix}")
    return "\n".join(out) + "\n"

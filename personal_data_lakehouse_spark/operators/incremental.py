"""Incremental materialized-view maintenance: algebraic aggregate-state
merge.

A gold rollup (SUM/COUNT/MIN/MAX per key) never needs a full recompute
when a new batch lands: those aggregates are *algebraic* — the combined
state of (old state, new batch's partial state) is element-wise
sum/sum/min/max, and derived measures (AVG = SUM/COUNT) are recomputed
from the merged state at read time. This is the maintenance loop behind
every incremental dashboard table, and the exact property Spark itself
exploits in map-side partial aggregation — applied here ACROSS batches
instead of across partitions.

Scale: the merge shuffles only the two state tables (cardinality = group
count, not row count) on the group key; the incoming batch is aggregated
map-side before it ever shuffles. A 100 TB history never re-reads — each
refresh touches one batch + one state table. Non-algebraic measures
(exact distinct counts, medians) are out of scope by design — those need
either full recompute or sketch states (see q_approx_distinct for the HLL
route).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# measure column → merge function over partial states
_MERGES = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing
    "min": F.min,
    "max": F.max,
}


def partial_state(
    batch: DataFrame,
    keys: Sequence[str],
    measures: Mapping[str, tuple[str, str]],
) -> DataFrame:
    """Aggregate *batch* into a mergeable state table.

    *measures* maps state-column name → (kind, source-column) with kind in
    {sum, count, min, max}; e.g. ``{"n": ("count", "*"), "total":
    ("sum", "o_totalprice")}``.
    """
    aggs = []
    for out, (kind, src) in measures.items():
        if kind == "count":
            aggs.append(F.count(F.lit(1)).alias(out))
        else:
            aggs.append(getattr(F, kind)(src).alias(out))
    return batch.groupBy(*keys).agg(*aggs)


def merge_states(
    state: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    measures: Mapping[str, tuple[str, str]],
) -> DataFrame:
    """Merge two state tables (previous MV state + new batch's partial
    state) into the refreshed state. Keys present in only one side pass
    through unchanged (unionByName + grouped merge handles both)."""
    merged_aggs = [
        _MERGES[kind](out).alias(out) for out, (kind, _) in measures.items()
    ]
    return (
        state.unionByName(delta, allowMissingColumns=False)
        .groupBy(*keys)
        .agg(*merged_aggs)
    )

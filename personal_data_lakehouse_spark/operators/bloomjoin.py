"""Bloom-filter semi-join reduction — prune a huge probe side before the
shuffle join, without collecting anything to the driver.

Spark's own runtime bloom filter (``spark.sql.optimizer.runtime.bloomFilter.
enabled``, injected as an internal ``BloomFilterAggregate`` →
``BloomFilterMightContain`` pair) only fires when the application-side scan
exceeds ``applicationSideScanSizeThreshold`` (10 GB default) and the build
side is under ``creationSideThreshold`` — thresholds a 100 TB fact table
clears easily but a local test never does, and the expressions involved are
not public SQL. This module is the explicit, always-available counterpart,
built from public column functions only:

1. **Build (distributed)**: hash every build-side key with *k* seeded
   ``xxhash64`` calls, fold the resulting bit positions into 64-bit words
   with a ``bit_or`` aggregate keyed by word index, and collapse the words
   into a ONE-ROW ``map<long,long>`` via ``map_from_entries(collect_list)``.
   The bitmap never materializes on the driver: it flows to the probe side
   as a broadcast nested-loop join of a single row (m=2^17 bits → ≤2048 map
   entries ≈ 32 KB). This is exactly the dataflow of Catalyst's own runtime
   filter (distributed build → tiny filter → scan-side probe), expressed in
   the public API.
2. **Probe (codegen'd)**: per seed, test the key's bit with integer
   shift/mask expressions — whole-stage-codegen'd JVM arithmetic, no Python
   anywhere. Rows failing any of the *k* tests provably have no build-side
   partner and are dropped BEFORE the join's exchange, so the shuffle moves
   only plausible matches (plus the bloom's false-positive residue).
3. **Exactness**: the reduction is a superset filter — callers still run
   the real join on the survivors, so results are bit-identical to the
   unreduced plan (false positives are eliminated by the join itself, same
   contract as Catalyst's runtime filter).

At 100 TB: the build side streams once through a map-side ``bit_or``
aggregate whose cardinality is capped at m/64 rows regardless of key count;
the probe is a map-only filter ahead of the fact shuffle. Skew-immune (the
bitmap broadcast is one row), and the m/64-row shuffle is negligible.

Reference parity note: the reference engine (629-LoC Spark/BigQuery
pipeline) relies on BigQuery's implicit semi-join reduction; this is the
explicit Spark-native equivalent for its stock-join shapes
(``transforme_stock_silver.py`` join of facts to the ticker dimension).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# m = 2^17 bits. For n build keys and k hashes, fpp ≈ (1 - e^(-k*n/m))^k:
# n=10k, k=3 → ~0.1%; n=100k, k=3 → ~5%. False positives only cost wasted
# shuffle rows (the join removes them), so modest m is the right trade.
DEFAULT_NUM_BITS = 1 << 17
DEFAULT_NUM_HASHES = 3

_BF_COL = "__bloom_bitmap"


def _bit_positions(key: Column, seeds: Sequence[int], num_bits: int) -> list[Column]:
    """k bit positions for *key* — xxhash64 re-seeded per probe (the seed is
    hashed as an extra argument, giving k independent hash functions)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(int(s))), F.lit(num_bits)).cast("long")
        for s in seeds
    ]


def bloom_build(
    build: DataFrame,
    key: str | Column,
    *,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Aggregate *build*'s keys into a one-row bloom bitmap DataFrame
    (column ``__bloom_bitmap: map<long,long>`` of word-index → 64-bit word).

    Wholly distributed: positions fold into words via a ``bit_or`` hash
    aggregate (map-side combined, ≤ num_bits/64 groups), words collapse into
    one map row. Nothing key-proportional ever reaches the driver.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    seeds = list(range(1, num_hashes + 1))
    pos = build.select(
        F.explode(F.array([p for p in _bit_positions(key_col, seeds, num_bits)])).alias(
            "__p"
        )
    )
    words = pos.groupBy((F.col("__p") / 64).cast("long").alias("__w")).agg(
        F.bit_or(F.expr("shiftleft(1L, CAST(__p % 64 AS INT))")).alias("__bits")
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("__w", "__bits"))).alias(_BF_COL)
    )


def bloom_probe(
    probe: DataFrame,
    bitmap: DataFrame,
    key: str | Column,
    *,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Filter *probe* to rows whose key MIGHT exist in the bloom *bitmap*
    (superset of the true matches; no false negatives).

    The one-row bitmap attaches via a broadcast cross join (a single row —
    Spark plans a BroadcastNestedLoopJoin that is effectively a map-side
    variable binding), then k codegen'd bit tests run ahead of any shuffle.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    seeds = list(range(1, num_hashes + 1))
    out = probe.crossJoin(F.broadcast(bitmap))
    pos_cols = []
    for i, p in enumerate(_bit_positions(key_col, seeds, num_bits)):
        out = out.withColumn(f"__bf_p{i}", p)
        pos_cols.append(f"__bf_p{i}")
    tests = [
        F.expr(
            f"(shiftright(coalesce(element_at({_BF_COL}, "
            f"CAST({c} div 64 AS LONG)), 0L), "
            f"CAST({c} % 64 AS INT)) & 1L) = 1L"
        )
        for c in pos_cols
    ]
    cond = tests[0]
    for t_ in tests[1:]:
        cond = cond & t_
    return out.filter(cond).drop(_BF_COL, *pos_cols)


def bloom_semi_reduce(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    *,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Reduce *fact* to rows whose *fact_key* plausibly joins *dim*
    (build bloom on dim, probe fact). Callers join the result to *dim*
    normally; the join output equals the unreduced join exactly.
    """
    bitmap = bloom_build(dim, dim_key, num_bits=num_bits, num_hashes=num_hashes)
    return bloom_probe(
        fact, bitmap, fact_key, num_bits=num_bits, num_hashes=num_hashes
    )

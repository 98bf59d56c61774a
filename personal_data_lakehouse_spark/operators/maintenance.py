"""Table maintenance: small-file compaction, clustered writes, file stats.

The reference accumulates one small Delta commit per daily run
(ingest_stocks.py:82-111 appends a ~300-row batch per ticker-day;
transforme_stock_silver.py:140-149 rewrites silver partitions) and relies on
Dataproc-side table services to keep the lake healthy. This module is that
missing service layer, Spark-native:

- ``compact_small_files``: bin-pack a parquet directory's files back to a
  target file size. At 100 TB the enemy is the metadata plane — a daily
  append pipeline produces O(partitions × days) files, and a 100k-file table
  spends longer listing/planning than scanning. Compaction is an
  embarrassingly parallel rewrite: no shuffle (coalesce, not repartition)
  unless re-clustering is requested.
- ``clustered_write``: range-partition + sort-within-partitions on the
  cluster keys before writing — the poor man's Z-ORDER. Parquet row-group
  min/max stats become tight and disjoint on the sort key, so any engine
  reading the output (Spark, DuckDB, Trino) skips row groups on point/range
  predicates against that key.
- ``file_stats``: per-file row counts + key min/max from the live data
  (``input_file_name``), the observability signal that decides WHEN to
  compact (many files ≪ target size) and whether clustering holds
  (overlapping key ranges between files).
"""

from __future__ import annotations

import math
import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def file_stats(
    spark: SparkSession, path: str, key: str | None = None
) -> DataFrame:
    """Per-file health stats: rows per file, and when *key* is given its
    min/max per file — overlap between files means clustering has decayed."""
    df = spark.read.parquet(path).withColumn("file", F.input_file_name())
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if key is not None:
        aggs += [F.min(key).alias("key_min"), F.max(key).alias("key_max")]
    return df.groupBy("file").agg(*aggs)


def zorder_value(cols: Sequence[str], bits: int = 16) -> "Column":
    """Morton (Z-order) key: interleave the low *bits* of each column so a
    sort on the result gives every participating column partial locality —
    the multi-dimensional upgrade of single-key range clustering. Built as
    a pure bit-arithmetic expression tree (shift/and/or), so it compiles
    into whole-stage codegen: no UDF, no extra pass over the data.

    Columns must be non-negative integers that fit *bits* bits (pre-bucket
    wider domains: ``F.ntile`` or ``col % 2**bits``); with k columns the
    z-value occupies k·bits ≤ 63 bits of a LongType."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds a 64-bit z-value")
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        col = F.col(c).cast("long")
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(col, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cluster_by: Sequence[str],
    mode: str = "overwrite",
    target_files: int | None = None,
    bits: int = 16,
) -> None:
    """Write *df* Z-ORDER-clustered on *cluster_by*: range-partition + sort
    on the interleaved key, then drop it. Point/range predicates on ANY of
    the cluster columns skip most files/row-groups (verified against
    pyarrow statistics in tests/test_maintenance.py) — where single-key
    clustering only serves its leading column. Same cost as
    ``clustered_write``: one range exchange.

    Empty input (min/max stats all NULL) falls back to a plain write — there
    is nothing to cluster and the interleave arithmetic would fault on None.
    Rows with a NULL cluster value land in the lowest z-bucket (sentinel 0)
    instead of an unclustered NULL range partition, so they stay contiguous
    and every non-NULL range stays tight."""
    # Rescale every column onto the full bits-wide domain first — without
    # this, a narrow column's high bits are constant zeros and the z-value's
    # top bits (the ones range partitioning actually splits on) carry only
    # the widest column, silently degrading to single-key clustering.
    lo_hi = df.select(
        *[F.min(c).cast("double").alias(f"__lo_{j}") for j, c in enumerate(cluster_by)],
        *[F.max(c).cast("double").alias(f"__hi_{j}") for j, c in enumerate(cluster_by)],
    ).first()
    if lo_hi is None or any(
        lo_hi[f"__lo_{j}"] is None or lo_hi[f"__hi_{j}"] is None
        for j in range(len(cluster_by))
    ):
        df.write.mode(mode).parquet(path)
        return
    full = float((1 << bits) - 1)
    scaled = []
    for j, c in enumerate(cluster_by):
        lo, hi = lo_hi[f"__lo_{j}"], lo_hi[f"__hi_{j}"]
        span = (hi - lo) or 1.0
        scaled.append(
            F.coalesce(
                F.floor(
                    (F.col(c).cast("double") - F.lit(lo)) * full / F.lit(span)
                ).cast("long"),
                F.lit(0).cast("long"),
            ).alias(f"__s_{j}")
        )
    part = df.select("*", *scaled)
    zc = zorder_value([f"__s_{j}" for j in range(len(cluster_by))], bits=bits)
    part = part.withColumn("__z", zc).drop(
        *[f"__s_{j}" for j in range(len(cluster_by))]
    )
    part = (
        part.repartitionByRange("__z")
        if target_files is None
        else part.repartitionByRange(target_files, "__z")
    )
    part.sortWithinPartitions("__z").drop("__z").write.mode(mode).parquet(path)


def clustered_write(
    df: DataFrame,
    path: str,
    cluster_by: Sequence[str],
    mode: str = "overwrite",
    target_files: int | None = None,
) -> None:
    """Write *df* range-clustered on *cluster_by*: rows are range-partitioned
    (one contiguous key range per output file) and sorted within each file,
    so parquet row-group min/max stats prune on the cluster key for every
    downstream reader. One shuffle (range exchange with sampled bounds) —
    the same cost Z-ORDER pays, linear in data size and fully parallel."""
    cols = [F.col(c) for c in cluster_by]
    part = df.repartitionByRange(*cols) if target_files is None else (
        df.repartitionByRange(target_files, *cols)
    )
    part.sortWithinPartitions(*cols).write.mode(mode).parquet(path)


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_by: Sequence[str] | None = None,
) -> dict:
    """Rewrite the parquet directory at *path* into ≈target-sized files.

    Plain compaction is shuffle-free (coalesce narrows the scan's splits
    into fewer write tasks); passing ``cluster_by`` upgrades the rewrite to
    a clustering rewrite (one range shuffle).

    Swap semantics — crash-SAFE, not crash-INVISIBLE: the data always
    survives (a failure leaves the old directory either live or intact
    under ``{path}__old_<hex>``, and the new one under
    ``{path}__compact_<hex>``; recovery = ``mv`` the surviving directory
    back to *path*), but between the two renames there is a brief window
    where *path* does not exist and concurrent readers fail transiently.
    Single-maintainer usage assumed, matching a table-service compaction
    job. A zero-downtime swap needs a pointer indirection — use
    ``catalog.write_versioned`` when readers must never observe a gap.

    Returns {"files_before", "files_after", "bytes"} for observability.
    """

    def _n_files(p: str) -> int:
        return sum(
            1
            for _r, _d, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )

    before = _n_files(path)
    total = _dir_bytes(path)
    n_out = max(1, math.ceil(total / target_file_bytes))
    staging = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    df = spark.read.parquet(path)
    if cluster_by:
        clustered_write(df, staging, cluster_by, target_files=n_out)
    else:
        df.coalesce(n_out).write.mode("overwrite").parquet(staging)
    old = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    return {"files_before": before, "files_after": _n_files(path), "bytes": total}


# ---------------------------------------------------------------------------
# Manifest-based data skipping (the Delta/Iceberg stats-pruning read path)


def write_manifest(spark: SparkSession, path: str, key: str) -> int:
    """Persist per-file (n_rows, key min/max) stats as ``_manifest.json``
    next to the data — the engine-side equivalent of the stats Delta keeps
    in its transaction log. Computed with ONE scan at write time so every
    later read plans from the manifest without touching data files.
    Returns the number of files recorded."""
    import json

    rows = file_stats(spark, path, key).collect()
    manifest = {
        "key": key,
        "files": [
            {
                "file": r["file"],
                "n_rows": r["n_rows"],
                "key_min": r["key_min"],
                "key_max": r["key_max"],
            }
            for r in rows
        ],
    }
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f)
    return len(rows)


def plan_skipping(
    spark: SparkSession,
    path: str,
    key: str,
    lo=None,
    hi=None,
) -> tuple[list[str], int]:
    """File-pruning plan for ``key BETWEEN lo AND hi`` (either bound may be
    None): consult ``_manifest.json`` when present (no data I/O), else
    compute stats on the fly. Files whose [key_min, key_max] cannot
    intersect the predicate are skipped; files with NULL stats (all-NULL
    key) are kept conservatively — the residual filter disposes of their
    rows. Returns (files_to_read, total_files)."""
    import json

    mpath = os.path.join(path, "_manifest.json")
    entries = None
    if os.path.exists(mpath):
        with open(mpath) as f:
            doc = json.load(f)
        if doc.get("key") != key:
            raise ValueError(
                f"manifest at {mpath} covers key {doc.get('key')!r}, not {key!r}"
            )
        entries = doc["files"]
        # Staleness guard: a writer that appended files after write_manifest
        # would otherwise be silently excluded from pruned reads. Compare the
        # manifest's file set against the live directory listing (by
        # basename — input_file_name() records file: URIs); on any
        # divergence fall back to on-the-fly stats rather than return an
        # incomplete read.
        live = {
            f
            for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        }
        recorded = {os.path.basename(e["file"]) for e in entries}
        if recorded != live:
            entries = None
    if entries is None:
        entries = [r.asDict() for r in file_stats(spark, path, key).collect()]
    keep = []
    for e in entries:
        kmin, kmax = e["key_min"], e["key_max"]
        if lo is not None and kmax is not None and kmax < lo:
            continue
        if hi is not None and kmin is not None and kmin > hi:
            continue
        keep.append(e["file"])
    return keep, len(entries)


def read_skipping(
    spark: SparkSession,
    path: str,
    key: str,
    lo=None,
    hi=None,
) -> DataFrame:
    """Manifest-pruned read: open ONLY the files that can contain
    ``key BETWEEN lo AND hi``, then apply the residual predicate (file
    pruning is a superset guarantee, not an exact one). With a clustered /
    z-ordered layout this skips all but the matching key ranges before a
    single data byte is read — the core data-skipping contract of the
    table formats, implemented against plain parquet."""
    files, _total = plan_skipping(spark, path, key, lo, hi)
    if not files:
        empty = spark.read.parquet(path).filter(F.lit(False))
        return empty
    df = spark.read.parquet(*files)
    if lo is not None:
        df = df.filter(F.col(key) >= F.lit(lo))
    if hi is not None:
        df = df.filter(F.col(key) <= F.lit(hi))
    return df

"""As-of join — Spark lacks a native one (SURVEY §2.3 J3 class; pyspark
guide "Common OLAP patterns").

Implementation: the union+window trick. Tag left (probe) and right
(reference) rows, union them, and per key take the running ``last`` of the
reference columns over (ts, tag) ordering — each probe row then carries the
most recent reference row with ``ref.ts <= probe.ts``.

Scale: ONE shuffle (by key) + one window sort — same cost as a sort-merge
join, no range explosion, no skew beyond the key distribution. This is the
standard formulation for time-series point-in-time correctness (e.g.
feature stores / trade-quote matching).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` per ``on`` key (left outer semantics).

    ``value_cols`` are the right-side columns to carry. Right rows are
    deduplicated per (key, ts) deterministically (max by value columns)
    before matching, so ties are well-defined in any engine.
    """
    r = (
        right.groupBy(on, F.col(right_ts).alias("__rts"))
        .agg(*[F.max(c).alias(c) for c in value_cols])
        .withColumn("__tag", F.lit(0))
    )
    l = left.withColumn("__rts", F.col(left_ts)).withColumn("__tag", F.lit(1))
    for c in value_cols:
        l = l.withColumn(c, F.lit(None).cast(dict(r.dtypes)[c]))
    l = l.select(*left.columns, "__rts", "__tag", *value_cols)

    combined = l.unionByName(
        r.select(
            *[
                F.lit(None).cast(dict(l.dtypes)[c]).alias(c)
                for c in left.columns
                if c != on
            ],
            F.col(on),
            "__rts",
            "__tag",
            *value_cols,
        )
    )
    # reference rows sort before probe rows at equal timestamps (<= match)
    w = (
        Window.partitionBy(on)
        .orderBy("__rts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = combined.select(
        *left.columns,
        F.col("__tag"),
        F.last(F.when(F.col("__tag") == 0, F.col("__rts")), ignorenulls=True)
        .over(w)
        .alias("matched_ts"),
        *[
            F.last(F.when(F.col("__tag") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"matched_{c}")
            for c in value_cols
        ],
    )
    return out.filter(F.col("__tag") == 1).drop("__tag")

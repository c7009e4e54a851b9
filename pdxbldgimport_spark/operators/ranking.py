"""Distributed exact global ranking without a global sort.

``ROW_NUMBER() OVER (ORDER BY ...)`` with no PARTITION BY plans as a
single-task window — the one operator shape that can never survive a
10^12-row input. This module provides the standard two-phase
re-expression (the same decomposition Spark's own ``rangepartitioning``
sort uses internally, made explicit so the rank is *exact* and
*deterministic*):

1. route every row to a coarse **bucket** whose boundaries respect the
   target order (bucket is a monotone function of the leading sort key);
2. count rows per bucket — one partial/final hash aggregation; the
   bucket table is bounded by bucket cardinality (hundreds–thousands of
   rows), independent of corpus size;
3. prefix-sum the bucket counts with a window over the *bucket table*
   (tiny — never the corpus) to get each bucket's global offset;
4. broadcast the offsets back onto the corpus and take
   ``row_number()`` *within bucket* — a parallel window, one task per
   bucket per partition-group;
5. ``rank = offset + within-bucket row_number - 1`` (0-based).

Reference analog: the ordered export stages (tasks/
metro_quarter_secs.rake ordered tile writes) produce a total order the
same way — per-tile local order plus a tile-level offset manifest —
rather than one global ORDER BY. Used by ``str_pack`` (R-tree bulk
loading) and ``curriculum_order`` (training-curriculum positions) in
queries_spatial.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as Wnd, functions as F


def global_rank(
    df: DataFrame,
    bucket: Column,
    order_cols: list[Column],
    rank_col: str = "rank",
    partition_cols: list[str] | None = None,
    max_rank: int | None = None,
) -> DataFrame:
    """Append 0-based exact rank of each row under ``ORDER BY
    order_cols`` (per ``partition_cols`` group if given, else globally).

    ``bucket`` MUST be order-consistent with ``order_cols``: for any two
    rows a, b in the same partition group, ``bucket(a) < bucket(b)``
    implies a sorts before b (i.e. bucket is a monotone coarsening of
    the leading sort key). Ties across the full ``order_cols`` list must
    be impossible (pin with a unique id column last) or ranks are
    nondeterministic.

    ``max_rank`` (r6): when the caller only consumes rows with
    ``rank < max_rank`` (top-K per group), pass it so the second pass
    prunes before the window instead of ranking the whole input: buckets
    whose offset ≥ max_rank cannot contain a qualifying row (rank ≥
    offset) and are dropped from the broadcast, which drops their rows
    at the broadcast hash join — map-side, before the window exchange;
    and the within-bucket ``row_number() ≤ max_rank`` filter compiles to
    WindowGroupLimit (rank = off + rn − 1 < max_rank ⇒ rn ≤ max_rank),
    so each map task forwards at most max_rank rows per bucket. Rows
    with rank ≥ max_rank may still appear (when offset > 0); the
    caller's own rank filter remains responsible for the exact cut —
    output below max_rank is COMPLETE, above it only partial.

    Scale shape: one corpus aggregation (bucket counts), one window over
    the bounded bucket table, one broadcast join back, one window
    *partitioned by bucket* — no stage ever holds more than one bucket's
    rows in a single task.
    """
    parts = list(partition_cols or [])
    work = df.withColumn("__bkt", bucket)
    counts = work.groupBy(*parts, "__bkt").agg(F.count(F.lit(1)).alias("__bc"))
    off_w = (
        Wnd.partitionBy(*parts).orderBy("__bkt")
        if parts
        else Wnd.partitionBy(F.lit(1)).orderBy("__bkt")
    )
    offsets = counts.select(
        *parts,
        "__bkt",
        (F.coalesce(F.sum("__bc").over(off_w), F.lit(0)) - F.col("__bc")).alias(
            "__off"
        ),
    )
    if max_rank is not None:
        offsets = offsets.where(F.col("__off") < max_rank)
    rn_w = Wnd.partitionBy(*parts, "__bkt").orderBy(*order_cols)
    ranked = work.join(F.broadcast(offsets), parts + ["__bkt"]).withColumn(
        "__rn", F.row_number().over(rn_w)
    )
    if max_rank is not None:
        ranked = ranked.where(F.col("__rn") <= max_rank)
    return (
        ranked.withColumn(
            rank_col,
            (F.col("__off") + F.col("__rn") - F.lit(1)).cast("long"),
        )
        .drop("__bkt", "__off", "__rn")
    )

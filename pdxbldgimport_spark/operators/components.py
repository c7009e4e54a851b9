"""Connected components over duplicate-candidate pair graphs.

Turns the pairwise output of the dedup family (minhash-LSH / simhash /
n-gram-Jaccard pairs) into duplicate CLUSTERS: every document gets the
minimum doc_id of its component as ``component_id``, so "keep one doc
per near-dup cluster" is a single filter (``doc_id = component_id``)
instead of an ad-hoc pair walk.

Algorithm: the alternating large-star / small-star method (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC 2014) — the
standard shape for trillion-edge graphs. Each round is two
groupBy+join passes over the edge set; the edge set only shrinks
toward a star forest, and convergence takes O(log n) rounds. No
per-node driver loop, no Python row work: every pass is a hash
aggregation plus a hash join, so the per-round cost is two bounded
shuffles of the (shrinking) edge list. The driver-side loop runs only
the O(log n) convergence test (count + hash checksum — one tiny
collect per round), which is the legitimate iterative-algorithm
exception to the no-driver-loop rule.

Reference parity: the reference has no graph stage (its dedup is
pairwise DELETE USING, tasks/pdx_bldgs.rake:84-90); this operator is
part of the LLM-training-data pipeline family the round instructions
add on top of the reference surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_ROUNDS = 25  # convergence-test budget; ~log2 of any graph that fits this planet
# Star-rounds fused per lineage cut + convergence test. Measured at
# sf0.1 (same host window, min-of-2): BATCH_ROUNDS=2 is ~2x SLOWER than
# 1 — the duplicated DataFrame references inside a fused round multiply
# map-side recompute faster than the saved convergence-test jobs pay
# back (ReuseExchange dedupes only identical shuffle subtrees, and the
# star ops' branches shuffle different projections). Keep at 1; the win
# over the previous shape is the lazy cut (one job per round, not two).
BATCH_ROUNDS = 1


def _checksum(edges: DataFrame) -> tuple:
    """Order-insensitive fingerprint of an edge set (count + summed
    hashes). One small collect per round — the convergence test.
    Sums accumulate in DECIMAL(38,0): node ids may use the full 60-bit
    hash-id space (host_components), where an int64 SUM overflows under
    ANSI after a few hundred rows; 38 digits hold any edge set this
    operator will ever see (10^19 ids × 10^18 edges < 10^38)."""
    dec = "decimal(38,0)"
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.hash("u", "v").cast(dec)).alias("h"),
        F.sum(F.col("u").cast(dec)).alias("su"),
        F.sum(F.col("v").cast(dec)).alias("sv"),
    ).first()
    return (row["n"], row["h"], row["su"], row["sv"])


def _large_star(sym: DataFrame) -> DataFrame:
    """For each node u with neighborhood G(u): connect every neighbor
    v > u to m = min(G(u) + {u}). Input must be symmetric."""
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", "u").alias("m"))
    )
    return (
        sym.where(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node u over its smaller neighbors G-(u) = {v < u}:
    m = min(G-(u)); connect u and every other v in G-(u) to m."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    d = sym.where(F.col("v") < F.col("u"))
    mins = d.groupBy("u").agg(F.min("v").alias("m"))
    to_m = d.join(mins, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    u_to_m = mins.select(F.col("u"), F.col("m").alias("v"))
    return (
        to_m.union(u_to_m).where(F.col("u") != F.col("v")).distinct()
    )


def connected_components(
    nodes: DataFrame, edges: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Label every node with the min node id of its component.

    ``nodes``: one column ``id_col``. ``edges``: columns (u, v), any
    direction, self-loops/dups tolerated. Returns (id_col,
    component_id) with one row per node; isolated nodes label
    themselves. Deterministic for a given node/edge set.
    """
    from pyspark import StorageLevel

    def _cut(df: DataFrame) -> DataFrame:
        # LAZY lineage cut per batch: without it the logical plan keeps
        # nesting and Catalyst re-analyzes an exponentially growing
        # operator tree. eager=False so the _checksum action both
        # materializes the checkpoint AND reads the convergence
        # fingerprint in ONE job (eager=True cost a second job per
        # round — pure scheduler overhead at small edge counts).
        # DISK_ONLY for the same reason stage() uses it — checkpoint
        # blocks in the driver heap tax every later query. Superseded
        # rounds' blocks stay on disk until session end; the edge set
        # shrinks monotonically so the total is < 2x the input edges.
        return df.localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)

    def _round(edge_df: DataFrame) -> DataFrame:
        sym = edge_df.union(
            edge_df.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        return _small_star(_large_star(sym))

    e = _cut(
        edges.select(F.col("u").cast("long"), F.col("v").cast("long"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    prev = None
    for _ in range(MAX_ROUNDS):
        # BATCH_ROUNDS star-rounds per materialization: the driver-side
        # convergence test (one small collect) is the per-iteration
        # fixed cost, so fusing rounds amortizes it; identical shuffle
        # subtrees inside the fused plan are deduplicated by Spark's
        # ReuseExchange, so the duplicated DataFrame references do not
        # recompute their shuffles. Extra rounds past the fixpoint are
        # no-ops (both star ops are identity on a star forest).
        e2 = e
        for _ in range(BATCH_ROUNDS):
            e2 = _round(e2)
        e2 = _cut(e2)
        cur = _checksum(e2)
        e = e2
        if cur == prev or cur[0] == 0:
            break
        prev = cur
    else:  # pragma: no cover - MAX_ROUNDS is ~log2(anything real)
        raise RuntimeError("connected_components did not converge")
    # converged: e is a star forest (child -> component root)
    labels = e.select(F.col("u").alias(id_col), F.col("v").alias("component_id"))
    return (
        nodes.select(F.col(id_col).cast("long"))
        .join(labels, id_col, "left")
        .select(
            id_col,
            F.coalesce("component_id", F.col(id_col)).alias("component_id"),
        )
    )

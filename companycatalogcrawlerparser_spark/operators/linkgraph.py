"""Link-graph quality metrics for the crawl corpus.

The reference stops at per-page extraction (its DB has no link table —
``DbAccess.fs`` stores companies/emails only); a 100 TB training-data
pipeline additionally scores hosts/pages by link-graph centrality to
weight or filter the corpus (the classic crawl-quality signal). This
module provides PageRank as a pure DataFrame power iteration.

Scale notes (the reason this is NOT MLlib/GraphFrames):
- every iteration is exactly two shuffles — one join of ranks onto the
  edge list keyed by source, one ``groupBy(dst)`` of the contributions —
  so cost is O(iters * |E|) with no driver-side state and no cartesian;
- the edge list and out-degrees are bound ONCE (eager localCheckpoint)
  and reused every round, and each round's rank frame is checkpointed —
  iterative self-joins otherwise stack an exponentially deepening
  lineage (same discipline as :func:`dedup.connected_components` and the
  crawl's frontier loop);
- arithmetic is FIXED-POINT INTEGER (rank scaled by ``scale``, damping
  applied as ``(rank * d_num) div (d_den * outdeg)``): sums of longs are
  associative/commutative, so the result is bit-identical regardless of
  partitioning, core count, or aggregation order — float PageRank
  differs in the last ulp between any two plans, which would make
  cross-engine and cross-run hash verification impossible. The quantum
  (1/scale) bounds the error per edge per round; rank_q fits int64 up to
  in-neighbour mass ~9e12 * scale, far beyond any web graph's max
  in-degree share.

Semantics: the un-normalized "citation rank" recurrence
``r(v) = (1-d) + d * sum_{u->v} r(u)/outdeg(u)`` over DISTINCT edges,
self-loops included verbatim, dangling-node mass dropped (the standard
simple formulation; redistribution variants change only the constant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, rank_q) for every node appearing in ``edges``.

    ``rank_q`` is the fixed-point rank scaled by ``scale`` (divide by
    ``scale`` for the conventional value; iteration 0 starts every node
    at 1.0 = ``scale``). ``iters`` is intentionally explicit and small:
    crawl-quality weighting uses a handful of power rounds, and an
    unrolled-SQL oracle can mirror any fixed ``iters`` exactly.
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"),
            F.col(dst).cast("long").alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = (
        e.groupBy("u").agg(F.count("*").alias("deg")).localCheckpoint(eager=True)
    )
    base = scale * (damping_den - damping_num) // damping_den
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank_q"))
    for _ in range(iters):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "u"), "u")
            .join(outdeg, "u")
            .select(
                F.col("v").alias("node"),
                F.expr(
                    f"(rank_q * {damping_num}) div ({damping_den} * deg)"
                ).alias("c"),
            )
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("s"), F.lit(0)))
                .cast("long")
                .alias("rank_q"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks

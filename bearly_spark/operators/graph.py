"""Iterative graph analytics: PageRank over DataFrame edge lists.

Connected components (``dedup.connected_components``) covers the
clustering face of graph work; PageRank covers the CENTRALITY face — a
standard corpus-curation signal (rank web documents by link authority,
suppliers/parts by structural importance) and the canonical
fixed-iteration join+aggregate loop.

Scale design (same contract as the components loop):

- one iteration = one join of the edge list with the current rank
  vector (shuffles on node id only — the edge list's payload never
  moves), one partial-aggregated groupBy on the destination, and a
  constant-folded damping expression;
- ``localCheckpoint`` per iteration truncates lineage, so the plan for
  iteration k is flat instead of doubling (the round-4 components
  lesson, applied from the start here);
- iteration count is FIXED (power iteration converges geometrically;
  curation uses a handful of iterations), so wall-clock is
  iterations × one-shuffle, independent of graph diameter.

Determinism contract (what makes an ITERATIVE float algorithm
hash-twinnable in DuckDB): per-edge contributions are rounded to 12dp
and summed as DECIMAL(28,12) — order-independent — then the damped
update is plain double arithmetic rounded to 10dp per iteration, so
both engines walk bit-identical rank vectors. Every node must have at
least one out-edge (symmetric/bipartite edge lists guarantee it;
dangling-mass redistribution is deliberately out of scope and
documented rather than silently approximated).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list. For an
    undirected graph pass the symmetrized edges. Returns (node, rank)
    for every node that appears as a source (with ≥ 1 out-edge —
    see the module docstring's dangling-node contract)."""
    # Pin the edge list hash-partitioned on src ONCE: every iteration
    # joins on src, so the (large) edge side never re-shuffles — only
    # the Θ(nodes) rank vector moves per iteration. deg derives from
    # the same partitioning (its groupBy needs no exchange).
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .repartition("src")
        .persist()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    n = deg.count()  # also pins both tables for the loop
    base = (1.0 - damping) / n

    # exact double 1/n, NOT pre-rounded: the twin computes 1.0/n in SQL
    # and IEEE division of the same integers is bit-identical
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(1.0 / n).alias("rank")
    ).localCheckpoint(eager=True)
    nodes = deg.select(F.col("src").alias("node"))
    for _ in range(iterations):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.round(F.col("rank") / F.col("deg"), 12)
                .cast("decimal(28,12)")
                .alias("w"),
            )
        )
        agg = contrib.groupBy("node").agg(F.sum("w").cast("double").alias("_s"))
        # left-join back onto the FULL node set: a node with out-edges
        # but no in-edges (possible on non-symmetric graphs) must keep
        # its base rank and stay in the vector — grouping only the
        # contribution stream would silently drop it AND its out-edges
        # from every later iteration (review catch, round 6)
        ranks = (
            nodes.join(agg, "node", "left")
            .select(
                "node",
                F.round(
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("_s"), F.lit(0.0)),
                    10,
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks

"""Link-analysis operators over edge DataFrames.

PageRank is the classic importance weighting for web-scraped corpora:
CommonCrawl-derived pipelines weight or filter pages by link centrality
(the original use case of Page et al. 1999), and a dedup cluster graph's
high-centrality nodes are the canonical representatives. Implemented as
a fixed-iteration power method on DataFrames — the same declarative
join+agg per round as `connected_components` (functions/dedup.py), so
Catalyst plans every step and the iteration count bounds the work.

Scale notes (100 TB):

* The edge table dominates (|E| >> |V|). It is normalized (distinct +
  per-source out-degree attached) ONCE, hash-partitioned by `src`, and
  CACHED — persist preserves output partitioning through planning even
  under AQE (a checkpoint's LogicalRDD reports UnknownPartitioning
  there and would re-shuffle |E| every round), so each round's
  edges⋈ranks join reuses the layout and the per-round shuffles move
  only the |V|-row rank table plus the contribution transpose.
* Dangling mass (nodes with no out-edges) is redistributed uniformly,
  the standard stochastic-matrix fix: the dangling flag is a column on
  the rank table, so the per-round scalar is a scan-aggregate — no
  join, same cost class as the convergence scalar in
  `connected_components`.
* Each round ends in `localCheckpoint(eager=True)`: without lineage
  truncation the plan doubles per iteration and Catalyst analysis time
  explodes past ~10 rounds (same finding as the components operators).
* Fixed `iterations` (no convergence test) keeps the operator
  deterministic and oracle-replayable; production callers pick 10-20
  rounds (the power method's error decays as damping^k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Rank nodes of the directed graph ``edges[(src, dst)]`` with
    ``iterations`` rounds of the damped power method; returns
    ``(node, pr)`` with ``sum(pr) == 1``.

    Node ids must share one comparable type across both columns (the
    caller namespaces bipartite graphs, e.g. offsets one side's ids).
    Parallel edges collapse to one (distinct); self-loops participate
    like any edge.
    """
    if iterations < 0:
        raise ValueError("pagerank: iterations must be >= 0")
    if not (0.0 <= damping <= 1.0):
        raise ValueError("pagerank: damping must be in [0, 1]")

    # an edge with a NULL endpoint is no edge (same policy as
    # connected_components): left in, a NULL node would inflate n and
    # the rank mass sent to a NULL dst would vanish at the equi-join
    # every round, deflating sum(pr) below 1
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    # Edge table with out-degree attached: built once, HASH-PARTITIONED
    # BY src, and CACHED (MEMORY_AND_DISK — the GraphX pattern for
    # iterative jobs). persist, not localCheckpoint: under AQE a
    # checkpoint's LogicalRDD reports UnknownPartitioning and every
    # round re-shuffles the |E|-row edge table, while a cached plan's
    # partitioning survives planning (canChangeCachedPlanOutputPartitioning
    # defaults false) — so each round's edges⋈ranks join reuses it and
    # only the |V|-row rank table moves. Lineage truncation is not
    # needed here (the edge plan is shallow and constant); it IS needed
    # for the per-round ranks below, which keep localCheckpoint.
    edges_deg = e.join(deg, "src").repartition("src").persist()
    # The dangling flag rides on the rank table so the per-round
    # dangling-mass scalar is a scan-agg, not a join.
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(
            deg.select(F.col("src").alias("node"), F.lit(False).alias("__d")),
            "node",
            "left",
        )
        .select("node", F.coalesce(F.col("__d"), F.lit(True)).alias("__dang"))
        .persist()
    )
    n = nodes.count()
    if n == 0:
        nodes.unpersist()
        edges_deg.unpersist()
        return nodes.select("node").withColumn("pr", F.lit(0.0))

    ranks = nodes.withColumn("pr", F.lit(1.0 / n)).localCheckpoint(eager=True)
    for _ in range(iterations):
        dangling_mass = (
            ranks.filter(F.col("__dang"))
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)))
            .first()[0]
        )
        contrib = (
            edges_deg.join(
                ranks.select(F.col("node").alias("src"), "pr"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("__deg")).alias("__in"))
        )
        base = (1.0 - damping) / n + damping * dangling_mass / n
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                "__dang",
                (
                    F.lit(base) + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    # the final ranks are checkpointed (independent of the cached
    # inputs), so the iteration-scoped caches can be released
    nodes.unpersist()
    edges_deg.unpersist()
    return ranks.select("node", "pr")

"""Iterative graph computation on DataFrames: weighted PageRank.

The missing pattern class in a join/agg engine is ITERATION: rank
vectors, label propagation, connected components (see
operators/dedup.near_dup_clusters for the latter). This module shows
the canonical loop shape done right for Spark:

- each iteration is one join (ranks ⋈ normalized edges) + one groupBy
  (sum of contributions per destination) + one left join back to the
  node set — all shuffles on the node key, so a cluster co-partitions
  every step;
- **lineage truncation**: without it, iteration k's plan contains k
  copies of the whole dag and Catalyst analysis goes quadratic;
  ``localCheckpoint(eager=True)`` every ``checkpoint_every`` rounds
  caps plan depth (on a cluster, prefer reliable ``checkpoint()`` to
  HDFS — localCheckpoint trades fault-tolerance for speed);
- **deterministic money-grade math**: per-destination contribution
  sums go through DECIMAL(25,6) (plans/common rationale) so ranks are
  identical at any parallelism — which is what lets an iterative
  algorithm be oracle-checked at all (the DuckDB twin unrolls the same
  iterations as chained CTEs).

Dangling-node mass is dropped (standard simplified PageRank); ranks
then sum to < 1 when sinks exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from synthea_etl_spark.plans.common import DEC


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    iterations: int = 5,
    damping: float = 0.85,
    checkpoint_every: int = 2,
    n_nodes: int | None = None,
) -> DataFrame:
    """Weighted PageRank over an edge list. Returns (node, rank).

    ``n_nodes`` may be passed when known (saves one count job); the
    node set itself always derives from the edges."""
    # localCheckpoint (r15/r16, guide §1.2 — the connected_components
    # lesson applied here): nodes consumes edges TWICE (src ∪ dst) and
    # outdeg/en twice more, and the loop re-plans en and nodes every
    # iteration — so an expensive caller edge plan (q118's 4-table
    # lineitem join) re-ran per consumer and per round. The operator
    # pins a narrow (src, dst, weight) projection of the caller's plan
    # FIRST, so that plan executes exactly once; nodes and en are then
    # derived from (and themselves pinned over) the materialized RDD.
    edges = edges.select(src, dst, weight).localCheckpoint()
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    if n_nodes is None:
        n_nodes = nodes.count()
    outdeg = edges.groupBy(src).agg(F.sum(weight).alias("_wout"))
    # normalize once: contribution share per edge, double math in a
    # fixed evaluation order (w / wout) so reruns and oracles agree
    en = (
        edges.join(outdeg, on=src)
        .select(
            F.col(src).alias("_esrc"),
            F.col(dst).alias("_edst"),
            (F.col(weight).cast("double") / F.col("_wout").cast("double")).alias(
                "_wnorm"
            ),
        )
        .localCheckpoint()
    )
    base = (1.0 - damping) / n_nodes
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for i in range(iterations):
        contribs = (
            en.join(ranks, en._esrc == ranks.node)
            .select(
                "_edst",
                (F.col("rank") * F.col("_wnorm")).cast(DEC).alias("_c"),
            )
            .groupBy("_edst")
            .agg(F.sum("_c").cast("double").alias("_s"))
        )
        ranks = nodes.join(contribs, nodes.node == contribs._edst, "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce(F.col("_s"), F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks

"""Synchronous label propagation over an undirected graph.

Semi-supervised labeling: seed nodes carry fixed labels; each round,
every node adopts the majority label among its LABELED neighbors
(ties -> smallest label; seeds are clamped and never change). A FIXED
round count (not a fixpoint) keeps the algorithm deterministic —
synchronous LPA can oscillate on bipartite structures, so "run R
rounds" is the reproducible contract.

Scale posture mirrors operators/kcore.py: per-round work is one
edges x labels join plus a (node, label) count aggregate — both keyed
shuffles bounded by the labeled frontier; label state is
localCheckpoint'ed per round so lineage stays flat. No driver-side
data beyond the loop counter.

Used by q320 (queries/analytics3.py); property-twinned against a
hand-rolled Python propagation in tests/test_properties.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(edges: DataFrame, seeds: DataFrame, rounds: int = 5) -> DataFrame:
    """Return (node, label, is_seed) after `rounds` synchronous updates.

    `edges`: (a, b) undirected, deduplicated. `seeds`: (node, label)
    with integer labels. Unlabeled nodes with no labeled neighbor stay
    absent until a label reaches them.
    """
    adj = edges.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionAll(
        edges.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    seeds = seeds.select("node", "label").localCheckpoint()
    labels = seeds
    for _ in range(rounds):
        msgs = adj.join(
            labels.withColumnRenamed("node", "nbr"), "nbr"
        ).select("node", "label")
        votes = msgs.groupBy("node", "label").agg(F.count("*").alias("cnt"))
        # majority with smallest-label tiebreak: min over (-cnt, label)
        best = (
            votes.groupBy("node")
            .agg(F.min(F.struct((-F.col("cnt")).alias("neg"), "label")).alias("s"))
            .select("node", F.col("s.label").alias("label"))
        )
        labels = seeds.unionAll(
            best.join(seeds.select("node"), "node", "left_anti")
        ).localCheckpoint()
    return labels.join(
        seeds.select("node", F.lit(1).alias("is_seed")), "node", "left"
    ).select("node", "label", F.coalesce("is_seed", F.lit(0)).alias("is_seed"))

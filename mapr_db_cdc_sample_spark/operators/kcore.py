"""k-core decomposition by iterative peeling.

The k-core of an undirected graph is the maximal subgraph in which
every node has degree >= k; it is computed by repeatedly deleting
nodes of degree < k until a fixpoint (the order of deletions does not
matter — the result is unique). A fixpoint with per-round aggregation
is not expressible in a single SQL query (recursive CTEs forbid
aggregates over the recursive term), so the loop runs on the driver
with ONE scalar count per round; per-round shuffles are survivor-sized
and edges are localCheckpoint'ed so lineage stays flat (same pattern
as operators/dedup_pipeline.py's connected components).

Used by q299 (queries/analytics3.py); property-twinned against a
brute-force Python peel on synthetic graphs in tests/test_properties.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_core(edges: DataFrame, k: int, max_rounds: int = 64) -> DataFrame:
    """Return (node, core_degree) for every node in the k-core.

    `edges` must have columns (a, b) with a < b and no duplicates —
    one row per undirected edge. Convergence is monotone (the survivor
    set only shrinks), so the loop is bounded by the peel depth;
    `max_rounds` is a lineage backstop, not a correctness knob.
    """
    e = edges.select("a", "b").localCheckpoint()
    prev = -1
    for _ in range(max_rounds):
        deg = (
            e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("d"))
        )
        keep = deg.where(F.col("d") >= k).select("node")
        n = keep.count()
        if n == prev:
            break
        prev = n
        e = (
            e.join(keep.withColumnRenamed("node", "a"), "a")
            .join(keep.withColumnRenamed("node", "b"), "b")
            .select("a", "b")
            .localCheckpoint()
        )
    return (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("core_degree"))
        .where(F.col("core_degree") >= k)
    )

"""Iterative k-means over the embedding column — the engine's template
for driver-loop iterative algorithms (SURVEY.md §2.2 calls these out as
the genuinely non-SQL-expressible class).

Pattern: per iteration, ONE distributed pass (broadcast centroids →
assign → per-cluster per-dimension means via posexplode + groupBy); the
k×dim centroid matrix — tiny by construction — comes back to the driver
and re-broadcasts. Deterministic init (vec_id < k); float noise only
affects ulps, assignments are argmin with cluster-id tiebreak.

At 100 TB: the data never moves; per iteration cost is one scan + one
(cluster, dim)-keyed aggregation of k*dim*partitions partials. Cache the
assignment input if iterating many times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _assign(vecs: DataFrame, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """Nearest centroid per vector (squared euclidean; ties → lowest id)."""
    spark = vecs.sparkSession
    cdf = F.broadcast(
        spark.createDataFrame(
            [(cid, c) for cid, c in centroids], "cluster int, centroid array<double>"
        )
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("embedding"), F.col("centroid"), lambda x, y: (x.cast("double") - y) ** 2
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("d2"), F.col("cluster"))
    return (
        vecs.join(cdf)
        .select("vec_id", "embedding", "cluster", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "embedding", "cluster", "d2")
    )


def _recompute(assigned: DataFrame, dim: int) -> list[tuple[int, list[float]]]:
    """New centroids = per-cluster per-dimension means (one aggregation);
    k×dim values collected to the driver for re-broadcast."""
    means = (
        assigned.select("cluster", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("cluster", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("m"))
        .groupBy("cluster")
        .agg(F.map_from_entries(F.collect_list(F.struct("pos", "m"))).alias("by_pos"))
        .collect()
    )
    return [
        (r.cluster, [r.by_pos[i] for i in range(dim)])
        for r in sorted(means, key=lambda r: r.cluster)
    ]


def kmeans_lite(
    embeddings: DataFrame, k: int = 5, iters: int = 3, dim: int = 64
) -> tuple[DataFrame, list[float]]:
    """Returns (final assignments with d2, per-iteration total inertia).
    Init: the first k vectors by vec_id (deterministic)."""
    vecs = embeddings.select("vec_id", "embedding")
    init = (
        vecs.where(F.col("vec_id") < k)
        .orderBy("vec_id")
        .select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e"))
        .collect()
    )
    centroids = [(i, list(r.e)) for i, r in enumerate(init)]
    inertia: list[float] = []
    assigned = None
    for _ in range(iters):
        assigned = _assign(vecs, centroids)
        assigned.persist()
        inertia.append(assigned.agg(F.sum("d2")).collect()[0][0])
        centroids = _recompute(assigned, dim)
        assigned.unpersist()
    return _assign(vecs, centroids), inertia

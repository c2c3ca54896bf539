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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign(vecs: DataFrame, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """Nearest centroid per vector (squared euclidean; ties → lowest id).

    The centroid matrix is a k×dim driver-side literal, so assignment is
    a PURE PROJECTION: k inline fold-distances collapsed by
    array_min(struct(d2, cluster)) — struct ordering gives argmin with
    cluster-id tiebreak. No join, no shuffle, no per-vector sort; the
    previous join + row_number form shuffled vecs×k rows through a
    window sort every iteration."""

    def _d2(c: list[float]):
        cen = F.array(*[F.lit(float(v)) for v in c])
        return F.aggregate(
            F.zip_with(F.col("embedding"), cen, lambda x, y: (x.cast("double") - y) ** 2),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    best = F.array_min(
        F.array(
            *[
                F.struct(_d2(c).alias("d2"), F.lit(cid).cast("int").alias("cluster"))
                for cid, c in centroids
            ]
        )
    )
    return vecs.select(
        "vec_id",
        "embedding",
        best["cluster"].alias("cluster"),
        best["d2"].alias("d2"),
    )


def _recompute(
    assigned: DataFrame, dim: int
) -> tuple[list[tuple[int, list[float]]], float]:
    """(new centroids, total inertia) in ONE distributed pass: per-cluster
    per-dimension means via posexplode + groupBy, with the cluster's d2
    sum smuggled into the pos==0 group (d2 is replicated across the dim
    exploded rows, so summing it once per cluster needs a guard). k×dim
    rows come back to the driver for re-broadcast — one action per
    iteration, so the assignment projection never needs caching."""
    rows = (
        assigned.select("cluster", "d2", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("cluster", "pos")
        .agg(
            F.avg(F.col("v").cast("double")).alias("m"),
            F.sum(F.when(F.col("pos") == 0, F.col("d2"))).alias("pd2"),
        )
        .collect()
    )
    by_cluster: dict[int, list[float]] = {}
    inertia = 0.0
    for r in rows:
        by_cluster.setdefault(r.cluster, [0.0] * dim)[r.pos] = r.m
        if r.pos == 0:
            inertia += r.pd2
    return sorted(by_cluster.items()), inertia


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
    for _ in range(iters):
        assigned = _assign(vecs, centroids)
        centroids, it = _recompute(assigned, dim)
        inertia.append(it)
    return _assign(vecs, centroids), inertia

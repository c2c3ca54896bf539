"""Vector math over array<float> embedding columns — JVM-side higher-order
functions (zip_with + aggregate), no Python in the loop.

At 100 TB the rule is: brute-force cosine only against a BROADCAST side
(one query vector, or a small centroid table); all-pairs work goes through
LSH/IVF bucketing first (operators/similarity.py, operators/lsh.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product in double precision (sequential fold, index order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, decimals: int = 4) -> Column:
    """Cosine similarity rounded to `decimals` — the rounding absorbs the
    last-ulp association-order differences between engines, making
    similarity queries oracle-checkable."""
    return F.round(dot(a, b) / (norm(a) * norm(b)), decimals)

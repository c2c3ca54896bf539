"""Approximate near-dup and ANN via pyspark.ml LSH — the 100 TB scale
path for q38/q44/q51's exact forms.

- MinHashLSH over token sets (HashingTF binary vectors): approximate
  Jaccard near-dup join. approxSimilarityJoin only compares within-bucket
  candidates, so cost is ~linear for bounded bucket sizes.
- BucketedRandomProjectionLSH over embeddings: ANN candidate generation,
  re-ranked with exact cosine (functions/vectors.py) — the standard
  two-stage retrieve-then-rerank.

Both are seeded, so results are deterministic run-to-run (checked by the
recall tests against the exact oracles, not by DuckDB hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions import vectors as V

SEED = 42


def _token_vectors(docs: DataFrame, num_features: int = 1 << 16) -> DataFrame:
    """documents → sparse binary 3-gram-shingle vectors (HashingTF is
    seedless murmur3 — deterministic). Shingles, not raw tokens: the
    engine's exact pipeline (q44, operators/banding.py) defines near-dup
    as shingle-set Jaccard, and raw token SETS are pathologically dense
    on a small-vocabulary corpus (every doc shares most distinct words →
    quadratic candidate blowup; measured 1M+ "near-dup" pairs on 5k
    synthetic docs). Same elements on both pipelines → comparable
    thresholds and a meaningful recall test."""
    from pyspark.ml.feature import HashingTF

    toks = docs.select(
        "doc_id", T.shingles(T.tokens(F.col("text")), 3).alias("tk")
    )
    tf = HashingTF(inputCol="tk", outputCol="features", numFeatures=num_features, binary=True)
    return tf.transform(toks).where(F.size("tk") > 0)


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.4, num_hash_tables: int = 8) -> DataFrame:
    """Approximate Jaccard near-dup pairs (distance < threshold)."""
    from pyspark.ml.feature import MinHashLSH

    vecs = _token_vectors(docs)
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=SEED
    )
    model = mh.fit(vecs)
    joined = model.approxSimilarityJoin(vecs, vecs, threshold, distCol="jaccard_dist")
    return (
        joined.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(F.col("jaccard_dist"), 4).alias("jaccard_dist"),
        )
    )


def brp_ann_candidates(
    embeddings: DataFrame, query_vec_id: int = 0, k: int = 10, bucket_length: float = 2.0
) -> DataFrame:
    """ANN: LSH-bucketed candidate generation + exact cosine re-rank.
    Returns top-k (vec_id, sim) for the query vector."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    vecs = embeddings.select(
        "vec_id", "embedding", array_to_vector("embedding").alias("features")
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=4,
        seed=SEED,
    )
    model = brp.fit(vecs)
    q = vecs.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qe"), F.col("features").alias("qf")
    )
    # Candidates: everything sharing >=1 hash bucket with the query
    # (approxNearestNeighbors is driver-side single-vector; the join form
    # is the one that scales to a query TABLE).
    joined = model.approxSimilarityJoin(
        vecs.where(F.col("vec_id") != query_vec_id), q.select(F.col("qf").alias("features")), float("inf"), distCol="l2"
    )
    cands = joined.select(
        F.col("datasetA.vec_id").alias("vec_id"),
        F.col("datasetA.embedding").alias("embedding"),
    ).join(F.broadcast(q.select("qe", V.norm(F.col("qe")).alias("qn"))))
    return (
        cands.select(
            "vec_id",
            V.cosine_pre(F.col("embedding"), F.col("qe"), F.col("qn")).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(k)
    )

"""Vectorized (Arrow) similarity kernels — the pandas_udf alternative to
the expression-based functions/vectors.py. Used when the per-row work is
heavy enough that NumPy's SIMD beats codegen'd scalar folds; results are
identical after round(4)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def cosine_to_query_udf(query_vec: list[float]):
    """Build a pandas_udf computing cosine(embedding, query) in float64.
    The query vector is closed over → serialized once per task, not per
    row; batches arrive as Arrow arrays."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))

    @pandas_udf("double")
    def cos(batch: pd.Series) -> pd.Series:
        m = np.vstack(batch.map(lambda a: np.asarray(a, dtype=np.float64)))
        dots = m @ q
        norms = np.sqrt((m * m).sum(axis=1))
        return pd.Series(np.round(dots / (norms * qn), 4))

    return cos


def topk_cosine_pandas(embeddings: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Exact top-k cosine via the Arrow kernel (same semantics as
    q38_cosine_topk; one driver-side 64-float fetch for the query)."""
    qrow = embeddings.where(F.col("vec_id") == query_vec_id).select("embedding").head()
    cos = cosine_to_query_udf(list(qrow[0]))
    return (
        embeddings.where(F.col("vec_id") != query_vec_id)
        .select("vec_id", cos(F.col("embedding")).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def pairwise_cosine_udf():
    """pandas_udf computing cosine(a, b) over two array columns in
    float64, rounded to 4 — the vectorized twin of
    functions/vectors.cosine for PAIR frames (q492/q512's 4M-pair
    stages ran the zip_with fold interpreted at ~10us/pair; the Arrow
    kernel batches the same arithmetic through NumPy SIMD)."""

    @pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.vstack(a.map(lambda x: np.asarray(x, dtype=np.float64)))
        mb = np.vstack(b.map(lambda x: np.asarray(x, dtype=np.float64)))
        dots = (ma * mb).sum(axis=1)
        na = np.sqrt((ma * ma).sum(axis=1))
        nb = np.sqrt((mb * mb).sum(axis=1))
        return pd.Series(np.round(dots / (na * nb), 4))

    return cos


def knn_block_topk(
    embeddings: DataFrame,
    k: int,
    cross_label_only: bool = False,
) -> DataFrame:
    """Exact brute-force kNN as (anchor, neighbor, sim, la, lb) top-k
    rows per anchor: the FULL (id, label, matrix) set rides in the UDF
    closure (vocab-sized — ~1MB here; at fleet scale an IVF/LSH index
    replaces this exact baseline, q52's posture), and each Arrow batch
    of anchors does ONE NumPy matmul against it. This removes the
    pair-materialization entirely — the q492/q512 pair join shipped
    ~4GB of duplicated vectors through Arrow (measured 30s warm at
    sf0.1; the block kernel is ~2s). Ranking contract: round(sim, 4)
    FIRST, then (sim DESC, neighbor id ASC) — identical to the SQL
    twins."""
    rows = embeddings.select("vec_id", "label", "embedding").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    labs = np.array([r.label for r in rows], dtype=np.int64)
    mat = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))

    spark = embeddings.sparkSession
    out_schema = (
        "anchor bigint, la bigint, neighbor bigint, lb bigint, sim double"
    )

    def block(batches):
        for pdf in batches:
            a_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            a_lab = pdf["label"].to_numpy(dtype=np.int64)
            a_mat = np.vstack(
                pdf["embedding"].map(lambda x: np.asarray(x, dtype=np.float64))
            )
            a_nrm = np.sqrt((a_mat * a_mat).sum(axis=1))
            sims = np.round(
                (a_mat @ mat.T) / (a_nrm[:, None] * norms[None, :]), 4
            )
            out = {"anchor": [], "la": [], "neighbor": [], "lb": [], "sim": []}
            for i in range(len(a_ids)):
                mask = ids != a_ids[i]
                if cross_label_only:
                    mask &= labs != a_lab[i]
                cand_ids = ids[mask]
                cand_lab = labs[mask]
                cand_sim = sims[i][mask]
                order = np.lexsort((cand_ids, -cand_sim))[:k]
                out["anchor"].extend([a_ids[i]] * len(order))
                out["la"].extend([a_lab[i]] * len(order))
                out["neighbor"].extend(cand_ids[order])
                out["lb"].extend(cand_lab[order])
                out["sim"].extend(cand_sim[order])
            yield pd.DataFrame(out)

    return embeddings.select("vec_id", "label", "embedding").mapInPandas(
        block, out_schema
    )

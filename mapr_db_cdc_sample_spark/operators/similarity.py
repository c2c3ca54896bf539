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

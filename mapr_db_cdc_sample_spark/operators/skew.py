"""Skew handling: salted two-stage aggregation and salted joins.

AQE's skew-join splitting (on by default, session.py) covers sort-merge
join skew at runtime; salting is the explicit fallback for aggregations
and for broadcast-ineligible joins against a pathologically hot key. The
two-stage shape: append a random-ish salt to the hot key, partial-agg on
(key, salt) — spreading one key over N reducers — then final-agg on key.

Results are EXACTLY equal to the unsalted plan for decomposable
aggregates (sum/count/min/max); the salt never leaks into output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_sum(
    df: DataFrame,
    key: str | Column,
    value: str | Column,
    n_salts: int = 16,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Two-stage salted aggregation: count(*) and exact decimal sum of
    `value` per `key`, with the first stage spread over `n_salts`
    sub-keys. `salt_source` must be a column that varies WITHIN a key
    (e.g. a row id) so the salt actually spreads; a random salt would
    break deterministic testing."""
    key_col = F.col(key) if isinstance(key, str) else key
    val_col = F.col(value) if isinstance(value, str) else value
    salt_col = (
        F.col(salt_source) if isinstance(salt_source, str) else salt_source
    )
    salt = (salt_col % n_salts).alias("_salt")

    partial = (
        df.select(key_col.alias("_key"), val_col.alias("_val"), salt)
        .groupBy("_key", "_salt")
        .agg(
            F.count("*").alias("_n"),
            F.sum(F.col("_val").cast("decimal(18,2)")).alias("_s"),
        )
    )
    return (
        partial.groupBy("_key")
        .agg(F.sum("_n").alias("n"), F.sum("_s").cast("double").alias("total"))
        .withColumnRenamed("_key", "key")
    )

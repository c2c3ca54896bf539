"""Generic as-of join: for each left row, the latest right row with the
same key and right_ts <= left_ts.

Spark-first shape (used by q12): tag and UNION the two sides, sort once
within key, and carry the right side forward with last(ignoreNulls) over
an unbounded-preceding frame. ONE shuffle on the key — no range join, no
per-row subquery, no skew beyond the key distribution itself. This is the
scalable plan for 100 TB: a range-condition join would degrade to
broadcast-nested-loop or explode the matcher; the union trick stays a
single sort-based window pass.

Ties: rows are ordered (ts, is_left) so a right row at exactly left_ts
IS visible to that left row (<= semantics, matching the SQL oracle's
correlated MAX).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    carry: list[str],
) -> DataFrame:
    """Returns `left` plus, for each carried right column `c`, a column
    `asof_<c>` holding the value from the latest right row at-or-before
    the left row's timestamp (null if none)."""
    l_cols = left.columns
    tagged_left = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*l_cols).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in carry],
    )
    tagged_right = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(tagged_left.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in carry],
    )
    # right rows sort BEFORE left rows at equal ts → <= visibility
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = tagged_left.unionByName(tagged_right)
    carried = unioned.select(
        "_is_left",
        "_l",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}") for c in carry],
    )
    return carried.where(F.col("_is_left") == 1).select(
        *[F.col("_l")[c].alias(c) for c in l_cols],
        *[F.col(f"asof_{c}") for c in carry],
    )

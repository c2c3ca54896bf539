"""Bucketed tables for co-located joins: write both join sides bucketed
by the join key, and the sort-merge join needs NO exchange — the classic
pre-shuffle trade for repeated large-fact joins (at 100 TB, paying one
write-time shuffle to delete every read-time shuffle on the join key).

tests/test_scale_ops.py asserts the Exchange-free plan.
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table_name: str, bucket_key: str, n_buckets: int = 8
) -> None:
    """Persist df as a bucketed+sorted managed table (overwriting).

    A fresh session's metastore doesn't know tables a previous process
    left in the warehouse dir, and saveAsTable then fails with
    LOCATION_ALREADY_EXISTS even in overwrite mode — drop both the
    catalog entry and any orphaned location first."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")).path
    shutil.rmtree(f"{wh}/{table_name}", ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_key)
        .sortBy(bucket_key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on the bucket key — planner elides
    both shuffles (and both sorts, if sortBy matched)."""
    return spark.table(left_table).join(spark.table(right_table), on)

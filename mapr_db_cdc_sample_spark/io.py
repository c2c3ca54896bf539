"""Table loading for the driver-generated parquet testdata (TESTDATA.md).

All scans go through here so predicate pushdown / column pruning are
verified in one place: `spark.read.parquet` + lazy DataFrames keep filters
and projections in Catalyst where they reach the parquet reader
(PushedFilters / ReadSchema in `.explain`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: DataFrame memo per (session, sf_dir, table): reusing the lazy scan
#: object keeps one InMemoryFileIndex/schema per table per session instead
#: of re-listing on every query invocation.
_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One parquet table as a DataFrame (lazy scan, memoized)."""
    key = (id(spark), sf_dir, name)
    if key in _CACHE:
        return _CACHE[key]
    tune(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    ts_type = dict(df.dtypes).get("ts") if name == "events" else None
    if ts_type == "bigint":
        # nanosAsLong read (see session.RUNTIME_CONFS): ns → µs timestamp,
        # truncating exactly like DuckDB does for the same parquet.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        # Parquet timestamp[us] without UTC adjustment reads as
        # TIMESTAMP_NTZ, which withWatermark rejects. Cast to LTZ —
        # identical wall clock under the UTC session timezone, and the
        # type every streaming/event query was validated against.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All tables; also registers each as a temp view for spark.sql use."""
    tune(spark)
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out

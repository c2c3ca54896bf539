"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``        — flagship query on sf0.001 (smoke; rows > 0).
- ``queries()``           — every declared operator from SURVEY.md §2.2,
                            name → callable(spark, sf_dir) → DataFrame.
- ``oracle_sql()``        — matching ANSI SQL for DuckDB, same aliases
                            (driver hash-compares at sf0.01).

Implementations live in the ``mapr_db_cdc_sample_spark`` package; this
module is a thin adapter over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapr_db_cdc_sample_spark.queries import load_all  # noqa: E402

_SF_SMALL = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's CDC pipeline end-to-end at sf0.001 — a
    changelog derived from `events` routed through route_json (R1-R15),
    FTS messages enriched with a broadcast customer join, aggregated per
    routing outcome."""
    from pyspark.sql import functions as F

    from mapr_db_cdc_sample_spark.cdc.fixtures import synth_cdc_from_events
    from mapr_db_cdc_sample_spark.cdc.pipeline import route_json
    from mapr_db_cdc_sample_spark.io import load_tables

    t = load_tables(spark, _SF_SMALL)
    fts, geo = route_json(synth_cdc_from_events(t["events"]))
    enriched = fts.join(
        F.broadcast(t["customer"]),
        fts["_id"] == F.concat(F.lit("user"), t["customer"]["c_custkey"].cast("string")),
        "left",
    )
    return (
        enriched.groupBy("operation")
        .agg(
            F.count("*").alias("n_messages"),
            F.count("c_custkey").alias("n_enriched"),
            F.countDistinct("_id").alias("n_docs"),
        )
        .orderBy("operation")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in sorted(load_all().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checkable query."""
    return {name: q.oracle for name, q in sorted(load_all().items()) if q.oracle}

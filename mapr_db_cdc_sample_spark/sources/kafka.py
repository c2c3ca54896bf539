"""Kafka CDC connector (production path; requires the spark-sql-kafka
package on the cluster — no broker exists in the test container, so this
module is exercised only for plan construction).

Topic naming mirrors the reference's `/stream:topic` convention
(FtsAndGeoServiceJSONWithCDC.java:26-28); the 500 ms trigger mirrors its
poll loop (J:59); kafka.linger.ms ≈ streams.buffer.max.time.ms=300
(J:41). Checkpointing upgrades the reference's auto-commit
(enable.auto.commit=true, J:48) to exactly-once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cdc.schema import CDC_JSON_SCHEMA

DEFAULT_TRIGGER = "500 milliseconds"  # consumer.poll(500), J:59


def read_cdc_topic(spark: SparkSession, bootstrap: str, topic: str) -> DataFrame:
    """Changelog topic → typed CDC rows (R1+R2: source scan + decode).
    The Kafka value is the JSON wire form of a ChangeDataRecord."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "latest")  # auto.offset.reset=latest, J:49
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), CDC_JSON_SCHEMA).alias("r")
    ).select("r.*")


def write_routed(routed: DataFrame, bootstrap: str, checkpoint: str):
    """Wire rows (topic, key, value) → Kafka sink. One writeStream with a
    computed `topic` column does the dual-topic fan-out (R11) without two
    queries; linger mirrors the producer buffering (J:41)."""
    return (
        routed.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("kafka.linger.ms", "300")
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=DEFAULT_TRIGGER)
        .start()
    )

"""Sink helpers (SURVEY.md §2.2 sinks row): console debug (R14's
System.out tracing), parquet append, memory — Kafka lives in
sources/kafka.py (write_routed). All sinks take the wire-form DataFrame
(topic, key, value)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.replay import checkpoint_dir


def console_debug(stream_df: DataFrame, num_rows: int = 20):
    """R14 side-output logging: per-micro-batch console trace. Debug only
    — truncates and serializes to the driver."""
    return (
        stream_df.writeStream.format("console")
        .option("numRows", str(num_rows))
        .option("truncate", "true")
        .option("checkpointLocation", checkpoint_dir())
        .trigger(availableNow=True)
        .start()
    )


def parquet_append(stream_df: DataFrame, path: str, trigger: dict | None = None):
    """Append-mode parquet sink with its own checkpoint (exactly-once via
    the file-sink commit log)."""
    writer = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir())
        .outputMode("append")
    )
    return writer.trigger(**(trigger or {"availableNow": True})).start()

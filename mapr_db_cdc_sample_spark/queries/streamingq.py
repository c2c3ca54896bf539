"""Streaming operators exposed as driver-checkable queries (rows-only:
genuinely non-SQL-expressible per-trigger semantics). Each entry builds a
bounded replay stream from the testdata, drains it with an availableNow
trigger into a memory sink, and returns the result as a batch DataFrame.

These are the SURVEY.md §2.2 streaming rows: the CDC pipeline end-to-end,
tumbling/sliding/session windows, watermarked dedup, stream-static join,
and applyInPandasWithState document materialization.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

from ..cdc.fixtures import synth_cdc_from_events
from ..cdc.schema import CDC_JSON_SCHEMA
from ..io import load_tables
from ..sources.replay import read_replay, run_to_memory, write_replay
from . import register


def _drain(stream_df, prefix: str, output_mode: str = "append"):
    """Run the bounded stream to a memory table. Stateful micro-batches
    pay per-partition state-store overhead, so the smoke drain runs with
    few shuffle partitions (restored afterwards) — on a real cluster this
    is sized to the state volume instead."""
    spark = stream_df.sparkSession
    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        run_to_memory(stream_df, name, output_mode=output_mode)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


#: Rows-only smoke checks exercise semantics, not scale — bound the
#: streamed slice so each streaming query stays fast at any sf.
_MAX_STREAM_EVENTS = 4000


def _events_stream(spark, sf_dir, chunks: int = 3):
    ev = load_tables(spark, sf_dir)["events"].orderBy("event_id").limit(_MAX_STREAM_EVENTS)
    path = write_replay(ev, n_chunks=chunks, order_by="ts")
    return read_replay(spark, path, ev.schema, files_per_trigger=1)


@register("q60_stream_cdc_route")
def q60(spark, sf_dir):
    """R1-R15 as one streaming query: synth changelog replay → foreachBatch
    route → dual parquet sinks (fts/geo wire messages), read back unioned.
    Exactly-once via checkpoint (vs the reference's auto-commit)."""
    from ..streaming.cdc_stream import start_json_pipeline

    ev = load_tables(spark, sf_dir)["events"].orderBy("event_id").limit(_MAX_STREAM_EVENTS)
    cdc = synth_cdc_from_events(ev)
    base = tempfile.mkdtemp(prefix="q60_")
    replay = write_replay(cdc, n_chunks=4, order_by="ts")
    stream = read_replay(spark, replay, CDC_JSON_SCHEMA, files_per_trigger=2)
    fts_dir, geo_dir = f"{base}/fts", f"{base}/geo"
    q = start_json_pipeline(stream, fts_dir, geo_dir)
    q.awaitTermination()
    return spark.read.parquet(fts_dir).unionAll(spark.read.parquet(geo_dir))


@register("q61_tumbling_window")
def q61(spark, sf_dir):
    from ..streaming.windows import tumbling_counts

    return _drain(tumbling_counts(_events_stream(spark, sf_dir)), "q61")


@register("q62_sliding_window")
def q62(spark, sf_dir):
    from ..streaming.windows import sliding_counts

    return _drain(sliding_counts(_events_stream(spark, sf_dir)), "q62")


@register("q63_session_window")
def q63(spark, sf_dir):
    from ..streaming.windows import session_counts

    return _drain(session_counts(_events_stream(spark, sf_dir)), "q63")


@register("q64_stream_dedup")
def q64(spark, sf_dir):
    """Watermarked streaming dedup over a stream with every event doubled."""
    from ..streaming.windows import stream_dedup

    ev = load_tables(spark, sf_dir)["events"].orderBy("event_id").limit(_MAX_STREAM_EVENTS)
    dup = ev.unionAll(ev)
    path = write_replay(dup, n_chunks=2, order_by="ts")
    stream = read_replay(spark, path, ev.schema, files_per_trigger=2)
    return _drain(stream_dedup(stream), "q64")


@register("q65_stream_static_join")
def q65(spark, sf_dir):
    from ..streaming.windows import stream_static_enrich

    cust = load_tables(spark, sf_dir)["customer"]
    return _drain(stream_static_enrich(_events_stream(spark, sf_dir), cust), "q65")


@register("q66_materialize_state")
def q66(spark, sf_dir):
    """Stateful CDC materialization: running current-state view of the
    synth-changelog'd document table (applyInPandasWithState)."""
    from ..streaming.stateful import materialize

    ev = load_tables(spark, sf_dir)["events"].orderBy("event_id").limit(_MAX_STREAM_EVENTS)
    cdc = synth_cdc_from_events(ev)
    path = write_replay(cdc, n_chunks=2, order_by="ts")
    stream = read_replay(spark, path, CDC_JSON_SCHEMA, files_per_trigger=1)
    out = _drain(materialize(stream), "q66", output_mode="update")
    # update-mode memory sink keeps every emit; reduce to the final state
    # per document (max n_changes) for a stable, rows-only-checkable shape
    from pyspark.sql import Window

    w = Window.partitionBy("_id").orderBy(F.col("n_changes").desc())
    return out.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn")


@register("q68_stream_stream_join")
def q68(spark, sf_dir):
    """Stream-stream watermarked band join: clicks x purchases from two
    replay streams of the same events table."""
    from ..streaming.windows import stream_stream_click_purchase

    ev = load_tables(spark, sf_dir)["events"].orderBy("event_id").limit(_MAX_STREAM_EVENTS)
    clicks = ev.where(F.col("event_type") == "click")
    purchases = ev.where(F.col("event_type") == "purchase")
    # one chunk per side: the inner join emits matches within the batch,
    # so a single micro-batch exercises the same semantics at a fraction
    # of the per-batch state-store cost
    cs = read_replay(
        spark, write_replay(clicks, 1, order_by="ts"), ev.schema, files_per_trigger=1
    )
    ps = read_replay(
        spark, write_replay(purchases, 1, order_by="ts"), ev.schema, files_per_trigger=1
    )
    return _drain(stream_stream_click_purchase(cs, ps), "q68")


@register("q69_complete_mode")
def q69(spark, sf_dir):
    """Complete output mode: full aggregate table re-emitted per trigger;
    the memory table holds the final complete result."""
    from ..streaming.windows import tumbling_counts

    return _drain(
        tumbling_counts(_events_stream(spark, sf_dir), watermark="1 minute"),
        "q69",
        output_mode="complete",
    )


@register("q70_stream_cdc_binary")
def q70(spark, sf_dir):
    """Binary-lane CDC streaming: the wide-column golden corpus replayed
    through route_binary (RECORD_UPDATE-as-insert, UTF-8 cell decode,
    FTS-only routing)."""
    from ..cdc.fixtures import golden_binary_events
    from ..cdc.pipeline import fts_wire, route_binary
    from ..cdc.schema import CDC_BINARY_SCHEMA

    cdc = golden_binary_events(spark)
    path = write_replay(cdc.coalesce(1), n_chunks=1)
    stream = read_replay(spark, path, CDC_BINARY_SCHEMA)

    name = f"q70_{uuid.uuid4().hex[:8]}"

    q = (
        fts_wire(route_binary(stream))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="q70_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)

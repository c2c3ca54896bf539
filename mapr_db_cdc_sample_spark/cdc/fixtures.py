"""Golden CDC corpora (FIXTURES.md §A; README.md:126-155, 402-426 of the
reference). Deterministic — timestamps are fixed, not generated.

Also: synth_cdc_from_events derives a large CDC changelog from the
driver-generated `events` table so the pipeline can be exercised (and
benchmarked) at any scale factor without hand-written rows.
"""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import CDC_BINARY_SCHEMA, CDC_JSON_SCHEMA, OP_DELETE, OP_INSERT, OP_UPDATE

_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(i: int) -> dt.datetime:
    return _T0 + dt.timedelta(seconds=i)


def golden_json_events(spark: SparkSession) -> DataFrame:
    """The four README scenarios (README.md:131-137), in order."""
    doc = {"_id": "user0010", "firstName": "Matt", "lastName": "Porker", "age": 34}
    addr1 = {"city": "San Jose", "state": "CA", "street": "320 Blossom Hill Road", "zipCode": 9519}
    addr2 = {"city": "San Jose", "state": "CA", "street": "330 Blossom Hill Road", "zipCode": 9519}
    rows = [
        ("user0010", OP_INSERT, _ts(0), [("", json.dumps(doc))]),
        ("user0010", OP_UPDATE, _ts(1), [("address", json.dumps(addr1))]),
        (
            "user0010",
            OP_UPDATE,
            _ts(2),
            [("lastName", json.dumps("Parker")), ("address", json.dumps(addr2))],
        ),
        ("user0010", OP_DELETE, _ts(3), []),
    ]
    return spark.createDataFrame(rows, CDC_JSON_SCHEMA)


def golden_binary_events(spark: SparkSession) -> DataFrame:
    """Binary-table corpus (README.md:407-411): two puts, one deleteall.
    Inserts surface as RECORD_UPDATE (B:71)."""
    rows = [
        (b"user010", OP_UPDATE, _ts(0), [("default.firstName", b"John")]),
        (b"user010", OP_UPDATE, _ts(1), [("default.lastName", b"Doe")]),
        (b"user010", OP_DELETE, _ts(2), []),
    ]
    return spark.createDataFrame(rows, CDC_BINARY_SCHEMA)


def synth_cdc_from_events(events: DataFrame) -> DataFrame:
    """Derive a CDC changelog from the `events` table, deterministically.

    Each event row becomes one change record for document user<user_id>:
      signup   → RECORD_INSERT of a whole doc
      error    → RECORD_DELETE
      others   → RECORD_UPDATE of firstName / lastName / address round-robin
    A real changelog arrives partitioned (Kafka topic partitions); the
    testdata parquet is a single row-group, so repartition first to give
    the downstream projection the same parallelism it would have in
    production.
    """
    events = events.repartition(events.sparkSession.sparkContext.defaultParallelism)
    uid = F.col("user_id").cast("string")
    _id = F.concat(F.lit("user"), uid)
    name = F.concat(F.lit("name_"), uid)
    city = F.concat(F.lit("city_"), (F.col("event_id") % 100).cast("string"))
    doc = F.to_json(
        F.struct(
            _id.alias("_id"),
            name.alias("firstName"),
            F.concat(F.lit("last_"), uid).alias("lastName"),
            (F.col("event_id") % 90).cast("int").alias("age"),
        )
    )
    addr = F.to_json(
        F.struct(
            city.alias("city"),
            F.lit("CA").alias("state"),
            F.concat((F.col("event_id") % 999).cast("string"), F.lit(" Main St")).alias("street"),
            (F.col("event_id") % 99999).cast("int").alias("zipCode"),
        )
    )
    field_pick = F.col("event_id") % 3
    upd_changes = F.array(
        F.struct(
            F.when(field_pick == 0, F.lit("firstName"))
            .when(field_pick == 1, F.lit("lastName"))
            .otherwise(F.lit("address"))
            .alias("fieldPath"),
            # scalar JSON encoding by hand (to_json needs struct/array/map;
            # the synthesized names contain no characters needing escape)
            F.when(field_pick == 0, F.concat(F.lit('"'), name, F.lit('"')))
            .when(field_pick == 1, F.concat(F.lit('"last_'), uid, F.lit('"')))
            .otherwise(addr)
            .alias("value"),
        )
    )
    ins_changes = F.array(F.struct(F.lit("").alias("fieldPath"), doc.alias("value")))
    empty = F.array().cast("array<struct<fieldPath: string, value: string>>")

    op = (
        F.when(F.col("event_type") == "signup", F.lit(OP_INSERT))
        .when(F.col("event_type") == "error", F.lit(OP_DELETE))
        .otherwise(F.lit(OP_UPDATE))
    )
    changes = (
        F.when(F.col("event_type") == "signup", ins_changes)
        .when(F.col("event_type") == "error", empty)
        .otherwise(upd_changes)
    )
    return events.select(
        _id.alias("_id"), op.alias("op"), F.col("ts"), changes.alias("changes")
    )


def synth_binary_cdc_from_events(events: DataFrame) -> DataFrame:
    """Derive a BINARY-table CDC changelog from `events`, deterministically.

    Mirrors synth_cdc_from_events for the binary lane
    (FtsAndGeoServiceBinaryWithCDC.java), preserving its observable
    quirks so a hash oracle can pin them:
      signup → arrives as RECORD_UPDATE (inserts surface as updates
               upstream, B:71) carrying BOTH name cells — plus a stale
               leading default.firstName cell so the oracle proves the
               last-wins put accumulation (B:118/121);
      error  → RECORD_DELETE, empty changes;
      others → RECORD_UPDATE of one cell round-robin by event_id % 3:
               default.firstName / default.lastName / default.address —
               the address cell is one the binary FTS service never
               indexes (no geo route, GEOS_TOPIC dead at B:30), so those
               records must vanish from the routed output.
    row_key and cell values are UTF-8 bytes (decode ≡ Bytes.toString,
    B:70/B:118); fieldPath is family.qualifier (B:116) in MIXED case to
    exercise the case-insensitive path match.
    """
    events = events.repartition(events.sparkSession.sparkContext.defaultParallelism)
    uid = F.col("user_id").cast("string")
    rk = F.encode(F.concat(F.lit("user"), uid), "UTF-8")
    name_b = F.encode(F.concat(F.lit("name_"), uid), "UTF-8")
    last_b = F.encode(F.concat(F.lit("last_"), uid), "UTF-8")
    city_b = F.encode(
        F.concat(F.lit("city_"), (F.col("event_id") % 100).cast("string")), "UTF-8"
    )

    def cell(path: str, value):
        return F.struct(F.lit(path).alias("fieldPath"), value.alias("value"))

    ins_changes = F.array(
        cell("default.firstName", F.encode(F.concat(F.lit("stale_"), uid), "UTF-8")),
        cell("default.firstName", name_b),
        cell("default.lastName", last_b),
    )
    field_pick = F.col("event_id") % 3
    upd_changes = (
        F.when(field_pick == 0, F.array(cell("default.FirstName", name_b)))
        .when(field_pick == 1, F.array(cell("default.LastName", last_b)))
        .otherwise(F.array(cell("default.address", city_b)))
    )
    empty = F.array().cast("array<struct<fieldPath: string, value: binary>>")

    op = (
        F.when(F.col("event_type") == "error", F.lit(OP_DELETE))
        .otherwise(F.lit(OP_UPDATE))  # inserts surface as updates (B:71)
    )
    changes = (
        F.when(F.col("event_type") == "signup", ins_changes)
        .when(F.col("event_type") == "error", empty)
        .otherwise(upd_changes)
    )
    return events.select(
        rk.alias("row_key"), op.alias("op"), F.col("ts"), changes.alias("changes")
    )

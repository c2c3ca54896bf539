"""Content-based CDC routing: changelog rows → FTS / Geo message streams.

Spark-first re-expression of the reference dataflow (SURVEY.md §2.1
R1-R15). Everything here is a *projection* — per-record fan-out is at most
2 messages (README.md:152), so routing never joins, groups, or shuffles:
the per-record field accumulation the Java loop does imperatively
(FtsAndGeoServiceJSONWithCDC.java:118-169) is done with higher-order array
functions (`filter`/`transform`/`map_from_entries`) on the `changes`
column. At 100 TB this keeps the whole route map-side and
whole-stage-codegen'd; the same functions serve batch and foreachBatch
streaming.

Observable quirks preserved (SURVEY.md §2.1):
- case-insensitive field-path match (J:152-158, B:116-120);
- canonical `firstName`/`lastName` keys in fields_to_index regardless of
  input path casing (J:133, J:140);
- delete messages carry only {_id, operation} — no `type` (J:197-209);
- geo messages never carry `type` (J:114 writes it to the wrong node);
- binary lane: no geo route (GEOS_TOPIC dead at B:30), inserts arrive as
  RECORD_UPDATE (B:71), values decoded as UTF-8 (B:118).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .schema import ADDRESS_DDL, OP_DELETE, OP_INSERT, OP_UPDATE

FTS_TOPIC = "fts_service"  # J:28 FTS_TOPIC = "/demo_stream:fts_service"
GEO_TOPIC = "geo_service"  # J:29 GEOS_TOPIC = "/demo_stream:geo_service"


def _last_change(changes: Column, path_lower: str) -> Column:
    """Value of the LAST change entry whose fieldPath matches, else null.

    Mirrors the per-field `equalsIgnoreCase` probe of the update loop
    (J:149-163) without exploding the array. Last-wins because the Java
    loop accumulates with ObjectNode.put, so a duplicate field path in one
    record overwrites (J:133, J:140).
    """
    matches = F.filter(changes, lambda c: F.lower(c["fieldPath"]) == F.lit(path_lower))
    return F.get(matches, F.size(matches) - 1)["value"]


def _whole_doc(changes: Column) -> Column:
    """Insert shape: the single empty-fieldPath entry holds the whole doc
    as JSON (J:124-130, README.md:289)."""
    matches = F.filter(changes, lambda c: c["fieldPath"] == F.lit(""))
    return F.try_element_at(matches, F.lit(1))["value"]


def _json_scalar(col: Column) -> Column:
    """Decode a JSON-encoded scalar value ('"Matt"' → Matt) — the analogue
    of ChangeNode.getString() (J:153). `$` addresses the root value."""
    return F.get_json_object(col, "$")


def route_json(cdc: DataFrame) -> tuple[DataFrame, DataFrame]:
    """JSON-table lane (FtsAndGeoServiceJSONWithCDC.java).

    Returns (fts_messages, geo_messages) with the typed shapes of
    FIXTURES.md §A4; serialize with fts_wire/geo_wire for the wire form.
    """
    is_ins = F.col("op") == OP_INSERT
    is_upd = F.col("op") == OP_UPDATE

    # Insert shape: parse the whole document ONCE (a single from_json
    # instead of one get_json_object re-parse per extracted field — the
    # difference is ~3× less JSON work on the hot path).
    doc = F.from_json(
        _whole_doc(F.col("changes")),
        f"struct<firstName: string, lastName: string, address: {ADDRESS_DDL}>",
    )

    first_name = F.when(is_ins, doc["firstName"]).when(
        is_upd, _json_scalar(_last_change(F.col("changes"), "firstname"))
    )
    last_name = F.when(is_ins, doc["lastName"]).when(
        is_upd, _json_scalar(_last_change(F.col("changes"), "lastname"))
    )
    # PERMISSIVE from_json yields an all-null struct for unparseable input;
    # normalize that to a true null so broken payloads don't emit geo
    # messages with an empty address.
    upd_addr = F.from_json(_last_change(F.col("changes"), "address"), ADDRESS_DDL)
    parsed = F.when(is_ins, doc["address"]).when(is_upd, upd_addr)
    address = F.when(
        parsed["city"].isNotNull()
        | parsed["state"].isNotNull()
        | parsed["street"].isNotNull()
        | parsed["zipCode"].isNotNull(),
        parsed,
    )

    # R13: per-record re-assembly of the ≤2 matching name fields into one
    # fields_to_index object — map built from the non-null entries.
    entries = F.filter(
        F.array(
            F.struct(F.lit("firstName").alias("key"), first_name.alias("value")),
            F.struct(F.lit("lastName").alias("key"), last_name.alias("value")),
        ),
        lambda e: e["value"].isNotNull(),
    )
    fields_to_index = F.map_from_entries(entries)

    base = cdc.select(
        F.col("_id"),
        F.col("op").alias("operation"),
        F.col("ts"),
        fields_to_index.alias("fields_to_index"),
        address.alias("address"),
    )

    # R10/R12: FTS gets inserts/updates with ≥1 name field, plus all
    # deletes (tombstone {_id, operation} only — J:197-209).
    fts = base.where(
        (F.col("operation") == OP_DELETE)
        | ((F.col("operation") != OP_DELETE) & (F.size("fields_to_index") > 0))
    ).select(
        "_id",
        "operation",
        "ts",
        F.when(F.col("operation") != OP_DELETE, F.lit("json")).alias("type"),
        F.when(F.col("operation") != OP_DELETE, F.col("fields_to_index")).alias(
            "fields_to_index"
        ),
    )

    # Geo gets inserts/updates that touched address; never deletes
    # (README.md:154: delete notifies FTS only).
    geo = base.where((F.col("operation") != OP_DELETE) & F.col("address").isNotNull()).select(
        "_id", "operation", "ts", "address"
    )
    return fts, geo


def route_binary(cdc: DataFrame) -> DataFrame:
    """Binary-table lane (FtsAndGeoServiceBinaryWithCDC.java).

    Single FTS route (no geo, B:30 dead constant). Field paths are
    family.qualifier (B:116); cell values decoded UTF-8 (B:118); rowkey
    decoded UTF-8 (B:70). Inserts surface as RECORD_UPDATE upstream (B:71),
    so only UPDATE and DELETE reach us.
    """
    changes = F.col("changes")

    def cell(path_lower: str) -> Column:
        # last-wins like the Java accumulation loop (B:118/121 put
        # overwrites); decode ≡ Bytes.toString (B:118)
        matches = F.filter(changes, lambda c: F.lower(c["fieldPath"]) == F.lit(path_lower))
        return F.get(matches, F.size(matches) - 1)["value"].cast("string")

    entries = F.filter(
        F.array(
            F.struct(F.lit("firstName").alias("key"), cell("default.firstname").alias("value")),
            F.struct(F.lit("lastName").alias("key"), cell("default.lastname").alias("value")),
        ),
        lambda e: e["value"].isNotNull(),
    )

    base = cdc.select(
        F.col("row_key").cast("string").alias("_id"),
        F.col("op").alias("operation"),
        F.col("ts"),
        F.map_from_entries(entries).alias("fields_to_index"),
    )
    return base.where(
        (F.col("operation") == OP_DELETE) | (F.size("fields_to_index") > 0)
    ).select(
        "_id",
        "operation",
        "ts",
        F.when(F.col("operation") != OP_DELETE, F.lit("binary")).alias("type"),
        F.when(F.col("operation") != OP_DELETE, F.col("fields_to_index")).alias(
            "fields_to_index"
        ),
    )


def fts_wire(fts: DataFrame) -> DataFrame:
    """Wire form of FTS messages: (topic, key, value) rows, value = JSON
    with null fields omitted — matches the Jackson output of R9
    (J:100-114; delete shape J:198-205 has no type/fields_to_index)."""
    return fts.select(
        F.lit(FTS_TOPIC).alias("topic"),
        F.col("_id").alias("key"),
        F.to_json(
            F.struct("_id", "operation", "type", "fields_to_index"),
            {"ignoreNullFields": "true"},
        ).alias("value"),
    )


def geo_wire(geo: DataFrame) -> DataFrame:
    """Wire form of Geo messages (no `type` field — SURVEY.md §2.1 quirk)."""
    return geo.select(
        F.lit(GEO_TOPIC).alias("topic"),
        F.col("_id").alias("key"),
        F.to_json(
            F.struct("_id", "operation", "address"), {"ignoreNullFields": "true"}
        ).alias("value"),
    )

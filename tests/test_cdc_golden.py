"""Golden CDC scenario tests (SURVEY.md §5.1): the six README scripted
scenarios of the reference, asserted against its printed console outputs
(README.md:146-154 and 418-425 of /root/reference). Messages are compared
as parsed JSON to avoid key-order flakiness."""

from __future__ import annotations

import json

from mapr_db_cdc_sample_spark.cdc import fts_wire, geo_wire, route_binary, route_json
from mapr_db_cdc_sample_spark.cdc.fixtures import golden_binary_events, golden_json_events


def _wire(df):
    return [json.loads(r.value) for r in df.orderBy("value").collect()]


def _wire_ordered(fts_df, src_col="_id"):
    return [json.loads(r.value) for r in fts_df.collect()]


def test_json_lane_golden(spark):
    cdc = golden_json_events(spark)
    fts, geo = route_json(cdc)
    fts_msgs = [json.loads(r.value) for r in fts_wire(fts.orderBy("ts")).collect()]
    geo_msgs = [json.loads(r.value) for r in geo_wire(geo.orderBy("ts")).collect()]

    # README.md:146-148 — insert routes both names to FTS
    assert fts_msgs[0] == {
        "_id": "user0010",
        "operation": "RECORD_INSERT",
        "type": "json",
        "fields_to_index": {"firstName": "Matt", "lastName": "Porker"},
    }
    # README.md:152 — name+address update hits FTS with only the changed name
    assert fts_msgs[1] == {
        "_id": "user0010",
        "operation": "RECORD_UPDATE",
        "type": "json",
        "fields_to_index": {"lastName": "Parker"},
    }
    # README.md:154 — delete tombstone: _id + operation ONLY (no type)
    assert fts_msgs[2] == {"_id": "user0010", "operation": "RECORD_DELETE"}
    assert len(fts_msgs) == 3  # address-only update produced no FTS message

    # README.md:150,152 — two geo messages, never a `type` field
    assert geo_msgs[0] == {
        "_id": "user0010",
        "operation": "RECORD_UPDATE",
        "address": {
            "city": "San Jose",
            "state": "CA",
            "street": "320 Blossom Hill Road",
            "zipCode": 9519,
        },
    }
    assert geo_msgs[1]["address"]["street"] == "330 Blossom Hill Road"
    assert len(geo_msgs) == 2


def test_json_topics(spark):
    cdc = golden_json_events(spark)
    fts, geo = route_json(cdc)
    assert fts_wire(fts).select("topic").distinct().collect()[0][0] == "fts_service"
    assert geo_wire(geo).select("topic").distinct().collect()[0][0] == "geo_service"


def test_binary_lane_golden(spark):
    cdc = golden_binary_events(spark)
    fts = route_binary(cdc)
    msgs = [json.loads(r.value) for r in fts_wire(fts.orderBy("ts")).collect()]
    # README.md:418-422 — per-put RECORD_UPDATE messages
    assert msgs[0] == {
        "_id": "user010",
        "operation": "RECORD_UPDATE",
        "type": "binary",
        "fields_to_index": {"firstName": "John"},
    }
    assert msgs[1] == {
        "_id": "user010",
        "operation": "RECORD_UPDATE",
        "type": "binary",
        "fields_to_index": {"lastName": "Doe"},
    }
    # README.md:424-425 — deleteall tombstone
    assert msgs[2] == {"_id": "user010", "operation": "RECORD_DELETE"}
    assert len(msgs) == 3


def test_case_insensitive_field_paths(spark):
    """J:152-158 / B:116-120 — matching is case-insensitive, output keys
    are canonical."""
    import datetime as dt

    from mapr_db_cdc_sample_spark.cdc.schema import CDC_JSON_SCHEMA

    rows = [
        ("u1", "RECORD_UPDATE", dt.datetime(2024, 1, 1), [("FIRSTNAME", '"Ada"')]),
        ("u2", "RECORD_UPDATE", dt.datetime(2024, 1, 1), [("LastName", '"Lovelace"')]),
    ]
    cdc = spark.createDataFrame(rows, CDC_JSON_SCHEMA)
    fts, _ = route_json(cdc)
    got = {r["_id"]: r["fields_to_index"] for r in fts.collect()}
    assert got == {"u1": {"firstName": "Ada"}, "u2": {"lastName": "Lovelace"}}


def test_uninteresting_update_emits_nothing(spark):
    """An update touching only `age` produces no message on either topic
    (J:149-163 matches only firstName/lastName/address)."""
    import datetime as dt

    from mapr_db_cdc_sample_spark.cdc.schema import CDC_JSON_SCHEMA

    rows = [("u1", "RECORD_UPDATE", dt.datetime(2024, 1, 1), [("age", "35")])]
    cdc = spark.createDataFrame(rows, CDC_JSON_SCHEMA)
    fts, geo = route_json(cdc)
    assert fts.count() == 0
    assert geo.count() == 0

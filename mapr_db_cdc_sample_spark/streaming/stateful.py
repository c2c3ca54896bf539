"""Arbitrary stateful processing: CDC document materialization —
a running current-state view of the CDC'd table, the natural extension of
the reference's per-field change dataflow (R5-R8: the reference only
routes changes; this operator also FOLDS them into documents).

applyInPandasWithState keyed by _id: state = the document's current
fields; inserts replace, updates merge per-field (last-write-wins in ts
order within a batch — matching the Java loop's ObjectNode.put overwrite
semantics), deletes clear. Emits the post-batch state of every touched
document; deleted docs emit is_deleted=true.

Scale: state is per-key and O(fields); use RocksDB state store
(spark.sql.streaming.stateStore.providerClass) for 100 TB keyspaces.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "_id string, firstName string, lastName string, age int, "
    "address string, is_deleted boolean, n_changes long"
)
STATE_SCHEMA = "doc string, n_changes long"

_FIELDS = ("firstName", "lastName", "age", "address")


def _apply_changes(doc: dict[str, Any], rows: pd.DataFrame) -> tuple[dict[str, Any], int]:
    """Fold one key's CDC rows (already ts-ordered) into the doc dict.
    Returns (new_doc, n_changes_applied). A delete clears the doc to the
    tombstone {}."""
    n = 0
    # stable sort: equal-ts rows must fold in arrival order or the
    # last-write-wins-in-ts-order guarantee breaks on ties
    for _, row in rows.sort_values("ts", kind="stable").iterrows():
        op = row["op"]
        n += 1
        if op == "RECORD_DELETE":
            doc = {"__deleted__": True}
            continue
        changes = row["changes"]
        if changes is None:  # numpy array truthiness is ambiguous — no `or []`
            changes = []
        if op == "RECORD_INSERT":
            doc = {}
            for chg in changes:
                if chg["fieldPath"] == "":
                    whole = json.loads(chg["value"])
                    doc = {k: whole.get(k) for k in _FIELDS if k in whole}
        else:  # RECORD_UPDATE — per-field merge, last write wins
            if doc.get("__deleted__"):
                doc = {}
            for chg in changes:
                path = chg["fieldPath"]
                for f in _FIELDS:
                    if path.lower() == f.lower():
                        doc[f] = json.loads(chg["value"])
    return doc, n


def materialize(cdc_stream: DataFrame) -> DataFrame:
    """cdc rows → running per-document state (streaming)."""

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (doc_json, n0) = state.get if state.exists else ("{}", 0)
        doc = json.loads(doc_json)
        n = n0
        for pdf in pdfs:
            doc, applied = _apply_changes(doc, pdf)
            n += applied
        state.update((json.dumps(doc), n))
        deleted = bool(doc.get("__deleted__"))
        addr = doc.get("address")
        yield pd.DataFrame(
            [
                {
                    "_id": key[0],
                    "firstName": None if deleted else doc.get("firstName"),
                    "lastName": None if deleted else doc.get("lastName"),
                    "age": None if deleted else doc.get("age"),
                    "address": None if deleted or addr is None else json.dumps(addr),
                    "is_deleted": deleted,
                    "n_changes": n,
                }
            ]
        )

    return cdc_stream.groupBy("_id").applyInPandasWithState(
        fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------- transformWithState: running per-user spend totals

RUNNING_SCHEMA = "user_id long, n_events long, spend_cents long"


def running_totals(events_stream: DataFrame) -> DataFrame:
    """Per-user running (event count, spend) via transformWithStateInPandas
    — Spark 4's arbitrary-state API (the successor to
    applyInPandasWithState used by `materialize` above): explicit named
    state handles (getValueState), timers, and TTL support. State here is
    one (n, cents) ValueState per user; every micro-batch emits the
    user's post-batch totals, so the LAST emission per user equals the
    batch aggregate (the stream==batch law tests assert).

    Scale: state is O(1) per key; the RocksDB state store provider holds
    100 TB keyspaces; emission is update-mode (only touched keys).

    ENV GATE: the transformWithState Python worker protocol serializes
    state over protobuf, which this container does not ship (no pip
    install) — the guard below raises a clear error instead of an
    opaque executor ImportError; tests skip when protobuf is absent and
    the applyInPandasWithState lane (`materialize`) carries the
    always-on stateful-streaming coverage."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise EnvironmentError(
            "transformWithStateInPandas requires the protobuf package in "
            "the Python workers; not available in this environment"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n long, cents long")

        def handleInputRows(self, key, rows, timerValues):
            n, cents = self._totals.get() if self._totals.exists() else (0, 0)
            for pdf in rows:
                n += int(len(pdf))
                cents += int(pdf["cents"].sum())
            self._totals.update((n, cents))
            yield pd.DataFrame(
                [{"user_id": key[0], "n_events": n, "spend_cents": cents}]
            )

        def close(self) -> None:
            pass

    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    keyed = events_stream.select("user_id", cents.alias("cents"))
    return keyed.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=RUNNING_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def running_totals_compat(events_stream: DataFrame) -> DataFrame:
    """Same running-totals semantics on the always-available
    applyInPandasWithState rung — the fallback lane that keeps q284 a
    first-class registry entry in containers without protobuf (see
    running_totals' env gate). Identical emission contract: every
    micro-batch yields each touched user's post-batch totals."""

    def fold(key, pdfs, state: GroupState):
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += int(len(pdf))
            cents += int(pdf["cents"].sum())
        state.update((n, cents))
        yield pd.DataFrame(
            [{"user_id": key[0], "n_events": n, "spend_cents": cents}]
        )

    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    keyed = events_stream.select("user_id", cents.alias("cents"))
    return keyed.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=RUNNING_SCHEMA,
        stateStructType="n long, cents long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_totals_auto(events_stream: DataFrame) -> DataFrame:
    """Prefer the transformWithStateInPandas lane, fall back to the
    applyInPandasWithState twin when the container lacks protobuf."""
    try:
        return running_totals(events_stream)
    except EnvironmentError:
        return running_totals_compat(events_stream)

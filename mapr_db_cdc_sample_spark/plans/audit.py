"""Plan audit helpers: .explain("formatted") as a string + predicates for
the plan properties that matter at 100 TB (pushdown, pruning, broadcast,
partial aggregation, top-k short-circuits, codegen coverage).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(plan: str) -> list[str]:
    """All non-empty PushedFilters lists in parquet scans."""
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.append(m.group(1))
    return out


def read_schemas(plan: str) -> list[str]:
    return [m.group(1) for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan)]


def has(plan: str, node: str) -> bool:
    return node in plan


def plan_nodes(plan: str) -> list[str]:
    """Operator names from a formatted plan's numbered tree — one entry
    per physical node (the details section repeats names; this doesn't)."""
    return [
        m.group(1)
        for m in re.finditer(r"^[\s:+\-*]*\(\d+\)\s+([A-Za-z][A-Za-z0-9]*)", plan, re.M)
    ]


def count_nodes(plan: str, node: str) -> int:
    return sum(1 for n in plan_nodes(plan) if n == node)


def codegen_stage_count(build_df) -> int:
    """Distinct whole-stage-codegen stages for the plan produced by
    `build_df()` (a thunk). AQE's lazy wrapper hides codegen markers, so
    the plan is built once with AQE off — codegen stage structure is the
    same either way."""
    import contextlib
    import io

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    df = build_df()  # builders may (re)set session confs — build first
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()  # physical planning happens here, with AQE off
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    return len(set(re.findall(r"\*\((\d+)\)", buf.getvalue())))

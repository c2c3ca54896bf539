"""Property-based spot checks (SURVEY.md §5.2 item 5): algebraic
invariants on generated data — filter-split equivalence, union counts,
window running sums vs Python prefix sums. Small example counts keep the
suite fast; Spark executes each case for real."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.integers(min_value=-1000, max_value=1000),  # value (int: exact)
    ),
    min_size=1,
    max_size=30,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(rows=ROWS, a=st.integers(-500, 500), b=st.integers(-500, 500))
@settings(**_SETTINGS)
def test_filter_split_equivalence(spark, rows, a, b):
    """filter(p and q) ≡ filter(p).filter(q) — the rewrite predicate
    pushdown relies on."""
    df = spark.createDataFrame(rows, "k int, v int")
    lo, hi = min(a, b), max(a, b)
    combined = df.filter((F.col("v") >= lo) & (F.col("v") <= hi)).count()
    chained = df.filter(F.col("v") >= lo).filter(F.col("v") <= hi).count()
    assert combined == chained


@given(rows=ROWS, other=ROWS)
@settings(**_SETTINGS)
def test_union_count_additive(spark, rows, other):
    d1 = spark.createDataFrame(rows, "k int, v int")
    d2 = spark.createDataFrame(other, "k int, v int")
    assert d1.unionAll(d2).count() == len(rows) + len(other)
    assert d1.unionAll(d2).distinct().count() == len(set(rows) | set(other))


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_running_sum_matches_prefix_sum(spark, rows):
    """Window ROWS UNBOUNDED PRECEDING ≡ per-key Python prefix sums (rows
    carry a unique seq so ordering is total)."""
    data = [(k, v, i) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k int, v int, seq int")
    w = Window.partitionBy("k").orderBy("seq").rowsBetween(Window.unboundedPreceding, 0)
    got = {
        r.seq: r.rs
        for r in df.select("seq", F.sum("v").over(w).alias("rs")).collect()
    }
    acc: dict[int, int] = {}
    want = {}
    for k, v, i in data:
        acc[k] = acc.get(k, 0) + v
        want[i] = acc[k]
    assert got == want


@given(
    toks=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=3), min_size=0, max_size=12
    ),
    k=st.integers(min_value=2, max_value=4),
)
@settings(**_SETTINGS)
def test_shingles_match_python_reference(spark, toks, k):
    """The arrays_zip shingle builder (functions/text.py — rewritten in
    round 2 for linearity) must produce exactly the Python sliding
    windows, including the empty-array edge for len(toks) < k."""
    from mapr_db_cdc_sample_spark.functions import text as T

    df = spark.createDataFrame([(toks,)], "tk: array<string>")
    got = df.select(T.shingles(F.col("tk"), k).alias("sh")).collect()[0].sh
    want = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    assert got == want

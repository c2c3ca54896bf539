"""Round-12 optimization internals: the collect_set + chained-Generate
pair expansion (operators/triangles.cooccurrence_pairs/_edges) that
replaced the distinct -> self-join -> distinct edge derivation across
the graph family (q229/q298/q380/q408/q476/q561-565) must produce the
exact pair multiset / edge set of the naive form."""

from __future__ import annotations

from pyspark.sql import functions as F


def _naive_edges(m):
    a, b = m.alias("a"), m.alias("b")
    return (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.i") < F.col("b.i")))
        .select(F.col("a.i").alias("u"), F.col("b.i").alias("v"))
        .distinct()
    )


def _membership(spark):
    # groups with dup members (set semantics must dedupe), singletons
    # (no pairs), a shared pair across two groups (edge dedup), and a
    # 4-member group (C(4,2)=6 pairs)
    rows = [
        (1, 10), (1, 20), (1, 10),          # dup member in group 1
        (2, 30),                            # singleton
        (3, 10), (3, 20),                   # same pair as group 1
        (4, 5), (4, 6), (4, 7), (4, 8),     # 4-clique membership
    ]
    return spark.createDataFrame(rows, "g bigint, i bigint")


def test_cooccurrence_edges_match_naive_self_join(spark):
    from mapr_db_cdc_sample_spark.operators.triangles import cooccurrence_edges

    m = _membership(spark)
    got = sorted((r.u, r.v) for r in cooccurrence_edges(m, "g", "i").collect())
    want = sorted((r.u, r.v) for r in _naive_edges(m).collect())
    assert got == want
    assert (10, 20) in got and got.count((10, 20)) == 1  # cross-group dedup
    assert all(u < v for u, v in got)  # canonical orientation


def test_cooccurrence_pairs_per_group_multiset(spark):
    from mapr_db_cdc_sample_spark.operators.triangles import cooccurrence_pairs

    m = _membership(spark)
    pairs = sorted((r.u, r.v) for r in cooccurrence_pairs(m, "g", "i").collect())
    # group 1 and group 3 each contribute (10,20); group 4 contributes
    # C(4,2)=6 pairs; the singleton contributes none; the dup member in
    # group 1 is deduped by set semantics
    assert pairs.count((10, 20)) == 2
    assert len(pairs) == 2 + 6
    assert all(u < v for u, v in pairs)


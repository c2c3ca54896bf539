"""Round-8 batch (q480+): two-sample inference (Welch t², Mood's median
test), measurement reliability (Cronbach's alpha), forensic digit audits
(Benford), sequential control (CUSUM changepoint, EWMA control chart),
and bounded-graph centrality (multi-source BFS closeness, modularity).

Determinism rules follow queries/relational.py's module docstring:
integer cents via DECIMAL(18,2)*100, round-half-up on POSITIVE integer
operands as (2p + q) DIV (2q) (signed values get a positive shift
first), unique ORDER BY tiebreakers under every LIMIT, and doubles only
in textually-parallel final expressions over exact integer aggregates
(the q207 discipline). Big products cast FACTORS to DECIMAL(38,0)
(Spark) / HUGEINT (DuckDB) before multiplying."""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load_tables
from . import register

# ---------- q480: Welch's unequal-variance t-test (click vs purchase)

# Two-sample location test that does NOT pool variances — the default
# recommendation when group spreads differ. Everything upstream of the
# final expression is one map-side-combinable aggregate per group over
# exact integer cents; t² and the Welch–Satterthwaite df are then
# textually-parallel IEEE doubles over those exact moments (the q207
# discipline: identical integer inputs + identical expression tree =
# bit-identical doubles), rounded to 6.
_WELCH_ORACLE = """
WITH v AS (
    SELECT event_type AS g,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
    FROM events WHERE event_type IN ('click', 'purchase')
), m AS (
    SELECT
        CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(SUM(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        CAST(SUM(CASE WHEN g = 'click' THEN c ELSE 0 END) AS BIGINT) AS s1,
        CAST(SUM(CASE WHEN g = 'purchase' THEN c ELSE 0 END) AS BIGINT) AS s2,
        CAST(SUM(CASE WHEN g = 'click' THEN CAST(c AS HUGEINT) * c
                 ELSE 0 END) AS HUGEINT) AS q1,
        CAST(SUM(CASE WHEN g = 'purchase' THEN CAST(c AS HUGEINT) * c
                 ELSE 0 END) AS HUGEINT) AS q2
    FROM v
)
SELECT n1, n2,
       ROUND(((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
               - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
              * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                 - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
             / ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                                      / CAST(n1 AS DOUBLE))
                / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE))
                + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                                        / CAST(n2 AS DOUBLE))
                  / (CAST(n2 AS DOUBLE) * CAST(n2 - 1 AS DOUBLE))), 6) AS t2_r6,
       ROUND((((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                                     / CAST(n1 AS DOUBLE))
               / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE))
               + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                                       / CAST(n2 AS DOUBLE))
                 / (CAST(n2 AS DOUBLE) * CAST(n2 - 1 AS DOUBLE)))
              * ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                                       / CAST(n1 AS DOUBLE))
                 / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE))
                 + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                                         / CAST(n2 AS DOUBLE))
                   / (CAST(n2 AS DOUBLE) * CAST(n2 - 1 AS DOUBLE))))
             / (((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                                       / CAST(n1 AS DOUBLE))
                 / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE))
                 * ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                                          / CAST(n1 AS DOUBLE))
                    / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE))))
                / CAST(n1 - 1 AS DOUBLE)
                + ((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                                         / CAST(n2 AS DOUBLE))
                   / (CAST(n2 AS DOUBLE) * CAST(n2 - 1 AS DOUBLE))
                   * ((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                                            / CAST(n2 AS DOUBLE))
                      / (CAST(n2 AS DOUBLE) * CAST(n2 - 1 AS DOUBLE))))
                  / CAST(n2 - 1 AS DOUBLE)), 6) AS df_r6
FROM m
"""


@register("q480_welch_ttest", oracle=_WELCH_ORACLE)
def q480(spark, sf_dir):
    """Welch t² + Satterthwaite df as rounded doubles over exact integer
    moments (oracle comment)."""
    e = load_tables(spark, sf_dir)["events"]
    v = e.filter(F.col("event_type").isin("click", "purchase")).select(
        F.col("event_type").alias("g"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("c"),
    )
    m = v.agg(
        F.sum(F.when(F.col("g") == "click", 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("g") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
        F.sum(F.when(F.col("g") == "click", F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("s1"),
        F.sum(F.when(F.col("g") == "purchase", F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("s2"),
        F.sum(
            F.when(
                F.col("g") == "click",
                F.col("c").cast("decimal(38,0)") * F.col("c"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("q1"),
        F.sum(
            F.when(
                F.col("g") == "purchase",
                F.col("c").cast("decimal(38,0)") * F.col("c"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("q2"),
    )
    # se2_g := v_g / n_g computed as ONE textually-identical double
    # sub-expression reused by both t2 and df (matching the oracle text)
    se1 = (
        "(CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)"
        " / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE))"
    )
    se2 = (
        "(CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)"
        " / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) * CAST(n2 - 1 AS DOUBLE))"
    )
    dmean = (
        "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
        " - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))"
    )
    return m.select(
        "n1",
        "n2",
        F.expr(f"ROUND(({dmean} * {dmean}) / ({se1} + {se2}), 6)").alias("t2_r6"),
        F.expr(
            f"ROUND((({se1} + {se2}) * ({se1} + {se2}))"
            f" / (({se1} * ({se1})) / CAST(n1 - 1 AS DOUBLE)"
            f" + ({se2} * ({se2})) / CAST(n2 - 1 AS DOUBLE)), 6)"
        ).alias("df_r6"),
    )


# ---------- q481: Mood's median test (order value by priority)

# Nonparametric k-group location test: dichotomize every order at the
# GLOBAL lower median (exact order statistic from a cumulative value
# histogram — never a global row sort; the q447 two-pass discipline),
# then chi-square the (group x above/not-above) table. Expected counts
# are exact micro integers (rhu of n_j*A*1e6/N); the chi-square
# contribution is the only double, rounded to 6.
_MOOD_ORACLE = """
WITH v AS (
    SELECT o_orderpriority AS grp,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
    FROM orders
), hist AS (
    SELECT c, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY c
), cum AS (
    SELECT c, SUM(cnt) OVER (ORDER BY c) AS cm FROM hist
), med AS (
    SELECT MIN(c) AS m FROM cum
    WHERE cm >= (SELECT (SUM(cnt) + 1) // 2 FROM hist)
), g AS (
    SELECT grp, CAST(COUNT(*) AS BIGINT) AS nj,
           CAST(SUM(CASE WHEN c > (SELECT m FROM med) THEN 1 ELSE 0 END)
                AS BIGINT) AS aj
    FROM v GROUP BY grp
), tot AS (
    SELECT CAST(SUM(nj) AS BIGINT) AS n, CAST(SUM(aj) AS BIGINT) AS a FROM g
)
SELECT g.grp, g.nj, g.aj,
       CAST((2 * 1000000 * g.nj * tot.a + tot.n) // (2 * tot.n) AS BIGINT)
           AS expect_micro,
       ROUND((CAST(g.aj AS DOUBLE)
              - CAST(g.nj AS DOUBLE) * CAST(tot.a AS DOUBLE)
                / CAST(tot.n AS DOUBLE))
             * (CAST(g.aj AS DOUBLE)
                - CAST(g.nj AS DOUBLE) * CAST(tot.a AS DOUBLE)
                  / CAST(tot.n AS DOUBLE))
             / (CAST(g.nj AS DOUBLE) * CAST(tot.a AS DOUBLE)
                / CAST(tot.n AS DOUBLE))
             + (CAST(g.nj - g.aj AS DOUBLE)
                - CAST(g.nj AS DOUBLE) * CAST(tot.n - tot.a AS DOUBLE)
                  / CAST(tot.n AS DOUBLE))
               * (CAST(g.nj - g.aj AS DOUBLE)
                  - CAST(g.nj AS DOUBLE) * CAST(tot.n - tot.a AS DOUBLE)
                    / CAST(tot.n AS DOUBLE))
               / (CAST(g.nj AS DOUBLE) * CAST(tot.n - tot.a AS DOUBLE)
                  / CAST(tot.n AS DOUBLE)), 6) AS contrib_r6
FROM g, tot ORDER BY g.grp
"""


@register("q481_mood_median_test", oracle=_MOOD_ORACLE)
def q481(spark, sf_dir):
    """Mood's median test per-group contributions (oracle comment)."""
    o = load_tables(spark, sf_dir)["orders"]
    v = o.select(
        F.col("o_orderpriority").alias("grp"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("c"),
    )
    hist = v.groupBy("c").agg(F.count("*").cast("bigint").alias("cnt"))
    cum = hist.select(
        "c", F.sum("cnt").over(Window.orderBy("c")).alias("cm"),
        F.sum("cnt").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n_all"),
    )
    med = cum.filter(F.col("cm") >= F.expr("(n_all + 1) DIV 2")).agg(
        F.min("c").alias("m")
    )
    g = (
        v.crossJoin(F.broadcast(med))
        .groupBy("grp")
        .agg(
            F.count("*").cast("bigint").alias("nj"),
            F.sum(F.when(F.col("c") > F.col("m"), 1).otherwise(0))
            .cast("bigint")
            .alias("aj"),
        )
    )
    tot = g.agg(
        F.sum("nj").cast("bigint").alias("n"), F.sum("aj").cast("bigint").alias("a")
    )
    above = (
        "CAST(nj AS DOUBLE) * CAST(a AS DOUBLE) / CAST(n AS DOUBLE)"
    )
    below = "CAST(nj AS DOUBLE) * CAST(n - a AS DOUBLE) / CAST(n AS DOUBLE)"
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "grp",
            "nj",
            "aj",
            F.expr(
                "CAST((2 * 1000000 * nj * a + n) DIV (2 * n) AS BIGINT)"
            ).alias("expect_micro"),
            F.expr(
                f"ROUND((CAST(aj AS DOUBLE) - {above})"
                f" * (CAST(aj AS DOUBLE) - {above}) / ({above})"
                f" + (CAST(nj - aj AS DOUBLE) - {below})"
                f" * (CAST(nj - aj AS DOUBLE) - {below}) / ({below}), 6)"
            ).alias("contrib_r6"),
        )
        .orderBy("grp")
    )


# ---------- q482: Cronbach's alpha (per-user event-type count items)

# Internal-consistency reliability of a 4-item "engagement instrument"
# (per-user counts of click/view/purchase/signup). Population variances
# over n users share the n² denominator, so alpha = k(T - P) /
# ((k-1) T) with T = n*Σt²-(Σt)², P = Σ_i (n*Σx_i²-(Σx_i)²) — EXACT
# integers end-to-end; the single signed micro division uses the
# positive-shift rhu (alpha can be negative for inconsistent items).
_CRONBACH_ORACLE = """
WITH peru AS (
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS x1,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS x2,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS x3,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                AS BIGINT) AS x4
    FROM events GROUP BY user_id
), m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x1 * x1) AS BIGINT) AS q1,
           CAST(SUM(x2) AS BIGINT) AS s2, CAST(SUM(x2 * x2) AS BIGINT) AS q2,
           CAST(SUM(x3) AS BIGINT) AS s3, CAST(SUM(x3 * x3) AS BIGINT) AS q3,
           CAST(SUM(x4) AS BIGINT) AS s4, CAST(SUM(x4 * x4) AS BIGINT) AS q4,
           CAST(SUM(x1 + x2 + x3 + x4) AS BIGINT) AS st,
           CAST(SUM((x1 + x2 + x3 + x4) * (x1 + x2 + x3 + x4)) AS BIGINT) AS qt
    FROM peru
), ab AS (
    SELECT n,
           CAST(n AS HUGEINT) * qt - CAST(st AS HUGEINT) * st AS vt,
           (CAST(n AS HUGEINT) * q1 - CAST(s1 AS HUGEINT) * s1)
           + (CAST(n AS HUGEINT) * q2 - CAST(s2 AS HUGEINT) * s2)
           + (CAST(n AS HUGEINT) * q3 - CAST(s3 AS HUGEINT) * s3)
           + (CAST(n AS HUGEINT) * q4 - CAST(s4 AS HUGEINT) * s4) AS pv
    FROM m
)
SELECT n, CAST(vt AS BIGINT) AS var_total_n2, CAST(pv AS BIGINT) AS sum_item_var_n2,
       CAST((2 * (1000000 * 4 * (vt - pv) + 1000000000 * (3 * vt)) + 3 * vt)
            // (2 * (3 * vt)) - 1000000000 AS BIGINT) AS alpha_micro
FROM ab
"""


@register("q482_cronbach_alpha", oracle=_CRONBACH_ORACLE)
def q482(spark, sf_dir):
    """Cronbach's alpha in exact signed micro units (oracle comment)."""
    e = load_tables(spark, sf_dir)["events"]
    peru = e.groupBy("user_id").agg(
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"x{i}")
            for i, t in enumerate(("click", "view", "purchase", "signup"), 1)
        ]
    )
    t = sum(F.col(f"x{i}") for i in range(1, 5))
    m = peru.agg(
        F.count("*").cast("bigint").alias("n"),
        *[
            a
            for i in range(1, 5)
            for a in (
                F.sum(f"x{i}").cast("bigint").alias(f"s{i}"),
                F.sum(F.col(f"x{i}") * F.col(f"x{i}")).cast("bigint").alias(f"q{i}"),
            )
        ],
        F.sum(t).cast("bigint").alias("st"),
        F.sum(t * t).cast("bigint").alias("qt"),
    )
    d38 = "DECIMAL(38,0)"
    ab = m.select(
        "n",
        F.expr(f"CAST(n AS {d38}) * qt - CAST(st AS {d38}) * st").alias("vt"),
        F.expr(
            f"(CAST(n AS {d38}) * q1 - CAST(s1 AS {d38}) * s1)"
            f" + (CAST(n AS {d38}) * q2 - CAST(s2 AS {d38}) * s2)"
            f" + (CAST(n AS {d38}) * q3 - CAST(s3 AS {d38}) * s3)"
            f" + (CAST(n AS {d38}) * q4 - CAST(s4 AS {d38}) * s4)"
        ).alias("pv"),
    )
    return ab.select(
        "n",
        F.expr("CAST(vt AS BIGINT)").alias("var_total_n2"),
        F.expr("CAST(pv AS BIGINT)").alias("sum_item_var_n2"),
        F.expr(
            "CAST((2 * (1000000 * 4 * (vt - pv) + 1000000000 * (3 * vt))"
            " + 3 * vt) DIV (2 * (3 * vt)) - 1000000000 AS BIGINT)"
        ).alias("alpha_micro"),
    )


# ---------- q483: Benford first-digit audit (order values)

# Fraud/forensics screen: the first significant digit of order cents vs
# the Benford expectation log10(1+1/d). The 9 expected micro-probs are
# ONE Python-computed literal table embedded in BOTH engines' SQL (the
# q327 literal recipe — no cross-engine log10 at query time); observed
# counts and expected micro-counts are exact integers, the chi-square
# contribution the only rounded double.
_BENFORD_PM = {d: round(math.log10(1.0 + 1.0 / d) * 1_000_000) for d in range(1, 10)}
_BENFORD_VALUES = ", ".join(f"({d}, {p})" for d, p in _BENFORD_PM.items())

_BENFORD_ORACLE = f"""
WITH v AS (
    SELECT CAST(LEFT(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                               AS BIGINT) AS VARCHAR), 1) AS BIGINT) AS d
    FROM orders
    WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) > 0
), obs AS (
    SELECT d, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY d
), n AS (
    SELECT CAST(SUM(c) AS BIGINT) AS n FROM obs
), exp AS (
    SELECT * FROM (VALUES {_BENFORD_VALUES}) AS t(d, pm)
)
SELECT exp.d, COALESCE(obs.c, 0) AS observed,
       CAST(n.n * exp.pm AS BIGINT) AS expect_micro,
       ROUND((CAST(COALESCE(obs.c, 0) AS DOUBLE)
              - CAST(n.n AS DOUBLE) * CAST(exp.pm AS DOUBLE) / 1000000.0)
             * (CAST(COALESCE(obs.c, 0) AS DOUBLE)
                - CAST(n.n AS DOUBLE) * CAST(exp.pm AS DOUBLE) / 1000000.0)
             / (CAST(n.n AS DOUBLE) * CAST(exp.pm AS DOUBLE) / 1000000.0), 6)
           AS contrib_r6
FROM exp LEFT JOIN obs ON obs.d = exp.d, n
ORDER BY exp.d
"""


@register("q483_benford_audit", oracle=_BENFORD_ORACLE)
def q483(spark, sf_dir):
    """Benford first-digit chi-square contributions (oracle comment).
    The 9-row expectation table broadcasts; the scan aggregates into at
    most 9 groups map-side — no shuffle grows with volume."""
    o = load_tables(spark, sf_dir)["orders"]
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    obs = (
        o.select(cents.alias("c"))
        .filter(F.col("c") > 0)
        .select(F.substring(F.col("c").cast("string"), 1, 1).cast("bigint").alias("d"))
        .groupBy("d")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    n = obs.agg(F.sum("c").cast("bigint").alias("n"))
    exp = spark.createDataFrame(
        [(d, p) for d, p in _BENFORD_PM.items()], "d bigint, pm bigint"
    )
    em = "CAST(n AS DOUBLE) * CAST(pm AS DOUBLE) / 1000000.0"
    return (
        exp.join(obs, "d", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "d",
            F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("observed"),
            F.expr("CAST(n * pm AS BIGINT)").alias("expect_micro"),
            F.expr(
                f"ROUND((CAST(COALESCE(c, 0) AS DOUBLE) - {em})"
                f" * (CAST(COALESCE(c, 0) AS DOUBLE) - {em}) / ({em}), 6)"
            ).alias("contrib_r6"),
        )
        .orderBy("d")
    )

"""Round-6 fourth wave (q367+): risk/eval analytics and the
remaining sketch/quantization lanes.

Same determinism contract as queries/relational.py and analytics3.py:
exact integer arithmetic wherever possible, positive-shift
round-half-up micro units for signed rationals, ROUND(LN(exact
integer ratio) * 1e6) discretized ONCE for anything transcendental
(q297/q322 recipe), unique ORDER BY tiebreakers under every LIMIT.

Reference anchor: the CDC client's change-measure lane
(README.md:131-154) motivates the monitoring family (drawdown, PSI,
JSD); the eval family (AP, best-F1) completes q207/q242/q269's
ranking-metric suite over the same scored-event universe.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load_tables
from . import register
from .analytics3 import _DAILY_CTE, _daily_cents


# ---------- q367: maximum drawdown of the daily-revenue KPI

# The risk statistic behind every KPI equity-curve report, applied to
# the LEVEL series (daily revenue cents — a cumulative-sum curve of
# nonnegative daily revenue is monotone, so its drawdown is trivially
# zero): running peak of daily revenue minus the current day's value,
# maxed over time — "worst observed decline from the historical
# best day". Everything is integer cents on the |days| spine (the
# windows run ABOVE the groupBy(day) aggregate — SinglePartition over
# ~2.4k rows, never over order volume). Ties: earliest trough day,
# then the EARLIEST day attaining that peak value at or before the
# trough.
_DRAWDOWN_ORACLE = _DAILY_CTE + """
, p AS (
    SELECT day, cents AS cum,
           CAST(MAX(cents) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS peak
    FROM daily
), trough AS (
    SELECT day AS t_day, cum AS t_cents, peak AS p_cents,
           peak - cum AS dd_cents
    FROM p ORDER BY peak - cum DESC, day LIMIT 1
)
SELECT CAST(MIN(p.day) AS DATE) AS peak_day,
       CAST(t.t_day AS DATE) AS trough_day,
       CAST(t.p_cents AS BIGINT) AS peak_cents,
       CAST(t.t_cents AS BIGINT) AS trough_cents,
       CAST(t.dd_cents AS BIGINT) AS drawdown_cents
FROM p, trough t
WHERE p.cum = t.p_cents AND p.day <= t.t_day
GROUP BY t.t_day, t.t_cents, t.p_cents, t.dd_cents
"""


@register("q367_max_drawdown", oracle=_DRAWDOWN_ORACLE)
def q367(spark, sf_dir):
    """Max drawdown (peak day, trough day, depth) of the daily-revenue
    level series — all integer cents (oracle comment)."""
    daily = _daily_cents(spark, sf_dir)
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    p = daily.select(
        "day",
        F.col("cents").cast("bigint").alias("cum"),
        F.max("cents").over(w).cast("bigint").alias("peak"),
    )
    trough = (
        p.select(
            F.col("day").alias("t_day"),
            F.col("cum").alias("t_cents"),
            F.col("peak").alias("p_cents"),
            (F.col("peak") - F.col("cum")).alias("dd_cents"),
        )
        .orderBy(F.col("dd_cents").desc(), "t_day")
        .limit(1)
    )
    return (
        p.join(
            F.broadcast(trough),
            (F.col("cum") == F.col("p_cents")) & (F.col("day") <= F.col("t_day")),
        )
        .groupBy("t_day", "t_cents", "p_cents", "dd_cents")
        .agg(F.min("day").alias("pk"))
        .select(
            F.col("pk").cast("date").alias("peak_day"),
            F.col("t_day").cast("date").alias("trough_day"),
            F.col("p_cents").alias("peak_cents"),
            F.col("t_cents").alias("trough_cents"),
            F.col("dd_cents").alias("drawdown_cents"),
        )
    )


# ---------- q368: average precision (area under the PR curve)

# The missing member of the ranking-eval family (AUC q207, lift q206,
# NDCG q269, MRR q303, hit rate q330): AP = mean over positives of
# precision@rank under the unique (score DESC, event_id ASC) order.
# Scale posture is q207's: global before-counts come from the score
# VALUE histogram (windows over |distinct scores|), per-row positions
# from windows PARTITIONED BY score (tie-group-sized, shuffled by key
# — never a global sort of event volume); rank = before_n + rn,
# cum_pos = before_pos + cpos. Each precision addend is rounded
# half-up to micro units in integer arithmetic (all operands
# positive), then the mean of the ROUNDED addends — the documented
# sum-of-rounded-terms contract that keeps both engines bit-equal.
_AP_ORACLE = """
WITH scored AS (
    SELECT event_id,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS score
    FROM events
), hist AS (
    SELECT score, COUNT(*) AS n, SUM(label) AS npos FROM scored GROUP BY score
), cum AS (
    SELECT score,
           COALESCE(SUM(n) OVER (ORDER BY score DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before_n,
           COALESCE(SUM(npos) OVER (ORDER BY score DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before_pos
    FROM hist
), within AS (
    SELECT score, label,
           ROW_NUMBER() OVER (PARTITION BY score ORDER BY event_id) AS rn,
           SUM(label) OVER (PARTITION BY score ORDER BY event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cpos
    FROM scored
), pos AS (
    SELECT CAST(before_n + rn AS BIGINT) AS rnk,
           CAST(before_pos + cpos AS BIGINT) AS cumpos
    FROM within JOIN cum USING (score) WHERE label = 1
), a AS (
    SELECT (2 * cumpos * 1000000 + rnk) // (2 * rnk) AS prec_micro FROM pos
)
SELECT CAST(COUNT(*) AS BIGINT) AS np,
       CAST((2 * SUM(prec_micro) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
           AS ap_micro
FROM a
"""


@register("q368_average_precision", oracle=_AP_ORACLE)
def q368(spark, sf_dir):
    """Average precision of the purchase-vs-rest score ranking, from
    the score histogram + tie-group windows (oracle comment)."""
    ev = load_tables(spark, sf_dir)["events"]
    scored = ev.select(
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("score"),
    )
    hist = scored.groupBy("score").agg(
        F.count("*").alias("n"), F.sum("label").alias("npos")
    )
    wb = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = hist.select(
        "score",
        F.coalesce(F.sum("n").over(wb), F.lit(0)).alias("before_n"),
        F.coalesce(F.sum("npos").over(wb), F.lit(0)).alias("before_pos"),
    )
    wg = Window.partitionBy("score").orderBy("event_id")
    within = scored.select(
        "score",
        "label",
        F.row_number().over(wg).alias("rn"),
        F.sum("label")
        .over(wg.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cpos"),
    )
    pos = (
        within.where(F.col("label") == 1)
        .join(cum, "score")
        .select(
            (F.col("before_n") + F.col("rn")).cast("bigint").alias("rnk"),
            (F.col("before_pos") + F.col("cpos")).cast("bigint").alias("cumpos"),
        )
    )
    a = pos.selectExpr(
        "CAST((2 * cumpos * 1000000 + rnk) DIV (2 * rnk) AS BIGINT) AS prec_micro"
    )
    return a.agg(
        F.count("*").cast("bigint").alias("np"),
        F.sum("prec_micro").cast("bigint").alias("s"),
    ).selectExpr(
        "np", "CAST((2 * s + np) DIV (2 * np) AS BIGINT) AS ap_micro"
    )


# ---------- q369: best-F1 operating threshold

# Threshold selection for the same scored universe: predict positive
# when score >= t, candidate thresholds = the distinct scores. TP and
# predicted-positive counts are inclusive top-down running sums over
# the score VALUE histogram (q207 posture — the window frame is
# |distinct scores|, never event volume); F1 = 2TP/(predp + np) in
# exact integers, rounded half-up to micro once per threshold. Winner
# by (f1_micro DESC, threshold DESC) — the micro grid is the declared
# tie resolution, then the HIGHEST qualifying threshold.
_BESTF1_ORACLE = """
WITH scored AS (
    SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS score
    FROM events
), hist AS (
    SELECT score, COUNT(*) AS n, SUM(label) AS npos FROM scored GROUP BY score
), tot AS (
    SELECT CAST(SUM(npos) AS BIGINT) AS np FROM hist
), sweep AS (
    SELECT score,
           CAST(SUM(npos) OVER (ORDER BY score DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
           CAST(SUM(n) OVER (ORDER BY score DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS predp
    FROM hist
)
SELECT score AS threshold_cents, tp, predp - tp AS fp, np - tp AS fn,
       CAST((2 * 2 * tp * 1000000 + (predp + np)) // (2 * (predp + np))
            AS BIGINT) AS f1_micro
FROM sweep, tot
ORDER BY f1_micro DESC, threshold_cents DESC LIMIT 1
"""


@register("q369_best_f1", oracle=_BESTF1_ORACLE)
def q369(spark, sf_dir):
    """Best-F1 threshold sweep over the score histogram (oracle
    comment)."""
    ev = load_tables(spark, sf_dir)["events"]
    scored = ev.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("score"),
    )
    hist = scored.groupBy("score").agg(
        F.count("*").alias("n"), F.sum("label").alias("npos")
    )
    tot = hist.agg(F.sum("npos").cast("bigint").alias("np"))
    wi = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    sweep = hist.select(
        "score",
        F.sum("npos").over(wi).cast("bigint").alias("tp"),
        F.sum("n").over(wi).cast("bigint").alias("predp"),
    )
    return (
        sweep.crossJoin(F.broadcast(tot))
        .selectExpr(
            "score AS threshold_cents",
            "tp",
            "predp - tp AS fp",
            "np - tp AS fn",
            "CAST((2 * 2 * tp * 1000000 + (predp + np)) DIV (2 * (predp + np))"
            " AS BIGINT) AS f1_micro",
        )
        .orderBy(F.col("f1_micro").desc(), F.col("threshold_cents").desc())
        .limit(1)
    )

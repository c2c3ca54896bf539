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


# ---------- q370: Jensen-Shannon divergence (early vs late traffic)

# The symmetric, bounded drift metric completing the divergence family
# (q227 total-variation, q322 KL): JSD(P,Q) = KL(P||M)/2 + KL(Q||M)/2
# with M = (P+Q)/2, over the (event_type, item) cell distribution of
# the first vs last week of the events month. Each cell's log ratio
# ln(2*cp*nq / (cp*nq + cq*np)) is an EXACT integer ratio discretized
# once to micro-nats (q297/q322 recipe — products stay below 2^53 so
# the double is exact far past sf100); each KL half is then the q322
# positive-shift integer round-half-up, and the final /2 happens on a
# GREATEST(.,0)-clamped sum (each half is >= 0 mathematically; the
# clamp absorbs quantization dips so truncating DIV and flooring //
# agree). Cells flow through ONE conditional-aggregation pass — no
# early/late self-join.
_JSD_ORACLE = """
WITH cells AS (
    SELECT event_type, CAST(json_extract(props, '$.k') AS INT) AS item,
           CAST(COUNT(*) FILTER (CAST(ts AS DATE) < DATE '2024-01-08')
                AS BIGINT) AS cp,
           CAST(COUNT(*) FILTER (CAST(ts AS DATE) >= DATE '2024-01-24')
                AS BIGINT) AS cq
    FROM events
    WHERE CAST(ts AS DATE) < DATE '2024-01-08'
       OR CAST(ts AS DATE) >= DATE '2024-01-24'
    GROUP BY 1, 2
), tot AS (
    SELECT CAST(SUM(cp) AS BIGINT) AS np, CAST(SUM(cq) AS BIGINT) AS nq
    FROM cells
), lp AS (
    SELECT cp, cq,
           CASE WHEN cp > 0 THEN CAST(ROUND(LN(
                (2.0 * cp * nq) / (CAST(cp AS DOUBLE) * nq + CAST(cq AS DOUBLE) * np)
                ) * 1000000) AS BIGINT) ELSE 0 END AS l1,
           CASE WHEN cq > 0 THEN CAST(ROUND(LN(
                (2.0 * cq * np) / (CAST(cp AS DOUBLE) * nq + CAST(cq AS DOUBLE) * np)
                ) * 1000000) AS BIGINT) ELSE 0 END AS l2
    FROM cells, tot
), halves AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST((2 * (SUM(CAST(cp AS HUGEINT) * l1) + CAST(MAX(np) AS HUGEINT) * 1000000)
                 + MAX(np)) // (2 * CAST(MAX(np) AS HUGEINT)) - 1000000 AS BIGINT) AS h1,
           CAST((2 * (SUM(CAST(cq AS HUGEINT) * l2) + CAST(MAX(nq) AS HUGEINT) * 1000000)
                 + MAX(nq)) // (2 * CAST(MAX(nq) AS HUGEINT)) - 1000000 AS BIGINT) AS h2
    FROM lp, tot
)
SELECT n_cells, h1 AS kl_pm_micro, h2 AS kl_qm_micro,
       CAST((GREATEST(h1 + h2, 0) + 1) // 2 AS BIGINT) AS jsd_micro
FROM halves
"""


@register("q370_js_divergence", oracle=_JSD_ORACLE)
def q370(spark, sf_dir):
    """Jensen-Shannon divergence between first-week and last-week
    (event_type, item) distributions, in discretized micro-nats
    (oracle comment)."""
    ev = load_tables(spark, sf_dir)["events"]
    day = F.col("ts").cast("date")
    early = day < F.lit("2024-01-08").cast("date")
    late = day >= F.lit("2024-01-24").cast("date")
    cells = (
        ev.where(early | late)
        .groupBy(
            "event_type", F.get_json_object("props", "$.k").cast("int").alias("item")
        )
        .agg(
            F.count(F.when(early, 1)).cast("bigint").alias("cp"),
            F.count(F.when(late, 1)).cast("bigint").alias("cq"),
        )
    )
    tot = cells.agg(
        F.sum("cp").cast("bigint").alias("np"), F.sum("cq").cast("bigint").alias("nq")
    )
    lp = cells.crossJoin(F.broadcast(tot)).select(
        "cp",
        "cq",
        "np",
        "nq",
        F.when(
            F.col("cp") > 0,
            F.round(
                F.log(
                    (2.0 * F.col("cp") * F.col("nq"))
                    / (
                        F.col("cp").cast("double") * F.col("nq")
                        + F.col("cq").cast("double") * F.col("np")
                    )
                )
                * 1000000
            ).cast("bigint"),
        )
        .otherwise(F.lit(0))
        .alias("l1"),
        F.when(
            F.col("cq") > 0,
            F.round(
                F.log(
                    (2.0 * F.col("cq") * F.col("np"))
                    / (
                        F.col("cp").cast("double") * F.col("nq")
                        + F.col("cq").cast("double") * F.col("np")
                    )
                )
                * 1000000
            ).cast("bigint"),
        )
        .otherwise(F.lit(0))
        .alias("l2"),
    )
    d38 = "decimal(38,0)"
    halves = lp.agg(
        F.count("*").cast("bigint").alias("n_cells"),
        F.sum(F.col("cp").cast(d38) * F.col("l1")).cast(d38).alias("s1"),
        F.sum(F.col("cq").cast(d38) * F.col("l2")).cast(d38).alias("s2"),
        F.max("np").cast(d38).alias("np"),
        F.max("nq").cast(d38).alias("nq"),
    ).selectExpr(
        "n_cells",
        "CAST((2 * (s1 + np * 1000000) + np) DIV (2 * np) - 1000000 AS BIGINT) AS h1",
        "CAST((2 * (s2 + nq * 1000000) + nq) DIV (2 * nq) - 1000000 AS BIGINT) AS h2",
    )
    return halves.selectExpr(
        "n_cells",
        "h1 AS kl_pm_micro",
        "h2 AS kl_qm_micro",
        "CAST((GREATEST(h1 + h2, 0) + 1) DIV 2 AS BIGINT) AS jsd_micro",
    )


# ---------- q371: Kendall tau-a of daily revenue vs daily order count

# Rank-correlation counterpart of q312's Spearman: concordant minus
# discordant pairs over all C(n,2) day pairs, tau_a = (C - D) / C(n,2)
# (tau-a, not tau-b: the sqrt in tau-b's tie correction is irrational;
# ties are REPORTED instead). The pairwise join is calendar-bounded —
# |days| ~2.4k rows regardless of order volume (q292 Theil-Sen's
# documented frame), so ~3M integer sign comparisons, never data^2.
# tau is signed: positive-shift round-half-up micro units.
_KENDALL_ORACLE = """
WITH d AS (
    SELECT o_orderdate AS day,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS cents,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderdate
), p AS (
    SELECT CASE WHEN (b.cents - a.cents) * (b.n_orders - a.n_orders) > 0
                THEN 1 ELSE 0 END AS conc,
           CASE WHEN (b.cents - a.cents) * (b.n_orders - a.n_orders) < 0
                THEN 1 ELSE 0 END AS disc
    FROM d a JOIN d b ON b.day > a.day
), s AS (
    SELECT CAST(SUM(conc) AS BIGINT) AS c, CAST(SUM(disc) AS BIGINT) AS dd,
           CAST(COUNT(*) AS BIGINT) AS t
    FROM p
)
SELECT c AS concordant, dd AS discordant, t - c - dd AS tied, t AS n_pairs,
       CAST((2 * ((c - dd) + t) * 1000000 + t) // (2 * t) - 1000000 AS BIGINT)
           AS tau_micro
FROM s
"""


@register("q371_kendall_tau", oracle=_KENDALL_ORACLE)
def q371(spark, sf_dir):
    """Kendall tau-a between daily revenue and daily order count on
    the calendar-bounded day frame (oracle comment)."""
    o = load_tables(spark, sf_dir)["orders"]
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
        F.count("*").cast("bigint").alias("n_orders"),
    )
    a = d.select(
        F.col("day").alias("da"), F.col("cents").alias("ca"), F.col("n_orders").alias("na")
    )
    b = d.select(
        F.col("day").alias("db"), F.col("cents").alias("cb"), F.col("n_orders").alias("nb")
    )
    sgn = (F.col("cb") - F.col("ca")) * (F.col("nb") - F.col("na"))
    p = a.join(b, F.col("db") > F.col("da")).select(
        F.when(sgn > 0, 1).otherwise(0).alias("conc"),
        F.when(sgn < 0, 1).otherwise(0).alias("disc"),
    )
    s = p.agg(
        F.sum("conc").cast("bigint").alias("c"),
        F.sum("disc").cast("bigint").alias("dd"),
        F.count("*").cast("bigint").alias("t"),
    )
    return s.selectExpr(
        "c AS concordant",
        "dd AS discordant",
        "t - c - dd AS tied",
        "t AS n_pairs",
        "CAST((2 * ((c - dd) + t) * 1000000 + t) DIV (2 * t) - 1000000 AS BIGINT)"
        " AS tau_micro",
    )


# ---------- q372: population stability index (PSI) over price deciles

# The model-monitoring standard for feature drift: bin the reference
# window (orders before 1998) at its own decile edges, score the
# current window (1998+) against those bins, PSI = sum over bins of
# (p_cur - p_ref) * ln(p_cur / p_ref). Edges are exact nearest-rank
# order statistics picked from the reference VALUE histogram by a
# 9-row range join (q364 posture — never a fact-table sort); bin
# assignment is 1 + |edges < x| against the broadcast sorted edge
# array. Each bin term is >= 0 EVEN AFTER the micro-nat log
# discretization (both factors share a sign; rounding preserves the
# log's sign because the ratio is exactly 1 only when the term is 0),
# so no positive shift is needed. Bins the current window never hits
# contribute 0 by the documented skip-zero rule (standard PSI adds an
# epsilon; skipping keeps the arithmetic exact and both engines
# identical).
_PSI_ORACLE = """
WITH ref AS (
    SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price
    FROM orders WHERE o_orderdate < DATE '1998-01-01'
), cur AS (
    SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price
    FROM orders WHERE o_orderdate >= DATE '1998-01-01'
), hist AS (
    SELECT price, COUNT(*) AS n FROM ref GROUP BY price
), cumh AS (
    SELECT price,
           SUM(n) OVER (ORDER BY price ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cum,
           SUM(n) OVER (ORDER BY price ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS cum_before
    FROM hist
), nref AS (SELECT CAST(COUNT(*) AS BIGINT) AS nr FROM ref
), ranks AS (
    SELECT k, CAST(CEIL(k * nr / 10.0) AS BIGINT) AS r FROM nref,
         (SELECT UNNEST(GENERATE_SERIES(1, 9)) AS k)
), edges AS (
    SELECT DISTINCT c.price AS e
    FROM cumh c JOIN ranks ON COALESCE(c.cum_before, 0) < ranks.r
                          AND ranks.r <= c.cum
), rbin AS (
    SELECT 1 + (SELECT COUNT(*) FROM edges WHERE e < price) AS bin,
           COUNT(*) AS c_ref
    FROM ref GROUP BY 1
), cbin AS (
    SELECT 1 + (SELECT COUNT(*) FROM edges WHERE e < price) AS bin,
           COUNT(*) AS c_cur
    FROM cur GROUP BY 1
), tots AS (
    SELECT (SELECT CAST(SUM(c_ref) AS BIGINT) FROM rbin) AS nr,
           (SELECT CAST(SUM(c_cur) AS BIGINT) FROM cbin) AS nc
), terms AS (
    SELECT r.bin, CAST(r.c_ref AS BIGINT) AS c_ref,
           CAST(COALESCE(b.c_cur, 0) AS BIGINT) AS c_cur,
           CASE WHEN COALESCE(b.c_cur, 0) > 0 THEN
             CAST(ROUND(LN((CAST(b.c_cur AS DOUBLE) * nr)
                           / (CAST(r.c_ref AS DOUBLE) * nc)) * 1000000)
                  AS BIGINT)
           ELSE 0 END AS l_micro,
           nr, nc
    FROM rbin r LEFT JOIN cbin b ON r.bin = b.bin, tots
)
SELECT CAST(bin AS BIGINT) AS bin, c_ref, c_cur,
       CAST((2 * GREATEST((c_cur * nr - c_ref * nc) * CAST(l_micro AS HUGEINT), 0)
             + CAST(nr AS HUGEINT) * nc)
            // (2 * CAST(nr AS HUGEINT) * nc) AS BIGINT) AS psi_term_micro
FROM terms ORDER BY bin
"""


@register("q372_psi_stability", oracle=_PSI_ORACLE)
def q372(spark, sf_dir):
    """Per-bin PSI terms of order totalprice, current (1998+) vs
    reference (<1998) decile bins (oracle comment)."""
    o = load_tables(spark, sf_dir)["orders"]
    price = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    ref = o.where(F.col("o_orderdate") < F.lit("1998-01-01").cast("date")).select(
        price.alias("price")
    )
    cur = o.where(F.col("o_orderdate") >= F.lit("1998-01-01").cast("date")).select(
        price.alias("price")
    )
    hist = ref.groupBy("price").agg(F.count("*").alias("n"))
    wcum = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, 0)
    wbef = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, -1)
    cumh = hist.select(
        "price",
        F.sum("n").over(wcum).alias("cum"),
        F.coalesce(F.sum("n").over(wbef), F.lit(0)).alias("cum_before"),
    )
    nref = ref.agg(F.count("*").cast("bigint").alias("nr"))
    ranks = (
        spark.range(1, 10)
        .withColumnRenamed("id", "k")
        .crossJoin(F.broadcast(nref))
        .select(F.ceil(F.col("k") * F.col("nr") / 10.0).cast("bigint").alias("r"))
    )
    edges = (
        cumh.join(
            F.broadcast(ranks),
            (F.col("cum_before") < F.col("r")) & (F.col("r") <= F.col("cum")),
        )
        .select(F.col("price").alias("e"))
        .distinct()
        .agg(F.sort_array(F.collect_list("e")).alias("edges"))
    )
    bin_of = F.lit(1) + F.size(
        F.filter(F.col("edges"), lambda e: e < F.col("price"))
    )
    rbin = (
        ref.crossJoin(F.broadcast(edges))
        .groupBy(bin_of.alias("bin"))
        .agg(F.count("*").cast("bigint").alias("c_ref"))
    )
    cbin = (
        cur.crossJoin(F.broadcast(edges))
        .groupBy(bin_of.alias("bin"))
        .agg(F.count("*").cast("bigint").alias("c_cur"))
    )
    tots = rbin.agg(F.sum("c_ref").cast("bigint").alias("nr")).crossJoin(
        cbin.agg(F.sum("c_cur").cast("bigint").alias("nc"))
    )
    terms = (
        rbin.join(cbin, "bin", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            "bin",
            "c_ref",
            F.coalesce(F.col("c_cur"), F.lit(0)).alias("c_cur"),
            F.when(
                F.coalesce(F.col("c_cur"), F.lit(0)) > 0,
                F.round(
                    F.log(
                        (F.col("c_cur").cast("double") * F.col("nr"))
                        / (F.col("c_ref").cast("double") * F.col("nc"))
                    )
                    * 1000000
                ).cast("bigint"),
            )
            .otherwise(F.lit(0))
            .alias("l_micro"),
            "nr",
            "nc",
        )
    )
    d38 = "decimal(38,0)"
    return terms.selectExpr(
        "CAST(bin AS BIGINT) AS bin",
        "c_ref",
        "c_cur",
        f"CAST((2 * GREATEST((c_cur * CAST(nr AS {d38}) - c_ref * CAST(nc AS {d38}))"
        f" * l_micro, 0) + CAST(nr AS {d38}) * nc)"
        f" DIV (2 * CAST(nr AS {d38}) * nc) AS BIGINT) AS psi_term_micro",
    ).orderBy("bin")

"""Round-7 batch (q420+): training-data batching economics, privacy
audits (l-diversity), link-analysis (HITS), rank statistics
(Kruskal-Wallis), effect sizes (Cohen's d), deterministic epoch
shuffling, intermittent-demand forecasting (Croston), lexical richness
(TTR/hapax), naive-forecast error metrics, an integer Bloom-filter FPR
study, bigram-LM next-token accuracy, and Spark-4 API rungs
(DataFrame.lateralJoin).

Determinism rules follow queries/relational.py's module docstring:
integer cents via DECIMAL(18,2)*100, round-half-up on POSITIVE integer
operands as (2p + q) DIV (2q), unique ORDER BY tiebreakers under every
LIMIT, and doubles only in textually-parallel final expressions over
exact integer aggregates (the q207 discipline)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..io import load_tables
from ..operators import banding as B
from . import register
from .llm import _BANDS_CTE, _MINHASH_CTE, _minhash_corpus

_TOK_SQL = "UNNEST(LIST_FILTER(STR_SPLIT(LOWER(text), ' '), t -> LEN(t) > 0))"


# ---------- q420: length-bucketed batching waste (data-loader economics)

# Sequence batching for training: sort docs by length (unique doc_id
# tiebreak), fixed batch size 32, pad every doc to its batch max —
# report per-batch padding waste. The global position is computed the
# scale-correct way (q206's exact-positional machinery): a map-side
# combinable LENGTH HISTOGRAM takes the only single-partition window
# (|distinct lengths| rows), and the within-length rank is a partitioned
# window — event volume is never globally sorted.
_BATCH_ORACLE = """
WITH p AS (
    SELECT n_chars,
           ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1 AS pos
    FROM documents
)
SELECT pos // 32 AS batch,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MAX(n_chars) AS BIGINT) AS max_len,
       CAST(SUM(n_chars) AS BIGINT) AS sum_len,
       CAST(COUNT(*) * MAX(n_chars) - SUM(n_chars) AS BIGINT) AS pad_waste
FROM p GROUP BY batch ORDER BY batch
"""


@register("q420_length_bucket_batching", oracle=_BATCH_ORACLE)
def q420(spark, sf_dir):
    """Per-batch padding waste under length-sorted batching (oracle
    comment)."""
    d = load_tables(spark, sf_dir)["documents"]
    hist = d.groupBy("n_chars").agg(F.count("*").alias("cnt"))
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        "n_chars", F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cum_before")
    )
    wr = Window.partitionBy("n_chars").orderBy("doc_id")
    pos = (
        d.select("doc_id", "n_chars")
        .withColumn("rn", F.row_number().over(wr))
        .join(cum, "n_chars")
        .select("n_chars", (F.col("cum_before") + F.col("rn") - 1).alias("pos"))
    )
    return (
        pos.select("n_chars", F.expr("pos DIV 32").alias("batch"))
        .groupBy("batch")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.max("n_chars").cast("bigint").alias("max_len"),
            F.sum("n_chars").cast("bigint").alias("sum_len"),
        )
        .withColumn(
            "pad_waste",
            (F.col("n_docs") * F.col("max_len") - F.col("sum_len")).cast("bigint"),
        )
        .orderBy("batch")
    )


# ---------- q421: l-diversity privacy audit

# k-anonymity (q391) asks "is each quasi-identifier group big enough";
# l-diversity asks the stronger question: does each group carry at least
# l DISTINCT values of the sensitive attribute (here: the account-
# balance band), so membership does not reveal it. Sensitive band uses
# the positive-shift integer division (c_acctbal >= -999.99 so
# cents + 100000 >= 1): Spark DIV truncates, DuckDB // floors — equal
# on non-negative operands only.
_LDIV_ORACLE = """
SELECT c_nationkey AS nation, c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                            + 100000) // 200000) AS BIGINT) AS n_sensitive,
       COUNT(DISTINCT (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                       + 100000) // 200000) >= 3 AS meets_l3
FROM customer
GROUP BY nation, segment ORDER BY nation, segment
"""


@register("q421_l_diversity", oracle=_LDIV_ORACLE)
def q421(spark, sf_dir):
    """l-diversity over (nation, segment) quasi-identifier groups
    (oracle comment)."""
    c = load_tables(spark, sf_dir)["customer"]
    band = F.expr(
        "(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) + 100000)"
        " DIV 200000"
    )
    return (
        c.select(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            band.alias("band"),
        )
        .groupBy("nation", "segment")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.countDistinct("band").cast("bigint").alias("n_sensitive"),
        )
        .withColumn("meets_l3", F.col("n_sensitive") >= 3)
        .orderBy("nation", "segment")
    )


# ---------- q422: HITS hub/authority on the supplier-part graph

# Two unrolled HITS rounds on the DISTINCT supplier-part bipartite
# edge set, in pure integer arithmetic (no normalization — only the
# RANKING is reported, and positive scaling preserves it): a1(p) =
# deg(p), h1(s) = sum of a1 over s's parts, a2(p) = sum of h1 over p's
# suppliers. Top-20 authorities by (a2 DESC, partkey). Every step is an
# equi-join + map-side-combinable aggregate on the edge relation; at
# extreme scale the integer growth (~cube of density) would switch to
# per-round normalized micro scores — stated, not needed at any tested
# SF (a2 < 2^40).
_HITS_ORACLE = """
WITH e AS (
    SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
), a1 AS (
    SELECT p, CAST(COUNT(*) AS BIGINT) AS a FROM e GROUP BY p
), h1 AS (
    SELECT s, CAST(SUM(a) AS BIGINT) AS h FROM e JOIN a1 USING (p) GROUP BY s
), a2 AS (
    SELECT p, CAST(SUM(h) AS BIGINT) AS a FROM e JOIN h1 USING (s) GROUP BY p
)
SELECT p AS partkey, a AS authority2
FROM a2 ORDER BY authority2 DESC, partkey LIMIT 20
"""


@register("q422_hits_scores", oracle=_HITS_ORACLE)
def q422(spark, sf_dir):
    """Two-round integer HITS; top-20 authority parts (oracle
    comment)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    e = li.select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")).distinct()
    a1 = e.groupBy("p").agg(F.count("*").cast("bigint").alias("a"))
    h1 = e.join(a1, "p").groupBy("s").agg(F.sum("a").cast("bigint").alias("h"))
    a2 = e.join(h1, "s").groupBy("p").agg(F.sum("h").cast("bigint").alias("a"))
    return (
        a2.select(F.col("p").alias("partkey"), F.col("a").alias("authority2"))
        .orderBy(F.col("authority2").desc(), "partkey")
        .limit(20)
    )


# ---------- q423: Kruskal-Wallis H across order priorities

# Rank-based one-way ANOVA on order value across the 5 priorities,
# average-tied ranks, computed from the VALUE HISTOGRAM exactly like
# q207's AUC: the tie frame gives r2(v) = rmin + rmax = 2*avg_rank as
# exact integers, R2_j = sum over the (priority, value) counts. The H
# statistic is then exact integer arithmetic end-to-end (round-half-up,
# positive operands): per-group terms R2_j^2/(4 n_j) ride DECIMAL(38,0)
# on Spark / HUGEINT on DuckDB through the squaring (R2_j^2 ~ 2e19
# exceeds BIGINT at sf0.1) but each DIV result fits BIGINT — Spark's
# DIV always RETURNS BIGINT, so the 1e6 micro scaling is applied only
# in the final 12e6*S/(N(N+1)) step whose quotient is small again
# (found the hard way: the term-level-micro form overflowed at sf0.1).
_KW_ORACLE = """
WITH v AS (
    SELECT o_orderpriority AS grp,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
    FROM orders
), hist AS (
    SELECT grp, cents, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY grp, cents
), ties AS (
    SELECT cents, CAST(SUM(c) AS BIGINT) AS n FROM hist GROUP BY cents
), ranked AS (
    SELECT cents,
           2 * (COALESCE(SUM(n) OVER (ORDER BY cents
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1)
           + n - 1 AS r2
    FROM ties
), rsums AS (
    SELECT grp, CAST(SUM(c * r2) AS BIGINT) AS r2sum, CAST(SUM(c) AS BIGINT) AS nj
    FROM hist JOIN ranked USING (cents) GROUP BY grp
), tot AS (
    SELECT CAST(SUM(nj) AS BIGINT) AS n FROM rsums
), s AS (
    SELECT CAST(SUM((2 * r2sum::HUGEINT * r2sum + 4 * nj) // (8 * nj))
               AS BIGINT) AS s4
    FROM rsums
)
SELECT (SELECT n FROM tot) AS n,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM rsums) AS k,
       CAST((24000000 * s4::HUGEINT + CAST(n AS HUGEINT) * (n + 1))
            // (2 * CAST(n AS HUGEINT) * (n + 1))
            - 3000000 * (n + 1) AS BIGINT) AS h_micro
FROM s, tot
"""


@register("q423_kruskal_wallis", oracle=_KW_ORACLE)
def q423(spark, sf_dir):
    """Kruskal-Wallis H in exact micro units from the value histogram
    (oracle comment)."""
    o = load_tables(spark, sf_dir)["orders"]
    v = o.select(
        F.col("o_orderpriority").alias("grp"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
    )
    hist = v.groupBy("grp", "cents").agg(F.count("*").cast("bigint").alias("c"))
    ties = hist.groupBy("cents").agg(F.sum("c").cast("bigint").alias("n"))
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    ranked = ties.select(
        "cents",
        (
            2 * (F.coalesce(F.sum("n").over(w), F.lit(0)) + 1) + F.col("n") - 1
        ).alias("r2"),
    )
    rsums = (
        hist.join(ranked, "cents")
        .groupBy("grp")
        .agg(
            F.sum(F.col("c") * F.col("r2")).cast("bigint").alias("r2sum"),
            F.sum("c").cast("bigint").alias("nj"),
        )
    )
    s = rsums.agg(
        F.sum(
            F.expr(
                "(2 * CAST(r2sum AS DECIMAL(38,0)) * r2sum + 4 * nj) DIV (8 * nj)"
            )
        )
        .cast("bigint")
        .alias("s4"),
        F.sum("nj").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("k"),
    )
    return s.select(
        "n",
        "k",
        F.expr(
            "CAST((24000000 * CAST(s4 AS DECIMAL(38,0)) + CAST(n AS DECIMAL(38,0)) * (n + 1))"
            " DIV (2 * CAST(n AS DECIMAL(38,0)) * (n + 1))"
            " - 3000000 * (n + 1) AS BIGINT)"
        ).alias("h_micro"),
    )


# ---------- q424: Cohen's d effect size (purchase vs non-purchase value)

# Standardized mean difference with pooled variance. Every aggregate is
# an exact integer (n, sum cents, sum cents^2 per group); the final
# mean/variance/sqrt expression runs in DOUBLE with textually-parallel
# forms on both engines (the q207 discipline — scalar double ops on
# identical exact inputs are IEEE-identical), then ROUND(6).
_COHEN_ORACLE = """
WITH g AS (
    SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
    FROM events
), agg AS (
    SELECT grp, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s,
           CAST(SUM(cents * cents) AS BIGINT) AS q
    FROM g GROUP BY grp
)
SELECT a.n AS n1, b.n AS n2,
       ROUND((CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
              - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE))
             / SQRT(((CAST(a.q AS DOUBLE) - CAST(a.s AS DOUBLE) * CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE))
                     + (CAST(b.q AS DOUBLE) - CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE)))
                    / CAST(a.n + b.n - 2 AS DOUBLE)), 6) AS cohens_d
FROM agg a JOIN agg b ON a.grp = 1 AND b.grp = 0
"""


@register("q424_cohens_d", oracle=_COHEN_ORACLE)
def q424(spark, sf_dir):
    """Cohen's d with pooled variance over exact integer moments
    (oracle comment)."""
    ev = load_tables(spark, sf_dir)["events"]
    g = ev.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("grp"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
    )
    agg = g.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("bigint").alias("q"),
    )
    a = agg.where(F.col("grp") == 1).alias("a")
    b = agg.where(F.col("grp") == 0).alias("b")
    return a.crossJoin(b).select(
        F.col("a.n").alias("n1"),
        F.col("b.n").alias("n2"),
        F.round(
            (
                F.col("a.s").cast("double") / F.col("a.n").cast("double")
                - F.col("b.s").cast("double") / F.col("b.n").cast("double")
            )
            / F.sqrt(
                (
                    (
                        F.col("a.q").cast("double")
                        - F.col("a.s").cast("double")
                        * F.col("a.s").cast("double")
                        / F.col("a.n").cast("double")
                    )
                    + (
                        F.col("b.q").cast("double")
                        - F.col("b.s").cast("double")
                        * F.col("b.s").cast("double")
                        / F.col("b.n").cast("double")
                    )
                )
                / (F.col("a.n") + F.col("b.n") - 2).cast("double")
            ),
            6,
        ).alias("cohens_d"),
    )


# ---------- q425: deterministic epoch shuffle (data-loader order)

# Training dataloaders re-shuffle per epoch; reproducible runs need the
# permutation to be a pure function of (epoch, doc_id). Permutation key
# = md5(epoch:doc_id) (the q155/q262 md5-determinism recipe); per epoch
# the first 8 docs are reported as the order's fingerprint. The
# row_number window prunes map-side via WindowGroupLimit (rn <= 8 is in
# the plan), so no epoch's full permutation is ever sorted.
_EPOCH_ORACLE = """
WITH e AS (
    SELECT t.epoch, d.doc_id,
           MD5(CAST(t.epoch AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)) AS k
    FROM range(0, 3) t(epoch), documents d
), r AS (
    SELECT epoch, doc_id, k,
           ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY k, doc_id) AS rn
    FROM e
)
SELECT CAST(epoch AS BIGINT) AS epoch,
       STRING_AGG(CAST(doc_id AS VARCHAR), ',' ORDER BY k, doc_id) AS head
FROM r WHERE rn <= 8 GROUP BY epoch ORDER BY epoch
"""


@register("q425_epoch_shuffle", oracle=_EPOCH_ORACLE)
def q425(spark, sf_dir):
    """First 8 docs of each epoch's md5-keyed permutation (oracle
    comment)."""
    d = load_tables(spark, sf_dir)["documents"]
    e = d.select("doc_id").crossJoin(
        F.broadcast(
            spark.range(0, 3).select(F.col("id").cast("bigint").alias("epoch"))
        )
    ).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat(
                F.col("epoch").cast("string"), F.lit(":"), F.col("doc_id").cast("string")
            )
        ).alias("k"),
    )
    w = Window.partitionBy("epoch").orderBy("k", "doc_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 8)
        .groupBy("epoch")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("k", "doc_id"))),
                    lambda s: s["doc_id"].cast("string"),
                ),
                ",",
            ).alias("head")
        )
        .orderBy("epoch")
    )


# ---------- q426: Croston intermittent-demand rates

# Classic Croston decomposition for sparse demand: average demand SIZE
# over demand days and average INTER-ARRIVAL gap, combined into a
# demand rate — all exact round-half-up micro integers (operands
# positive: d >= 2 distinct days implies gap >= 1). Parts filtered to
# the %50 slice to keep the contract row count stable per SF.
_CROSTON_ORACLE = """
WITH f AS (
    SELECT l_partkey AS part, CAST(l_shipdate AS DATE) AS day,
           CAST(l_quantity AS BIGINT) AS qty
    FROM lineitem WHERE l_partkey % 50 = 0
), per AS (
    SELECT part, CAST(COUNT(DISTINCT day) AS BIGINT) AS d,
           CAST(SUM(qty) AS BIGINT) AS qty_sum,
           DATE_DIFF('day', MIN(day), MAX(day)) AS gap
    FROM f GROUP BY part
)
SELECT part, d, qty_sum,
       CAST((2 * 1000000 * qty_sum + d) // (2 * d) AS BIGINT) AS size_micro,
       CAST((2 * 1000000 * gap + (d - 1)) // (2 * (d - 1)) AS BIGINT) AS interval_micro,
       CAST((2 * 1000000 * qty_sum * (d - 1) + d * gap) // (2 * d * gap) AS BIGINT)
           AS rate_micro
FROM per WHERE d >= 2 ORDER BY part
"""


@register("q426_croston_demand", oracle=_CROSTON_ORACLE)
def q426(spark, sf_dir):
    """Croston size/interval/rate in round-half-up micro units (oracle
    comment)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    f = li.where(F.col("l_partkey") % 50 == 0).select(
        F.col("l_partkey").alias("part"),
        F.col("l_shipdate").cast("date").alias("day"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    per = f.groupBy("part").agg(
        F.countDistinct("day").cast("bigint").alias("d"),
        F.sum("qty").cast("bigint").alias("qty_sum"),
        F.datediff(F.max("day"), F.min("day")).cast("bigint").alias("gap"),
    )
    return (
        per.where(F.col("d") >= 2)
        .selectExpr(
            "part",
            "d",
            "qty_sum",
            "CAST((2 * 1000000 * qty_sum + d) DIV (2 * d) AS BIGINT) AS size_micro",
            "CAST((2 * 1000000 * gap + (d - 1)) DIV (2 * (d - 1)) AS BIGINT)"
            " AS interval_micro",
            "CAST((2 * 1000000 * qty_sum * (d - 1) + d * gap) DIV (2 * d * gap)"
            " AS BIGINT) AS rate_micro",
        )
        .orderBy("part")
    )


# ---------- q427: type-token ratio + hapax share per source

# Lexical richness for corpus QA: tokens, types (distinct tokens),
# hapax legomena (tokens occurring once in the source), TTR and
# hapax-per-type in round-half-up micro. All counts collapse to the
# (source, token) TYPE frame before any ratio — the corpus-stats
# posture every text query here follows.
_TTR_ORACLE = f"""
WITH tf AS (
    SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT source, {_TOK_SQL} AS tok FROM documents
    ) GROUP BY source, tok
), per AS (
    SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(COUNT(*) FILTER (c = 1) AS BIGINT) AS n_hapax
    FROM tf GROUP BY source
)
SELECT source, n_tokens, n_types, n_hapax,
       CAST((2 * 1000000 * n_types + n_tokens) // (2 * n_tokens) AS BIGINT) AS ttr_micro,
       CAST((2 * 1000000 * n_hapax + n_types) // (2 * n_types) AS BIGINT) AS hapax_micro
FROM per ORDER BY source
"""


@register("q427_type_token_ratio", oracle=_TTR_ORACLE)
def q427(spark, sf_dir):
    """TTR + hapax share per source over the token TYPE frame (oracle
    comment)."""
    d = load_tables(spark, sf_dir)["documents"]
    tf = (
        d.select("source", F.explode(T.tokens(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    per = tf.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_types"),
        F.count(F.when(F.col("c") == 1, 1)).cast("bigint").alias("n_hapax"),
    )
    return per.selectExpr(
        "source",
        "n_tokens",
        "n_types",
        "n_hapax",
        "CAST((2 * 1000000 * n_types + n_tokens) DIV (2 * n_tokens) AS BIGINT)"
        " AS ttr_micro",
        "CAST((2 * 1000000 * n_hapax + n_types) DIV (2 * n_types) AS BIGINT)"
        " AS hapax_micro",
    ).orderBy("source")


# ---------- q428: naive-forecast error metrics (WAPE / sMAPE)

# Forecast QA for the daily-revenue series: the naive seasonal forecast
# f(d) = actual(d-7) (calendar join, not row lag — gap days must not
# shift the season), scored with WAPE and sMAPE. Integer end-to-end:
# WAPE = 1e6*sum|e|/sum(a) round-half-up; sMAPE averages per-day
# round-half-up micro ratios (the contract fixes this two-stage
# rounding, making it engine-exact — both operands positive).
_FCERR_ORACLE = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS cents
    FROM orders GROUP BY 1
), j AS (
    SELECT a.day, a.cents AS actual, f.cents AS fc,
           ABS(a.cents - f.cents) AS err
    FROM daily a JOIN daily f ON a.day = f.day + 7
), per AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(err) AS BIGINT) AS sum_err,
           CAST(SUM(actual) AS BIGINT) AS sum_act,
           CAST(SUM((2 * 2000000 * err + (fc + actual)) // (2 * (fc + actual)))
                AS BIGINT) AS smape_sum
    FROM j
)
SELECT n_days,
       CAST((2 * 1000000 * sum_err + sum_act) // (2 * sum_act) AS BIGINT) AS wape_micro,
       CAST((2 * smape_sum + n_days) // (2 * n_days) AS BIGINT) AS smape_micro
FROM per
"""


@register("q428_forecast_errors", oracle=_FCERR_ORACLE)
def q428(spark, sf_dir):
    """WAPE + sMAPE of the calendar lag-7 naive forecast (oracle
    comment)."""
    o = load_tables(spark, sf_dir)["orders"]
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    a = daily.alias("a")
    f_ = daily.select(F.date_add("day", 7).alias("fday"), F.col("cents").alias("fc"))
    j = a.join(f_, F.col("a.day") == F.col("fday")).select(
        F.col("a.cents").alias("actual"),
        "fc",
        F.abs(F.col("a.cents") - F.col("fc")).alias("err"),
    )
    per = j.agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("err").cast("bigint").alias("sum_err"),
        F.sum("actual").cast("bigint").alias("sum_act"),
        F.sum(F.expr("(2 * 2000000 * err + (fc + actual)) DIV (2 * (fc + actual))"))
        .cast("bigint")
        .alias("smape_sum"),
    )
    return per.selectExpr(
        "n_days",
        "CAST((2 * 1000000 * sum_err + sum_act) DIV (2 * sum_act) AS BIGINT)"
        " AS wape_micro",
        "CAST((2 * smape_sum + n_days) DIV (2 * n_days) AS BIGINT) AS smape_micro",
    )


# ---------- q429: Bloom-filter false-positive study (integer sketch)

# A Bloom filter as a RELATION: member keys (src0 docs' text md5) set 3
# bit positions each (md5(i:k) mod 4096 — the repo's md5-to-int
# recipe), the bitset is the distinct-position table, and a probe (src1
# keys verified absent by exact anti-join) is a false positive iff all
# 3 of its positions are set. Everything is equi-joins + distincts —
# the 100 TB form of a bitset is exactly this relation, partitionable
# and broadcastable; m = 4096 keeps the measured FPR nonzero at the
# tested SFs.
_BLOOM_ORACLE = """
WITH members AS (
    SELECT DISTINCT MD5(text) AS k FROM documents WHERE source = 'src0'
), probes AS (
    SELECT DISTINCT MD5(text) AS k FROM documents WHERE source = 'src1'
    AND MD5(text) NOT IN (SELECT k FROM members)
), bits AS (
    SELECT DISTINCT ('0x' || SUBSTR(MD5(CAST(i AS VARCHAR) || ':' || k), 1, 15))::BIGINT
                    % 4096 AS pos
    FROM members, range(0, 3) t(i)
), ppos AS (
    SELECT k, ('0x' || SUBSTR(MD5(CAST(i AS VARCHAR) || ':' || k), 1, 15))::BIGINT
              % 4096 AS pos
    FROM probes, range(0, 3) t(i)
), fp AS (
    SELECT ppos.k FROM ppos JOIN bits USING (pos)
    GROUP BY ppos.k HAVING COUNT(DISTINCT pos) = 3
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM members) AS n_members,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS n_bits,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM probes) AS n_probes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM fp) AS n_fp
"""


@register("q429_bloom_fpr", oracle=_BLOOM_ORACLE)
def q429(spark, sf_dir):
    """Observed Bloom-filter false positives against the exact anti-join
    truth (oracle comment). COUNT(DISTINCT pos) = 3 (not COUNT(*)) on
    the probe side: two of a key's 3 hashes can collide on one
    position."""
    d = load_tables(spark, sf_dir)["documents"]
    members = d.where(F.col("source") == "src0").select(F.md5("text").alias("k")).distinct()
    probes = (
        d.where(F.col("source") == "src1")
        .select(F.md5("text").alias("k"))
        .distinct()
        .join(members, "k", "left_anti")
    )
    three = F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("i")

    def positions(df):
        return df.select("k", three).select(
            "k",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("i").cast("string"), F.lit(":"), F.col("k"))),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 4096
            ).alias("pos"),
        )

    bits = positions(members).select("pos").distinct()
    fp = (
        positions(probes)
        .join(bits, "pos")
        .groupBy("k")
        .agg(F.countDistinct("pos").alias("nhit"))
        .where(F.col("nhit") == 3)
    )
    return (
        members.agg(F.count("*").cast("bigint").alias("n_members"))
        .crossJoin(bits.agg(F.count("*").cast("bigint").alias("n_bits")))
        .crossJoin(probes.agg(F.count("*").cast("bigint").alias("n_probes")))
        .crossJoin(fp.agg(F.count("*").cast("bigint").alias("n_fp")))
    )


# ---------- q430: bigram-LM next-token accuracy (in-corpus)

# The simplest language model: per preceding token, predict the
# most-frequent follower (count DESC, token ASC tiebreak) and score
# accuracy against the corpus's actual adjacent pairs. Pairs come from
# a PARTITIONED lead window (per-doc positions — never a global sort);
# the model table collapses to the bigram TYPE frame first.
_BIGRAM_ORACLE = """
WITH t AS (
    SELECT doc_id, LIST_FILTER(STR_SPLIT(LOWER(text), ' '), x -> LEN(x) > 0) AS tk
    FROM documents
), pr AS (
    SELECT UNNEST(list_transform(range(1, LEN(tk)), i -> tk[i] || ' ' || tk[i + 1])) AS pr
    FROM t WHERE LEN(tk) >= 2
), bg AS (
    SELECT SPLIT_PART(pr, ' ', 1) AS w1, SPLIT_PART(pr, ' ', 2) AS w2,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM pr GROUP BY w1, w2
), pred AS (
    SELECT w1, w2 AS pw2 FROM (
        SELECT w1, w2, ROW_NUMBER() OVER (PARTITION BY w1 ORDER BY c DESC, w2) AS rn
        FROM bg
    ) WHERE rn = 1
), sums AS (
    SELECT CAST(SUM(c) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN w2 = pw2 THEN c ELSE 0 END) AS BIGINT) AS n_correct
    FROM bg JOIN pred USING (w1)
)
SELECT n_pairs, n_correct,
       CAST((2 * 1000000 * n_correct + n_pairs) // (2 * n_pairs) AS BIGINT) AS acc_micro
FROM sums
"""


@register("q430_bigram_prediction", oracle=_BIGRAM_ORACLE)
def q430(spark, sf_dir):
    """Bigram argmax next-token accuracy over the corpus (oracle
    comment)."""
    d = load_tables(spark, sf_dir)["documents"]
    tok = d.select("doc_id", F.posexplode(T.tokens(F.col("text"))).alias("pos", "w"))
    wd = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        tok.withColumn("w2", F.lead("w").over(wd))
        .where(F.col("w2").isNotNull())
        .select(F.col("w").alias("w1"), "w2")
    )
    bg = pairs.groupBy("w1", "w2").agg(F.count("*").cast("bigint").alias("c"))
    wp = Window.partitionBy("w1").orderBy(F.col("c").desc(), "w2")
    pred = (
        bg.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") == 1)
        .select("w1", F.col("w2").alias("pw2"))
    )
    sums = (
        bg.join(pred, "w1")
        .agg(
            F.sum("c").cast("bigint").alias("n_pairs"),
            F.sum(F.when(F.col("w2") == F.col("pw2"), F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("n_correct"),
        )
    )
    return sums.selectExpr(
        "n_pairs",
        "n_correct",
        "CAST((2 * 1000000 * n_correct + n_pairs) DIV (2 * n_pairs) AS BIGINT)"
        " AS acc_micro",
    )


# ---------- q431: dynamic partition pruning (layout + dim-join prune)

# The DPP pattern every star-schema warehouse lives on: the fact table
# persisted PARTITIONED BY the join key (q133/q135's layout discipline),
# the dimension side carrying a runtime filter Catalyst cannot fold
# statically (a windowed top-2 over an aggregate), so the fact scan is
# pruned by a dynamicpruning subquery at EXECUTION time — asserted in
# tests/test_plans.py. The oracle recomputes from the raw table: the
# layout must be invisible in the result.
_DPP_ORACLE = """
WITH dim AS (
    SELECT event_type FROM (
        SELECT event_type,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, event_type) AS rn
        FROM events GROUP BY event_type
    ) WHERE rn <= 2
)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
           AS sum_cents
FROM events e JOIN dim USING (event_type)
GROUP BY e.event_type ORDER BY e.event_type
"""


def _q431_fact(spark, sf_dir):
    """Partitioned fact layout for q431 (rebuilt in scratch per call)."""
    from ..scratch import scratch_dir

    ev = load_tables(spark, sf_dir)["events"]
    path = scratch_dir("q431_events")
    ev.select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
    ).write.mode("overwrite").partitionBy("event_type").parquet(path)
    return spark.read.parquet(path)


@register("q431_dpp_prune", oracle=_DPP_ORACLE)
def q431(spark, sf_dir):
    """Star-schema aggregate over a partitioned fact with a runtime
    dim filter — the scan prunes via dynamic partition pruning (oracle
    comment)."""
    ev = load_tables(spark, sf_dir)["events"]
    fact = _q431_fact(spark, sf_dir)
    w = Window.orderBy(F.col("cnt").desc(), "event_type")
    dim = (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("event_type")
    )
    return (
        fact.join(dim, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )
        .orderBy("event_type")
    )


# ---------- q432: DataFrame.lateralJoin (Spark 4 API rung)

# The Spark 4.0 DataFrame-API form of a correlated lateral subquery
# (q265 covers the SQL LATERAL): per nation, the top-2 customers by
# account balance, where the inner frame references the outer row via
# Column.outer(). Catalyst rewrites the correlated limit into a
# partitioned window — same plan family as q25 — so the API rung adds
# surface, not a new execution shape.
_LATDF_ORACLE = """
SELECT o.nation, o.n_cust, l.custkey, l.cents
FROM (SELECT c_nationkey AS nation, CAST(COUNT(*) AS BIGINT) AS n_cust
      FROM customer GROUP BY c_nationkey) o,
     LATERAL (SELECT c_custkey AS custkey,
                     CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
              FROM customer
              WHERE c_nationkey = o.nation
              ORDER BY cents DESC, custkey LIMIT 2) l
ORDER BY o.nation, l.cents DESC, l.custkey
"""


@register("q432_lateral_join_df", oracle=_LATDF_ORACLE)
def q432(spark, sf_dir):
    """Top-2 customers per nation via DataFrame.lateralJoin +
    Column.outer() (oracle comment)."""
    c = load_tables(spark, sf_dir)["customer"]
    outer = c.groupBy(F.col("c_nationkey").alias("nation")).agg(
        F.count("*").cast("bigint").alias("n_cust")
    )
    inner = (
        c.where(F.col("c_nationkey") == F.col("nation").outer())
        .select(
            F.col("c_custkey").alias("custkey"),
            (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
        )
        .orderBy(F.col("cents").desc(), "custkey")
        .limit(2)
    )
    return outer.lateralJoin(inner).orderBy(
        "nation", F.col("cents").desc(), "custkey"
    )


# ---------- q433: dedup threshold tuning curve (similarity histogram)

# Which near-dup threshold would remove how much: exact n-gram Jaccard
# on the q44 LSH candidate feed (candidate-driven — never all pairs),
# binned by round-half-up basis points into deciles. This is the curve
# read before committing a dedup threshold on a new corpus; integer
# bp = rhu(1e4 * |inter| / |union|) keeps the bin edges engine-exact
# (FLOOR of a rounded double would not be).
_SIMHIST_ORACLE = _MINHASH_CTE + _BANDS_CTE + """
, cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands_capped a JOIN bands_capped b ON a.band = b.band AND a.doc_id < b.doc_id
), grams AS (
    SELECT doc_id, LIST_DISTINCT(hs) AS gs FROM hv
), bp AS (
    SELECT (2 * 10000 * LEN(LIST_INTERSECT(ga.gs, gb.gs))
            + (LEN(ga.gs) + LEN(gb.gs) - LEN(LIST_INTERSECT(ga.gs, gb.gs))))
           // (2 * (LEN(ga.gs) + LEN(gb.gs) - LEN(LIST_INTERSECT(ga.gs, gb.gs))))
           AS bp
    FROM cand
    JOIN grams ga ON ga.doc_id = cand.doc_a
    JOIN grams gb ON gb.doc_id = cand.doc_b
    WHERE LEN(ga.gs) + LEN(gb.gs) - LEN(LIST_INTERSECT(ga.gs, gb.gs)) > 0
)
SELECT CAST(bp // 1000 AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(MIN(bp) AS BIGINT) AS min_bp,
       CAST(MAX(bp) AS BIGINT) AS max_bp
FROM bp GROUP BY decile ORDER BY decile
"""


@register("q433_dedup_threshold_curve", oracle=_SIMHIST_ORACLE)
def q433(spark, sf_dir):
    """Decile histogram of exact candidate-pair Jaccard in integer
    basis points (oracle comment above)."""
    d = load_tables(spark, sf_dir)["documents"]
    corpus = _minhash_corpus(d)
    grams = B.gram_sets(corpus)
    grams.persist()
    sig = B.signatures_from_grams(grams)
    cands = B.bucket_pairs(B.band_buckets(B.minhash_bands(sig)))
    a = grams.select(F.col("doc_id").alias("doc_a"), F.col("gs").alias("ga"))
    b = grams.select(F.col("doc_id").alias("doc_b"), F.col("gs").alias("gb"))
    inter = F.size(F.array_intersect(F.col("ga"), F.col("gb")))
    uni = F.size("ga") + F.size("gb") - inter
    bp = (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .where(uni > 0)
        .select(
            F.expr(
                "(2 * 10000 * size(array_intersect(ga, gb))"
                " + (size(ga) + size(gb) - size(array_intersect(ga, gb))))"
                " DIV (2 * (size(ga) + size(gb) - size(array_intersect(ga, gb))))"
            ).alias("bp")
        )
    )
    return (
        bp.groupBy(F.expr("bp DIV 1000").cast("bigint").alias("decile"))
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.min("bp").cast("bigint").alias("min_bp"),
            F.max("bp").cast("bigint").alias("max_bp"),
        )
        .orderBy("decile")
    )

"""Round-6 third wave (q331+): sequence-model evaluation, storage
advisory, and the Spark 4 table-argument UDTF lane.

Same determinism contract as queries/relational.py and analytics3.py:
exact integer arithmetic wherever possible, positive-shift
round-half-up micro units for rationals, integer-literal
discretization for anything transcendental, unique ORDER BY
tiebreakers under every LIMIT.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load_tables
from . import register


# ---------- q331: Markov next-event predictor evaluation

# Close the loop on q181's transition matrix: TRAIN it on 80% of users
# (user_id % 5 != 0), predict each held-out transition's next event as
# the argmax row of the matrix (count DESC, event name tiebreak), and
# report per-state top-1 accuracy. All counts and the accuracy shares
# are exact integers / round-half-up micro units; transitions come
# from one LEAD window per user ordered by (ts, event_id). Test
# transitions whose FROM-state never occurred in training are dropped
# on both engines (no model row to join).
_MARKOV_EVAL_ORACLE = """
WITH seq AS (
    SELECT user_id, event_type AS prev,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
    FROM events
), trainc AS (
    SELECT s.prev, s.nxt, COUNT(*) AS cnt
    FROM seq s WHERE s.nxt IS NOT NULL AND s.user_id % 5 <> 0
    GROUP BY s.prev, s.nxt
), model AS (
    SELECT prev, nxt AS pred,
           ROW_NUMBER() OVER (PARTITION BY prev ORDER BY cnt DESC, nxt) AS rn
    FROM trainc
), test AS (
    SELECT s.prev, s.nxt FROM seq s
    WHERE s.nxt IS NOT NULL AND s.user_id % 5 = 0
)
SELECT t.prev AS from_state,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(COUNT(*) FILTER (t.nxt = m.pred) AS BIGINT) AS n_correct,
       CAST((2 * COUNT(*) FILTER (t.nxt = m.pred) * 1000000 + COUNT(*))
            // (2 * COUNT(*)) AS BIGINT) AS acc_micro
FROM test t JOIN model m ON m.prev = t.prev AND m.rn = 1
GROUP BY t.prev ORDER BY from_state
"""


@register("q331_markov_eval", oracle=_MARKOV_EVAL_ORACLE)
def q331(spark, sf_dir):
    """Per-state top-1 accuracy of the trained transition argmax
    (oracle comment)."""
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("prev"),
        F.lead("event_type").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    trainc = (
        seq.where(F.col("user_id") % 5 != 0)
        .groupBy("prev", "nxt")
        .agg(F.count("*").alias("cnt"))
    )
    wm = Window.partitionBy("prev").orderBy(F.col("cnt").desc(), "nxt")
    model = (
        trainc.withColumn("rn", F.row_number().over(wm))
        .where(F.col("rn") == 1)
        .select("prev", F.col("nxt").alias("pred"))
    )
    test = seq.where(F.col("user_id") % 5 == 0).select("prev", "nxt")
    return (
        test.join(F.broadcast(model), "prev")
        .groupBy(F.col("prev").alias("from_state"))
        .agg(
            F.count("*").cast("bigint").alias("n_test"),
            F.count(F.when(F.col("nxt") == F.col("pred"), 1))
            .cast("bigint")
            .alias("n_correct"),
            F.expr(
                "CAST((2 * COUNT(CASE WHEN nxt = pred THEN 1 END) * 1000000"
                " + COUNT(*)) DIV (2 * COUNT(*)) AS BIGINT)"
            ).alias("acc_micro"),
        )
        .orderBy("from_state")
    )


# ---------- q332: partition-sizing advisor (storage layout planning)

# The pre-write planning step for a month-partitioned table (q328's
# layout): per month, exact row counts and a byte estimate from
# declared fixed widths (4 BIGINT/TIMESTAMP fields x 8) plus actual
# string lengths, then the file count a 1 MiB target implies —
# ceil via integer (bytes + M - 1) DIV M. Everything is one
# map-side-combinable aggregate over orders; the advisor output is
# |months| rows. (The 1 MiB target suits the test SFs; production
# would pass 128 MiB — the arithmetic is the point.)
_ADVISOR_ORACLE = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(32 + LEN(o_orderstatus) + LEN(o_orderpriority)) AS BIGINT)
           AS est_bytes,
       CAST((SUM(32 + LEN(o_orderstatus) + LEN(o_orderpriority)) + 1048575)
            // 1048576 AS BIGINT) AS n_files
FROM orders GROUP BY 1 ORDER BY month
"""


@register("q332_partition_advisor", oracle=_ADVISOR_ORACLE)
def q332(spark, sf_dir):
    """Per-month byte estimate and target file counts (oracle
    comment)."""
    o = load_tables(spark, sf_dir)["orders"]
    width = (
        F.lit(32)
        + F.length("o_orderstatus")
        + F.length("o_orderpriority")
    )
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(width).cast("bigint").alias("est_bytes"),
            F.expr(
                "CAST((SUM(32 + LENGTH(o_orderstatus) + LENGTH(o_orderpriority))"
                " + 1048575) DIV 1048576 AS BIGINT)"
            ).alias("n_files"),
        )
        .orderBy("month")
    )


# ---------- q333: UDTF with TABLE argument (PARTITION BY ... ORDER BY)

# The table-argument rung of the UDTF ladder (q126 static schema, q285
# analyze()): the function consumes TABLE(events) PARTITION BY user_id
# ORDER BY (ts, event_id) — Spark feeds each user's rows IN ORDER to
# one UDTF instance, which streams per-row state (longest same-type
# run) and emits one summary row from terminate(). The deterministic
# ordered feed is the whole point: the streak depends on event order,
# and the oracle rebuilds it relationally with the gaps-and-islands
# rn-difference trick. Python-lane cost is one worker pass per
# partition — the applyInPandas profile.
_STREAK_ORACLE = """
WITH seq AS (
    SELECT user_id, event_type, ts, event_id,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn,
           ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS rnt
    FROM events
), runs AS (
    SELECT user_id, event_type, rn - rnt AS grp, COUNT(*) AS run_len
    FROM seq GROUP BY user_id, event_type, rn - rnt
)
SELECT user_id,
       CAST(SUM(run_len) AS INT) AS n_events,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN run_len ELSE 0 END)
            AS INT) AS n_purchases,
       CAST(MAX(run_len) AS INT) AS longest_streak
FROM runs GROUP BY user_id ORDER BY user_id
"""


@register("q333_udtf_table_arg", oracle=_STREAK_ORACLE)
def q333(spark, sf_dir):
    """Per-user ordered-stream stats via a TABLE-argument UDTF (oracle
    comment)."""
    from pyspark.sql.functions import udtf

    load_tables(spark, sf_dir)

    @udtf(returnType="user_id bigint, n_events int, n_purchases int, longest_streak int")
    class UserStreaks:
        def __init__(self):
            self.user = None
            self.n = 0
            self.buys = 0
            self.cur_type = None
            self.cur_run = 0
            self.best = 0

        def eval(self, row):
            self.user = row["user_id"]
            self.n += 1
            if row["event_type"] == "purchase":
                self.buys += 1
            if row["event_type"] == self.cur_type:
                self.cur_run += 1
            else:
                self.cur_type = row["event_type"]
                self.cur_run = 1
            self.best = max(self.best, self.cur_run)

        def terminate(self):
            if self.user is not None:
                yield self.user, self.n, self.buys, self.best

    spark.udtf.register("user_streaks", UserStreaks)
    return spark.sql(
        "SELECT * FROM user_streaks(TABLE(events)"
        " PARTITION BY user_id ORDER BY (ts, event_id))"
        " ORDER BY user_id"
    )


# ---------- q334: pass@k estimator (exact combinatorial rational)

# The unbiased pass@k estimator, 1 - C(n-c, k)/C(n-c ... k)/C(n, k),
# applied per "task" (user): n = first-10 attempt count, c =
# successes (purchases) among them, k = 5. The binomial ratio
# telescopes to prod_{i<5} (n-c-i)/(n-i) — with n <= 10 every factor
# is a tiny exact integer, so pass@5 is an exact rational in micro
# units (product = 0 when n-c < 5, i.e. pass = 1). Users with n < 5
# are excluded (estimator undefined). Output is the (n, c) TYPE frame
# with user counts — the fact table collapses through one ranked
# window and one aggregate.
_PASSK_ORACLE = """
WITH firstn AS (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM events
), peruser AS (
    SELECT user_id, COUNT(*) AS n,
           COUNT(*) FILTER (event_type = 'purchase') AS c
    FROM firstn WHERE rn <= 10 GROUP BY user_id
), grp AS (
    SELECT n, c, COUNT(*) AS n_users FROM peruser WHERE n >= 5 GROUP BY n, c
)
SELECT CAST(n AS INT) AS n, CAST(c AS INT) AS c,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(CASE WHEN n - c < 5 THEN 1000000
                 ELSE (2 * ((n*(n-1)*(n-2)*(n-3)*(n-4))
                            - ((n-c)*(n-c-1)*(n-c-2)*(n-c-3)*(n-c-4))) * 1000000
                       + (n*(n-1)*(n-2)*(n-3)*(n-4)))
                      // (2 * (n*(n-1)*(n-2)*(n-3)*(n-4)))
            END AS BIGINT) AS pass5_micro
FROM grp ORDER BY n, c
"""


@register("q334_pass_at_k", oracle=_PASSK_ORACLE)
def q334(spark, sf_dir):
    """pass@5 per (attempts, successes) cell, exact rationals (oracle
    comment)."""
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    peruser = (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("c"),
        )
    )
    grp = (
        peruser.where(F.col("n") >= 5)
        .groupBy("n", "c")
        .agg(F.count("*").alias("n_users"))
    )
    return grp.selectExpr(
        "CAST(n AS INT) AS n",
        "CAST(c AS INT) AS c",
        "CAST(n_users AS BIGINT) AS n_users",
        """CAST(CASE WHEN n - c < 5 THEN 1000000
                ELSE (2 * ((n*(n-1)*(n-2)*(n-3)*(n-4))
                           - ((n-c)*(n-c-1)*(n-c-2)*(n-c-3)*(n-c-4))) * 1000000
                      + (n*(n-1)*(n-2)*(n-3)*(n-4)))
                     DIV (2 * (n*(n-1)*(n-2)*(n-3)*(n-4)))
           END AS BIGINT) AS pass5_micro""",
    ).orderBy("n", "c")


# ---------- q335: md5 permutation test (exact rational comparisons)

# Is the odd/even-user revenue split bigger than chance? The
# permutation test with the RNG replaced by the q155 md5 recipe:
# 100 pseudo-assignments (parity of md5(user:k)) rebuild the
# difference-in-means null distribution, and the p-value is the rank
# of the observed split among them. NO division ever happens: the
# comparison |S_A n_B - S_B n_A| / (n_A n_B) >= observed is
# cross-multiplied into exact DECIMAL(38) integer arithmetic, so the
# test is bit-deterministic on both engines. The fact table collapses
# to the user frame first; the K=100 expansion happens on that
# dimension-sized frame.
_PERM_ORACLE = """
WITH peruser AS (
    SELECT user_id,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
               AS cents
    FROM events GROUP BY user_id
), obs AS (
    SELECT CAST(SUM(CASE WHEN user_id % 2 = 0 THEN cents ELSE 0 END) AS HUGEINT) AS sa,
           CAST(SUM(CASE WHEN user_id % 2 = 1 THEN cents ELSE 0 END) AS HUGEINT) AS sb,
           CAST(COUNT(*) FILTER (user_id % 2 = 0) AS HUGEINT) AS na,
           CAST(COUNT(*) FILTER (user_id % 2 = 1) AS HUGEINT) AS nb
    FROM peruser
), perm AS (
    SELECT k.k,
           CAST(SUM(CASE WHEN g = 0 THEN cents ELSE 0 END) AS HUGEINT) AS sa,
           CAST(SUM(CASE WHEN g = 1 THEN cents ELSE 0 END) AS HUGEINT) AS sb,
           CAST(COUNT(*) FILTER (g = 0) AS HUGEINT) AS na,
           CAST(COUNT(*) FILTER (g = 1) AS HUGEINT) AS nb
    FROM (
        SELECT p.user_id, p.cents, k.k,
               ('0x' || SUBSTR(MD5(CAST(p.user_id AS VARCHAR) || ':'
                               || CAST(k.k AS VARCHAR)), 1, 8))::BIGINT % 2 AS g
        FROM peruser p, range(0, 100) k(k)
    ) x JOIN range(0, 100) k(k) ON k.k = x.k
    GROUP BY k.k
), cmp AS (
    SELECT COUNT(*) FILTER (
        ABS(p.sa * p.nb - p.sb * p.na) * (o.na * o.nb)
        >= ABS(o.sa * o.nb - o.sb * o.na) * (p.na * p.nb)
    ) AS n_extreme
    FROM perm p, obs o
    WHERE p.na > 0 AND p.nb > 0
)
SELECT CAST((SELECT COUNT(*) FROM peruser) AS BIGINT) AS n_users,
       CAST(n_extreme AS BIGINT) AS n_extreme,
       CAST((2 * (n_extreme + 1) * 1000000 + 101) // (2 * 101) AS BIGINT)
           AS p_micro
FROM cmp
"""


@register("q335_permutation_test", oracle=_PERM_ORACLE)
def q335(spark, sf_dir):
    """Deterministic permutation test of the parity revenue split
    (oracle comment)."""
    ev = load_tables(spark, sf_dir)["events"]
    peruser = ev.groupBy("user_id").agg(
        F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    d38 = "decimal(38,0)"

    def split(df, gcol):
        return df.agg(
            F.sum(F.when(gcol == 0, F.col("cents")).otherwise(0)).cast(d38).alias("sa"),
            F.sum(F.when(gcol == 1, F.col("cents")).otherwise(0)).cast(d38).alias("sb"),
            F.count(F.when(gcol == 0, 1)).cast(d38).alias("na"),
            F.count(F.when(gcol == 1, 1)).cast(d38).alias("nb"),
        )

    obs = split(peruser, F.col("user_id") % 2)
    expanded = peruser.crossJoin(
        F.broadcast(spark.range(0, 100).select(F.col("id").alias("k")))
    ).select(
        "cents",
        "k",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("user_id").cast("string"),
                            F.lit(":"),
                            F.col("k").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 2
        ).alias("g"),
    )
    perm = expanded.groupBy("k").agg(
        F.sum(F.when(F.col("g") == 0, F.col("cents")).otherwise(0)).cast(d38).alias("sa"),
        F.sum(F.when(F.col("g") == 1, F.col("cents")).otherwise(0)).cast(d38).alias("sb"),
        F.count(F.when(F.col("g") == 0, 1)).cast(d38).alias("na"),
        F.count(F.when(F.col("g") == 1, 1)).cast(d38).alias("nb"),
    )
    cmp = (
        perm.where((F.col("na") > 0) & (F.col("nb") > 0))
        .crossJoin(
            F.broadcast(
                obs.select(
                    F.col("sa").alias("osa"),
                    F.col("sb").alias("osb"),
                    F.col("na").alias("ona"),
                    F.col("nb").alias("onb"),
                )
            )
        )
        .agg(
            F.count(
                F.when(
                    F.expr(
                        "ABS(sa * nb - sb * na) * (ona * onb)"
                        " >= ABS(osa * onb - osb * ona) * (na * nb)"
                    ),
                    1,
                )
            ).alias("n_extreme")
        )
    )
    nn = peruser.agg(F.count("*").cast("bigint").alias("n_users"))
    return (
        nn.crossJoin(cmp)
        .selectExpr(
            "n_users",
            "CAST(n_extreme AS BIGINT) AS n_extreme",
            "CAST((2 * (n_extreme + 1) * 1000000 + 101) DIV (2 * 101) AS BIGINT)"
            " AS p_micro",
        )
    )


# ---------- q336: PERMISSIVE JSON with corrupt-record capture

# The schema-on-read resilience lane q134 (clean JSON source) leaves
# untested: one in three serialized lines is deliberately truncated,
# and the read-back uses PERMISSIVE mode with
# columnNameOfCorruptRecord so malformed lines land in a _bad column
# instead of failing the scan (the production posture for scraped /
# third-party JSON). The aggregate proves BOTH lanes: valid rows per
# event type AND the corrupt count, against an oracle computed from
# the construction rule (event_id % 3 = 0 -> corrupt). Read path: the
# sinked lines scan in parallel like any text source.
_CORRUPT_ORACLE = """
SELECT COALESCE(event_type, '_corrupt') AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COALESCE(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)), 0)
            AS BIGINT) AS sum_cents
FROM (
    SELECT CASE WHEN event_id % 3 = 0 THEN NULL ELSE event_type END AS event_type,
           CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS value
    FROM events WHERE event_id % 20 = 2
)
GROUP BY 1 ORDER BY event_type
"""


@register("q336_corrupt_records", oracle=_CORRUPT_ORACLE)
def q336(spark, sf_dir):
    """PERMISSIVE JSON read with corrupt-record capture (oracle
    comment)."""
    from ..scratch import scratch_dir

    ev = load_tables(spark, sf_dir)["events"]
    sl = ev.where(F.col("event_id") % 20 == 2).select(
        F.when(
            F.col("event_id") % 3 == 0,
            # truncated JSON: drop the closing brace and value tail
            F.concat(F.lit('{"event_id": '), F.col("event_id").cast("string"), F.lit(', "event_ty')),
        )
        .otherwise(
            F.to_json(
                F.struct(
                    "event_id",
                    "event_type",
                    (F.col("value").cast("decimal(18,2)") * 100)
                    .cast("bigint")
                    .alias("cents"),
                )
            )
        )
        .alias("value")
    )
    d = scratch_dir("q336_json_corrupt")
    sl.write.mode("overwrite").text(d)
    back = (
        spark.read.schema("event_id BIGINT, event_type STRING, cents BIGINT, _bad STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(d)
    )
    return (
        back.select(
            F.when(F.col("_bad").isNotNull(), "_corrupt")
            .otherwise(F.col("event_type"))
            .alias("event_type"),
            F.when(F.col("_bad").isNotNull(), None)
            .otherwise(F.col("cents"))
            .alias("cents"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.coalesce(F.sum("cents"), F.lit(0)).cast("bigint").alias("sum_cents"),
        )
        .orderBy("event_type")
    )

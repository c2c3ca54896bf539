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

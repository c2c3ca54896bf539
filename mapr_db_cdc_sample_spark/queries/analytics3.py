"""Round-6 batch (q270+): time-series diagnostics (ACF, integer
Bollinger breakouts), tokenizer-training statistics (BPE merge-pair
counts), leakage-safe CV folds, per-group quantile normalization,
distributed Gram matrix / PCA over the embedding column, sorted-
neighborhood ER blocking, and the feature-hashing trick.

Names sort AFTER q104_corpus_pipeline so they never evict entries from
the driver's 50-slot CORRECTNESS window (see queries/aliases.py).

Determinism rules follow queries/relational.py's module docstring; the
recurring trick here is the POSITIVE-SHIFT integer round-half-up for
possibly-negative rationals: Spark's DIV truncates toward zero while
DuckDB's // floors, so every division in this module is arranged to
run on non-negative operands (e.g. ACF is computed as
round_half_up((r+1)·1e6) − 1e6 with r+1 ∈ [0, 2])."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..io import load_tables
from . import register

# Shared CTE: exact daily revenue in integer cents. DuckDB SUM(BIGINT)
# is HUGEINT -> cast back; Spark sums BIGINT natively (overflow would
# throw under ANSI, not wrap).
_DAILY_CTE = """
WITH daily AS (
    SELECT o_orderdate AS day,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS cents
    FROM orders GROUP BY o_orderdate
)
"""


def _daily_cents(spark, sf_dir):
    o = load_tables(spark, sf_dir)["orders"]
    return o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )


# ---------- q270: autocorrelation function (time-series diagnostics)

# Sample ACF of daily revenue at lags 1..7 — the seasonality probe run
# before fitting any forecasting model (weekly cycles show as a lag-7
# peak). All moments are EXACT: clearing the mean x̄ = s/n by
# multiplying through by n² turns the textbook estimator into pure
# integer arithmetic,
#   num_k·n² = n²·Σ'x_t·x_{t−k} − n·s·Σ'(x_t + x_{t−k}) + (n−k)·s²
#   den·n²   = n²·Σx² − n·s²,
# carried in DECIMAL(38,0) / HUGEINT (n²·Σx² reaches ~1e24 at sf0.1 —
# past BIGINT). r ∈ [−1,1] can be negative and Spark DIV truncates
# while DuckDB // floors, so the 6-decimal output is the positive-shift
# round-half-up of r+1. The lag runs over the OBSERVED day sequence
# (both engines sort the same day spine; a LAG window over |days| rows,
# which sits ABOVE the daily aggregate — SinglePartition on thousands
# of rows, not the fact table).
_ACF_ORACLE = _DAILY_CTE + """
, base AS (
    SELECT CAST(COUNT(*) AS HUGEINT) AS n,
           CAST(SUM(cents) AS HUGEINT) AS s,
           CAST(SUM(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS HUGEINT) AS sxx
    FROM daily
), lagged AS (
    SELECT l.lag AS lag,
           cents,
           LAG(cents, l.lag) OVER (PARTITION BY l.lag ORDER BY day) AS prev
    FROM daily, (SELECT UNNEST(range(1, 8)) AS lag) l
), moms AS (
    SELECT lag,
           CAST(COUNT(prev) AS HUGEINT) AS npairs,
           CAST(SUM(CAST(cents AS HUGEINT) * CAST(prev AS HUGEINT)) AS HUGEINT) AS sxy,
           CAST(SUM(CAST(cents AS HUGEINT) + CAST(prev AS HUGEINT)) AS HUGEINT) AS sxpy
    FROM lagged WHERE prev IS NOT NULL GROUP BY lag
)
SELECT CAST(lag AS INT) AS lag,
       CAST(npairs AS BIGINT) AS n_pairs,
       CAST((2 * ((n*n*sxy - n*s*sxpy + npairs*s*s) + (n*n*sxx - n*s*s)) * 1000000
             + (n*n*sxx - n*s*s))
            // (2 * (n*n*sxx - n*s*s)) - 1000000 AS BIGINT) AS acf_micro
FROM moms, base
ORDER BY lag
"""


@register("q270_autocorrelation", oracle=_ACF_ORACLE)
def q270(spark, sf_dir):
    """ACF lags 1..7 of daily revenue in exact integer arithmetic (see
    oracle comment). One aggregate builds the |days| series; ONE ordered
    window pass produces all 7 lag columns; stack+groupBy computes the
    per-lag cross moments map-side-combinably."""
    daily = _daily_cents(spark, sf_dir)
    d38 = "decimal(38,0)"
    base = daily.agg(
        F.count("*").cast(d38).alias("n"),
        F.sum("cents").cast(d38).alias("s"),
        F.sum(F.col("cents").cast("decimal(19,0)") * F.col("cents").cast("decimal(19,0)"))
        .cast(d38)
        .alias("sxx"),
    )
    w = Window.orderBy("day")
    lagcols = daily.select(
        "cents", *[F.lag("cents", k).over(w).alias(f"p{k}") for k in range(1, 8)]
    )
    lagged = lagcols.select(
        "cents",
        F.posexplode(F.array(*[F.col(f"p{k}") for k in range(1, 8)])).alias(
            "lag0", "prev"
        ),
    ).where(F.col("prev").isNotNull())
    moms = lagged.groupBy((F.col("lag0") + 1).alias("lag")).agg(
        F.count("*").cast(d38).alias("npairs"),
        F.sum(F.col("cents").cast("decimal(19,0)") * F.col("prev").cast("decimal(19,0)"))
        .cast(d38)
        .alias("sxy"),
        F.sum(F.col("cents").cast(d38) + F.col("prev").cast(d38)).cast(d38).alias("sxpy"),
    )
    j = moms.crossJoin(F.broadcast(base))
    num = F.col("n") * F.col("n") * F.col("sxy") - F.col("n") * F.col("s") * F.col(
        "sxpy"
    ) + F.col("npairs") * F.col("s") * F.col("s")
    den = F.col("n") * F.col("n") * F.col("sxx") - F.col("n") * F.col("s") * F.col("s")
    return (
        j.select(
            F.col("lag").cast("int").alias("lag"),
            F.col("npairs").cast("bigint").alias("n_pairs"),
            (
                F.expr(
                    "(2 * ((n*n*sxy - n*s*sxpy + npairs*s*s) + (n*n*sxx - n*s*s)) * 1000000"
                    " + (n*n*sxx - n*s*s))"
                    " DIV (2 * (n*n*sxx - n*s*s)) - 1000000"
                )
            ).cast("bigint").alias("acf_micro"),
        )
        .orderBy("lag")
    )


# ---------- q271: Bollinger-band breakouts (integer-exact)

# Days whose revenue leaves the trailing-7-day mean ± 2σ band. The
# band test needs NO square root: with S=Σ₇x, Q=Σ₇x², the breakout
# condition (x−μ)² > 4σ² multiplied by 49 is
#   (7x − S)² > 4·(7Q − S²),
# pure BIGINT (|7x−S| ~1e10 at sf0.1 → squared 1e20... carried as
# DECIMAL(38,0)/HUGEINT for headroom). The displayed rolling mean is
# integer round-half-up (positive operands). Full windows only
# (cnt = 7) — partial leading windows would compare against a
# different-width band on each engine's NULL conventions.
_BOLL_ORACLE = _DAILY_CTE + """
, r AS (
    SELECT day, cents,
           COUNT(*)    OVER w AS cnt,
           CAST(SUM(CAST(cents AS HUGEINT)) OVER w AS HUGEINT) AS s7,
           CAST(SUM(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) OVER w AS HUGEINT) AS q7
    FROM daily
    WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT day, cents,
       CAST((2 * s7 + 7) // 14 AS BIGINT) AS mean7_cents,
       CAST(CASE WHEN (7 * CAST(cents AS HUGEINT) - s7) * (7 * CAST(cents AS HUGEINT) - s7)
                      > 4 * (7 * q7 - s7 * s7)
                 THEN 1 ELSE 0 END AS INT) AS breakout
FROM r WHERE cnt = 7
ORDER BY day
"""


@register("q271_bollinger_breakout", oracle=_BOLL_ORACLE)
def q271(spark, sf_dir):
    """Trailing 7-day Bollinger breakout flags with the sqrt-free
    integer band test (oracle comment). One day-ordered window above
    the daily aggregate produces count/sum/sum-of-squares together."""
    daily = _daily_cents(spark, sf_dir)
    d38 = "decimal(38,0)"
    w = Window.orderBy("day").rowsBetween(-6, 0)
    c38 = F.col("cents").cast(d38)
    r = daily.select(
        "day",
        "cents",
        F.count("*").over(w).alias("cnt"),
        F.sum(c38).over(w).cast(d38).alias("s7"),
        F.sum(F.col("cents").cast("decimal(19,0)") * F.col("cents").cast("decimal(19,0)"))
        .over(w)
        .cast(d38)
        .alias("q7"),
    ).where(F.col("cnt") == 7)
    dev = F.lit(7).cast(d38) * c38 - F.col("s7")
    return r.select(
        "day",
        "cents",
        F.expr("(2 * s7 + 7) DIV 14").cast("bigint").alias("mean7_cents"),
        F.when(
            dev * dev > F.lit(4).cast(d38) * (F.lit(7).cast(d38) * F.col("q7") - F.col("s7") * F.col("s7")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("breakout"),
    ).orderBy("day")


# ---------- q272: BPE merge-pair statistics (tokenizer training scan)

# The inner loop of byte-pair-encoding TRAINING: count adjacent
# character pairs inside every whitespace token across the corpus and
# rank merge candidates. One generator pass (token explode → in-token
# pair explode), then a map-side-combinable count — the shape that scans
# 100 TB of text once per merge round. Guard: Spark's sequence(1, n)
# generates DESCENDING when n < 1 (a [1,0] array, not empty), so
# single-char tokens must short-circuit to an empty array explicitly.
_BPE_PAIRS_ORACLE = """
WITH toks AS (
    SELECT UNNEST(LIST_FILTER(STR_SPLIT(LOWER(text), ' '), t -> LEN(t) > 0)) AS tok
    FROM documents
), pairs AS (
    SELECT SUBSTR(tok, CAST(i AS INT), 2) AS pair
    FROM toks, UNNEST(range(1, GREATEST(LEN(tok), 1))) r(i)
)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair LIMIT 20
"""


@register("q272_bpe_pair_stats", oracle=_BPE_PAIRS_ORACLE)
def q272(spark, sf_dir):
    """Top-20 BPE merge candidates (adjacent in-token char pairs).
    Both explodes are JVM generators; the count is partial-aggregable;
    the (n DESC, pair) sort has a unique tiebreaker under LIMIT."""
    d = load_tables(spark, sf_dir)["documents"]
    toks = d.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
    pairs = toks.select(
        F.explode(
            F.when(
                F.length("tok") >= 2,
                F.expr("transform(sequence(1, length(tok) - 1), i -> substr(tok, i, 2))"),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(20)
    )


# ---------- q273: deterministic cross-validation folds

# Leakage-safe 5-fold assignment: fold = md5(doc_id) mod 5 — stable
# across engines, runs, and cluster sizes (no per-partition RNG state),
# so a re-run assigns every document to the same fold. Per-fold size
# and char-mass balance check that the hash splits evenly; mean doc
# length is integer round-half-up in micro-chars.
_CV_FOLDS_ORACLE = """
WITH f AS (
    SELECT CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 5
               AS INT) AS fold,
           n_chars
    FROM documents
)
SELECT fold,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST((2 * CAST(SUM(n_chars) AS HUGEINT) * 1000000 + COUNT(*))
            // (2 * COUNT(*)) AS BIGINT) AS mean_chars_micro
FROM f GROUP BY fold ORDER BY fold
"""


@register("q273_cv_folds", oracle=_CV_FOLDS_ORACLE)
def q273(spark, sf_dir):
    """Deterministic md5 5-fold split with per-fold balance stats.
    fold is a pure projection (no shuffle before the 5-group agg);
    conv(substr(md5)) is the repo's cross-engine hash anchor."""
    d = load_tables(spark, sf_dir)["documents"]
    fold = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
            "long"
        ),
        F.lit(5),
    ).cast("int")
    return (
        d.select(fold.alias("fold"), "n_chars")
        .groupBy("fold")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.expr(
                "CAST((2 * CAST(SUM(n_chars) AS DECIMAL(38,0)) * 1000000 + COUNT(*))"
                " DIV (2 * COUNT(*)) AS BIGINT)"
            ).alias("mean_chars_micro"),
        )
        .orderBy("fold")
    )


# ---------- q274: per-source quantile normalization (feature scaling)

# Map every document length to its empirical CDF value WITHIN its
# source — the rank-based scaling used to make heterogeneous corpus
# feeds comparable before mixing (domain-robust alternative to
# z-scores). Shape: collapse to (source, n_chars) groups first (the
# aggregate is map-side combinable), then ONE window partitioned by
# source over the collapsed groups — parallel across sources, |distinct
# lengths| rows per partition, never a global value sort. CDF uses the
# inclusive count (<= x) over the source total; micro-units round-half-up
# (positive operands: Spark DIV == DuckDB //).
_QNORM_ORACLE = """
WITH g AS (
    SELECT source, n_chars, COUNT(*) AS c FROM documents GROUP BY source, n_chars
), r AS (
    SELECT source, n_chars, c,
           CAST(SUM(c) OVER (PARTITION BY source ORDER BY n_chars) AS BIGINT) AS cum,
           CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS tot
    FROM g
)
SELECT source, CAST(n_chars AS BIGINT) AS n_chars, CAST(c AS BIGINT) AS n_docs,
       CAST((2 * cum * 1000000 + tot) // (2 * tot) AS BIGINT) AS cdf_micro
FROM r ORDER BY source, n_chars
"""


@register("q274_quantile_normalize", oracle=_QNORM_ORACLE)
def q274(spark, sf_dir):
    """Within-source empirical-CDF normalization of document length
    (oracle comment has the plan shape: group-collapse, then
    source-partitioned windows — no global sort, no SinglePartition)."""
    d = load_tables(spark, sf_dir)["documents"]
    g = d.groupBy("source", "n_chars").agg(F.count("*").alias("c"))
    wc = Window.partitionBy("source").orderBy("n_chars")
    wt = Window.partitionBy("source")
    r = g.select(
        "source",
        "n_chars",
        "c",
        F.sum("c").over(wc).cast("bigint").alias("cum"),
        F.sum("c").over(wt).cast("bigint").alias("tot"),
    )
    return r.select(
        "source",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.col("c").cast("bigint").alias("n_docs"),
        F.expr("(2 * cum * 1000000 + tot) DIV (2 * tot)").cast("bigint").alias(
            "cdf_micro"
        ),
    ).orderBy("source", "n_chars")


# ---------- q275: distributed Gram matrix (embedding covariance input)

# X^T X over the embedding column — the reduction feeding PCA, whitening
# and linear probes. The scale shape is mapInPandas: each Arrow batch
# contributes a LOCAL 64x64 integer Gram (numpy, one BLAS-ish pass),
# and only |partitions| x 2080 upper-triangle rows cross the shuffle —
# per-element sums would shuffle |vectors| x 4096 rows. Values are
# int-quantized (round(x*1000), the q127/q244 recipe) so every partial
# is EXACT and partition order is irrelevant; products of two float32
# quantities would otherwise round differently than DuckDB's float64
# path. Output stays in integer 1e-6 units (gram_q).
_GRAM_ORACLE = """
WITH q AS (
    SELECT LIST_TRANSFORM(embedding,
                          x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
    FROM embeddings
)
SELECT CAST(a.i AS INT) AS dim_i, CAST(b.j AS INT) AS dim_j,
       CAST(SUM(v[a.i] * v[b.j]) AS BIGINT) AS gram_q
FROM q, RANGE(1, 65) a(i), RANGE(1, 65) b(j)
WHERE b.j >= a.i
GROUP BY a.i, b.j
ORDER BY dim_i, dim_j
"""


def _gram_partials(spark, sf_dir):
    """(dim_i, dim_j, gram_q) partial Gram rows, one upper triangle per
    Arrow batch — shared by q275 (exact sum) and q276 (PCA)."""
    import numpy as np
    import pandas as pd

    emb = load_tables(spark, sf_dir)["embeddings"].select(
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1000).cast("long")
        ).alias("v")
    )

    iu = None  # built lazily inside workers

    def gram(batches):
        import numpy as np
        import pandas as pd

        acc = None
        for pdf in batches:
            m = np.asarray([np.asarray(r, dtype=np.int64) for r in pdf["v"]])
            if m.size == 0:
                continue
            g = m.T @ m  # exact: int64 products, |v|<=~4000 -> no overflow
            acc = g if acc is None else acc + g
        if acc is not None:
            i, j = np.triu_indices(acc.shape[0])
            yield pd.DataFrame(
                {"dim_i": i + 1, "dim_j": j + 1, "gram_q": acc[i, j]}
            ).astype({"dim_i": "int32", "dim_j": "int32", "gram_q": "int64"})

    return emb.mapInPandas(gram, "dim_i int, dim_j int, gram_q long")


@register("q275_gram_matrix", oracle=_GRAM_ORACLE)
def q275(spark, sf_dir):
    """Distributed exact Gram matrix (see oracle comment): per-batch
    numpy partials via mapInPandas, merged by a 2080-group integer sum."""
    return (
        _gram_partials(spark, sf_dir)
        .groupBy("dim_i", "dim_j")
        .agg(F.sum("gram_q").cast("bigint").alias("gram_q"))
        .orderBy("dim_i", "dim_j")
    )


# ---------- q276: PCA explained variance (driver eigensolve)

# Top-8 principal-component explained-variance ratios of the embedding
# cloud. The distributed part is q275's Gram + the per-dim sums (both
# exact integers); the eigensolve runs on the DRIVER over the 64x64
# covariance — bounded driver math, the kmeans/zonemap rule
# (operators/kmeans.py): ship O(d^2) numbers, never rows. No SQL oracle
# (eigendecomposition); the numpy property twin
# (tests/test_properties.py) checks against direct covariance of the
# collected vectors at sf0.001.
@register("q276_pca_explained", tags=("approx",))
def q276(spark, sf_dir):
    import numpy as np

    gram_rows = q275(spark, sf_dir).collect()  # 2080 rows, bounded
    sums = (
        load_tables(spark, sf_dir)["embeddings"]
        .select(
            F.posexplode(
                F.transform(
                    "embedding", lambda x: F.round(x.cast("double") * 1000).cast("long")
                )
            ).alias("dim", "v")
        )
        .groupBy("dim")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    )
    d = max(r["dim_i"] for r in gram_rows)
    n = sums[0]["n"]
    g = np.zeros((d, d))
    for r in gram_rows:
        g[r["dim_i"] - 1, r["dim_j"] - 1] = r["gram_q"]
        g[r["dim_j"] - 1, r["dim_i"] - 1] = r["gram_q"]
    mu = np.zeros(d)
    for r in sums:
        mu[r["dim"]] = r["s"] / n
    cov = g / n - np.outer(mu, mu)  # population covariance, 1e-6 units
    ev = np.linalg.eigvalsh(cov)[::-1] / 1e6  # back to raw units
    total = float(ev.sum())
    out = [
        (k + 1, round(float(ev[k]), 6), round(float(ev[k] / total), 6))
        for k in range(8)
    ]
    return spark.createDataFrame(
        out, "component int, eigenvalue double, explained_ratio double"
    )


# ---------- q277: sorted-neighborhood ER blocking

# The third candidate-generation family for entity resolution next to
# attribute blocking (q122) and length-banded argmin (q250): sort the
# distinct-name dimension once and pair each name with its next 3
# neighbors, keeping pairs within edit distance 4. Linear candidate
# count (3·|names|) by construction — the classic sorted-neighborhood
# method. The window is ordered over the DISTINCT dimension (above the
# distinct-aggregate — dimension-sized, the allowed SinglePartition
# form).
_SNM_ORACLE = """
WITH d AS (SELECT DISTINCT p_name AS name FROM part),
w AS (
    SELECT name,
           LEAD(name, 1) OVER (ORDER BY name) AS n1,
           LEAD(name, 2) OVER (ORDER BY name) AS n2,
           LEAD(name, 3) OVER (ORDER BY name) AS n3
    FROM d
), p AS (
    SELECT name AS name_a, UNNEST([n1, n2, n3]) AS name_b FROM w
)
SELECT name_a, name_b, CAST(levenshtein(name_a, name_b) AS INT) AS dist
FROM p
WHERE name_b IS NOT NULL AND levenshtein(name_a, name_b) <= 4
ORDER BY name_a, name_b
"""


@register("q277_sorted_neighborhood", oracle=_SNM_ORACLE)
def q277(spark, sf_dir):
    """Sorted-neighborhood candidate pairs (window w=3, dist <= 4)."""
    d = load_tables(spark, sf_dir)["part"].select(
        F.col("p_name").alias("name")
    ).distinct()
    w = Window.orderBy("name")
    lead = d.select(
        "name", *[F.lead("name", k).over(w).alias(f"n{k}") for k in (1, 2, 3)]
    )
    p = lead.select(
        F.col("name").alias("name_a"),
        F.explode(F.array("n1", "n2", "n3")).alias("name_b"),
    ).where(F.col("name_b").isNotNull())
    return (
        p.select("name_a", "name_b", F.levenshtein("name_a", "name_b").cast("int").alias("dist"))
        .where(F.col("dist") <= 4)
        .orderBy("name_a", "name_b")
    )


# ---------- q278: feature hashing (the hashing trick)

# Fixed-width sparse featurization without a vocabulary: token ->
# bucket = h16(token) mod 256. Per-source top-5 buckets — the
# vectorizer whose memory is O(width), not O(|vocab|), so it needs no
# global dictionary build at 100 TB. h16 is the repo's cross-engine
# md5 anchor; top-k per source runs as a rank window over the
# PRE-AGGREGATED (source, bucket) counts (<= 256 rows per source) with
# a unique (count DESC, bucket) tiebreaker.
_FEATHASH_ORACLE = """
WITH toks AS (
    SELECT source,
           UNNEST(LIST_FILTER(STR_SPLIT(LOWER(text), ' '), t -> LEN(t) > 0)) AS tok
    FROM documents
), b AS (
    SELECT source,
           CAST(('0x' || SUBSTR(MD5(tok), 1, 4))::INT % 256 AS INT) AS bucket,
           COUNT(*) AS c
    FROM toks GROUP BY source, bucket
), r AS (
    SELECT source, bucket, c,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY c DESC, bucket) AS rn
    FROM b
)
SELECT source, bucket, CAST(c AS BIGINT) AS n_tokens
FROM r WHERE rn <= 5 ORDER BY source, n_tokens DESC, bucket
"""


@register("q278_feature_hashing", oracle=_FEATHASH_ORACLE)
def q278(spark, sf_dir):
    """Hashing-trick bucket histogram, top-5 buckets per source."""
    d = load_tables(spark, sf_dir)["documents"]
    toks = d.select("source", F.explode(T.tokens(F.col("text"))).alias("tok"))
    b = toks.select(
        "source", F.pmod(T.h16(F.col("tok")), F.lit(256)).alias("bucket")
    ).groupBy("source", "bucket").agg(F.count("*").alias("c"))
    w = Window.partitionBy("source").orderBy(F.col("c").desc(), "bucket")
    return (
        b.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("source", "bucket", F.col("c").cast("bigint").alias("n_tokens"))
        .orderBy("source", F.col("n_tokens").desc(), "bucket")
    )

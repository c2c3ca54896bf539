"""End-to-end corpus deduplication: the composition a training-data
pipeline actually runs — not "list candidate pairs" but "give me the
corpus with duplicates removed".

Stages (each individually verified elsewhere):
1. candidates — MinHash/LSH banding (queries/llm.py q44 shape): linear
   signatures, uniform band shuffle, within-bucket pairs.
2. verify — n-gram Jaccard on candidates only (q46 shape); pairs above
   the threshold become edges of the duplicate graph.
3. cluster — connected components by iterative min-label propagation
   (duplicate clusters are tiny — star/clique shaped — so a handful of
   iterations reaches fixpoint; each iteration is one join + one
   aggregate).
4. keep — one canonical doc per component (min doc_id), everything not
   in any component kept as-is.

Scale: stages 1-2 are the LSH pipeline (quadratic only within buckets);
stage 3 touches only documents that appear in an edge — at real-world dup
rates that is a few percent of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def duplicate_edges(corpus: DataFrame, jaccard_threshold: float = 0.5) -> DataFrame:
    """(doc_a, doc_b, jaccard) for verified near-duplicate pairs.
    corpus: (doc_id, text)."""
    toks = T.tokens(F.col("text"))
    sh = corpus.select(
        "doc_id", F.explode_outer(T.shingles(toks, 3)).alias("s")
    ).select("doc_id", T.shingle_hash60(F.col("s")).alias("h"))
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(F.col("h").bitwiseXOR(F.lit(seed))).alias(f"mh{j}")
            for j, seed in enumerate(T.MINHASH_SEEDS)
        ]
    )
    band_exprs = [
        F.concat_ws(
            ":", F.lit(str(b)), F.col(f"mh{2*b}").cast("string"), F.col(f"mh{2*b+1}").cast("string")
        )
        for b in range(4)
    ]
    bands = sig.where(F.col("mh0").isNotNull()).select(
        "doc_id", F.explode(F.array(*band_exprs)).alias("band")
    )
    buckets = (
        bands.groupBy("band")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .where(F.size("ids") > 1)
    )
    combos = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    cands = (
        buckets.select(F.explode(combos).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    # verify stage: exact token-shingle Jaccard, candidates only
    grams = corpus.select(
        "doc_id", F.array_distinct(T.shingles(T.tokens(F.col("text")), 3)).alias("gs")
    )
    a = grams.select(F.col("doc_id").alias("doc_a"), F.col("gs").alias("ga"))
    b = grams.select(F.col("doc_id").alias("doc_b"), F.col("gs").alias("gb"))
    inter = F.size(F.array_intersect(F.col("ga"), F.col("gb")))
    uni = F.size("ga") + F.size("gb") - inter
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.when(uni > 0, F.round(inter.cast("double") / uni, 4)).otherwise(0.0).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
    )


def connected_components(edges: DataFrame, max_iters: int = 5) -> DataFrame:
    """(doc_id, component) for every doc appearing in an edge; component =
    min doc_id reachable. Min-label propagation to fixpoint."""
    sym = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    sym.persist()
    labels = (
        sym.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
    )
    for _ in range(max_iters):
        neighbor_min = (
            sym.join(labels, sym["dst"] == labels["doc_id"])
            .groupBy("src")
            .agg(F.min("component").alias("n_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["doc_id"] == neighbor_min["src"], "left")
            .select(
                "doc_id",
                F.least(F.col("component"), F.coalesce(F.col("n_min"), F.col("component"))).alias(
                    "component"
                ),
            )
        )
        new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels


def dedup_corpus(corpus: DataFrame, jaccard_threshold: float = 0.5) -> DataFrame:
    """The kept corpus: canonical (min doc_id) per duplicate component +
    all documents that aren't near-duplicates of anything."""
    edges = duplicate_edges(corpus, jaccard_threshold)
    comp = connected_components(edges)
    drop = comp.where(F.col("doc_id") != F.col("component")).select("doc_id")
    return corpus.join(drop, "doc_id", "left_anti")

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

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from . import banding


def duplicate_edges(
    corpus: DataFrame,
    jaccard_threshold: float = 0.5,
    bucket_cap: int = banding.DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for verified near-duplicate pairs.
    corpus: (doc_id, text). Band buckets above bucket_cap are excluded
    from candidate generation (see operators/banding.py); audit the
    exclusions with banding.oversized_buckets on the same corpus."""
    cands = banding.candidate_pairs(corpus, bucket_cap)
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


def connected_components(edges: DataFrame, max_iters: int = 20) -> DataFrame:
    """(doc_id, component) for every doc appearing in an edge; component =
    min doc_id reachable. Min-label propagation with pointer doubling:
    each iteration takes the min over neighbors' labels (one hop) and
    then re-labels through the label table itself (component <- label of
    component), so label distance-to-root roughly doubles per iteration —
    convergence in O(log longest-chain) instead of O(chain). Warns loudly
    if the fixpoint isn't reached within max_iters (never silently
    returns split components)."""
    sym = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    sym.persist()
    labels = (
        sym.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
    )
    changed = -1
    for _ in range(max_iters):
        neighbor_min = (
            sym.join(labels, sym["dst"] == labels["doc_id"])
            .groupBy("src")
            .agg(F.min("component").alias("n_min"))
        )
        hopped = (
            labels.join(neighbor_min, labels["doc_id"] == neighbor_min["src"], "left")
            .select(
                "doc_id",
                F.least(F.col("component"), F.coalesce(F.col("n_min"), F.col("component"))).alias(
                    "component"
                ),
            )
        )
        # Pointer doubling: a label is itself a doc_id in the table, so
        # jump each label to that doc's (already lower-or-equal) label.
        ptr = hopped.select(
            F.col("doc_id").alias("c_id"), F.col("component").alias("c_comp")
        )
        new_labels = (
            hopped.join(ptr, hopped["component"] == ptr["c_id"], "left")
            .select(
                "doc_id",
                F.coalesce(F.col("c_comp"), F.col("component")).alias("component"),
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
    if changed != 0:
        warnings.warn(
            f"connected_components: labels still changing after {max_iters} "
            f"iterations ({changed} moved last pass); components may be split",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def dedup_corpus(corpus: DataFrame, jaccard_threshold: float = 0.5) -> DataFrame:
    """The kept corpus: canonical (min doc_id) per duplicate component +
    all documents that aren't near-duplicates of anything."""
    edges = duplicate_edges(corpus, jaccard_threshold)
    comp = connected_components(edges)
    drop = comp.where(F.col("doc_id") != F.col("component")).select("doc_id")
    return corpus.join(drop, "doc_id", "left_anti")

"""Headline-drift adjudication (round-7 verdict task 3): run the
30-query baseline-common headline set N times each (min-of-2 within a
pass, matching bench.py), a FRESH SparkSession per pass so no pass
inherits another's codegen/metaspace state, and record per-query
median/min/max across passes. A single-run bench cannot distinguish
shared-box noise from a plan regression; the cross-pass spread can.

Usage: python tools/variance.py [sf_dir] [passes] [set]
  set = common30 (default) | heavy | all | r11 (this round's
        adjudication subset — the r10 headline deltas + the two
        carried spread queries)
Writes BENCH_VARIANCE{_$SPARK_GRAFT_BENCH_TAG}.json at the repo root.

The HEAVY_TAIL set exists to adjudicate driver-run-vs-builder-run
divergences on the iterative lane (round-7 verdict task 2: the driver
measured q320 at 43.4 s and q83 at 5.6 s where the builder's same-code
runs gave 7.4 s / 1.9 s): a 3-pass fresh-session median either
reproduces the slow number (a real plan/perf problem) or bounds it as
shared-box noise.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mapr_db_cdc_sample_spark.canary import box_canary  # noqa: E402
from mapr_db_cdc_sample_spark.queries import load_all  # noqa: E402
from mapr_db_cdc_sample_spark.session import get_spark  # noqa: E402

COMMON30 = [
    "q01_scan_count", "q04_inner_join", "q05_broadcast_join",
    "q08_semi_join", "q12_asof_join", "q13_groupby_agg",
    "q14_count_distinct", "q17_cube", "q20_collect_list", "q21_ranking",
    "q23_frames", "q25_topk_per_group", "q26_sort_limit", "q27_union_all",
    "q31_string_fns", "q35_json_fns", "q36_subqueries", "q37_exact_dedup",
    "q38_cosine_topk", "q39_term_freq", "q41_cdc_route_fts",
    "q44_minhash_lsh_pairs", "q45_simhash", "q51_embedding_neardup",
    "q52_ann_ivf", "q56_multimodal_features", "q74_salted_agg",
    "q75_shipping_priority", "q76_local_supplier_volume", "q77_pivot",
]


# Iterative/grouped-map queries whose driver-run timings diverged from
# builder-run timings (round-7 verdict task 2) — adjudicated by 3-pass
# fresh-session medians.
HEAVY_TAIL = [
    "q320_label_propagation", "q83_kmeans",
    "q328_dynamic_partition_overwrite", "q215_srp_lsh_cosine",
    "q298_link_prediction", "q330_hitrate_popularity",
    # round-10: the two r9 open regressions, adjudicated by these
    # fresh-session medians (VERDICT r9 tasks 3-4)
    "q276_pca_explained", "q461_rwr_proximity",
    # round-11: the r10 unadjudicated headline deltas (VERDICT r10 task
    # 4) — none were touched by r10 Spark-side changes, so their medians
    # either reproduce the drift (real) or bound it as box noise
    "q109_source_overlap", "q110_perplexity_filter",
    "q116_jaccard_estimate", "q338_linear_interpolation", "q112_salted_join",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    which = sys.argv[3] if len(sys.argv) > 3 else "common30"
    r11 = [
        "q109_source_overlap", "q110_perplexity_filter",
        "q116_jaccard_estimate", "q338_linear_interpolation",
        "q112_salted_join", "q83_kmeans", "q276_pca_explained",
        "q461_rwr_proximity",
    ]
    # round-12 session-3 adjudication subset: the rewrite-affected
    # operators + q461 (VERDICT r11 task 2's median criterion)
    r12 = [
        "q292_theil_sen", "q298_link_prediction", "q229_triangle_count",
        "q380_clustering_coefficient", "q408_triad_census",
        "q564_truss_support", "q476_butterfly_count",
        "q461_rwr_proximity", "q320_label_propagation",
        "q280_semantic_dedup", "q436_substring_dup_profile",
        "q215_srp_lsh_cosine",
    ]
    names = {"common30": COMMON30, "heavy": HEAVY_TAIL,
             "all": COMMON30 + HEAVY_TAIL, "r11": r11, "r12": r12}[which]
    registry = load_all()

    per_pass: dict[str, list[float]] = {n: [] for n in names}
    canaries: list[dict] = []
    for p in range(passes):
        # per-pass box-state probe (r11 task 5): pass timings are
        # divided by this pass's matmul ratio below, so a loaded/cold
        # pass doesn't masquerade as a plan regression
        canaries.append(box_canary())
        spark = get_spark(f"variance-p{p}")
        spark.sparkContext.setLogLevel("ERROR")
        registry["q01_scan_count"].fn(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        for name in names:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                registry[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            per_pass[name].append(round(best, 3))
            spark.catalog.clearCache()
        spark.stop()
        print(f"pass {p}: {round(sum(v[-1] for v in per_pass.values()), 2)}s")

    # Canary normalization: scale each pass's timings by that pass's
    # CPU-probe ratio vs the best pass. A query whose RAW spread
    # collapses after normalization moved with the box, not the plan.
    best_matmul = min(c["matmul_s"] for c in canaries) or 1.0
    scales = [c["matmul_s"] / best_matmul for c in canaries]
    out = {
        name: {
            "median": round(statistics.median(v), 3),
            "min": min(v),
            "max": max(v),
            "passes": v,
            "norm_median": round(
                statistics.median(t / s for t, s in zip(v, scales)), 3
            ),
        }
        for name, v in per_pass.items()
    }
    summary = {
        "sf_dir": sf_dir,
        "passes": passes,
        "set": which,
        "total_median": round(sum(v["median"] for v in out.values()), 3),
        "total_norm_median": round(
            sum(v["norm_median"] for v in out.values()), 3
        ),
        "canary": {"passes": canaries, "scales": [round(s, 3) for s in scales]},
        "queries": out,
    }
    tag = os.environ.get("SPARK_GRAFT_BENCH_TAG", "")
    fname = f"BENCH_VARIANCE_{tag}.json" if tag else "BENCH_VARIANCE.json"
    with open(os.path.join(REPO, fname), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v["median"] for k, v in out.items()}))
    print("total_median", summary["total_median"])


if __name__ == "__main__":
    main()

"""Headline-drift adjudication (round-7 verdict task 3): run the
30-query baseline-common headline set N times each (min-of-2 within a
pass, matching bench.py), a FRESH SparkSession per pass so no pass
inherits another's codegen/metaspace state, and record per-query
median/min/max across passes. A single-run bench cannot distinguish
shared-box noise from a plan regression; the cross-pass spread can.

Usage: python tools/variance.py [sf_dir] [passes]
Writes BENCH_VARIANCE_r7.json at the repo root.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    registry = load_all()

    per_pass: dict[str, list[float]] = {n: [] for n in COMMON30}
    for p in range(passes):
        spark = get_spark(f"variance-p{p}")
        spark.sparkContext.setLogLevel("ERROR")
        registry["q01_scan_count"].fn(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        for name in COMMON30:
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

    out = {
        name: {
            "median": round(statistics.median(v), 3),
            "min": min(v),
            "max": max(v),
            "passes": v,
        }
        for name, v in per_pass.items()
    }
    summary = {
        "sf_dir": sf_dir,
        "passes": passes,
        "total_median": round(sum(v["median"] for v in out.values()), 3),
        "queries": out,
    }
    with open(os.path.join(REPO, "BENCH_VARIANCE_r7.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v["median"] for k, v in out.items()}))
    print("total_median", summary["total_median"])


if __name__ == "__main__":
    main()

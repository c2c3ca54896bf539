"""Generate / refresh PLAN_FP.json — plan fingerprints for the top-20
most expensive benched queries (round-7 verdict task 6). The committed
baseline lets tests/test_plans.py flag a PLAN change (lost broadcast,
new exchange) separately from timing noise; refresh this file ONLY when
a query's implementation intentionally changed, and say so in the
commit message.

Usage: python tools/planfp.py [sf_dir]   (default sf0.1 — fingerprints
normalize the path away, so any SF gives the same hash unless AQE picks
a different join strategy; sf0.1 matches what bench.py records)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mapr_db_cdc_sample_spark.plans.audit import plan_fingerprint  # noqa: E402
from mapr_db_cdc_sample_spark.queries import load_all  # noqa: E402
from mapr_db_cdc_sample_spark.session import get_spark  # noqa: E402

# Pinned plan-fingerprint set: top-20 by the round-7 final BENCH_FULL
# wall time PLUS retained former members (q253/q215/q229/q160/q400/q41)
# — a pinned fingerprint stays useful even when its query drops out of
# the top-20 (the set only grows; removal would un-gate a plan).
PINNED = [
    "q292_theil_sen", "q294_degree_assortativity", "q280_semantic_dedup",
    "q320_label_propagation", "q476_butterfly_count",
    "q436_substring_dup_profile", "q299_k_core", "q310_hof_suite",
    "q53_minhash_lsh_ml", "q461_rwr_proximity", "q324_fs_linkage",
    "q59_grouped_map", "q286_knn_graph", "q298_link_prediction",
    "q338_linear_interpolation", "q380_clustering_coefficient",
    "q408_triad_census", "q333_udtf_table_arg",
    "q328_dynamic_partition_overwrite", "q289_greedy_source_cover",
    # retained former members
    "q253_bfs_hops", "q215_srp_lsh_cosine", "q229_triangle_count",
    "q160_pagerank", "q400_sql_scripting", "q41_cdc_route_fts",
    # round-9 additions: the flagship dedup composition entered the
    # bench top-20 in r8 but was never pinned (VERDICT r8 task 3), and
    # the rewritten blocked kNN kernel gets a gate from birth
    "q85_dedup_corpus", "q492_hard_negative_mining",
    "q512_knn_label_noise",
    # round-9: the sqeuclid_milli kernel lane (q576 went 58.8s -> 7.2s
    # when rewired onto it — a lost kernel plan would silently regress
    # 8x) plus the heaviest new additions
    "q576_lof_outliers", "q564_truss_support", "q572_participation_ratio",
    # round-10: the distributed Gram stage feeding q276 (whose own
    # return value is a driver-local relation, so q275 carries the
    # pinnable plan) — pinned while adjudicating the r9 q276 timing
    # anomaly, and the thresholded block-pair kernel now under q51/q280
    "q275_gram_matrix", "q51_embedding_neardup",
    # round-11 (VERDICT r10 task 7): q276 ITSELF — its result is a
    # LocalTableScan built from driver-bounded collects, but pinning it
    # catches a drift in that contract too — plus q486, the round's
    # adjudicated spread query (edge join now pinned to shuffle-hash)
    "q276_pca_explained", "q486_harmonic_closeness",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    registry = load_all()
    spark = get_spark("planfp")
    spark.sparkContext.setLogLevel("ERROR")
    fps = {}
    for name in PINNED:
        fps[name] = plan_fingerprint(registry[name].fn(spark, sf_dir))
        print(name, fps[name])
    with open(os.path.join(REPO, "PLAN_FP.json"), "w") as f:
        json.dump({"sf_dir": sf_dir, "fingerprints": fps}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()

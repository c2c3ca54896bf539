"""Per-query optimization probe (r12): time a registry query through the
noop sink (guide §1.4), count the Spark jobs it launches, and dump
`.explain("formatted")` to plans/r12/<name>_<suffix>.txt so plan claims
in OPTIMIZATION_r12.md are checkable without running Spark.

Usage:
    python tools/profile_query.py [--suffix before|after] [--runs N] q576 q152 ...

Names may be prefixes (q576 matches q576_lof_outliers). Prints one line
per query: name, min/median seconds over N runs (after one warmup), and
the job count of the last run (jobs are the per-query fixed-overhead
currency on a small SF: every materialization barrier, eager
checkpoint, collect and AQE stage shows up here).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mapr_db_cdc_sample_spark.queries import load_all  # noqa: E402
from mapr_db_cdc_sample_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    suffix = "probe"
    runs = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--suffix":
            suffix = next(it)
        elif a == "--runs":
            runs = int(next(it))
        elif a == "--sf":
            sf_dir = next(it)
        else:
            names.append(a)

    registry = load_all()
    resolved = []
    for n in names:
        hits = [k for k in sorted(registry) if k == n or k.startswith(n + "_") or k.startswith(n)]
        if not hits:
            print(f"no registry match for {n!r}", file=sys.stderr)
            return 1
        resolved.append(hits[0])

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    plans_dir = os.path.join(REPO, "plans", os.environ.get("SPARK_GRAFT_ROUND", "r13"))
    os.makedirs(plans_dir, exist_ok=True)

    # warm the session once (JIT, parquet footers)
    registry[resolved[0]].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in resolved:
        fn = registry[name].fn
        times = []
        n_jobs = 0
        for i in range(runs):
            spark.catalog.clearCache()
            group = f"{name}-run{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            sc.setJobGroup("", "")
        if suffix != "none":
            import contextlib
            import io as _io

            buf = _io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            out = os.path.join(plans_dir, f"{name}_{suffix}.txt")
            with open(out, "w") as f:
                f.write(buf.getvalue())
        print(
            f"{name}: min={min(times):.3f}s med={statistics.median(times):.3f}s "
            f"runs={[round(t, 3) for t in times]} jobs={n_jobs}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

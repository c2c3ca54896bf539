"""Full driver-gate rehearsal: runs entry() plus every queries() entry
against its oracle_sql() via DuckDB — the exact comparison the driver's
t2 performs. Usage:

    python tools/sweep.py [sf_dir] [name_prefix_filter]

e.g. `python tools/sweep.py /root/testdata/sf0.01 q4` runs only q4x.
Exit code 1 on any mismatch.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as E  # noqa: E402
from mapr_db_cdc_sample_spark.oracle import compare, duck_connect  # noqa: E402
from mapr_db_cdc_sample_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefix = sys.argv[2] if len(sys.argv) > 2 else ""

    spark = get_spark("sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connect(sf_dir)
    qs, osql = E.queries(), E.oracle_sql()

    if not prefix:
        rows = E.entry(spark).collect()
        print(f"entry: {len(rows)} rows")

    fails = 0
    for name in sorted(qs):
        if not name.startswith(prefix):
            continue
        t0 = time.perf_counter()
        if name in osql:
            ok, msg = compare(qs[name](spark, sf_dir), con, osql[name])
            status = "ok" if ok else f"FAIL {msg[:200]}"
            fails += 0 if ok else 1
        else:
            status = f"rows-only {qs[name](spark, sf_dir).count()}"
        print(f"{name}: {status} ({time.perf_counter() - t0:.1f}s)")
    print(f"== {fails} failures ==")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())

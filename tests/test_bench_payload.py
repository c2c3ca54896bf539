"""The round driver keeps only the last 2000 chars of bench.py stdout and
parses the final JSON line out of that tail. Round 3's line (75 queries)
overflowed the buffer and BENCH_r03.json recorded `parsed: null`. These
tests pin the guarantee that can never happen again, for any registry size.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, build_payload


def _fake_timings(names):
    return {n: round(0.1 + (i % 37) * 0.123, 3) for i, n in enumerate(names)}


def test_line_fits_driver_tail_at_current_headline_size():
    timings = _fake_timings(HEADLINE)
    line = build_payload(timings, HEADLINE, 123.456, 0.1)
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_query_set_total"
    assert parsed["value"] == 123.456
    assert parsed["n_queries"] == len(HEADLINE)
    # A useful number of per-query timings still make it into the line.
    assert len(parsed["queries"]) >= 40
    # Greedy fill preserves HEADLINE prefix order => stable round-over-round
    # common subset.
    kept = list(parsed["queries"])
    assert kept == [n for n in HEADLINE if n in parsed["queries"]]
    assert kept == HEADLINE[: len(kept)]


def test_line_fits_even_at_300_queries():
    names = [f"q{900 + i}_very_long_operator_name_suffix" for i in range(300)]
    timings = _fake_timings(names)
    line = build_payload(timings, names, 999.999, 0.1)
    assert len(line) <= 1900
    assert json.loads(line)["n_queries"] == 300


def test_small_sets_fully_included():
    names = HEADLINE[:10]
    timings = _fake_timings(names)
    parsed = json.loads(build_payload(timings, names, 1.0, 0.01))
    assert parsed["queries"] == timings

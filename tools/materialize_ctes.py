"""Add AS MATERIALIZED to multi-referenced CTEs in oracle SQL constants.

DuckDB re-inlines a CTE at every reference site; chains of
multi-referenced CTEs therefore re-expand EXPONENTIALLY (q487 went
511s -> 0.2s with MATERIALIZED; CLAUDE.md hard rule).  This tool scans
a queries module for ``_NAME_ORACLE = \"\"\"...\"\"\"`` constants, finds
CTE definitions referenced more than once inside the same statement,
and rewrites ``name AS (`` -> ``name AS MATERIALIZED (`` scoped to
that constant only.  Run with --apply to write; default is report.
"""

from __future__ import annotations

import re
import sys

CTE_DEF = re.compile(r"(?:\bWITH\b|\),)\s*(\w+)\s+AS\s+(MATERIALIZED\s+)?\(", re.I)


def find_ctes(sql: str):
    """Yield (name, already_materialized, def_span) for each CTE definition."""
    for m in CTE_DEF.finditer(sql):
        yield m.group(1), bool(m.group(2)), m.span()


def _strip_comments(sql: str) -> str:
    return re.sub(r"--[^\n]*", "", sql)


def ref_count(sql: str, name: str) -> int:
    # occurrences of the bare identifier (comments stripped so prose
    # mentioning a CTE name doesn't count), minus 1 for the definition
    return len(re.findall(rf"\b{re.escape(name)}\b", _strip_comments(sql))) - 1


def process(path: str, apply: bool) -> int:
    text = open(path).read()
    changed = 0
    # match module-level oracle constants
    for m in re.finditer(r'(_[A-Z0-9_]+_ORACLE(?:\w*)?)\s*=\s*"""(.*?)"""', text, re.S):
        const, sql = m.group(1), m.group(2)
        new_sql = sql
        # rewrite from the END so earlier spans stay valid, anchored to
        # the matched definition span from find_ctes (not a fresh regex
        # search that could hit a same-named alias elsewhere)
        for name, mat, span in sorted(
            find_ctes(sql), key=lambda t: t[2][0], reverse=True
        ):
            refs = ref_count(sql, name)
            if refs >= 2 and not mat:
                seg = new_sql[span[0] : span[1]]
                new_seg = re.sub(
                    rf"\b{re.escape(name)}\s+AS\s+\($",
                    f"{name} AS MATERIALIZED (",
                    seg,
                )
                if new_seg != seg:
                    new_sql = new_sql[: span[0]] + new_seg + new_sql[span[1] :]
                    changed += 1
                    print(f"{const}: {name} (refs={refs}) -> MATERIALIZED")
        if new_sql != sql:
            text = text.replace(f'{const} = """{sql}"""', f'{const} = """{new_sql}"""')
    if apply and changed:
        open(path, "w").write(text)
        print(f"wrote {path}: {changed} CTEs materialized")
    elif not apply:
        print(f"(dry run) {changed} CTEs would be materialized in {path}")
    return changed


if __name__ == "__main__":
    apply = "--apply" in sys.argv
    paths = [a for a in sys.argv[1:] if not a.startswith("-")]
    total = 0
    for p in paths:
        total += process(p, apply)
    sys.exit(0)

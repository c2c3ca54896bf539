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


def ref_count(sql: str, name: str) -> int:
    # occurrences of the bare identifier, minus 1 for the definition
    return len(re.findall(rf"\b{re.escape(name)}\b", sql)) - 1


def process(path: str, apply: bool) -> int:
    text = open(path).read()
    changed = 0
    # match module-level oracle constants
    for m in re.finditer(r'(_[A-Z0-9_]+_ORACLE(?:\w*)?)\s*=\s*"""(.*?)"""', text, re.S):
        const, sql = m.group(1), m.group(2)
        new_sql = sql
        for name, mat, _ in find_ctes(sql):
            refs = ref_count(sql, name)
            if refs >= 2 and not mat:
                # rewrite only the definition site (the one followed by AS ()
                new_sql, n = re.subn(
                    rf"\b{re.escape(name)}\s+AS\s+\(",
                    f"{name} AS MATERIALIZED (",
                    new_sql,
                    count=1,
                )
                if n:
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

"""Driver-window rotation aliases (round 4).

The external correctness gate hash-checks only the first 50 registry
names in SORTED order. Three rounds in, the q49-q99 band had never been
inside that window — those entries were green only under the repo's own
sweep/pytest oracle (same comparison code, self-administered). The
round-3 verdict ranked rotating external verification onto that band
above any new operator.

Each ``q0NN_*`` name below is an ALIAS — same callable, same oracle
string — for an oracled q49-q99 entry. Zero-padding makes it sort
inside the window (``q049_...`` < ``q04_...`` because ``9`` < ``_``),
so this round the driver hash-checks the entire oracled band. Rows-only
entries are not aliased (the hash gate adds nothing for them), and
aliases carry a ``rotation-alias`` tag so tooling can tell them apart;
bench uses an explicit name list and is unaffected. The canonical names
stay registered — nothing else in the repo changes.
"""

from __future__ import annotations

import re

from . import REGISTRY, QueryDef


def _rotate() -> None:
    for name in sorted(REGISTRY):
        m = re.match(r"^q(\d\d)_(.+)$", name)
        if not m or not (49 <= int(m.group(1)) <= 99):
            continue
        q = REGISTRY[name]
        if not q.oracle:
            continue
        alias = f"q0{m.group(1)}_{m.group(2)}"
        REGISTRY.setdefault(
            alias, QueryDef(fn=q.fn, oracle=q.oracle, tags=(*q.tags, "rotation-alias"))
        )


_rotate()

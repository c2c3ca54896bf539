"""Driver-window rotation aliases (round 5: q135-q186 band).

The external correctness gate hash-checks only the first 50 registry
names in SORTED order. The round-4 additions (q135-q228, 92 oracled
entries) had never been inside that window — green only under the
repo's own sweep/pytest oracle (same comparison code,
self-administered). The round-4 verdict ranked rotating external
verification onto that band as the top item, splitting it across
rounds 5 and 6.

Each ``q0NNN_*`` name below is an ALIAS — same callable, same oracle
string — for an oracled q135-q186 entry. Zero-padding makes it sort
inside the window (``q0135_...`` < ``q01_...`` because ``'1' < '_'``),
so this round the driver hash-checks the q135-q186 oracled band
(exactly 50 entries — the whole window). Rows-only entries are not
aliased (the hash gate adds nothing for them), and aliases carry a
``rotation-alias`` tag so tooling can tell them apart; bench uses an
explicit name list and is unaffected. The canonical names stay
registered — nothing else in the repo changes.

Rotation history (union = externally verified coverage):
  round 4: q049-q099 aliases  -> q01-q134 all driver-green (retired)
  round 5: q0135-q0186 aliases (this file)
  round 6 (planned): q0187-q0228 aliases
  round 7 (planned): q0229-q0266 aliases (the round-5 additions)
"""

from __future__ import annotations

import re

from . import REGISTRY, QueryDef

ROTATION_LO = 135
ROTATION_HI = 186


def _rotate() -> None:
    for name in sorted(REGISTRY):
        m = re.match(r"^q(\d{3})_(.+)$", name)
        if not m or not (ROTATION_LO <= int(m.group(1)) <= ROTATION_HI):
            continue
        q = REGISTRY[name]
        if not q.oracle:
            continue
        alias = f"q0{m.group(1)}_{m.group(2)}"
        REGISTRY.setdefault(
            alias, QueryDef(fn=q.fn, oracle=q.oracle, tags=(*q.tags, "rotation-alias"))
        )


_rotate()

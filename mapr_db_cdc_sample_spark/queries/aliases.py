"""Driver-window rotation aliases (round 12: q495-q544 band).

The external correctness gate hash-checks only the first 50 registry
names in SORTED order. The round-4 additions (q135-q228, 92 oracled
entries) had never been inside that window — green only under the
repo's own sweep/pytest oracle (same comparison code,
self-administered). The round-4 verdict ranked rotating external
verification onto that band as the top item, splitting it across
rounds 5 and 6.

Each ``q00NNN_*`` name below is an ALIAS — same callable, same oracle
string — for an oracled q187-q236 entry. Double-zero padding makes it
sort inside the window (``q00236_...`` < ``q01_...`` because
``'0' < '1'`` at the third character), so this round the driver
hash-checks the q187-q236 oracled band (exactly 50 entries — the
whole window). Rows-only entries are not
aliased (the hash gate adds nothing for them), and aliases carry a
``rotation-alias`` tag so tooling can tell them apart; bench uses an
explicit name list and is unaffected. The canonical names stay
registered — nothing else in the repo changes.

Rotation history (union = externally verified coverage):
  round 4: q049-q099 aliases  -> q01-q134 all driver-green (retired)
  round 5: q0135-q0186 aliases -> driver-green 50/50 (retired)
  round 6: q0187-q0236 aliases -> driver-green 50/50 (retired)
  round 7: q00237-q00291 aliases -> driver-green 50/50 (retired)
  round 8: q00292-q00343 aliases -> driver-green 50/50 (retired)
  round 9: q00344-q00393 aliases -> driver-green 50/50 (retired)
  round 10: q00394-q00444 aliases -> driver-green 50/50 (retired)
  round 11: q00445-q00494 aliases -> driver-green 50/50 (retired)
  round 12: q00495-q00544 aliases (this file — exactly the 50 oracled
           ids in q495-q544, no rows-only gaps in this range)
  round 13 (planned): q545-q591 (47 remaining oracled ids) — the
           driver union then covers every oracled id q01-q591
           (each round's band is meanwhile judge-checkable via
           SWEEP_r{N}_band.json, produced by the driver's own
           range-filter invocation)
"""

from __future__ import annotations

import re

from . import REGISTRY, QueryDef

ROTATION_LO = 495
ROTATION_HI = 544


def _rotate() -> None:
    for name in sorted(REGISTRY):
        m = re.match(r"^q(\d{3})_(.+)$", name)
        if not m or not (ROTATION_LO <= int(m.group(1)) <= ROTATION_HI):
            continue
        q = REGISTRY[name]
        if not q.oracle:
            continue
        # double-zero pad: 'q00NNN_' sorts before EVERY canonical name
        # (including 'q01_...', which 'q0NNN_' would not beat for NNN>=200),
        # so the 50-slot sorted window is owned entirely by the band
        alias = f"q00{m.group(1)}_{m.group(2)}"
        REGISTRY.setdefault(
            alias, QueryDef(fn=q.fn, oracle=q.oracle, tags=(*q.tags, "rotation-alias"))
        )


_rotate()

"""Process-scoped scratch space for queries that materialize data
(partitioned copies, JSON round-trips, replay streams, checkpoints).

One root per process, removed at interpreter exit — a sweep or bench run
leaves nothing behind in /tmp. Two flavors:

- ``scratch_dir("key")`` — FIXED path per key; callers rewrite with
  ``mode("overwrite")``, so bench's min-of-N loop reuses one directory
  instead of leaking a fresh table copy per invocation.
- ``scratch_dir()`` — unique dir under the root, for things that must
  never be reused across runs (streaming checkpoints: offsets/state are
  query-scoped; replay dirs consumed by an active FileStreamSource).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

_ROOT: str | None = None


def scratch_root() -> str:
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="spark_graft_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def scratch_dir(key: str | None = None) -> str:
    """Fixed dir for a key (caller overwrites in place), unique dir if
    key is None. Always under the process root, always cleaned at exit."""
    path = os.path.join(scratch_root(), key or uuid.uuid4().hex)
    os.makedirs(path, exist_ok=True)
    return path

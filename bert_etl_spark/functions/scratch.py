"""Session-scoped scratch directories with guaranteed cleanup.

The registered index-demo queries must run on a VANILLA session (no
conf'd standing index) yet should not rebuild their scratch index on
every invocation within a session — bench and the recall/rerank
composites call the same builder several times. This helper hands out
ONE stable directory per (session, kind, key), registered for removal
at interpreter exit — the round-11 'low' advice (no index-sized /tmp
leftovers) kept, without per-call rebuild cost. A hard kill can leave a
dir behind; that is the standard mkdtemp trade every tool makes.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_DIRS: dict[tuple, str] = {}


def session_scratch_dir(spark, kind: str, *key: object) -> str:
    """A stable scratch dir for (this SparkContext, kind, key) — created
    on first request, removed at interpreter exit. The dir is handed out
    EMPTY on first call and KEPT (not pre-deleted): every builder goes
    through the lifecycle's open_index, which treats an existing dir with
    no partition dirs and no marker as buildable, and deleting the
    mkdtemp dir before returning would forfeit its uniqueness guarantee
    (another process could reclaim the name) while making reuse — keyed
    on isdir — silently hand a failed builder a fresh path and a fresh
    atexit registration each call (round-12 advice, the 'low' item)."""
    k = (spark.sparkContext.applicationId, kind, *key)
    d = _DIRS.get(k)
    if d is None or not os.path.isdir(d):
        d = tempfile.mkdtemp(prefix=f"{kind}_scratch_")
        _DIRS[k] = d
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d

"""Process-scoped scratch directories for workload/streaming specs.

Every spec that materializes a dataset (ORC/CSV/JSON roundtrips,
snapshots, changelogs) previously called tempfile.mkdtemp directly —
14+ directories holding full table copies leaked into /tmp per sweep,
accumulating until the disk filled. All scratch dirs now live under
ONE per-process root that atexit removes."""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ROOT: str | None = None


def scratch_dir(prefix: str) -> str:
    """A fresh directory under the process-scoped scratch root
    (created lazily, removed whole at interpreter exit)."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="dqps_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_ROOT)

"""Session-scoped scratch directories for queries that stage files on disk.

Several registered queries materialize intermediate files (flush-sentinel
parquet for streaming replays, snapshot/compaction outputs, replay
directories). ``tempfile.mkdtemp`` leaks one directory per invocation per
run; this module instead hands out subdirectories of a single per-process
root that is removed at interpreter exit, so repeated selfcheck/parity runs
leave nothing behind.

At cluster scale the analogue is a job-scoped staging prefix on the
distributed store (e.g. ``s3://bucket/_staging/<job-id>/``) cleaned by the
orchestrator; the per-process atexit hook is the local[n] stand-in.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ROOT: str | None = None


def _root() -> str:
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="hfd_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def scratch_dir(prefix: str) -> str:
    """A fresh empty directory under the process-scoped scratch root.

    Drop-in replacement for ``tempfile.mkdtemp(prefix=...)`` with cleanup.
    """
    return tempfile.mkdtemp(prefix=prefix, dir=_root())

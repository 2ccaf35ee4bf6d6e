"""Per-process scratch directories for queries that materialize state.

Sink and streaming queries must write somewhere, and several return
DataFrames that LAZILY read what they wrote (st10's state snapshot, the
sink round-trips) — so a ``tempfile.mkdtemp`` per invocation can never be
safely deleted while the result DF is alive, and repeated bench/correctness
invocations accumulate copies in $TMP (round-2 ADVICE finding).

Scheme: ``$TMP/dmshadoop_scratch/<pid>/<tag>``. Each invocation wipes and
reuses ITS OWN tag dir — the footprint per process is one copy per query,
however many times it runs — and tag dirs left behind by exited processes
are swept opportunistically on every call.
"""

from __future__ import annotations

import os
import shutil
import tempfile

_ROOT_NAME = "dmshadoop_scratch"


def scratch_dir(tag: str) -> str:
    """Return a clean per-process scratch dir for ``tag`` (see module doc)."""
    root = os.path.join(tempfile.gettempdir(), _ROOT_NAME)
    os.makedirs(root, exist_ok=True)
    _sweep_dead_processes(root)
    workdir = os.path.join(root, str(os.getpid()), tag)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir, exist_ok=True)
    return workdir


def _sweep_dead_processes(root: str) -> None:
    for entry in os.listdir(root):
        if not entry.isdigit() or int(entry) == os.getpid():
            continue
        try:
            os.kill(int(entry), 0)
        except ProcessLookupError:
            shutil.rmtree(os.path.join(root, entry), ignore_errors=True)
        except PermissionError:
            pass

"""Per-process scratch directories for queries that materialize state.

Sink and streaming queries must write somewhere, and several return
DataFrames that LAZILY read what they wrote (st10's state snapshot, the
sink round-trips) — so a ``tempfile.mkdtemp`` per invocation can never be
safely deleted while the result DF is alive, and repeated bench/correctness
invocations accumulate copies in $TMP (round-2 ADVICE finding).

Scheme: ``$TMP/dmshadoop_scratch/<pid>/<tag>-<N>``. Each invocation vends a
NEW generation ``tag-N`` and deletes all generations up to ``N-2`` — the
immediately previous generation stays alive, so a still-held lazy result
from the prior invocation keeps reading valid files while the new run
proceeds (round-3 ADVICE: wiping the single tag dir on vend silently broke
a held first result on re-run). Footprint per process is therefore at most
two copies per query; tag dirs left behind by exited processes are swept
opportunistically on every call.
"""

from __future__ import annotations

import os
import shutil
import tempfile

_ROOT_NAME = "dmshadoop_scratch"


def scratch_dir(tag: str) -> str:
    """Return a clean scratch dir for ``tag``, versioned per invocation
    within this process (see module doc)."""
    root = os.path.join(tempfile.gettempdir(), _ROOT_NAME)
    os.makedirs(root, exist_ok=True)
    _sweep_dead_processes(root)
    piddir = os.path.join(root, str(os.getpid()))
    os.makedirs(piddir, exist_ok=True)
    gens = sorted(
        int(e[len(tag) + 1 :])
        for e in os.listdir(piddir)
        if e.startswith(tag + "-") and e[len(tag) + 1 :].isdigit()
    )
    for g in gens[:-1]:  # keep the newest prior generation readable
        shutil.rmtree(os.path.join(piddir, f"{tag}-{g}"), ignore_errors=True)
    workdir = os.path.join(piddir, f"{tag}-{(gens[-1] + 1) if gens else 1}")
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

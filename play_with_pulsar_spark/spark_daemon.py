"""Python worker daemon that preloads the engine's heavy modules.

Installed via the documented ``spark.python.daemon.module`` conf
(session.py sets it in local mode). Spark's stock daemon preloads only
``pyspark.worker``; every forked worker then imports pandas/numpy/
pyarrow on first use — measured ~300 ms per worker on this box, paid
per Python-stage task whenever the worker pool has no warm worker.
Importing them HERE, before the daemon starts forking, makes every
fork inherit the already-initialized modules for free (copy-on-write).

At cluster scale the same conf ships with ``--py-files``: a 1000-
executor job running Arrow-batched UDFs saves the import tax on every
executor's first task wave, which is exactly when it hurts (stragglers
during ramp-up).

The stock ``pyspark.daemon`` resolves the worker module from
``sys.argv[1]`` at import time, so importing it AFTER the preloads and
delegating to its ``manager()`` preserves the full protocol.
"""

import importlib
import sys

for _mod in ("numpy", "pandas", "pyarrow", "pyspark.worker"):
    try:
        importlib.import_module(_mod)
    except ImportError:  # never block worker startup on an extra
        pass


def _install_cache_invalidation_guard() -> None:
    """Skip ``importlib.invalidate_caches()`` when sys.path is unchanged.

    ``pyspark.worker_util.setup_spark_files`` invalidates import caches
    on EVERY task; CPython then re-reads the central directory of every
    zip on sys.path (pyspark.zip alone is ~27k entries) — profiled at
    ~0.5 s CPU per task on this box, dwarfing the task's actual work.
    The invalidation only matters when the include set changed (a new
    ``addPyFile`` landing mid-session adds a sys.path entry), so run
    the real invalidation exactly then. Directory-based finders keep
    their own mtime-based staleness checks either way; the one case
    this trades away is a zip OVERWRITTEN in place at an unchanged
    path, which Spark's file-sync refuses by default.
    """
    try:
        import pyspark.worker as _w
        import pyspark.worker_util as _wu

        orig_setup = _wu.setup_spark_files
    except Exception:
        # monkeypatching a pyspark internal: ANY shape change in a
        # future pyspark (module gone, function renamed) must degrade
        # to stock behavior, never break worker startup
        return
    state = {"paths": None}

    def guarded_setup(infile):
        real = importlib.invalidate_caches
        importlib.invalidate_caches = lambda: None
        try:
            orig_setup(infile)
        finally:
            importlib.invalidate_caches = real
        paths = list(sys.path)
        if paths != state["paths"]:
            real()
            state["paths"] = paths

    _wu.setup_spark_files = guarded_setup
    # worker.py binds the name at import time — patch its module global
    # too so the wrapper is the one the task loop calls.
    if getattr(_w, "setup_spark_files", None) is orig_setup:
        _w.setup_spark_files = guarded_setup


_install_cache_invalidation_guard()

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()

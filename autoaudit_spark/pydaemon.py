"""Python worker daemon with the numeric stack preloaded (r18, guide §4.5
applied at the process level).

Spark's `PythonWorkerFactory` keeps an idle-worker pool, but reaps it
after a HARD-CODED one minute of factory inactivity
(`PythonWorkerFactory.IDLE_WORKER_TIMEOUT_NS`, not configurable). In a
mixed suite where JVM-only queries run for more than a minute between
Python-boundary queries, every Python stage therefore starts with a
fresh fork storm: each of the N workers re-imports numpy + pandas +
pyarrow + this package (~0.6 s per worker uncontended, 1-2.5 s when N
spawn at once), which measured as 2-4x wall on the first
`applyInPandas` stage after a JVM-only stretch (anomaly_scores_iforest:
~40-100 s of aggregate worker CPU before the first batch, vs ~13 s of
actual fit compute at sf0.1).

The fix is the standard public recipe for `spark.python.daemon.module`:
import the heavy modules ONCE in the daemon process, before it starts
forking workers — every forked worker then inherits the initialized
modules through copy-on-write pages for free. No task-visible behavior
changes: the daemon protocol, worker module, and UDF execution are
exactly pyspark's own (`pyspark.daemon.manager`).

The imports are best-effort: a missing optional package must not take
down the daemon (workers that need it would fail identically anyway).
"""

from __future__ import annotations

from pyspark.daemon import manager  # also preloads pyspark.worker

for _mod in ("numpy", "pandas", "pyarrow"):
    try:  # noqa: SIM105
        __import__(_mod)
    except Exception:  # pragma: no cover — absent optional dep
        pass

if __name__ == "__main__":
    manager()

"""Round-18 optimization measurement harness.

Two modes over the bench HEADLINE set (or an explicit query list):

    python tools/perf17.py plans  [--tag before] [query ...]
        Dump `.explain("formatted")` for each query to
        plans/r18/<query>_<tag>.txt (guide §1: capture the plan shape —
        Exchange count, join strategy, PushedFilters, Python eval nodes —
        before and after every change).

    python tools/perf17.py probe  [--reps N] [--sf DIR] [query ...]
        Time each query in isolation with the noop sink (guide §1.4),
        N reps per query in one warm session, print per-query
        min/median/all — min-of-N is the standing jitter-robust reading
        (BASELINE eight-run protocol).

Streaming queries execute micro-batches during construction; their
"plan" is the final batch result's plan, and probe timings include the
stream run (same methodology as bench.py)."""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from autoaudit_spark import registry
from autoaudit_spark.session import get_spark

registry.load_all()


def headline() -> list[str]:
    import bench

    return list(bench.HEADLINE)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["plans", "probe"])
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    names = args.queries or headline()
    spark = get_spark("perf17")
    spark.range(1).count()  # warm JVM + scheduler

    if args.mode == "plans":
        outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r18")
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            try:
                df = registry.QUERIES[name](spark, args.sf)
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                )
            except Exception as e:  # noqa: BLE001 — record the failure, keep going
                plan = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
            path = os.path.join(outdir, f"{name}_{args.tag}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path} ({len(plan)} chars)")
        return

    # probe: per-query isolation timings, min-of-reps reading
    results: dict[str, list[float]] = {}
    for name in names:
        fn = registry.QUERIES[name]
        runs = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"probe:{name}#{i}")
            t0 = time.monotonic()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = runs
        print(json.dumps({"query": name, "min": min(runs), "median": statistics.median(runs), "runs": runs}), flush=True)
    total_min = round(sum(min(r) for r in results.values()), 3)
    print(json.dumps({"metric": "probe_total_of_minima", "value": total_min, "unit": "sec", "reps": args.reps}))


if __name__ == "__main__":
    main()

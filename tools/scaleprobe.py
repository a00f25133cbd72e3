"""Window-count scale probe for the windowed lifecycle family.

Reproduces (and makes repeatable) the ad-hoc r10–r12 probe recipe: N
time-shifted copies of a scale factor's events — +70 days per copy
(5 slides of the 28d/14d grid, so every copy's windows are disjoint)
with unique, mod-150-preserving event ids (edges derive dst from
event_id % 150, so the per-copy graph content is identical) — then a
registered query timed at 1x and Nx in the same warm session.

The lifecycle reports have sharp expected arithmetic under this
transform (BASELINE r11/r12 probes):

- persistence: NO observability crop and disjoint copies cannot merge
  runs -> the Nx report must be EXACTLY N shifted copies of the 1x
  report (--verify checks the shift-back multiset identity).
- formation: the MIN-bound crop removes rows only AT the data's first
  window; on data whose first window holds no report rows (true for
  the k-core at sf0.1) the crop is vacuous and the Nx report is again
  EXACTLY N shifted copies (--verify applies).
- dissolution: the MAX-bound makes copies 1..N-1's final populated
  windows newly-observable total collapses, so rows EXCEED Nx by
  exactly those finals (BASELINE r11's k_core_dissolution arithmetic:
  8x2 windows + 7 finals = 23) — run WITHOUT --verify and read the
  excess against the final-window population.

Usage:
    python tools/scaleprobe.py [sf_dir] QUERY [--copies N] [--verify]
                               [--prebuilt]

--verify sorts the Nx rows after shifting window_start back by each
copy's offset and compares the multiset against N copies of the 1x
rows (requires the query to expose a window_start column). For the
persistence reports there is no window_start; --verify instead shifts
run_start/run_end back per copy, the same identity.

--prebuilt resolves names from typeaudit's banked unregistered pairs
(the NOTES "Window capacity" queue) instead of the registry — probe a
birth candidate BEFORE spending its window slot.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from autoaudit_spark import registry
from autoaudit_spark.session import get_spark
from autoaudit_spark.sources import load_table

SHIFT_DAYS = 70  # 5 slides of 14d — copies' 28d windows stay disjoint


def build_shifted(spark, sf_dir: str, out_dir: str, copies: int) -> None:
    ev = load_table(spark, sf_dir, "events")
    max_id = ev.agg(F.max("event_id")).collect()[0][0]
    # unique ids, event_id % 150 preserved (dst = event_id % 150)
    off = ((max_id // 150) + 1) * 150
    parts = [
        ev.select(
            (F.col("event_id") + F.lit(k * off)).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {k * SHIFT_DAYS} DAYS")).alias(
                "ts"
            ),
            *[c for c in ev.columns if c not in ("event_id", "ts")],
        )
        for k in range(copies)
    ]
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    union.write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )


def main() -> int:
    args = [a for a in sys.argv[1:]]
    verify = "--verify" in args
    prebuilt = "--prebuilt" in args
    args = [a for a in args if a not in ("--verify", "--prebuilt")]
    copies = 8
    if "--copies" in args:
        i = args.index("--copies")
        copies = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.1"
    names = [a for a in args if "/" not in a]
    if not names:
        print("usage: scaleprobe.py [sf_dir] QUERY [--copies N] [--verify]")
        return 2

    spark = get_spark("scaleprobe")
    fns = dict(registry.QUERIES)
    if prebuilt:
        from typeaudit import _prebuilt_pairs

        fns = {n: fn for n, (fn, _mk) in _prebuilt_pairs().items()}
    tmp = tempfile.mkdtemp(prefix="scaleprobe_")
    try:
        build_shifted(spark, sf_dir, tmp, copies)
        rc = 0
        for name in names:
            fn = fns.get(name)
            if fn is None:
                kind = "a prebuilt pair" if prebuilt else "registered"
                print(f"ERR  {name}: not {kind}")
                rc = 1
                continue
            t0 = time.monotonic()
            df1 = fn(spark, sf_dir)
            rows1 = df1.collect()
            w1 = time.monotonic() - t0
            t0 = time.monotonic()
            rows_n = fn(spark, tmp).collect()
            wn = time.monotonic() - t0
            print(
                f"{name}: 1x {len(rows1)} rows in {w1:.1f}s | "
                f"{copies}x {len(rows_n)} rows in {wn:.1f}s "
                f"(rows ratio {len(rows_n) / max(len(rows1), 1):.2f}, "
                f"wall ratio {wn / w1:.2f})"
            )
            if verify:
                import datetime as dt

                # shift EVERY timestamp column back — covers both the
                # window_start family and the persistence reports'
                # (run_start, run_end) without naming columns.
                # Detected from the DataFrame SCHEMA, not the first
                # row's values (r13 ADVICE: a NULL in row 0 would
                # misclassify the column and fake a MISMATCH). Reuse
                # the DataFrame built for the timed collect (r14
                # ADVICE: rebuilding it re-ran the lifecycle kernels'
                # eager localCheckpoint jobs once per probe).
                from pyspark.sql.types import TimestampType

                shift = dt.timedelta(days=SHIFT_DAYS)
                schema = df1.schema
                cols = [f.name for f in schema.fields]
                ts_cols = {
                    f.name for f in schema.fields
                    if isinstance(f.dataType, TimestampType)
                }
                want = sorted(
                    tuple(
                        r0[c] + k * shift if c in ts_cols else r0[c]
                        for c in cols
                    )
                    for k in range(copies)
                    for r0 in rows1
                )
                got = sorted(
                    tuple(r[c] for c in cols) for r in rows_n
                ) if rows1 else []
                ok = want == got and bool(want)
                print(
                    f"  shift-back identity: "
                    f"{'EXACT' if ok else 'MISMATCH (or empty)'}"
                )
                if not ok:
                    rc = 1
        return rc
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    registry.load_all()
    sys.exit(main())

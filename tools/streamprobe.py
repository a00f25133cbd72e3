"""Stream-stream join fixed-cost probe (round-5 verdict, "Next round"
#7): `stream_stream_join` is the bench suite's single biggest line
(~33 s official r5 / ~4 micro-batches), and the r5 analysis attributed
it to fixed per-batch machinery rather than join work. This probe
measures that split so the attribution is NUMBERS, not narrative:

- `full @ N` — the registered interval self-join pipeline (replay →
  watermark → typed split → interval join → memory sink) with
  ``spark.sql.shuffle.partitions = N`` at stream start, which is what
  sizes the join STATE STORE partition count (pinned per checkpoint).
- `empty @ N` — the identical pipeline with both typed streams
  filtered to sentinel rows only: the micro-batch planner, state
  stores, watermark bookkeeping, and sink all run the same number of
  batches, but the join processes ~0 rows. `empty` wall ≈ the fixed
  machinery cost; `full − empty` ≈ actual join work.

The ENGINE default stays the scale-correct core count (session.py);
sizing state partitions to the micro scale is a HARNESS choice, and
this probe is where its effect is recorded (BASELINE.md r6 note).

Usage: python tools/streamprobe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from autoaudit_spark.session import get_spark
from autoaudit_spark.streaming.windowed import (
    drain,
    replay_events_chunked,
)

INTERVAL = "INTERVAL 1 DAY"


def _join_pipeline(spark, sf_dir: str, empty: bool):
    ev = replay_events_chunked(
        spark,
        sf_dir,
        n_chunks=3,
        delay="2 days",
        include_type=True,
        sentinel_types=("view", "click"),
    ).withWatermark("ts", "2 days")
    views = ev.filter(F.col("event_type") == "view")
    clicks = ev.filter(F.col("event_type") == "click")
    if empty:
        # keep ONLY the sentinels (user_id −1): watermarks still
        # advance, every micro-batch still plans and commits, the state
        # stores still checkpoint — but the join sees ~1 row per side
        views = views.filter(F.col("user_id") < 0)
        clicks = clicks.filter(F.col("user_id") < 0)
    v = views.select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return v.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr(INTERVAL)),
    )


def _run(spark, sf_dir: str, parts: int, empty: bool) -> tuple[float, int]:
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        t0 = time.monotonic()
        out = drain(
            _join_pipeline(spark, sf_dir, empty),
            f"probe_ssj_{parts}_{int(empty)}",
            output_mode="append",
        )
        n = out.filter(F.col("view_id") >= 0).count()
        return round(time.monotonic() - t0, 2), n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("streamprobe")
    spark.range(1).count()

    results = {}
    rows = {}
    for parts in (32, 8):
        for empty in (True, False):
            wall, n = _run(spark, sf_dir, parts, empty)
            key = f"{'empty' if empty else 'full'}@{parts}"
            results[key] = wall
            rows[key] = n

    # the full@32 and full@8 runs must agree on the join result
    assert rows["full@32"] == rows["full@8"], rows
    print(
        json.dumps(
            {
                "metric": "stream_stream_join_cost_split",
                "sf_dir": sf_dir,
                "wall_sec": results,
                "result_rows": rows["full@32"],
                "n_micro_batches": 4,
                "fixed_per_batch_sec": {
                    "32_parts": round(results["empty@32"] / 4, 2),
                    "8_parts": round(results["empty@8"] / 4, 2),
                },
                "join_work_sec": {
                    "32_parts": round(
                        results["full@32"] - results["empty@32"], 2
                    ),
                    "8_parts": round(results["full@8"] - results["empty@8"], 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()

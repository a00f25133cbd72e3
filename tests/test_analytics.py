"""Unit tests for operators/analytics.py, the clustering coefficient, the
embedding centroids, and the repetition/scrub text operators — crafted
micro-fixtures with hand-computed expectations (the sf0.01 DuckDB oracle
sweep in tools/check.py is the integration layer)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from autoaudit_spark.registry import QUERIES


def crafted_events_dir(spark, tmp_path, rows, schema) -> str:
    """Materialize crafted rows as `<dir>/events.parquet` so a planted-
    case test can invoke the REGISTERED query on them (ADVICE r4: the
    crafted tests previously re-implemented the operator inline, so an
    operator regression slipped past them). `load_table` reads
    `{sf_dir}/events.parquet`, so the temp dir is a drop-in sf_dir."""
    d = str(tmp_path / "crafted_sf")
    spark.createDataFrame(rows, schema).write.parquet(f"{d}/events.parquet")
    return d


class TestAnalytics:
    def test_latest_snapshot_latest_wins(self, spark, sf_dir):
        out = QUERIES["latest_snapshot"](spark, sf_dir)
        rows = out.collect()
        users = [r["user_id"] for r in rows]
        assert users == sorted(set(users))  # one row per user
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        mx = {
            r["user_id"]: r["m"]
            for r in ev.groupBy("user_id").agg(F.max("ts").alias("m")).collect()
        }
        assert all(r["ts"] == mx[r["user_id"]] for r in rows)

    def test_hash_reservoir_deterministic_and_bounded(self, spark, sf_dir):
        a = QUERIES["hash_reservoir_sample"](spark, sf_dir).collect()
        b = QUERIES["hash_reservoir_sample"](spark, sf_dir).collect()
        assert a == b  # reproducible across runs
        per_user: dict[int, int] = {}
        for r in a:
            per_user[r["user_id"]] = per_user.get(r["user_id"], 0) + 1
        assert max(per_user.values()) <= 5

    def test_robust_zscore_flags_planted_outlier(self, spark, tmp_path):
        # median of [9,10,10,11,12,500] = 10.5; MAD = median of
        # |x-10.5| = [1.5,0.5,0.5,0.5,1.5,489.5] = 1.0 → only the 500
        # row clears ZSCORE_CUT (z = 489.5; next largest |z| is 1.5)
        rows = [(1, i, float(v)) for i, v in enumerate([10, 11, 9, 10, 12, 500])]
        d = crafted_events_dir(
            spark, tmp_path, rows, "user_id long, event_id long, value double"
        )
        got = QUERIES["robust_zscore"](spark, d).collect()
        assert len(got) == 1
        r = got[0]
        assert (r["user_id"], r["event_id"], r["value"]) == (1, 5, 500.0)
        assert (r["med"], r["mad"], r["z"]) == (10.5, 1.0, 489.5)

    def test_event_transitions_counts(self, spark, tmp_path):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, i, t0 + dt.timedelta(minutes=i), t)
            for i, t in enumerate(["a", "b", "a", "b"])
        ]
        d = crafted_events_dir(
            spark,
            tmp_path,
            rows,
            "user_id long, event_id long, ts timestamp, event_type string",
        )
        got = {
            (r["event_type"], r["next_type"]): r["n"]
            for r in QUERIES["event_transitions"](spark, d).collect()
        }
        assert got == {("a", "b"): 2, ("b", "a"): 1}

    def test_value_histogram_partitions_all_rows(self, spark, sf_dir):
        out = QUERIES["value_histogram"](spark, sf_dir)
        rows = out.collect()
        total = sum(r["n"] for r in rows)
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        assert total == ev.count()
        assert all(0 <= r["bucket"] <= 19 for r in rows)


class TestGraphExtras:
    def test_clustering_coefficient_triangle_plus_tail(self, spark, sf_dir):
        # K3 {1,2,3} plus a pendant 4-1: coef(1)=2*1/(3*2)=0.333333,
        # coef(2)=coef(3)=1.0, node 4 excluded (deg 1).
        import autoaudit_spark.operators.graph as g

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (4, 1), (2, 1)], "src long, dst long"
        )
        und = (
            edges.filter(F.col("src") != F.col("dst"))
            .select(
                F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"),
            )
            .distinct()
        )
        deg = (
            und.select(F.col("a").alias("node"))
            .unionAll(und.select(F.col("b").alias("node")))
            .groupBy("node")
            .count()
        )
        got = {r["node"]: r["count"] for r in deg.collect()}
        assert got == {1: 3, 2: 2, 3: 2, 4: 1}
        out = QUERIES["clustering_coefficient"](spark, sf_dir)
        rows = out.collect()
        assert all(0.0 <= r["coef"] <= 1.0 for r in rows)
        assert all(r["deg"] >= 2 for r in rows)
        # triangles bounded by deg-choose-2
        assert all(
            r["triangles"] <= r["deg"] * (r["deg"] - 1) / 2 for r in rows
        )


class TestEmbeddingCentroids:
    def test_centroid_matches_numpy_mean(self, spark, sf_dir):
        import numpy as np

        out = QUERIES["embedding_centroids"](spark, sf_dir)
        got = {
            (r["label"], r["d"]): r["centroid"]
            for r in out.filter(F.col("label") == 0).collect()
        }
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        vecs = np.array(
            [
                [float(x) for x in r["embedding"]]
                for r in emb.filter(F.col("label") == 0).collect()
            ]
        )
        mean = vecs.mean(axis=0)
        for d in range(vecs.shape[1]):
            assert math.isclose(got[(0, d)], mean[d], rel_tol=1e-5, abs_tol=1e-5)


class TestTextQuality:
    def test_repetition_metrics_crafted(self, spark):
        docs = spark.createDataFrame(
            [(0, "a a a b"), (1, "w x y z")], "doc_id long, text string"
        )
        docs.createOrReplaceTempView("_rep_docs")
        t = F.split(F.trim(F.col("text")), r"\s+")
        d = docs.select("doc_id", t.alias("t")).withColumn(
            "b",
            F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
            ),
        )
        rows = {r["doc_id"]: r for r in d.collect()}
        assert rows[0]["b"] == ["a a", "a a", "a b"]
        # doc 0: dup_frac = 1 - 2/4 = 0.5; top token 'a' 3/4; top bigram 'a a' 2/3
        # doc 1: all distinct → dup 0, top_token 1/4, top_bigram 1/3

    def test_text_scrub_redacts_and_counts(self, spark):
        from autoaudit_spark.llm.text import SCRUB_PATTERN

        df = spark.createDataFrame(
            [(0, "spark is spark not sparkle"), (1, "nothing here")],
            "doc_id long, text string",
        )
        out = (
            df.filter(F.col("text").rlike(SCRUB_PATTERN))
            .select(
                "doc_id",
                F.regexp_count(F.col("text"), F.lit(SCRUB_PATTERN)).alias("n"),
                F.regexp_replace("text", SCRUB_PATTERN, "<REDACTED>").alias("s"),
            )
            .collect()
        )
        assert len(out) == 1
        assert out[0]["n"] == 2  # word-bounded: 'sparkle' untouched
        assert out[0]["s"] == "<REDACTED> is <REDACTED> not sparkle"


class TestAuditBatch:
    def test_benford_fracs_sum_to_one(self, spark, sf_dir):
        rows = QUERIES["benford_digits"](spark, sf_dir).collect()
        assert {r["digit"] for r in rows} <= set("123456789")
        assert abs(sum(r["frac"] for r in rows) - 1.0) < 1e-4
        # expected fracs are the Benford constants
        import math

        for r in rows:
            want = round(math.log10(1 + 1 / int(r["digit"])), 6)
            assert r["benford"] == want

    def test_burst_detection_planted(self, spark, tmp_path):
        import datetime as dt

        # 20 quiet days of 2 events + one 100-event burst. 20 days, not
        # 10: a single outlier among n days has population z at most
        # sqrt(n-1), so with n=10 a lone burst sits EXACTLY at 3σ and
        # flagging depended on float rounding; sqrt(19) ≈ 4.36 clears
        # BURST_SIGMA=3 with real margin (threshold ≈ 71 vs cnt 100).
        rows = []
        for day in range(20):
            n = 100 if day == 5 else 2
            for i in range(n):
                rows.append(
                    (
                        1,
                        day * 1000 + i,
                        dt.datetime(2024, 1, 1 + day, 12, i // 60, i % 60),
                    )
                )
        d = crafted_events_dir(
            spark, tmp_path, rows, "user_id long, event_id long, ts timestamp"
        )
        flagged = QUERIES["burst_detection"](spark, d).collect()
        assert len(flagged) == 1
        assert flagged[0]["cnt"] == 100
        assert flagged[0]["day"] == dt.date(2024, 1, 6)

    def test_reciprocity_crafted(self, spark, sf_dir):
        out = QUERIES["edge_reciprocity"](spark, sf_dir).collect()[0]
        assert 0 <= out["n_reciprocal"] <= out["n_edges"]
        assert 0.0 <= out["reciprocity"] <= 1.0

    def test_assortativity_in_range(self, spark, sf_dir):
        out = QUERIES["degree_assortativity"](spark, sf_dir).collect()[0]
        assert -1.0 <= out["assortativity"] <= 1.0
        assert out["n_pairs"] % 2 == 0  # both orientations counted

    def test_temporal_cycles_ordering_and_span(self, spark, sf_dir):
        from autoaudit_spark.operators.graph import CYCLE_SPAN_US

        rows = QUERIES["temporal_cycles"](spark, sf_dir).collect()
        for r in rows[:50]:
            assert r["ts1"] < r["ts3"]
            assert 0 < r["span_us"] <= CYCLE_SPAN_US
            assert len({r["a"], r["b"], r["c"]}) == 3  # genuine 3-cycle


class TestPipelineBatch:
    def test_profile_columns_counts(self, spark, sf_dir):
        rows = {r["column_name"]: r for r in QUERIES["profile_columns"](spark, sf_dir).collect()}
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        n = li.count()
        assert all(r["n_rows"] == n for r in rows.values())
        assert rows["l_returnflag"]["n_distinct"] == 3  # A/N/R
        assert all(r["n_null"] == 0 for r in rows.values())

    def test_unigram_logprob_rare_scores_higher(self, spark):
        import math

        from pyspark.sql import functions as Fn

        docs = spark.createDataFrame(
            [(0, "common common common common"), (1, "common rare")],
            "doc_id long, text string",
        )
        toks = docs.select(
            "doc_id",
            Fn.explode(Fn.split(Fn.trim(Fn.col("text")), r"\s+")).alias("term"),
        )
        cnt = toks.groupBy("term").agg(Fn.count("*").alias("c"))
        got = {r["term"]: r["c"] for r in cnt.collect()}
        assert got == {"common": 5, "rare": 1}
        # doc 0 all 'common' (p=5/6) → low nll; doc 1 contains 'rare'
        # (p=1/6) → higher mean nll
        nll0 = -math.log2(5 / 6)
        nll1 = (-math.log2(5 / 6) - math.log2(1 / 6)) / 2
        assert nll1 > nll0

    def test_negative_edges_are_non_edges(self, spark, sf_dir):
        from autoaudit_spark.operators.graph import NEG_KEEP
        from autoaudit_spark.sources import adjacency

        neg = QUERIES["negative_edge_sample"](spark, sf_dir)
        adj = adjacency(spark, sf_dir)
        # no sampled pair may be a real edge
        assert neg.join(adj, ["src", "dst"], "inner").count() == 0
        rows = neg.collect()
        assert all(r["src"] != r["dst"] for r in rows)
        per_src: dict[int, int] = {}
        for r in rows:
            per_src[r["src"]] = per_src.get(r["src"], 0) + 1
        assert max(per_src.values()) <= NEG_KEEP
        # deterministic across runs
        assert rows == QUERIES["negative_edge_sample"](spark, sf_dir).collect()


class TestSequenceAndSimilarity:
    def test_event_runs_islands_crafted(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        types = ["a", "a", "a", "b", "a", "a", "b", "b", "b", "b"]
        df = spark.createDataFrame(
            [
                (1, i, t0 + dt.timedelta(minutes=i), t)
                for i, t in enumerate(types)
            ],
            "user_id long, event_id long, ts timestamp, event_type string",
        )
        from pyspark.sql import Window

        w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
        w_typ = Window.partitionBy("user_id", "event_type").orderBy(
            "ts", "event_id"
        )
        runs = (
            df.select(
                "event_type",
                (
                    F.row_number().over(w_all) - F.row_number().over(w_typ)
                ).alias("grp"),
            )
            .groupBy("event_type", "grp")
            .count()
            .collect()
        )
        got = sorted((r["event_type"], r["count"]) for r in runs)
        # runs: aaa, b, aa, bbbb
        assert got == [("a", 2), ("a", 3), ("b", 1), ("b", 4)]

    def test_containment_catches_subset_jaccard_misses(self, spark):
        from autoaudit_spark.llm.dedup import shingles

        short = "alpha beta gamma delta epsilon zeta"  # 6 tokens → 2 5-shingles
        long = short + " " + " ".join(f"w{i}" for i in range(40))
        docs = spark.createDataFrame(
            [(0, short), (1, long)], "doc_id long, text string"
        )
        sh = shingles(docs)
        sizes = {r["doc_id"]: r["n"] for r in sh.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
        both = (
            sh.withColumnRenamed("doc_id", "d1")
            .join(sh.withColumnRenamed("doc_id", "d2"), "shingle")
            .filter(F.col("d1") < F.col("d2"))
            .count()
        )
        # containment of the short doc is total; jaccard is small
        c = both / sizes[0]
        j = both / (sizes[0] + sizes[1] - both)
        assert c == 1.0 and j < 0.2

    def test_hashing_tf_bucket_range_and_mass(self, spark, sf_dir):
        from autoaudit_spark.llm.text import HTF_BUCKETS

        rows = QUERIES["hashing_tf"](spark, sf_dir).collect()
        assert all(0 <= r["bucket"] < HTF_BUCKETS for r in rows)
        # total tf mass equals the token count
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n_tokens = docs.select(
            F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n")
        ).agg(F.sum("n")).collect()[0][0]
        assert sum(r["tf"] for r in rows) == n_tokens


class TestModernAPITiers:
    def test_variant_matches_get_json_object(self, spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(200)
        both = ev.select(
            F.get_json_object("props", "$.k").cast("int").alias("j"),
            F.variant_get(F.parse_json("props"), "$.k", "int").alias("v"),
        ).collect()
        assert all(r["j"] == r["v"] for r in both)

    def test_variant_decade_floors_negative_k_both_engines(self, spark, tmp_path):
        """ADVICE r5: DuckDB's integer `//` truncates toward zero
        (-7 // 10 = 0) while Spark F.floor(-7/10) = -1 — the oracle must
        use FLOOR too. Crafted negative k drives the REGISTERED query AND
        its registered oracle over the same parquet and asserts they agree
        on the floored decades."""
        import duckdb

        from autoaudit_spark.registry import ORACLES

        rows = [
            (i, None, 1, "a", 1.0, '{"k": %d}' % k)
            for i, k in enumerate([-17, -10, -7, -1, 0, 7, 10, 19])
        ]
        d = crafted_events_dir(
            spark, tmp_path, rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        )
        got = QUERIES["variant_props_extract"](spark, d).collect()
        # floor decades: -17→-2, -10→-1, -7→-1, -1→-1, 0→0, 7→0, 10→1, 19→1
        assert [(r["k_decade"], r["n"]) for r in got] == [
            (-2, 1), (-1, 3), (0, 2), (1, 2),
        ]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'"
        )
        oracle = con.execute(ORACLES["variant_props_extract"]).fetchall()
        assert [
            (r["k_decade"], r["n"], r["k_min"], r["k_max"], r["tot_value"])
            for r in got
        ] == oracle

    def test_python_datasource_partitions_by_row_group(self, spark, sf_dir):
        import pyarrow.parquet as pq

        from autoaudit_spark.sources.pysource import _EventsReader

        path = f"{sf_dir}/events.parquet"
        r = _EventsReader({"path": path})
        assert len(r.partitions()) == pq.ParquetFile(path).num_row_groups
        n = sum(
            b.num_rows for p in r.partitions() for b in r.read(p)
        )
        assert n == pq.ParquetFile(path).metadata.num_rows

    def test_media_arrow_matches_pandas_twin(self, spark, sf_dir):
        a = QUERIES["media_features_arrow"](spark, sf_dir).collect()
        b = QUERIES["media_features_hashed"](spark, sf_dir).collect()
        assert a == b


class TestTokenBudgetOps:
    def test_bpe_counts_at_least_ws(self, spark, sf_dir):
        rows = QUERIES["bpe_token_count"](spark, sf_dir).collect()
        # the BPE-ish pretokenizer never merges across whitespace, so it
        # produces at least one token per whitespace word
        assert all(r["n_bpe"] >= r["n_ws"] for r in rows)
        assert all(r["bpe_per_word"] >= 1.0 for r in rows)

    def test_dataset_split_deterministic_and_near_80_10_10(self, spark, sf_dir):
        rows = QUERIES["dataset_split"](spark, sf_dir).collect()
        again = QUERIES["dataset_split"](spark, sf_dir).collect()
        assert rows == again
        n = len(rows)
        frac = {
            s: sum(1 for r in rows if r["split"] == s) / n
            for s in ("train", "val", "test")
        }
        assert 0.7 < frac["train"] < 0.9
        assert 0.04 < frac["val"] < 0.17
        assert 0.04 < frac["test"] < 0.17


class TestPQ:
    def test_pq_recall_vs_brute_force(self, spark, sf_dir):
        """PQ ADC top-5 should substantially overlap exact L2 top-5 —
        the quantization is lossy but 8×8 subspaces on 64-dim is mild."""
        import numpy as np

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
        vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb}
        pq = QUERIES["ann_pq_topk"](spark, sf_dir).collect()
        by_q: dict[int, list[int]] = {}
        for r in pq:
            by_q.setdefault(r["query_id"], []).append(r["vec_id"])
        hits = total = 0
        for qid, got in by_q.items():
            q = vecs[qid]
            d = {
                vid: float(np.sum((v - q) ** 2))
                for vid, v in vecs.items()
                if vid != qid
            }
            want = [v for v, _ in sorted(d.items(), key=lambda kv: (kv[1], kv[0]))[:5]]
            hits += len(set(got) & set(want))
            total += 5
        # the synthetic embeddings are near-isotropic (no cluster
        # structure) — PQ's hardest case; NumPy simulation shows ~0.2-0.3
        # top-5 recall regardless of Lloyd rounds. Chance is 5/2000 =
        # 0.25%, so ≥15% still demonstrates the codes carry geometry.
        assert hits / total >= 0.15

    def test_pq_codes_in_range(self, spark, sf_dir):
        from autoaudit_spark.llm.similarity import (
            PQ_K,
            PQ_M,
            _dvec,
            _pq_code_expr,
            _pq_sub,
            pq_train,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", _dvec("embedding").alias("v")
        )
        cents = pq_train(spark, emb)
        assert len(cents) == PQ_M and all(len(c) == PQ_K for c in cents)
        codes = emb.select(
            *[
                _pq_code_expr(_pq_sub(F.col("v"), m), cents[m]).alias(f"c{m}")
                for m in range(PQ_M)
            ]
        ).collect()
        for r in codes:
            assert all(0 <= r[f"c{m}"] < PQ_K for m in range(PQ_M))


class TestLabelPropagation:
    def test_lpa_separates_planted_cliques(self, spark, tmp_path):
        """Two 4-cliques joined by one bridge edge: LPA labels each
        clique uniformly; min-label components would merge them. The
        graph rides the events→edges derivation (src=user_id,
        dst=event_id%150 — ids < 150, so event_id IS the endpoint) and
        the assertion exercises the REGISTERED query end-to-end."""
        import datetime as dt

        edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        edges += [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
        edges.append((3, 10))  # bridge
        t0 = dt.datetime(2024, 1, 1)
        rows = [(a, b, 1.0, t0) for a, b in edges]
        d = crafted_events_dir(
            spark,
            tmp_path,
            rows,
            "user_id long, event_id long, value double, ts timestamp",
        )
        got = {
            r["node"]: r["label"]
            for r in QUERIES["label_propagation"](spark, d).collect()
        }
        assert set(got) == set(range(4)) | set(range(10, 14))
        c1 = {got[n] for n in range(4)}
        c2 = {got[n] for n in range(10, 14)}
        assert len(c1) == 1 and len(c2) == 1  # uniform within cliques
        assert c1 != c2  # but DIFFERENT across the bridge

    def test_lpa_registered_query_runs(self, spark, sf_dir):
        rows = QUERIES["label_propagation"](spark, sf_dir).collect()
        nodes = {r["node"] for r in rows}
        labels = {r["label"] for r in rows}
        assert labels <= nodes  # labels are node ids
        assert len(labels) < len(nodes)  # propagation actually merged


class TestIVFPQ:
    def test_ivfpq_variants_shape_and_candidate_discipline(self, spark, sf_dir):
        """Both IVFPQ variants return ≤k rows per query, never the query
        itself, and only candidates from the query's probed lists."""
        for name in ("ann_ivfpq_topk", "ann_ivfpq_residual_topk"):
            rows = QUERIES[name](spark, sf_dir).collect()
            per_q: dict[int, list] = {}
            for r in rows:
                assert r["neighbor_id"] != r["query_id"]
                assert r["dist"] >= 0.0
                per_q.setdefault(r["query_id"], []).append(r["rk"])
            for q, rks in per_q.items():
                assert rks == list(range(1, len(rks) + 1))
                assert len(rks) <= 5


class TestObservationAPI:
    def test_observe_collects_scan_metrics(self, spark, sf_dir):
        """df.observe — plan-embedded metric collection (the zero-cost
        way to audit row counts / sums in a production pipeline without
        a second scan)."""
        from pyspark.sql import Observation
        from pyspark.sql import functions as Fn

        obs = Observation("ev_metrics")
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        out = (
            ev.observe(
                obs,
                Fn.count(Fn.lit(1)).alias("n_rows"),
                Fn.sum(Fn.col("value").cast("decimal(18,2)")).alias("tot"),
            )
            .groupBy("event_type")
            .count()
        )
        out.collect()
        got = obs.get
        assert got["n_rows"] == ev.count()
        want = ev.agg(
            Fn.sum(Fn.col("value").cast("decimal(18,2)")).alias("t")
        ).collect()[0]["t"]
        assert got["tot"] == want


class TestMortonLayout:
    def test_zorder_prunes_more_files_than_linear_sort(
        self, spark, sf_root, tmp_path
    ):
        """Write events (a) sorted by event_id and (b) sorted by the
        Morton key, many small files each; count how many files a 2-D
        predicate (user range × value range) could touch judging ONLY by
        footer min-max stats — the exact skipping a scan does. The
        Z-order layout must prune strictly more files."""
        import glob

        import pyarrow.parquet as pq

        from autoaudit_spark.sources.bucketed import _morton_sql

        # sf0.01 deliberately (not the sf0.001 fixture): at sf0.001 the
        # event-time order happens to correlate with user_id, so a plain
        # event_id sort ALSO yields narrow user stats and both layouts
        # prune — the comparison only discriminates on decorrelated data
        import os

        sf_dir = f"{sf_root}/sf0.01"
        if not os.path.isdir(sf_dir):
            pytest.skip(f"{sf_dir} not present on this machine")
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id",
            "user_id",
            F.least(F.floor(F.col("value") / 25.0).cast("long"), F.lit(19)).alias(
                "bucket"
            ),
        )
        morton = F.expr(_morton_sql("user_id", "bucket")).cast("long")
        linear = str(tmp_path / "linear")
        zorder = str(tmp_path / "zorder")
        n_files = 20
        (
            ev.orderBy("event_id").coalesce(1)
            .withColumn("morton", morton)
            .write.option("maxRecordsPerFile", ev.count() // n_files + 1)
            .parquet(linear)
        )
        (
            ev.orderBy(morton, F.col("event_id")).coalesce(1)
            .withColumn("morton", morton)
            .write.option("maxRecordsPerFile", ev.count() // n_files + 1)
            .parquet(zorder)
        )

        def candidate_files(path: str) -> tuple[int, int]:
            total = cand = 0
            for f in glob.glob(f"{path}/*.parquet"):
                md = pq.ParquetFile(f).metadata
                schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
                ui = schema_names.index("user_id")
                bi = schema_names.index("bucket")
                for rg in range(md.num_row_groups):
                    total += 1
                    us = md.row_group(rg).column(ui).statistics
                    bs = md.row_group(rg).column(bi).statistics
                    # predicate: user_id in [40, 60] AND bucket in [5, 8]
                    if us.max >= 40 and us.min <= 60 and bs.max >= 5 and bs.min <= 8:
                        cand += 1
            return cand, total

        lin_cand, lin_total = candidate_files(linear)
        z_cand, z_total = candidate_files(zorder)
        assert lin_total >= 10 and z_total >= 10  # layout actually split
        # linear sort: every chunk spans the full user/value space →
        # nothing prunes; Morton clusters both dims → real skipping
        assert z_cand < lin_cand
        assert z_cand <= z_total // 2  # at least half the files skipped


class TestRateBiasScreens:
    def _write(self, spark, path, rows):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        data = [
            (i, t0 + dt.timedelta(minutes=i), u, "pay", v, "{}")
            for i, (u, v) in enumerate(rows)
        ]
        spark.createDataFrame(
            data,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).write.parquet(f"{path}/events.parquet")

    def test_planted_structurer_ranks_first(self, spark, tmp_path):
        """An account keeping every transfer just under the threshold
        must top the z ranking with a large positive score; organic
        accounts (amounts far from the band) sit at negative z."""
        from autoaudit_spark.operators.analytics import RATE_BIAS_MIN_TX
        from autoaudit_spark.registry import QUERIES

        rows = [(1, 95.0 + (i % 5)) for i in range(RATE_BIAS_MIN_TX)]
        rows += [(2, 10.0 + i) for i in range(RATE_BIAS_MIN_TX)]
        rows += [(3, 150.0 + i) for i in range(RATE_BIAS_MIN_TX)]
        d = str(tmp_path / "st")
        self._write(spark, d, rows)

        out = QUERIES["threshold_structuring"](spark, d).collect()
        assert out[0]["user_id"] == 1
        assert out[0]["n_band"] == RATE_BIAS_MIN_TX
        assert out[0]["band_frac"] == 1.0
        assert out[0]["z_band"] > 3
        assert all(r["z_band"] < 0 for r in out[1:])

    def test_planted_round_number_account(self, spark, tmp_path):
        """All-whole-dollar account flags; an all-cents account scores
        negative. Sub-minimum accounts are excluded entirely."""
        from autoaudit_spark.operators.analytics import RATE_BIAS_MIN_TX
        from autoaudit_spark.registry import QUERIES

        rows = [(1, float(100 + i)) for i in range(RATE_BIAS_MIN_TX)]
        rows += [(2, 100.37 + i) for i in range(RATE_BIAS_MIN_TX)]
        rows += [(9, 500.0)]  # below min support
        d = str(tmp_path / "rn")
        self._write(spark, d, rows)

        out = {r["user_id"]: r for r in
               QUERIES["round_number_bias"](spark, d).collect()}
        assert set(out) == {1, 2}
        assert out[1]["round_frac"] == 1.0 and out[1]["z_round"] > 3
        assert out[2]["n_round"] == 0 and out[2]["z_round"] < 0

    def test_degenerate_base_rate_yields_null_z(self, spark, tmp_path):
        """Review r7: p0 = 1 (every amount whole-unit) must yield NULL
        z in BOTH engines, not a Spark ANSI DIVIDE_BY_ZERO crash."""
        from autoaudit_spark.operators.analytics import RATE_BIAS_MIN_TX
        from autoaudit_spark.registry import QUERIES

        rows = [(1, float(i + 1)) for i in range(RATE_BIAS_MIN_TX)]
        d = str(tmp_path / "degen")
        self._write(spark, d, rows)

        out = QUERIES["round_number_bias"](spark, d).collect()
        assert len(out) == 1
        assert out[0]["round_frac"] == 1.0 and out[0]["z_round"] is None
        # and p0 = 0: no amount in the structuring band
        out2 = QUERIES["threshold_structuring"](spark, d).collect()
        assert len(out2) == 1
        assert out2[0]["n_band"] == 0 and out2[0]["z_band"] is None


class TestCusumUpshifts:
    def test_planted_shift_flags_once_at_onset(self, spark, tmp_path):
        """A quiet account that suddenly starts large transfers crosses
        h exactly once, at/after the shift onset; a steady low-value
        account never flags."""
        import datetime as dt

        from autoaudit_spark.registry import QUERIES

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        # user 1: 30 quiet (10.00) then 20 big (200.00); user 2 all quiet.
        # corpus mean stays low because user 2 dominates.
        for i in range(30):
            rows.append((i, t0 + dt.timedelta(minutes=i), 1, "pay", 10.0, "{}"))
        for i in range(30, 50):
            rows.append((i, t0 + dt.timedelta(minutes=i), 1, "pay", 200.0, "{}"))
        for i in range(50, 250):
            rows.append((i, t0 + dt.timedelta(minutes=i), 2, "pay", 10.0, "{}"))
        d = str(tmp_path / "cu")
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).write.parquet(f"{d}/events.parquet")

        out = QUERIES["cusum_upshifts"](spark, d).collect()
        assert [r["user_id"] for r in out] == [1]
        assert out[0]["event_id"] >= 30  # flagged at/after the onset

    def test_reflection_identity_matches_recursion(self, spark):
        """The windowed form S_t = C_t - min(0, running_min(C)) must
        equal the textbook recursion S_t = max(0, S_{t-1} + x - k)
        replayed in Python over every account (sf0.001, upcrossings of
        the same h)."""
        from collections import defaultdict

        from autoaudit_spark.operators.analytics import CUSUM_H_MULT
        from autoaudit_spark.registry import QUERIES
        from autoaudit_spark.sources import load_table

        sf = "/root/testdata/sf0.001"
        ev = sorted(
            (r["user_id"], r["ts"], r["event_id"], round(r["value"] * 100))
            for r in load_table(spark, sf, "events").collect()
        )
        kc = round(sum(c for *_, c in ev) / len(ev))
        h = CUSUM_H_MULT * kc
        s_by_user, prev_by_user = defaultdict(int), defaultdict(int)
        expect = []
        for u, ts, eid, cents in ev:
            s = max(0, s_by_user[u] + cents - kc)
            if s >= h and prev_by_user[u] < h:
                expect.append((u, eid, s))
            s_by_user[u] = prev_by_user[u] = s
        got = [(r["user_id"], r["event_id"], r["s_plus_cents"])
               for r in QUERIES["cusum_upshifts"](spark, sf).collect()]
        assert got == expect


class TestUserProfileDivergence:
    def test_planted_divergent_account(self, spark, tmp_path):
        """An account doing ONLY the corpus-rare action tops the KL
        ranking; accounts matching the corpus mix score near zero."""
        import datetime as dt

        from autoaudit_spark.registry import QUERIES

        t0 = dt.datetime(2024, 1, 1)
        rows, i = [], 0
        # 9 conformist accounts: 8 view / 2 click; 1 deviant: all error
        for u in range(1, 10):
            for _ in range(8):
                rows.append((i, t0 + dt.timedelta(minutes=i), u, "view", 1.0, "{}")); i += 1
            for _ in range(2):
                rows.append((i, t0 + dt.timedelta(minutes=i), u, "click", 1.0, "{}")); i += 1
        for _ in range(10):
            rows.append((i, t0 + dt.timedelta(minutes=i), 99, "error", 1.0, "{}")); i += 1
        d = str(tmp_path / "kl")
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).write.parquet(f"{d}/events.parquet")

        out = QUERIES["user_profile_divergence"](spark, d).collect()
        assert out[0]["user_id"] == 99
        assert out[0]["kl_bits"] > 3  # log2(100/10) ≈ 3.32 bits
        # conformists: identical mix to each other, tiny divergence
        assert all(abs(r["kl_bits"]) < 0.2 for r in out[1:])

    def test_python_replication_sf0001(self, spark):
        """Textbook KL recomputed in Python (engine rounding at 6dp on
        the logs, 9dp on the terms) matches every account."""
        import math
        from collections import Counter, defaultdict

        from autoaudit_spark.registry import QUERIES
        from autoaudit_spark.sources import load_table

        def r(x, p):
            s = 10 ** p
            return math.copysign(math.floor(abs(x) * s + 0.5), x) / s

        sf = "/root/testdata/sf0.001"
        ev = load_table(spark, sf, "events").collect()
        per = Counter((e["user_id"], e["event_type"]) for e in ev)
        gl = Counter(e["event_type"] for e in ev)
        ng = len(ev)
        n_u = defaultdict(int)
        for (u, _), c in per.items():
            n_u[u] += c
        expect = {}
        for u in n_u:
            kl = 0.0
            for (uu, t), c in per.items():
                if uu != u:
                    continue
                term = (c / n_u[u]) * (
                    r(math.log2(c), 6) - r(math.log2(n_u[u]), 6)
                    - r(math.log2(gl[t]), 6) + r(math.log2(ng), 6))
                kl += r(term, 9)
            expect[u] = (n_u[u], kl)
        got = {row["user_id"]: (row["n_events"], row["kl_bits"])
               for row in QUERIES["user_profile_divergence"](spark, sf).collect()}
        assert set(got) == set(expect)
        for u, (n, kl) in expect.items():
            assert got[u][0] == n
            assert abs(got[u][1] - kl) < 1e-9, u


class TestEwmaSpikeFlags:
    def test_planted_spike_flags_only_the_spike(self, spark, tmp_path):
        """A steady account with one 5x transaction flags exactly that
        transaction; a uniformly steady account flags nothing, and
        nothing flags inside the first EWMA_MIN_HIST rows."""
        import datetime as dt

        from autoaudit_spark.operators.analytics import EWMA_MIN_HIST
        from autoaudit_spark.registry import QUERIES

        t0 = dt.datetime(2024, 1, 1)
        rows, i = [], 0
        for k in range(30):                      # user 1: steady + spike at 20
            v = 500.0 if k == 20 else 100.0
            rows.append((i, t0 + dt.timedelta(minutes=i), 1, "pay", v, "{}")); i += 1
        for k in range(30):                      # user 2: steady
            rows.append((i, t0 + dt.timedelta(minutes=i), 2, "pay", 100.0, "{}")); i += 1
        # user 3: a 10x jump INSIDE the warm-up window -> no flag
        for k in range(EWMA_MIN_HIST):
            v = 1000.0 if k == EWMA_MIN_HIST - 1 else 100.0
            rows.append((i, t0 + dt.timedelta(minutes=i), 3, "pay", v, "{}")); i += 1
        d = str(tmp_path / "ewma")
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).write.parquet(f"{d}/events.parquet")

        out = QUERIES["ewma_spike_flags"](spark, d).collect()
        assert len(out) == 1
        assert out[0]["user_id"] == 1 and out[0]["event_id"] == 20
        assert out[0]["cents"] == 50000
        assert out[0]["baseline_cents"] == 10000.0  # all-steady history

    def test_python_replication_sf0001(self, spark):
        """Dyadic-weight EWMA recomputed exactly in Python (same
        truncation, same warm-up rule) matches every flagged row
        BITWISE — the weights are exact, so == not approx."""
        from collections import defaultdict

        from autoaudit_spark.operators.analytics import (
            EWMA_LAGS, EWMA_MIN_HIST, EWMA_SPIKE_MULT,
        )
        from autoaudit_spark.registry import QUERIES
        from autoaudit_spark.sources import load_table

        sf = "/root/testdata/sf0.001"
        ev = sorted(
            (r["user_id"], r["ts"], r["event_id"], round(r["value"] * 100))
            for r in load_table(spark, sf, "events").collect()
        )
        hist = defaultdict(list)
        expect = []
        for u, ts, eid, cents in ev:
            h = hist[u]
            lags = h[::-1][:EWMA_LAGS]
            num = sum(c * (1.0 / (1 << k)) for k, c in enumerate(lags))
            den = sum(1.0 / (1 << k) for k in range(len(lags)))
            if len(h) > EWMA_MIN_HIST - 1 and den > 0:
                baseline = num / den
                if cents >= EWMA_SPIKE_MULT * baseline:
                    expect.append((u, eid, cents, baseline))
            h.append(cents)
        got = [(r["user_id"], r["event_id"], r["cents"], r["baseline_cents"])
               for r in QUERIES["ewma_spike_flags"](spark, sf).collect()]
        assert got == expect

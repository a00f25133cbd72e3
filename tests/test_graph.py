"""Graph operator unit tests on hand-built graphs (known answers)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from autoaudit_spark.operators.graph import (
    node_universe,
    relabel,
    two_hop_counts,
    two_hop_intermediaries,
)


def _adj(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_two_hop_counts_star(spark):
    # smurf star: 0 -> {10,11,12} -> 5  (3 intermediaries)
    pairs = [(0, 10), (0, 11), (0, 12), (10, 5), (11, 5), (12, 5)]
    out = two_hop_counts(_adj(spark, pairs), min_paths=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.src, r.dst, r.path_cnt) == (0, 5, 3)


def test_two_hop_counts_threshold(spark):
    # only 2 paths 0->5: below the c=3 threshold (AA-Smurf.py:108)
    pairs = [(0, 10), (0, 11), (10, 5), (11, 5)]
    assert two_hop_counts(_adj(spark, pairs), min_paths=3).count() == 0
    out = two_hop_counts(_adj(spark, pairs), min_paths=2).collect()
    assert [(r.src, r.dst, r.path_cnt) for r in out] == [(0, 5, 2)]


def test_two_hop_intermediaries(spark):
    pairs = [(0, 10), (0, 11), (0, 12), (10, 5), (11, 5), (12, 5)]
    out = two_hop_intermediaries(_adj(spark, pairs), min_paths=3).collect()
    assert sorted((r.src, r.dst, r.mid) for r in out) == [
        (0, 5, 10),
        (0, 5, 11),
        (0, 5, 12),
    ]


def test_node_universe(spark):
    e = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0)], "src long, dst long, weight double"
    )
    nodes = sorted(r.node for r in node_universe(e).collect())
    assert nodes == [1, 2, 3]


def test_relabel_preserves_edge_count(spark):
    adj = _adj(spark, [(5, 7), (7, 9), (9, 5)])
    rank_map = spark.createDataFrame(
        [(5, 0), (7, 1), (9, 2)], "node long, rank long"
    )
    out = relabel(adj, rank_map)
    assert out.count() == 3
    assert sorted((r.src, r.dst) for r in out.collect()) == [(0, 1), (1, 2), (2, 0)]


def test_csv_edge_scan_round_trip(spark, sf_dir, tmp_path):
    """S2/S3: schema'd CSV scan == the parquet edge relation it was
    written from; null rows dropped; projection works."""
    from autoaudit_spark.sources import edges, load_csv_edges
    from autoaudit_spark.sources.tables import CSV_TS_FORMAT

    e = edges(spark, sf_dir).limit(200)
    out = str(tmp_path / "edges_csv")
    e.write.option("header", True).option("timestampFormat", CSV_TS_FORMAT).mode("overwrite").csv(out)
    back = load_csv_edges(spark, out)
    assert back.count() == 200
    a = {tuple(r) for r in e.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b
    proj = load_csv_edges(spark, out, columns=["src", "dst"])
    assert proj.columns == ["src", "dst"]


def test_connected_components_known_graph(spark):
    from autoaudit_spark.operators.graph import connected_components

    edges = [(0, 1), (1, 2), (5, 6), (6, 7), (7, 5), (10, 11)]
    adj = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["component"] for r in connected_components(adj).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5, 7: 5, 10: 10, 11: 10}


def test_pagerank_matches_numpy_power_iteration(spark):
    """Same convention: d=0.85, uniform dangling redistribution, 10 iters."""
    import numpy as np
    from autoaudit_spark.operators.graph import pagerank

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]  # node 4 dangling+isolated? keep 0-3
    adj = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(adj, iters=10).collect()}

    n, d = 4, 0.85
    out = {0: [1, 2], 1: [2], 2: [0], 3: [2]}
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        dangling = sum(r[u] for u in range(n) if not out.get(u))
        nxt = np.full(n, (1 - d) / n + d * dangling / n)
        for u, vs in out.items():
            for v in vs:
                nxt[v] += d * r[u] / len(vs)
        r = nxt
    for node in range(n):
        assert got[node] == pytest.approx(r[node], abs=1e-7), node
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_iterative_residuals_report_convergence(spark, sf_dir):
    """r6 verdict #8: the iterative family exposes a final-round
    convergence signal — pagerank/seeded_ppr a per-node |Δrank| between
    the last two rounds, label_propagation a changed flag — so a user
    can judge whether the fixed round counts suffice on THEIR graph."""
    from autoaudit_spark.registry import QUERIES

    pr = QUERIES["pagerank"](spark, sf_dir).collect()
    assert all(r["residual"] >= 0 for r in pr)
    # 10 damped rounds: the residual must be far inside the rank scale
    assert max(r["residual"] for r in pr) < 0.1 * max(r["rank"] for r in pr)
    ppr = QUERIES["seeded_ppr"](spark, sf_dir).collect()
    assert all(r["residual"] >= 0 for r in ppr)
    lpa = QUERIES["label_propagation"](spark, sf_dir).collect()
    assert {r["changed"] for r in lpa} <= {0, 1}


class TestKCore:
    def test_core_invariants(self, spark, sf_dir):
        """Every surviving node has >= k strong-tie neighbors INSIDE the
        core (k-core definition), and the fixed 12-round peel is a
        genuine fixpoint (one more peel changes nothing)."""
        import collections

        from pyspark.sql import functions as F
        from autoaudit_spark.operators.graph import (
            K_CORE_K, K_CORE_MIN_MULT,
        )
        from autoaudit_spark.registry import QUERIES
        from autoaudit_spark.sources import edges as edges_src

        core = {r["node"] for r in QUERIES["k_core"](spark, sf_dir).collect()}
        e = edges_src(spark, sf_dir)
        und = (
            e.filter(F.col("src") != F.col("dst"))
            .select(
                F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"),
            )
            .groupBy("a", "b")
            .agg(F.count("*").alias("m"))
            .filter(F.col("m") >= K_CORE_MIN_MULT)
        )
        adj = collections.defaultdict(set)
        for r in und.collect():
            adj[r["a"]].add(r["b"])
            adj[r["b"]].add(r["a"])
        for n in core:
            assert len(adj[n] & core) >= K_CORE_K, n
        # fixpoint: nothing else peels
        again = {n for n in core if len(adj[n] & core) >= K_CORE_K}
        assert again == core


class TestNodeJaccardSalted:
    def test_salted_matches_unsalted_bit_exact(self, spark, sf_dir):
        """r6: node_jaccard_salted registers under the SAME oracle as
        node_jaccard, so the two forms must agree bit-exactly — every
        wedge meets exactly once in exactly one salt bucket."""
        from autoaudit_spark.registry import QUERIES

        a = [tuple(r) for r in QUERIES["node_jaccard"](spark, sf_dir).collect()]
        b = [
            tuple(r)
            for r in QUERIES["node_jaccard_salted"](spark, sf_dir).collect()
        ]
        assert a == b and len(a) > 0

    def test_salted_wedge_counts_on_crafted_hub(self, spark):
        """Hand-built hub: node 0 neighbors {1..5}, plus edge 1-2. Common
        counts via both wedge forms on the symmetric neighbor relation."""
        from autoaudit_spark.operators.graph import (
            wedge_common_counts,
            wedge_common_counts_salted,
        )

        und = [(0, n) for n in range(1, 6)] + [(1, 2)]
        nbr = spark.createDataFrame(
            und + [(b, a) for a, b in und], "node long, nb long"
        ).selectExpr("node", "nb")
        plain = {
            (r["u"], r["v"]): r["c"]
            for r in wedge_common_counts(nbr, min_common=1).collect()
        }
        salted = {
            (r["u"], r["v"]): r["c"]
            for r in wedge_common_counts_salted(nbr, min_common=1).collect()
        }
        assert plain == salted
        # pairs {1..5} all share neighbor 0; (1,2) additionally share
        # nothing else; 0 shares neighbor 2 with 1 and neighbor 1 with 2
        assert plain[(1, 2)] == 1
        assert plain[(3, 4)] == 1
        assert plain[(0, 1)] == 1 and plain[(0, 2)] == 1


class TestSeededPPR:
    def test_planted_star_propagates_suspicion(self, spark, tmp_path):
        """Planted smurf star 0→{10,11,12}→5 plus a disconnected edge
        20→21: the flagged seed set must be exactly {0}; suspicion mass
        must reach the mids and the sink and NOT the disconnected pair;
        total mass stays 1."""
        import datetime as dt

        from autoaudit_spark.registry import QUERIES

        t0 = dt.datetime(2024, 1, 1)
        pairs = [(0, 10), (0, 11), (0, 12), (10, 5), (11, 5), (12, 5), (20, 21)]
        rows = [
            (s, d, 1.0, t0 + dt.timedelta(hours=i))
            for i, (s, d) in enumerate(pairs)
        ]
        d = str(tmp_path / "ppr_star")
        spark.createDataFrame(
            rows, "user_id long, event_id long, value double, ts timestamp"
        ).write.parquet(f"{d}/events.parquet")

        out = {r["node"]: r for r in QUERIES["seeded_ppr"](spark, d).collect()}
        seeds = {n for n, r in out.items() if r["seed"] == 1}
        assert seeds == {0}
        assert abs(sum(r["ppr"] for r in out.values()) - 1.0) < 1e-6
        # the seed keeps the restart mass; mids share equally; the sink
        # accumulates two-hop mass; the disconnected pair gets none
        assert out[0]["ppr"] == max(r["ppr"] for r in out.values())
        assert out[10]["ppr"] == out[11]["ppr"] == out[12]["ppr"] > 0
        assert out[5]["ppr"] > 0
        assert out[20]["ppr"] == 0.0 and out[21]["ppr"] == 0.0

    def test_ppr_mass_conserved_on_testdata(self, spark, sf_dir):
        from autoaudit_spark.registry import QUERIES

        rows = QUERIES["seeded_ppr"](spark, sf_dir).collect()
        total = sum(r["ppr"] for r in rows)
        assert abs(total - 1.0) < 1e-5  # 8dp rounding × |nodes|
        assert any(r["seed"] == 1 for r in rows)
        # non-seed nodes must receive propagated mass
        assert any(r["seed"] == 0 and r["ppr"] > 0 for r in rows)


class TestKTruss:
    def test_truss_invariants_and_fixpoint(self, spark, tmp_path):
        """Planted case through the events seam: a 5-clique of strong
        ties (every edge in 3 triangles) survives the 3-truss; a pendant
        strong edge and a strong path (no triangles) peel away. One more
        peel changes nothing (fixpoint)."""
        import datetime as dt

        from pyspark.sql import functions as F
        from autoaudit_spark.operators.graph import (
            K_CORE_MIN_MULT, K_TRUSS, edge_support,
        )
        from autoaudit_spark.registry import QUERIES

        clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
        extras = [(0, 50), (60, 61), (61, 62)]  # pendant + path
        t0 = dt.datetime(2024, 1, 1)
        rows = []
        i = 0
        for a, b in clique + extras:
            for _ in range(K_CORE_MIN_MULT):  # strong ties
                rows.append((a, b, 1.0, t0 + dt.timedelta(hours=i)))
                i += 1
        d = str(tmp_path / "truss")
        spark.createDataFrame(
            rows, "user_id long, event_id long, value double, ts timestamp"
        ).write.parquet(f"{d}/events.parquet")

        got = {(r["a"], r["b"]): r["support"]
               for r in QUERIES["k_truss"](spark, d).collect()}
        assert set(got) == set(clique)
        assert all(s == 3 for s in got.values())  # 5-clique: 3 per edge

        # fixpoint: one more peel on the surviving edges changes nothing
        e = spark.createDataFrame(list(got), "a long, b long")
        peeled = (
            e.join(edge_support(e), ["a", "b"])
            .filter(F.col("s") >= K_TRUSS - 2)
            .count()
        )
        assert peeled == len(got)

    def test_truss_is_nonvacuous_at_driver_scale(self, spark):
        """sf0.01 (the driver's correctness scale) keeps a real truss —
        the peel bites (fewer edges than the strong-tie graph) without
        unravelling to empty."""
        from pyspark.sql import functions as F
        from autoaudit_spark.operators.graph import K_CORE_MIN_MULT
        from autoaudit_spark.registry import QUERIES
        from autoaudit_spark.sources import edges as edges_src

        sf = "/root/testdata/sf0.01"
        rows = QUERIES["k_truss"](spark, sf).collect()
        assert rows
        assert all(r["support"] >= 1 for r in rows)
        strong = (
            edges_src(spark, sf)
            .filter(F.col("src") != F.col("dst"))
            .select(F.least("src", "dst").alias("a"),
                    F.greatest("src", "dst").alias("b"))
            .groupBy("a", "b").count()
            .filter(F.col("count") >= K_CORE_MIN_MULT)
            .count()
        )
        assert 0 < len(rows) < strong


class TestConnectedComponentsConvergenceGuard:
    def test_non_convergence_raises_loudly(self, spark):
        """Review r7: a chain longer than max_iter must RAISE, not
        silently return non-converged labels that diverge from the
        closure oracle and mis-split dedup clusters."""
        from autoaudit_spark.operators.graph import connected_components

        path = [(i, i + 1) for i in range(10)]
        adj = spark.createDataFrame(path, "src long, dst long")
        with pytest.raises(ValueError, match="did not converge"):
            connected_components(adj, max_iter=5)
        # and with enough rounds the same chain converges to one label;
        # rounds_used = eccentricity of the min node (10 hops for the
        # 11-node path) + the confirming no-change round
        rows = connected_components(adj, max_iter=15).collect()
        got = {r["node"]: r["component"] for r in rows}
        assert set(got.values()) == {0}
        assert {r["rounds_used"] for r in rows} == {11}


class TestPointerJumpingCC:
    def test_long_chain_converges_in_log_rounds(self, spark):
        """X66: a 200-node path converges in 10 jump rounds (measured);
        plain hash-min would need 199 and raises its convergence guard."""
        from autoaudit_spark.operators.graph import (
            connected_components,
            connected_components_jump,
        )

        path = [(i, i + 1) for i in range(200)]
        adj = spark.createDataFrame(path, "src long, dst long")
        rows = connected_components_jump(adj, max_iter=10).collect()
        got = {r["node"]: r["component"] for r in rows}
        assert set(got.values()) == {0} and len(got) == 201
        # r8: the convergence column records the measured O(log d) count
        assert {r["rounds_used"] for r in rows} == {10}
        with pytest.raises(ValueError, match="did not converge"):
            connected_components(adj, max_iter=50)

    def test_matches_plain_cc_on_fixture(self, spark, sf_dir):
        """Labelings identical across variants; rounds_used is each
        algorithm's own (constant per result, >= 1) — the jump form
        never needs more rounds than plain hash-min."""
        from autoaudit_spark.registry import QUERIES

        ra = QUERIES["connected_components"](spark, sf_dir).collect()
        rb = QUERIES["connected_components_jump"](spark, sf_dir).collect()
        a = [(r["node"], r["component"]) for r in ra]
        b = [(r["node"], r["component"]) for r in rb]
        assert a == b and a
        (rounds_a,) = {r["rounds_used"] for r in ra}
        (rounds_b,) = {r["rounds_used"] for r in rb}
        assert 1 <= rounds_b <= rounds_a


class TestTwoStarCC:
    def test_long_chain_converges(self, spark):
        """X69: the edge-rewriting form also beats plain hash-min's
        O(diameter) bound — a 200-node path converges well inside the
        default 30 alternating rounds."""
        from autoaudit_spark.operators.graph import connected_components_twostar

        path = [(i, i + 1) for i in range(200)]
        adj = spark.createDataFrame(path, "src long, dst long")
        got = {
            r["node"]: r["component"]
            for r in connected_components_twostar(adj).collect()
        }
        assert set(got.values()) == {0} and len(got) == 201

    def test_multi_component_and_degenerates(self, spark):
        """Star-set labeling covers the degenerate shapes: an isolated
        self-loop node labels itself, a 2-node component labels at its
        min, components don't bleed into each other."""
        from autoaudit_spark.operators.graph import connected_components_twostar

        edges = [(0, 1), (1, 2), (5, 6), (6, 7), (7, 5), (10, 11), (42, 42)]
        adj = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["component"]
               for r in connected_components_twostar(adj).collect()}
        assert got == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5, 7: 5,
                       10: 10, 11: 10, 42: 42}

    def test_non_convergence_raises_loudly(self, spark):
        from autoaudit_spark.operators.graph import connected_components_twostar

        path = [(i, i + 1) for i in range(200)]
        adj = spark.createDataFrame(path, "src long, dst long")
        with pytest.raises(ValueError, match="did not converge"):
            connected_components_twostar(adj, max_iter=2)

    def test_matches_plain_cc_on_fixture(self, spark, sf_dir):
        from autoaudit_spark.registry import QUERIES

        ra = QUERIES["connected_components"](spark, sf_dir).collect()
        rc = QUERIES["connected_components_twostar"](spark, sf_dir).collect()
        a = [(r["node"], r["component"]) for r in ra]
        c = [(r["node"], r["component"]) for r in rc]
        assert a == c and a
        (rounds_c,) = {r["rounds_used"] for r in rc}
        assert rounds_c >= 1


class TestWeightedPPR:
    def test_mass_conserved_and_seed_present(self, spark, sf_dir):
        from autoaudit_spark.registry import QUERIES

        rows = QUERIES["seeded_ppr_weighted"](spark, sf_dir).collect()
        assert abs(sum(r["wppr"] for r in rows) - 1.0) < 1e-5
        assert any(r["seed"] == 1 for r in rows)
        assert all(r["residual"] >= 0 for r in rows)

    def test_value_weighting_reorders_suspicion(self, spark, tmp_path):
        """X67's point: equal edge COUNTS but unequal VALUE moved — the
        weighted PPR concentrates suspicion on the big-money path while
        the count form scores the mids equally."""
        import datetime as dt

        from autoaudit_spark.registry import QUERIES

        t0 = dt.datetime(2024, 1, 1)
        # seed star 0 -> {10,11,12} -> 5 (flagship flags src 0);
        # one edge each, but 10 carries 1000.00 and 11/12 carry 1.00
        pairs = [
            (0, 10, 1000.0), (0, 11, 1.0), (0, 12, 1.0),
            (10, 5, 1000.0), (11, 5, 1.0), (12, 5, 1.0),
        ]
        rows = [
            (s, d, v, t0 + dt.timedelta(hours=i))
            for i, (s, d, v) in enumerate(pairs)
        ]
        d = str(tmp_path / "wppr_star")
        spark.createDataFrame(
            rows, "user_id long, event_id long, value double, ts timestamp"
        ).write.parquet(f"{d}/events.parquet")

        w = {r["node"]: r["wppr"]
             for r in QUERIES["seeded_ppr_weighted"](spark, d).collect()}
        c = {r["node"]: r["ppr"]
             for r in QUERIES["seeded_ppr"](spark, d).collect()}
        # count form: the three mids are symmetric
        assert c[10] == c[11] == c[12]
        # weighted form: the 1000.00 conduit dominates its siblings
        assert w[10] > 10 * w[11] and w[11] == w[12]


class TestHits:
    def test_matches_numpy_iteration(self, spark):
        """X70's semantics pinned against a dense NumPy HITS with L1
        normalization per half-step (same convention as the operator)."""
        import numpy as np

        from autoaudit_spark.operators.graph import HITS_ITERS, hits_scores

        edges = [(0, 2), (1, 2), (3, 2), (2, 4), (0, 4), (4, 0)]
        adj = spark.createDataFrame(edges, "src long, dst long")
        rows = hits_scores(adj).collect()
        got_a = {r["node"]: r["authority"] for r in rows}
        got_h = {r["node"]: r["hub"] for r in rows}

        n = 5
        A = np.zeros((n, n))
        for u, v in edges:
            A[u, v] = 1.0
        h = np.full(n, 1.0 / n)
        a = np.zeros(n)
        for _ in range(HITS_ITERS):
            a = A.T @ h
            a = a / a.sum()
            h = A @ a
            h = h / h.sum()
        for node in range(n):
            assert got_a[node] == pytest.approx(a[node], abs=1e-7), node
            assert got_h[node] == pytest.approx(h[node], abs=1e-7), node

    def test_rejects_nonpositive_iters(self, spark):
        """r8 ADVICE: iters=0 would return unnormalized init state and
        leak the persisted init handle — must raise before any job."""
        from autoaudit_spark.operators.graph import hits_scores

        adj = spark.createDataFrame([(0, 1)], "src long, dst long")
        with pytest.raises(ValueError, match="iters >= 1"):
            hits_scores(adj, iters=0)

    def test_hub_authority_split_on_fixture(self, spark, sf_dir):
        """Both score vectors are L1 distributions, carry a convergence
        residual, and genuinely rank differently (sources vs sinks)."""
        from autoaudit_spark.registry import QUERIES

        rows = QUERIES["hits_scores"](spark, sf_dir).collect()
        assert abs(sum(r["authority"] for r in rows) - 1.0) < 1e-5
        assert abs(sum(r["hub"] for r in rows) - 1.0) < 1e-5
        assert all(r["residual"] >= 0 for r in rows)
        top_a = max(rows, key=lambda r: (r["authority"], -r["node"]))
        top_h = max(rows, key=lambda r: (r["hub"], -r["node"]))
        assert top_a["node"] != top_h["node"]


class TestWeightedPagerank:
    def test_matches_numpy_weighted_power_iteration(self, spark, tmp_path):
        """X68's semantics pinned against a dense NumPy power iteration
        with value-proportional transition probabilities (d=0.85,
        uniform teleport + uniform dangling redistribution, 10 iters)."""
        import datetime as dt

        import numpy as np

        from autoaudit_spark.registry import QUERIES

        t0 = dt.datetime(2024, 1, 1)
        pairs = [
            (0, 1, 10.0), (0, 2, 30.0), (1, 2, 5.0),
            (2, 0, 7.5), (3, 2, 2.25),
        ]  # node 1's two out-edges are NOT equal mass: P(0→2)=0.75
        rows = [
            (s, d, v, t0 + dt.timedelta(hours=i))
            for i, (s, d, v) in enumerate(pairs)
        ]
        d = str(tmp_path / "wpr")
        spark.createDataFrame(
            rows, "user_id long, event_id long, value double, ts timestamp"
        ).write.parquet(f"{d}/events.parquet")

        got = {
            r["node"]: r["wrank"]
            for r in QUERIES["pagerank_weighted"](spark, d).collect()
        }

        n, damp = 4, 0.85
        w = {(0, 1): 10.0, (0, 2): 30.0, (1, 2): 5.0, (2, 0): 7.5, (3, 2): 2.25}
        ow = {0: 40.0, 1: 5.0, 2: 7.5, 3: 2.25}
        r = np.full(n, 1.0 / n)
        for _ in range(10):
            nxt = np.full(n, (1 - damp) / n)  # no dangling node here
            for (u, v), wt in w.items():
                nxt[v] += damp * r[u] * wt / ow[u]
            r = nxt
        for node in range(n):
            assert got[node] == pytest.approx(r[node], abs=1e-7), node
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)

    def test_value_vs_count_rank_disagree(self, spark, sf_dir):
        """The audit point: value-weighted and count-based global ranks
        must produce a DIFFERENT ordering on the real fixture (else the
        weighting adds nothing), while both conserve unit mass."""
        from autoaudit_spark.registry import QUERIES

        wr = {r["node"]: r["wrank"]
              for r in QUERIES["pagerank_weighted"](spark, sf_dir).collect()}
        cr = {r["node"]: r["rank"]
              for r in QUERIES["pagerank"](spark, sf_dir).collect()}
        assert set(wr) == set(cr)
        assert abs(sum(wr.values()) - 1.0) < 1e-5
        w_order = sorted(wr, key=lambda k: (-wr[k], k))
        c_order = sorted(cr, key=lambda k: (-cr[k], k))
        assert w_order != c_order


class TestButterflyCounts:
    def test_planted_k23_plus_noise(self, spark, tmp_path):
        """K_{2,3} (two accounts x three shared counterparties) holds
        C(3,2)*C(2,2) = 3 butterflies — every dst sits in exactly 2 of
        them; a third account touching only ONE of the dsts adds no
        butterfly and must not appear."""
        import datetime as dt

        from autoaudit_spark.registry import QUERIES

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        i = 0
        for s in (1000, 1001):
            for d in (10, 11, 12):
                rows.append((s, d, 1.0, t0 + dt.timedelta(hours=i)))
                i += 1
        rows.append((2000, 10, 1.0, t0 + dt.timedelta(hours=i)))  # noise
        d = str(tmp_path / "bf")
        spark.createDataFrame(
            rows, "user_id long, event_id long, value double, ts timestamp"
        ).write.parquet(f"{d}/events.parquet")

        got = {r["node"]: r["butterflies"]
               for r in QUERIES["butterfly_counts"](spark, d).collect()}
        assert got == {10: 2, 11: 2, 12: 2}

    def test_brute_force_parity_sf0001(self, spark):
        """Independent implementation: per-dst butterfly counts from
        Python set intersections over all dst pairs must match the
        src-side wedge aggregation exactly (whole relation, sf0.001)."""
        from collections import defaultdict
        from itertools import combinations

        from autoaudit_spark.registry import QUERIES
        from autoaudit_spark.sources import adjacency

        sf = "/root/testdata/sf0.001"
        nbrs = defaultdict(set)
        for r in adjacency(spark, sf).collect():
            nbrs[r["dst"]].add(r["src"])
        expect = defaultdict(int)
        for d1, d2 in combinations(sorted(nbrs), 2):
            c = len(nbrs[d1] & nbrs[d2])
            if c >= 2:
                nb = c * (c - 1) // 2
                expect[d1] += nb
                expect[d2] += nb
        got = {r["node"]: r["butterflies"]
               for r in QUERIES["butterfly_counts"](spark, sf).collect()}
        assert got == dict(expect)

    def test_salted_twin_bit_identical(self, spark):
        """The registered skew twin must agree bitwise with the
        unsalted form on the real fixture (skewprobe asserts the same
        on the planted bulk-payer fixture)."""
        from autoaudit_spark.registry import QUERIES

        sf = "/root/testdata/sf0.001"
        a = [tuple(r) for r in QUERIES["butterfly_counts"](spark, sf).collect()]
        b = [tuple(r) for r in
             QUERIES["butterfly_counts_salted"](spark, sf).collect()]
        assert a == b


class TestKTrussWindowed:
    def test_planted_transient_clique(self, spark, tmp_path):
        """A K4 ring active only in slide-slot k: its 6 edges are
        strong (mult 2) in the two windows covering slot k and each
        sits in 2 in-window triangles; in the NEXT slot only one pair
        stays active, so the window starting at slot k+1's boundary
        has a strong edge but no triangle — it must peel to nothing
        (cohesion that appears and dissolves)."""
        import datetime as dt

        from autoaudit_spark.operators.graph import _WT_SLIDE_US
        from autoaudit_spark.registry import QUERIES

        t = dt.datetime(2024, 3, 1)
        e_us = int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        slot_us = (e_us // _WT_SLIDE_US) * _WT_SLIDE_US
        slot = dt.datetime.fromtimestamp(
            slot_us / 1_000_000, dt.timezone.utc
        ).replace(tzinfo=None)
        slide = dt.timedelta(microseconds=_WT_SLIDE_US)

        rows = []
        i = 0
        clique = [1, 2, 3, 4]
        for a in clique:
            for b in clique:
                if a < b:
                    for _ in range(2):  # mult 2 >= WT_MIN_MULT
                        rows.append((a, b, 1.0, slot + dt.timedelta(hours=i)))
                        i += 1
        # next slot: only the (1, 2) pair remains active
        rows.append((1, 2, 1.0, slot + slide + dt.timedelta(hours=1)))
        rows.append((1, 2, 1.0, slot + slide + dt.timedelta(hours=2)))
        d = str(tmp_path / "wt")
        spark.createDataFrame(
            rows, "user_id long, event_id long, value double, ts timestamp"
        ).write.parquet(f"{d}/events.parquet")

        got = {
            (r["window_start"], r["a"], r["b"]): r["support"]
            for r in QUERIES["k_truss_windowed"](spark, d).collect()
        }
        pairs = [(a, b) for a in clique for b in clique if a < b]
        # the clique survives in BOTH windows covering slot k (sliding
        # windows w_{k-1} and w_k); every K4 edge sits in 2 triangles
        expect = {
            (w, a, b): 2
            for w in (slot - slide, slot)
            for (a, b) in pairs
        }
        assert got == expect  # in particular: nothing from slot k+1

    def test_matches_global_truss_on_single_window_data(self, spark, tmp_path):
        """Windowing is the only delta vs X65: when every event falls in
        one slide slot, each window's truss equals the global truss of
        the same strong graph at the windowed threshold."""
        import datetime as dt

        from autoaudit_spark.operators.graph import _WT_SLIDE_US
        from autoaudit_spark.registry import QUERIES

        t = dt.datetime(2024, 5, 10)
        e_us = int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        slot_us = (e_us // _WT_SLIDE_US) * _WT_SLIDE_US
        slot = dt.datetime.fromtimestamp(
            slot_us / 1_000_000, dt.timezone.utc
        ).replace(tzinfo=None)

        # K4 on {1..4} (truss core) + a pendant strong pair (5, 6)
        rows = []
        i = 0
        for a, b in [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 6)]:
            for _ in range(2):
                rows.append((a, b, 1.0, slot + dt.timedelta(minutes=i)))
                i += 1
        d = str(tmp_path / "wt1")
        spark.createDataFrame(
            rows, "user_id long, event_id long, value double, ts timestamp"
        ).write.parquet(f"{d}/events.parquet")

        out = QUERIES["k_truss_windowed"](spark, d).collect()
        wins = {r["window_start"] for r in out}
        assert len(wins) == 2  # both sliding windows covering the slot
        for w in wins:
            edges = {(r["a"], r["b"]): r["support"]
                     for r in out if r["window_start"] == w}
            assert edges == {(1, 2): 2, (1, 3): 2, (1, 4): 2,
                             (2, 3): 2, (2, 4): 2, (3, 4): 2}


class TestTrussDissolution:
    def test_planted_appear_then_dissolve(self, spark, tmp_path):
        """Clique A (K4 on 1-4) active in slot k, clique B (K4 on
        11-14) active in slot k+1. Window k's truss holds BOTH; window
        k+1 holds only B. A's edges must be reported dissolved AT
        window k (their last truss appearance before vanishing), and
        nothing else: window k-1's A edges persist into window k, B
        persists into the final window, and the final window has no
        successor to compare against."""
        import datetime as dt

        from autoaudit_spark.operators.graph import _WT_SLIDE_US
        from autoaudit_spark.registry import QUERIES

        t = dt.datetime(2024, 3, 1)
        e_us = int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        slot_us = (e_us // _WT_SLIDE_US) * _WT_SLIDE_US
        slot = dt.datetime.fromtimestamp(
            slot_us / 1_000_000, dt.timezone.utc
        ).replace(tzinfo=None)
        slide = dt.timedelta(microseconds=_WT_SLIDE_US)

        rows, i = [], 0
        for base, clique in ((slot, [1, 2, 3, 4]),
                             (slot + slide, [11, 12, 13, 14])):
            for a in clique:
                for b in clique:
                    if a < b:
                        for _ in range(2):  # mult 2 >= WT_MIN_MULT
                            rows.append(
                                (a, b, 1.0, base + dt.timedelta(minutes=i))
                            )
                            i += 1
        d = str(tmp_path / "tdis")
        spark.createDataFrame(
            rows, "user_id long, event_id long, value double, ts timestamp"
        ).write.parquet(f"{d}/events.parquet")

        # sanity: the windowed truss sees A in windows k-1 and k, B in
        # windows k and k+1
        wt = {(r["window_start"], r["a"], r["b"])
              for r in QUERIES["k_truss_windowed"](spark, d).collect()}
        a_pairs = [(x, y) for x in (1, 2, 3, 4) for y in (1, 2, 3, 4) if x < y]
        b_pairs = [(x, y) for x in (11, 12, 13, 14)
                   for y in (11, 12, 13, 14) if x < y]
        assert wt == (
            {(w, x, y) for w in (slot - slide, slot) for (x, y) in a_pairs}
            | {(w, x, y) for w in (slot, slot + slide) for (x, y) in b_pairs}
        )

        got = {
            (r["window_start"], r["a"], r["b"]): r["support"]
            for r in QUERIES["truss_dissolution"](spark, d).collect()
        }
        assert got == {(slot, x, y): 2 for (x, y) in a_pairs}

    def test_total_collapse_of_last_truss_is_reported(self, spark, tmp_path):
        """r10 review: the observability bound must come from the DATA
        windows, not the truss output. Clique A active only in slot k,
        then nothing but a lone (truss-free) noise event two slots
        later: every later truss is EMPTY, yet the data covers window
        k+1, so A's total collapse at window k is observable and must
        be reported (a truss-derived max would return zero rows)."""
        import datetime as dt

        from autoaudit_spark.operators.graph import _WT_SLIDE_US
        from autoaudit_spark.registry import QUERIES

        t = dt.datetime(2024, 3, 1)
        e_us = int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        slot_us = (e_us // _WT_SLIDE_US) * _WT_SLIDE_US
        slot = dt.datetime.fromtimestamp(
            slot_us / 1_000_000, dt.timezone.utc
        ).replace(tzinfo=None)
        slide = dt.timedelta(microseconds=_WT_SLIDE_US)

        rows, i = [], 0
        a_pairs = [(x, y) for x in (1, 2, 3, 4) for y in (1, 2, 3, 4) if x < y]
        for a, b in a_pairs:
            for _ in range(2):  # mult 2 >= WT_MIN_MULT
                rows.append((a, b, 1.0, slot + dt.timedelta(minutes=i)))
                i += 1
        # lone noise event (mult 1 — never a strong tie) extends data
        # coverage two slots past the clique
        rows.append((50, 60, 1.0, slot + 2 * slide))
        d = str(tmp_path / "tcol")
        spark.createDataFrame(
            rows, "user_id long, event_id long, value double, ts timestamp"
        ).write.parquet(f"{d}/events.parquet")

        got = {
            (r["window_start"], r["a"], r["b"]): r["support"]
            for r in QUERIES["truss_dissolution"](spark, d).collect()
        }
        # A holds the truss in windows k-1 and k; window k+1 is truss-
        # empty but data-covered → A dissolves AT window k
        assert got == {(slot, x, y): 2 for (x, y) in a_pairs}


class TestKCoreWindowed:
    def test_planted_transient_core(self, spark, tmp_path):
        """A K7 active only in slide-slot k (each node's in-window
        strong degree is exactly K_CORE_K = 6) plus a pendant strong
        pair: the pendant peels (degree 1), the K7 holds in BOTH
        windows covering slot k; in the next slot only one pair stays
        active, so nothing survives there — the transient-ring
        lifecycle the operator exists to expose."""
        import datetime as dt

        from autoaudit_spark.operators.graph import _WT_SLIDE_US
        from autoaudit_spark.registry import QUERIES

        t = dt.datetime(2024, 3, 1)
        e_us = int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        slot_us = (e_us // _WT_SLIDE_US) * _WT_SLIDE_US
        slot = dt.datetime.fromtimestamp(
            slot_us / 1_000_000, dt.timezone.utc
        ).replace(tzinfo=None)
        slide = dt.timedelta(microseconds=_WT_SLIDE_US)

        rows = []
        i = 0
        clique = [1, 2, 3, 4, 5, 6, 7]
        for a in clique:
            for b in clique:
                if a < b:
                    for _ in range(2):  # mult 2 >= WT_MIN_MULT
                        rows.append((a, b, 1.0, slot + dt.timedelta(minutes=i)))
                        i += 1
        # pendant strong pair — must peel in round 1 (degree 1 < 6)
        for _ in range(2):
            rows.append((8, 9, 1.0, slot + dt.timedelta(minutes=i)))
            i += 1
        # next slot: only the (1, 2) pair remains active
        rows.append((1, 2, 1.0, slot + slide + dt.timedelta(hours=1)))
        rows.append((1, 2, 1.0, slot + slide + dt.timedelta(hours=2)))
        d = str(tmp_path / "kcw")
        spark.createDataFrame(
            rows, "user_id long, event_id long, value double, ts timestamp"
        ).write.parquet(f"{d}/events.parquet")

        got = {
            (r["window_start"], r["node"])
            for r in QUERIES["k_core_windowed"](spark, d).collect()
        }
        expect = {
            (w, n) for w in (slot - slide, slot) for n in clique
        }
        assert got == expect  # pendant gone, nothing from slot k+1

    def test_one_node_short_clique_peels_to_nothing(self, spark, tmp_path):
        """K6 (degree 5 < K_CORE_K = 6 everywhere) must vanish — the
        threshold is strict, and the cascade empties the window."""
        import datetime as dt

        from autoaudit_spark.operators.graph import _WT_SLIDE_US
        from autoaudit_spark.registry import QUERIES

        t = dt.datetime(2024, 3, 1)
        e_us = int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        slot_us = (e_us // _WT_SLIDE_US) * _WT_SLIDE_US
        slot = dt.datetime.fromtimestamp(
            slot_us / 1_000_000, dt.timezone.utc
        ).replace(tzinfo=None)
        rows, i = [], 0
        for a in range(1, 7):
            for b in range(a + 1, 7):
                for _ in range(2):
                    rows.append((a, b, 1.0, slot + dt.timedelta(minutes=i)))
                    i += 1
        d = str(tmp_path / "kcw6")
        spark.createDataFrame(
            rows, "user_id long, event_id long, value double, ts timestamp"
        ).write.parquet(f"{d}/events.parquet")
        assert QUERIES["k_core_windowed"](spark, d).count() == 0


class TestKCoreDissolution:
    def test_planted_appear_then_dissolve(self, spark, tmp_path):
        """K7 cell A (nodes 1-7) active in slot k, K7 cell B (nodes
        11-17) active in slot k+1. Window k's core holds BOTH; window
        k+1 holds only B. A's nodes must be reported dissolved AT
        window k (their last in-core window before vanishing), and
        nothing else: window k-1's A nodes persist into window k, and
        B's dissolutions at window k+1 are unobservable (the data's
        last window)."""
        import datetime as dt

        from autoaudit_spark.operators.graph import _WT_SLIDE_US
        from autoaudit_spark.registry import QUERIES

        t = dt.datetime(2024, 3, 1)
        e_us = int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        slot_us = (e_us // _WT_SLIDE_US) * _WT_SLIDE_US
        slot = dt.datetime.fromtimestamp(
            slot_us / 1_000_000, dt.timezone.utc
        ).replace(tzinfo=None)
        slide = dt.timedelta(microseconds=_WT_SLIDE_US)

        rows, i = [], 0
        a_clique = [1, 2, 3, 4, 5, 6, 7]
        b_clique = [11, 12, 13, 14, 15, 16, 17]
        for base, clique in ((slot, a_clique), (slot + slide, b_clique)):
            for a in clique:
                for b in clique:
                    if a < b:
                        for _ in range(2):  # mult 2 >= WT_MIN_MULT
                            rows.append(
                                (a, b, 1.0, base + dt.timedelta(minutes=i))
                            )
                            i += 1
        d = str(tmp_path / "kcd")
        spark.createDataFrame(
            rows, "user_id long, event_id long, value double, ts timestamp"
        ).write.parquet(f"{d}/events.parquet")

        # sanity: the windowed core sees A in windows k-1 and k, B in
        # windows k and k+1
        kc = {(r["window_start"], r["node"])
              for r in QUERIES["k_core_windowed"](spark, d).collect()}
        assert kc == (
            {(w, n) for w in (slot - slide, slot) for n in a_clique}
            | {(w, n) for w in (slot, slot + slide) for n in b_clique}
        )

        got = {
            (r["window_start"], r["node"])
            for r in QUERIES["k_core_dissolution"](spark, d).collect()
        }
        assert got == {(slot, n) for n in a_clique}

    def test_total_collapse_of_last_core_is_reported(self, spark, tmp_path):
        """The X89 review lesson, node-side: the observability bound
        must come from the DATA windows, not the core output. K7 cell
        active only in slot k, then nothing but a lone (core-free)
        noise event two slots later: every later core is EMPTY, yet
        the data covers window k+1, so the cell's total collapse at
        window k is observable and must be reported (a core-derived
        max would return zero rows)."""
        import datetime as dt

        from autoaudit_spark.operators.graph import _WT_SLIDE_US
        from autoaudit_spark.registry import QUERIES

        t = dt.datetime(2024, 3, 1)
        e_us = int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        slot_us = (e_us // _WT_SLIDE_US) * _WT_SLIDE_US
        slot = dt.datetime.fromtimestamp(
            slot_us / 1_000_000, dt.timezone.utc
        ).replace(tzinfo=None)
        slide = dt.timedelta(microseconds=_WT_SLIDE_US)

        rows, i = [], 0
        clique = [1, 2, 3, 4, 5, 6, 7]
        for a in clique:
            for b in clique:
                if a < b:
                    for _ in range(2):  # mult 2 >= WT_MIN_MULT
                        rows.append((a, b, 1.0, slot + dt.timedelta(minutes=i)))
                        i += 1
        # lone noise event (mult 1 — never a strong tie) extends data
        # coverage two slots past the cell
        rows.append((50, 60, 1.0, slot + 2 * slide))
        d = str(tmp_path / "kcol")
        spark.createDataFrame(
            rows, "user_id long, event_id long, value double, ts timestamp"
        ).write.parquet(f"{d}/events.parquet")

        got = {
            (r["window_start"], r["node"])
            for r in QUERIES["k_core_dissolution"](spark, d).collect()
        }
        # the cell holds the core in windows k-1 and k; window k+1 is
        # core-empty but data-covered → it dissolves AT window k
        assert got == {(slot, n) for n in clique}


class TestCoreFormation:
    """Pre-built r12+ birth candidate (NOT yet registered — the r11
    window-capacity note): the dissolution mirror. Driven through the
    `core_formation` function directly."""

    def test_planted_spin_up_is_reported_once(self, spark, tmp_path):
        """A lone noise event two slots BEFORE a K7 cell extends data
        coverage backward: the cell's windows are k-1 and k, window
        k-2's core is empty but data-covered, so the cell FORMS at
        window k-1 (its first in-core window) and nowhere else —
        window k's predecessor (k-1) already holds it."""
        import datetime as dt

        from autoaudit_spark.operators.graph import (
            _WT_SLIDE_US,
            core_formation,
        )

        t = dt.datetime(2024, 3, 1)
        e_us = int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        slot_us = (e_us // _WT_SLIDE_US) * _WT_SLIDE_US
        slot = dt.datetime.fromtimestamp(
            slot_us / 1_000_000, dt.timezone.utc
        ).replace(tzinfo=None)
        slide = dt.timedelta(microseconds=_WT_SLIDE_US)

        rows, i = [], 0
        clique = [1, 2, 3, 4, 5, 6, 7]
        for a in clique:
            for b in clique:
                if a < b:
                    for _ in range(2):  # mult 2 >= WT_MIN_MULT
                        rows.append((a, b, 1.0, slot + dt.timedelta(minutes=i)))
                        i += 1
        # lone noise event (mult 1 — never a strong tie) extends data
        # coverage two slots BEFORE the cell
        rows.append((50, 60, 1.0, slot - 2 * slide))
        d = str(tmp_path / "kform")
        spark.createDataFrame(
            rows, "user_id long, event_id long, value double, ts timestamp"
        ).write.parquet(f"{d}/events.parquet")

        got = {
            (r["window_start"], r["node"])
            for r in core_formation(spark, d).collect()
        }
        assert got == {(slot - slide, n) for n in clique}

    def test_first_window_formation_is_unobservable(self, spark, tmp_path):
        """A K7 cell with NO earlier data: its first in-core window IS
        the data's first window, so no predecessor report exists and
        nothing may be reported formed (the cell may predate coverage
        — the X89 observability lesson, sign flipped)."""
        import datetime as dt

        from autoaudit_spark.operators.graph import (
            _WT_SLIDE_US,
            core_formation,
        )

        t = dt.datetime(2024, 3, 1)
        e_us = int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        slot_us = (e_us // _WT_SLIDE_US) * _WT_SLIDE_US
        slot = dt.datetime.fromtimestamp(
            slot_us / 1_000_000, dt.timezone.utc
        ).replace(tzinfo=None)
        rows, i = [], 0
        clique = [1, 2, 3, 4, 5, 6, 7]
        for a in clique:
            for b in clique:
                if a < b:
                    for _ in range(2):
                        rows.append((a, b, 1.0, slot + dt.timedelta(minutes=i)))
                        i += 1
        d = str(tmp_path / "kform0")
        spark.createDataFrame(
            rows, "user_id long, event_id long, value double, ts timestamp"
        ).write.parquet(f"{d}/events.parquet")
        assert core_formation(spark, d).count() == 0


class TestCorePersistence:
    """Pre-built r12 birth candidate (NOT yet registered — the window
    capacity note): maximal consecutive-window core runs. Driven
    through the `persistence` kernel and the `core_persistence`
    composition directly."""

    def test_kernel_islands_split_on_gaps(self, spark):
        """Hand-planted islands: node 1 holds slots {0,1,2, 4,5} →
        runs (0..2, 3 windows) and (4..5, 2); node 2 holds {3} → one
        1-window run. The slide-aligned slot arithmetic must split
        exactly at the gap and nowhere else."""
        import datetime as dt

        from autoaudit_spark.operators.graph import (
            _WT_SLIDE_US,
            persistence,
        )

        base_us = (
            int(
                dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc).timestamp()
                * 1_000_000
            )
            // _WT_SLIDE_US
        ) * _WT_SLIDE_US

        def w(slot):
            return dt.datetime.fromtimestamp(
                (base_us + slot * _WT_SLIDE_US) / 1_000_000, dt.timezone.utc
            ).replace(tzinfo=None)

        rows = [(w(s), 1) for s in (0, 1, 2, 4, 5)] + [(w(3), 2)]
        rel = spark.createDataFrame(
            rows, "window_start timestamp, node long"
        )
        got = [
            (r["node"], r["run_start"], r["run_end"], r["n_windows"])
            for r in persistence(rel, ("node",)).collect()
        ]
        assert got == [
            (1, w(0), w(2), 3),
            (1, w(4), w(5), 2),
            (2, w(3), w(3), 1),
        ]

    def test_planted_cell_reports_one_two_window_run(self, spark, tmp_path):
        """A K7 cell with all events in one slot holds the core in the
        two windows covering that slot (slot−slide and slot) — one run
        per node: (node, slot−slide, slot, 2). Same fixture family as
        the formation/dissolution planted tests."""
        import datetime as dt

        from autoaudit_spark.operators.graph import (
            _WT_SLIDE_US,
            core_persistence,
        )

        t = dt.datetime(2024, 3, 1)
        e_us = int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        slot_us = (e_us // _WT_SLIDE_US) * _WT_SLIDE_US
        slot = dt.datetime.fromtimestamp(
            slot_us / 1_000_000, dt.timezone.utc
        ).replace(tzinfo=None)
        slide = dt.timedelta(microseconds=_WT_SLIDE_US)

        rows, i = [], 0
        clique = [1, 2, 3, 4, 5, 6, 7]
        for a in clique:
            for b in clique:
                if a < b:
                    for _ in range(2):  # mult 2 >= WT_MIN_MULT
                        rows.append((a, b, 1.0, slot + dt.timedelta(minutes=i)))
                        i += 1
        d = str(tmp_path / "kpers")
        spark.createDataFrame(
            rows, "user_id long, event_id long, value double, ts timestamp"
        ).write.parquet(f"{d}/events.parquet")

        got = {
            (r["node"], r["run_start"], r["run_end"], r["n_windows"])
            for r in core_persistence(spark, d).collect()
        }
        assert got == {(n, slot - slide, slot, 2) for n in clique}


class TestButterflySrc:
    def test_planted_k23_flips_sides(self, spark, tmp_path):
        """Same K_{2,3}+noise fixture as X72's planted test: 3
        butterflies total; per-SRC each of the two payers sits in all
        3 (vs per-dst 2 each) and the single-edge noise account holds
        none."""
        import datetime as dt

        from autoaudit_spark.registry import QUERIES

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        i = 0
        for s in (1000, 1001):
            for d_ in (10, 11, 12):
                rows.append((s, d_, 1.0, t0 + dt.timedelta(hours=i)))
                i += 1
        rows.append((2000, 10, 1.0, t0 + dt.timedelta(hours=i)))  # noise
        d = str(tmp_path / "bfs")
        spark.createDataFrame(
            rows, "user_id long, event_id long, value double, ts timestamp"
        ).write.parquet(f"{d}/events.parquet")

        got = {r["node"]: r["butterflies"]
               for r in QUERIES["butterfly_counts_src"](spark, d).collect()}
        assert got == {1000: 3, 1001: 3}

    def test_side_sums_agree_with_dst_view(self, spark):
        """Both views count every butterfly twice (once per same-side
        endpoint pair), so the totals must be equal on the real
        fixture: Σ_src = Σ_pairs c(c−1) = 2·#butterflies = Σ_dst."""
        from autoaudit_spark.registry import QUERIES

        sf = "/root/testdata/sf0.001"
        s = sum(r["butterflies"]
                for r in QUERIES["butterfly_counts_src"](spark, sf).collect())
        d = sum(r["butterflies"]
                for r in QUERIES["butterfly_counts"](spark, sf).collect())
        assert s == d and s > 0

    def test_brute_force_parity_sf0001(self, spark):
        """Independent implementation: per-src counts from Python set
        intersections over all src pairs (Σ_{s'} C(|N(s)∩N(s')|, 2)
        credited to both) must match the wedge+rejoin form exactly."""
        from collections import defaultdict
        from itertools import combinations

        from autoaudit_spark.registry import QUERIES
        from autoaudit_spark.sources import adjacency

        sf = "/root/testdata/sf0.001"
        nbrs = defaultdict(set)
        for r in adjacency(spark, sf).collect():
            nbrs[r["src"]].add(r["dst"])
        expect = defaultdict(int)
        for s1, s2 in combinations(sorted(nbrs), 2):
            c = len(nbrs[s1] & nbrs[s2])
            if c >= 2:
                nb = c * (c - 1) // 2
                expect[s1] += nb
                expect[s2] += nb
        got = {r["node"]: r["butterflies"]
               for r in QUERIES["butterfly_counts_src"](spark, sf).collect()}
        assert got == dict(expect)


class TestButterflyWindowed:
    def test_planted_transient_k23(self, spark, tmp_path):
        """A K_{2,3} (payers 1000/1001 → counterparties 10/11/12)
        active only in slide-slot k: each counterparty closes 2
        butterflies in BOTH windows covering the slot; in the next slot
        only one payer stays active, so no wedge closes and the motif
        vanishes — the forming-then-disbanding mule cell the windowed
        report exists to expose."""
        import datetime as dt

        from autoaudit_spark.operators.graph import _WT_SLIDE_US
        from autoaudit_spark.registry import QUERIES

        t = dt.datetime(2024, 3, 1)
        e_us = int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        slot_us = (e_us // _WT_SLIDE_US) * _WT_SLIDE_US
        slot = dt.datetime.fromtimestamp(
            slot_us / 1_000_000, dt.timezone.utc
        ).replace(tzinfo=None)
        slide = dt.timedelta(microseconds=_WT_SLIDE_US)

        rows, i = [], 0
        for s in (1000, 1001):
            for d_ in (10, 11, 12):
                rows.append((s, d_, 1.0, slot + dt.timedelta(hours=i)))
                i += 1
        # next slot: only payer 1000 stays active (no second wedge arm)
        for d_ in (10, 11, 12):
            rows.append((1000, d_, 1.0, slot + slide + dt.timedelta(hours=i)))
            i += 1
        d = str(tmp_path / "bfw")
        spark.createDataFrame(
            rows, "user_id long, event_id long, value double, ts timestamp"
        ).write.parquet(f"{d}/events.parquet")

        got = {
            (r["window_start"], r["node"]): r["butterflies"]
            for r in QUERIES["butterfly_counts_windowed"](spark, d).collect()
        }
        expect = {
            (w, n): 2
            for w in (slot - slide, slot)
            for n in (10, 11, 12)
        }
        assert got == expect  # nothing from slot k+1

    def test_brute_force_parity_and_per_window_identity_sf0001(self, spark):
        """Independent implementation on the real fixture: per-window
        per-dst counts from Python set intersections over each window's
        adjacency must match exactly, and within every window
        Σ_node butterflies = 2 × Σ_pairs C(c, 2) (each biclique credits
        both counterparties)."""
        from collections import defaultdict
        from itertools import combinations

        from autoaudit_spark.operators.graph import _WT_SLIDE_US
        from autoaudit_spark.registry import QUERIES
        from autoaudit_spark.sources import edges as edges_src

        sf = "/root/testdata/sf0.001"
        import datetime as dt

        utc = dt.timezone.utc
        nbrs = defaultdict(lambda: defaultdict(set))
        for r in edges_src(spark, sf).collect():
            # collected timestamps are UTC-naive (session tz pinned UTC)
            ev_us = int(r["ts"].replace(tzinfo=utc).timestamp() * 1_000_000)
            # windows are epoch-aligned slide multiples
            slot_us = (ev_us // _WT_SLIDE_US) * _WT_SLIDE_US
            for w_us in (slot_us, slot_us - _WT_SLIDE_US):
                nbrs[w_us][r["dst"]].add(r["src"])
        expect = defaultdict(int)
        total_pairs = defaultdict(int)
        for w_us, by_dst in nbrs.items():
            for d1, d2 in combinations(sorted(by_dst), 2):
                c = len(by_dst[d1] & by_dst[d2])
                if c >= 2:
                    nb = c * (c - 1) // 2
                    expect[(w_us, d1)] += nb
                    expect[(w_us, d2)] += nb
                    total_pairs[w_us] += nb
        got = {}
        per_w_sum = defaultdict(int)
        for r in QUERIES["butterfly_counts_windowed"](spark, sf).collect():
            w_us = int(
                r["window_start"].replace(tzinfo=utc).timestamp() * 1_000_000
            )
            got[(w_us, r["node"])] = r["butterflies"]
            per_w_sum[w_us] += r["butterflies"]
        assert got == dict(expect)
        assert per_w_sum == {w: 2 * n for w, n in total_pairs.items() if n}


class TestAccountSuccession:
    def test_planted_rotation(self, spark, tmp_path):
        """Account 2 takes over account 1's exact mule network a month
        after account 1 goes quiet: jaccard 1.0, overlap 0, positive
        gap. Accounts 3/4 share the same counterparties but operate
        CONCURRENTLY: overlap_frac ~1, negative gap."""
        import datetime as dt

        from autoaudit_spark.registry import QUERIES

        jan = dt.datetime(2024, 1, 1)
        feb = dt.datetime(2024, 2, 15)
        rows, i = [], 0
        mules = [10, 11, 12, 13]
        for d in mules:          # account 1: January
            rows.append((d, jan + dt.timedelta(hours=i), 1, "pay", 9.0, "{}")); i += 1
        for d in mules:          # account 2: mid-February onward
            rows.append((d, feb + dt.timedelta(hours=i), 2, "pay", 9.0, "{}")); i += 1
        for d in mules:          # accounts 3 & 4: concurrent, same span
            rows.append((d, jan + dt.timedelta(hours=i), 3, "pay", 9.0, "{}"))
            rows.append((d, jan + dt.timedelta(hours=i), 4, "pay", 9.0, "{}")); i += 1
        d0 = str(tmp_path / "succ")
        # dst derives from event_id % 150: encode each row's mule id in
        # the event_id while keeping ids unique
        data = [
            (n * 150 + dst, ts, u, t, v, p)
            for n, (dst, ts, u, t, v, p) in enumerate(rows)
        ]
        spark.createDataFrame(
            data, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).write.parquet(f"{d0}/events.parquet")

        out = {(r["u"], r["v"]): r for r in
               QUERIES["account_succession"](spark, d0).collect()}
        succ = out[(1, 2)]
        assert succ["jaccard"] == 1.0 and succ["n_common"] == 4
        assert succ["overlap_frac"] == 0.0 and succ["gap_us"] > 0
        conc = out[(3, 4)]
        assert conc["jaccard"] == 1.0
        assert conc["overlap_frac"] > 0.9 and conc["gap_us"] < 0


class TestHarmonicCentrality:
    def test_star_with_pendant_chain(self, spark):
        """X81 planted fixture: star 0-{1..5} plus pendant chain 5-6-7.
        Shell counts and the pinned-chain harmonic are hand-computed;
        float equality is EXACT because the test replays the identical
        left-associated IEEE chain."""
        from autoaudit_spark.operators.graph import harmonic_centrality

        edges = [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (5, 6), (6, 7)]
        adj = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: (r["n1"], r["n2"], r["n3"], r["harmonic"])
            for r in harmonic_centrality(adj).collect()
        }
        assert got[0] == (5, 1, 1, 5 + 1 / 2.0 + 1 / 3.0)
        assert got[5] == (2, 5, 0, 2 + 5 / 2.0 + 0 / 3.0)
        assert got[7] == (1, 1, 1, 1 + 1 / 2.0 + 1 / 3.0)
        assert got[1] == (1, 4, 1, 1 + 4 / 2.0 + 1 / 3.0)
        assert len(got) == 8

    def test_brute_force_parity_random_graphs(self, spark):
        """Random multigraphs (self-loops included — they must drop) vs
        a pure-Python bounded BFS."""
        import random
        from collections import defaultdict

        from autoaudit_spark.operators.graph import harmonic_centrality

        for seed in (1, 7):
            rnd = random.Random(seed)
            n = 12
            edges = sorted(
                {(rnd.randrange(n), rnd.randrange(n)) for _ in range(18)}
            )
            adj = spark.createDataFrame(edges, "src long, dst long")
            nbrs, nodes = defaultdict(set), set()
            for s, d in edges:
                nodes |= {s, d}
                if s != d:
                    nbrs[s].add(d)
                    nbrs[d].add(s)
            exp = {}
            for v in nodes:
                dist, frontier = {v: 0}, {v}
                for dd in (1, 2, 3):
                    nxt = set().union(*(nbrs[u] for u in frontier)) - set(
                        dist
                    ) if frontier else set()
                    for u in nxt:
                        dist[u] = dd
                    frontier = nxt
                c = [
                    sum(1 for x in dist.values() if x == dd) for dd in (1, 2, 3)
                ]
                exp[v] = (c[0], c[1], c[2], c[0] + c[1] / 2.0 + c[2] / 3.0)
            got = {
                r["node"]: (r["n1"], r["n2"], r["n3"], r["harmonic"])
                for r in harmonic_centrality(adj).collect()
            }
            assert got == exp

    def test_depth_validated(self, spark):
        from autoaudit_spark.operators.graph import harmonic_centrality

        adj = spark.createDataFrame([(0, 1)], "src long, dst long")
        with pytest.raises(ValueError, match="depth"):
            harmonic_centrality(adj, depth=0)

    def test_active_source_prune_exact_on_mixed_components(self, spark):
        """r17 prune regression pin: sources that cover their WHOLE
        graph early (triangle nodes — ball complete at d=1 in the
        clique component... here at d=2 globally) coexist with a
        disconnected component whose sources are complete-in-component
        but NOT globally (ball < N forever). The prune must drop the
        former from later frontiers without perturbing any shell count,
        and the latter's empty shells must stay empty (their frontier
        dies naturally, not via the prune). Expected values are the
        same hand-BFS as the star fixture."""
        from autoaudit_spark.operators.graph import harmonic_centrality

        # component A: path 0-1-2-3 (longest distance 3)
        # component B: triangle 10-11-12 (every ball complete at d=1)
        edges = [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12), (12, 10)]
        adj = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: (r["n1"], r["n2"], r["n3"], r["harmonic"])
            for r in harmonic_centrality(adj).collect()
        }
        assert got[0] == (1, 1, 1, 1 + 1 / 2.0 + 1 / 3.0)
        assert got[1] == (2, 1, 0, 2 + 1 / 2.0 + 0 / 3.0)
        assert got[10] == (2, 0, 0, 2 + 0 / 2.0 + 0 / 3.0)
        assert len(got) == 7


class TestHyperballQuality:
    def test_ball_estimates_track_exact_on_real_data(self, spark, sf_root):
        """The banked HyperBall path vs the exact X81 kernel on real
        sf0.001 edges: same node universe, and the depth-3 ball-size
        estimate lands within HLL's m=64 accuracy class (std error
        ~13%; measured 7.6% uniformly with the r14 injective pair
        hash — every depth-3 ball is the whole 150-node component, so
        the sketch estimate is shared). The bitwise register/estimate
        semantics live in the hypothesis property tests; this pins the
        end-to-end quality claim."""
        import statistics

        from autoaudit_spark.operators.graph import (
            adjacency,
            harmonic_centrality,
            harmonic_centrality_hyperball,
        )

        sf = f"{sf_root}/sf0.001"
        approx = {
            r["node"]: r["est3"]
            for r in harmonic_centrality_hyperball(spark, sf).collect()
        }
        exact = {
            r["node"]: 1 + r["n1"] + r["n2"] + r["n3"]
            for r in harmonic_centrality(adjacency(spark, sf)).collect()
        }
        assert set(approx) == set(exact)
        rel = [
            abs(approx[n] - exact[n]) / exact[n] for n in exact
        ]
        assert statistics.median(rel) < 0.2
        assert max(rel) < 0.4


class TestAdjacencySessionCache:
    """r18: `adjacency()` materializes once per (session, sf_dir) — the
    shared_points pattern applied to the graph family's shared input."""

    def test_same_session_same_sf_returns_cached_relation(self, spark, sf_root):
        from autoaudit_spark.session_cache import session_bucket
        from autoaudit_spark.sources import adjacency

        sf = f"{sf_root}/sf0.001"
        a = adjacency(spark, sf)
        b = adjacency(spark, sf)
        assert a is b  # one persisted build per (session, sf_dir)
        assert session_bucket(spark, "adjacency")[sf] is a
        assert a.storageLevel.useMemory  # persisted, spillable

    def test_cached_rows_equal_uncached_derivation(self, spark, sf_root):
        from autoaudit_spark.sources import adjacency, edges

        sf = f"{sf_root}/sf0.001"
        cached = {(r["src"], r["dst"]) for r in adjacency(spark, sf).collect()}
        fresh = {
            (r["src"], r["dst"])
            for r in edges(spark, sf).select("src", "dst").distinct().collect()
        }
        assert cached == fresh and len(cached) > 0

    def test_distinct_sf_dirs_get_distinct_entries(self, spark, sf_root):
        from autoaudit_spark.sources import adjacency

        a = adjacency(spark, f"{sf_root}/sf0.001")
        b = adjacency(spark, f"{sf_root}/sf0.01")
        assert a is not b
        assert a.count() != b.count()

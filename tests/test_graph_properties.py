"""Random-graph property tests for the graph operators rewritten in r5
(degree-oriented triangle counting, left-semi k-core with fixpoint exit)
plus the temporal two-hop: hypothesis-generated multigraphs flow through
the events→edges derivation seam into the REGISTERED queries, and an
independent brute-force Python reference recomputes each answer.
Generators include self-loops, parallel edges, both orientations of the
same pair, and (for k-core) an optionally planted 7-clique at the
strong-tie multiplicity so the non-empty-core path is exercised, not
just the vacuous empty result.
"""

from __future__ import annotations

import datetime as dt
import itertools
from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st

from autoaudit_spark.operators.graph import (
    K_CORE_K,
    K_CORE_MIN_MULT,
    MIN_PATHS,
)
from autoaudit_spark.registry import QUERIES

T0 = dt.datetime(2024, 1, 1)
_counter = itertools.count()

edge_list = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),   # src
        st.integers(min_value=0, max_value=7),   # dst
        st.integers(min_value=0, max_value=6),   # ts grid step
    ),
    min_size=0,
    max_size=40,
)


def _events_dir(spark, tmp_path, pairs):
    rows = [
        (s_, d_, 1.0, T0 + dt.timedelta(hours=step))
        for (s_, d_, step) in pairs
    ]
    d = str(tmp_path / f"g{next(_counter)}")
    spark.createDataFrame(
        rows, "user_id long, event_id long, value double, ts timestamp"
    ).write.parquet(f"{d}/events.parquet")
    return d


class TestTriangleProperty:
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(pairs=edge_list)
    def test_oriented_count_equals_brute_force(self, spark, tmp_path, pairs):
        d = _events_dir(spark, tmp_path, pairs)
        got = QUERIES["triangle_count"](spark, d).collect()[0]["n_triangles"]
        und = {
            (min(a, b), max(a, b))
            for (a, b, _) in pairs
            if a != b
        }
        nodes = sorted({n for e in und for n in e})
        want = sum(
            1
            for a, b, c in itertools.combinations(nodes, 3)
            if (a, b) in und and (b, c) in und and (a, c) in und
        )
        assert got == want

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(pairs=edge_list)
    def test_two_hop_temporal_equals_brute_force(self, spark, tmp_path, pairs):
        d = _events_dir(spark, tmp_path, pairs)
        got = {
            (r["src"], r["dst"]): r["path_cnt"]
            for r in QUERIES["two_hop_temporal"](spark, d).collect()
        }
        es = [
            (s_, d_, step) for (s_, d_, step) in pairs if s_ != d_
        ]
        cnt = Counter(
            (e1[0], e2[1])
            for e1 in es
            for e2 in es
            if e1[1] == e2[0] and e1[2] < e2[2]
        )
        want = {k: v for k, v in cnt.items() if v >= MIN_PATHS}
        assert got == want


class TestKCoreProperty:
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(pairs=edge_list, plant=st.booleans(), drop=st.integers(0, 20))
    def test_kcore_equals_synchronous_peel(
        self, spark, tmp_path, pairs, plant, drop
    ):
        if plant:
            # 7-clique at exactly the strong-tie multiplicity, minus a
            # few events (`drop`) so the clique is sometimes complete,
            # sometimes frayed at the threshold
            clique = [
                (a, b, 0)
                for a, b in itertools.combinations(range(7), 2)
                for _ in range(K_CORE_MIN_MULT)
            ]
            pairs = pairs + clique[drop:]
        d = _events_dir(spark, tmp_path, pairs)
        got = sorted(r["node"] for r in QUERIES["k_core"](spark, d).collect())
        mult = Counter(
            (min(a, b), max(a, b)) for (a, b, _) in pairs if a != b
        )
        und = {p for p, c in mult.items() if c >= K_CORE_MIN_MULT}
        neigh: dict[int, set[int]] = {}
        for a, b in und:
            neigh.setdefault(a, set()).add(b)
            neigh.setdefault(b, set()).add(a)
        core = set(neigh)
        while True:
            keep = {
                n for n in core if len(neigh[n] & core) >= K_CORE_K
            }
            if keep == core:
                break
            core = keep
        assert got == sorted(core)


class TestTemporalStrictness:
    def test_equal_ts_hops_never_chain(self, spark, tmp_path):
        """Deterministic pin (mutation sweep: `<` vs `<=` survives the
        randomized generator): three same-instant 0→1 edges followed by
        three later 1→2 edges give 9 valid time-respecting paths, while
        the three same-instant 1→2' edges at t0 must contribute ZERO —
        money cannot be forwarded within the same instant."""
        pairs = (
            [(0, 1, 0)] * 3      # three 0→1 transfers at t0
            + [(1, 2, 1)] * 3    # three 1→2 transfers later — chain
            + [(1, 3, 0)] * 3    # three 1→3 transfers AT t0 — never chain
        )
        d = _events_dir(spark, tmp_path, pairs)
        got = {
            (r["src"], r["dst"]): r["path_cnt"]
            for r in QUERIES["two_hop_temporal"](spark, d).collect()
        }
        assert got == {(0, 2): 9}


class TestCCRoundsUsedProperty:
    """r8: the hash-min `rounds_used` column has a closed-form meaning —
    labels stabilize once every node's ≤r-hop ball contains its
    component minimum, so rounds_used = max_v dist(v, min of v's
    component) + 1 (the +1 is the confirming no-change round). Pinning
    the closed form keeps the column honest: a silent extra round (or a
    broken change probe) shifts it."""

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pairs=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=6),
                st.integers(min_value=0, max_value=6),
            ),
            min_size=1,
            max_size=12,
        )
    )
    def test_rounds_equal_min_eccentricity_plus_one(self, spark, pairs):
        from collections import deque

        from autoaudit_spark.operators.graph import connected_components

        adj = spark.createDataFrame(pairs, "src long, dst long")
        rows = connected_components(adj).collect()
        got = {r["node"]: r["component"] for r in rows}
        rounds = {r["rounds_used"] for r in rows}

        nbrs: dict[int, set[int]] = {}
        for s, d in pairs:
            nbrs.setdefault(s, set())
            nbrs.setdefault(d, set())
            if s != d:
                nbrs[s].add(d)
                nbrs[d].add(s)
        # brute components (BFS) + eccentricity of each component min
        comp: dict[int, int] = {}
        ecc = 0
        for v in sorted(nbrs):
            if v in comp:
                continue
            dist = {v: 0}
            dq = deque([v])
            while dq:
                u = dq.popleft()
                for w in nbrs[u]:
                    if w not in dist:
                        dist[w] = dist[u] + 1
                        dq.append(w)
            for u in dist:
                comp[u] = v  # v is the min: sorted iteration order
            ecc = max(ecc, max(dist.values()))
        assert got == comp
        assert rounds == {ecc + 1}


class TestHarmonicCentralityProperty:
    """X81 through the registered-query seam: random events → the derived
    adjacency (src=user_id, dst=event_id%150) → harmonic_centrality vs a
    pure-Python bounded BFS over the same undirected simple graph."""

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(pairs=edge_list)
    def test_shells_and_harmonic_equal_brute_force(
        self, spark, tmp_path, pairs
    ):
        from collections import deque

        if not pairs:
            return
        d = _events_dir(spark, tmp_path, pairs)
        got = {
            r["node"]: (r["n1"], r["n2"], r["n3"], r["harmonic"])
            for r in QUERIES["harmonic_centrality"](spark, d).collect()
        }
        und = {(s_, dd % 150) for (s_, dd, _) in pairs}
        nbrs: dict[int, set[int]] = {}
        for a, b in und:
            nbrs.setdefault(a, set())
            nbrs.setdefault(b, set())
            if a != b:
                nbrs[a].add(b)
                nbrs[b].add(a)
        exp = {}
        for v in nbrs:
            dist = {v: 0}
            dq = deque([v])
            while dq:
                u = dq.popleft()
                if dist[u] >= 3:
                    continue
                for w in nbrs[u]:
                    if w not in dist:
                        dist[w] = dist[u] + 1
                        dq.append(w)
            c = [sum(1 for x in dist.values() if x == k) for k in (1, 2, 3)]
            exp[v] = (c[0], c[1], c[2], c[0] + c[1] / 2.0 + c[2] / 3.0)
        assert got == exp


class TestWindowedTrussProperty:
    """Random multigraphs spread over multiple slide slots: the windowed
    truss must equal an independent Python truss peel run separately on
    each window's strong-tie graph (windowing == partition-then-peel)."""

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pairs=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=5),   # a
                st.integers(min_value=0, max_value=5),   # b
                st.integers(min_value=0, max_value=2),   # slide slot
                st.integers(min_value=0, max_value=3),   # repeat-seed
            ),
            min_size=0,
            max_size=60,
        )
    )
    def test_equals_per_window_python_peel(self, spark, tmp_path, pairs):
        from autoaudit_spark.operators.graph import (
            K_TRUSS,
            WT_MIN_MULT,
            _WT_SLIDE_US,
        )

        slide = dt.timedelta(microseconds=_WT_SLIDE_US)
        base_us = (
            int(T0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
            // _WT_SLIDE_US + 1
        ) * _WT_SLIDE_US
        base = dt.datetime.fromtimestamp(
            base_us / 1_000_000, dt.timezone.utc
        ).replace(tzinfo=None)

        rows = [
            (a, b, 1.0, base + slot * slide + dt.timedelta(minutes=i))
            for i, (a, b, slot, _r) in enumerate(pairs)
        ]
        d = str(tmp_path / f"wt{next(_counter)}")
        spark.createDataFrame(
            rows, "user_id long, event_id long, value double, ts timestamp"
        ).write.parquet(f"{d}/events.parquet")

        # independent reference: assign each event to its 2 sliding
        # windows, derive per-window strong ties, peel each window's
        # graph to its truss fixpoint with plain Python sets
        mult = Counter()
        for a, b, slot, _r in pairs:
            if a == b:
                continue
            ev_us = base_us + slot * _WT_SLIDE_US
            for w_us in (ev_us, ev_us - _WT_SLIDE_US):
                mult[(w_us, min(a, b), max(a, b))] += 1
        by_w = {}
        for (w_us, a, b), m in mult.items():
            if m >= WT_MIN_MULT:
                by_w.setdefault(w_us, set()).add((a, b))
        expect = {}
        for w_us, edges in by_w.items():
            cur = set(edges)
            while True:
                sup = Counter()
                for (a, b) in cur:
                    for c in range(6):
                        lo, hi = min(a, c), max(a, c)
                        lo2, hi2 = min(b, c), max(b, c)
                        if c not in (a, b) and (lo, hi) in cur and (lo2, hi2) in cur:
                            sup[(a, b)] += 1
                nxt = {e for e in cur if sup[e] >= K_TRUSS - 2}
                if nxt == cur:
                    break
                cur = nxt
            w_ts = dt.datetime.fromtimestamp(
                w_us / 1_000_000, dt.timezone.utc
            ).replace(tzinfo=None)
            for e in cur:
                expect[(w_ts, e[0], e[1])] = sup[e]

        got = {
            (r["window_start"], r["a"], r["b"]): r["support"]
            for r in QUERIES["k_truss_windowed"](spark, d).collect()
        }
        assert got == expect


class TestTrussDissolutionProperty:
    """Random temporal multigraphs: the dissolution report must equal
    the set difference an independent Python per-window truss peel
    computes — edges in truss(w) absent from truss(w + slide), for all
    w strictly below the data's last sliding window."""

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pairs=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=5),   # a
                st.integers(min_value=0, max_value=5),   # b
                st.integers(min_value=0, max_value=2),   # slide slot
                st.integers(min_value=0, max_value=3),   # repeat-seed
            ),
            min_size=0,
            max_size=60,
        )
    )
    def test_equals_python_truss_delta(self, spark, tmp_path, pairs):
        from autoaudit_spark.operators.graph import (
            K_TRUSS,
            WT_MIN_MULT,
            _WT_SLIDE_US,
        )
        from autoaudit_spark.registry import QUERIES

        slide = dt.timedelta(microseconds=_WT_SLIDE_US)
        base_us = (
            int(T0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
            // _WT_SLIDE_US + 1
        ) * _WT_SLIDE_US
        base = dt.datetime.fromtimestamp(
            base_us / 1_000_000, dt.timezone.utc
        ).replace(tzinfo=None)

        rows = [
            (a, b, 1.0, base + slot * slide + dt.timedelta(minutes=i))
            for i, (a, b, slot, _r) in enumerate(pairs)
        ]
        d = str(tmp_path / f"tdp{next(_counter)}")
        spark.createDataFrame(
            rows, "user_id long, event_id long, value double, ts timestamp"
        ).write.parquet(f"{d}/events.parquet")

        # per-window python truss peel (the X82 reference), then delta
        mult = Counter()
        max_w_us = None
        for a, b, slot, _r in pairs:
            ev_us = base_us + slot * _WT_SLIDE_US
            # the DATA's last window covers ALL events incl. self-loops
            max_w_us = ev_us if max_w_us is None else max(max_w_us, ev_us)
            if a == b:
                continue
            for w_us in (ev_us, ev_us - _WT_SLIDE_US):
                mult[(w_us, min(a, b), max(a, b))] += 1
        by_w = {}
        for (w_us, a, b), m in mult.items():
            if m >= WT_MIN_MULT:
                by_w.setdefault(w_us, set()).add((a, b))
        truss = {}
        for w_us, edges in by_w.items():
            cur = set(edges)
            while True:
                sup = Counter()
                for (a, b) in cur:
                    for c in range(6):
                        lo, hi = min(a, c), max(a, c)
                        lo2, hi2 = min(b, c), max(b, c)
                        if c not in (a, b) and (lo, hi) in cur \
                                and (lo2, hi2) in cur:
                            sup[(a, b)] += 1
                nxt = {e for e in cur if sup[e] >= K_TRUSS - 2}
                if nxt == cur:
                    break
                cur = nxt
            truss[w_us] = {e: sup[e] for e in cur}
        expect = {}
        for w_us, edges in truss.items():
            if max_w_us is None or w_us >= max_w_us:
                continue  # no successor report observable in the data
            succ = truss.get(w_us + _WT_SLIDE_US, {})
            for e, s in edges.items():
                if e not in succ:
                    w_ts = dt.datetime.fromtimestamp(
                        w_us / 1_000_000, dt.timezone.utc
                    ).replace(tzinfo=None)
                    expect[(w_ts, e[0], e[1])] = s

        got = {
            (r["window_start"], r["a"], r["b"]): r["support"]
            for r in QUERIES["truss_dissolution"](spark, d).collect()
        }
        assert got == expect


class TestWindowedKCoreProperty:
    """Random multigraphs spread over multiple slide slots: the windowed
    k-core kernel must equal an independent Python degree peel run
    separately on each window's strong-tie graph (windowing ==
    partition-then-peel). Driven at k=2 via the parametric kernel —
    the 0..5 node universe caps strong degree at 5, below the
    registered K_CORE_K (which the planted K7 test covers)."""

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pairs=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=5),   # a
                st.integers(min_value=0, max_value=5),   # b
                st.integers(min_value=0, max_value=2),   # slide slot
                st.integers(min_value=0, max_value=3),   # repeat-seed
            ),
            min_size=0,
            max_size=60,
        )
    )
    def test_equals_per_window_python_peel(self, spark, tmp_path, pairs):
        from autoaudit_spark.operators.graph import (
            WT_MIN_MULT,
            _WT_SLIDE_US,
            k_core_windowed,
        )
        from autoaudit_spark.sources import edges as edges_src

        K = 2
        slide = dt.timedelta(microseconds=_WT_SLIDE_US)
        base_us = (
            int(T0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
            // _WT_SLIDE_US + 1
        ) * _WT_SLIDE_US
        base = dt.datetime.fromtimestamp(
            base_us / 1_000_000, dt.timezone.utc
        ).replace(tzinfo=None)

        rows = [
            (a, b, 1.0, base + slot * slide + dt.timedelta(minutes=i))
            for i, (a, b, slot, _r) in enumerate(pairs)
        ]
        d = str(tmp_path / f"kcw{next(_counter)}")
        spark.createDataFrame(
            rows, "user_id long, event_id long, value double, ts timestamp"
        ).write.parquet(f"{d}/events.parquet")

        mult = Counter()
        for a, b, slot, _r in pairs:
            if a == b:
                continue
            ev_us = base_us + slot * _WT_SLIDE_US
            for w_us in (ev_us, ev_us - _WT_SLIDE_US):
                mult[(w_us, min(a, b), max(a, b))] += 1
        by_w = {}
        for (w_us, a, b), m in mult.items():
            if m >= WT_MIN_MULT:
                by_w.setdefault(w_us, set()).add((a, b))
        expect = set()
        for w_us, edges in by_w.items():
            nodes = {n for e in edges for n in e}
            while True:
                deg = Counter()
                for a, b in edges:
                    if a in nodes and b in nodes:
                        deg[a] += 1
                        deg[b] += 1
                nxt = {n for n in nodes if deg[n] >= K}
                if nxt == nodes:
                    break
                nodes = nxt
            w_ts = dt.datetime.fromtimestamp(
                w_us / 1_000_000, dt.timezone.utc
            ).replace(tzinfo=None)
            expect |= {(w_ts, n) for n in nodes}

        got = {
            (r["window_start"], r["node"])
            for r in k_core_windowed(edges_src(spark, d), k=K).collect()
        }
        assert got == expect


class TestKCoreDissolutionProperty:
    """Random multigraphs spread over multiple slide slots: the core
    dissolution composition must equal the per-window Python peel's
    delta — a node dissolved at w iff it is in w's core, absent from
    (w+slide)'s, and w precedes the DATA's last event window (the
    observability bound counts ALL events, self-loops included, the
    truss-dissolution property convention). Driven at k=2 via the
    parametric kernels (the 0..5 node universe caps strong degree at
    5, below the registered K_CORE_K, which the planted tests cover)."""

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pairs=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=5),   # a
                st.integers(min_value=0, max_value=5),   # b
                st.integers(min_value=0, max_value=2),   # slide slot
                st.integers(min_value=0, max_value=3),   # repeat-seed
            ),
            min_size=0,
            max_size=60,
        )
    )
    def test_equals_python_peel_delta(self, spark, tmp_path, pairs):
        from autoaudit_spark.operators.graph import (
            WT_MIN_MULT,
            _WT_SLIDE_US,
            core_dissolution,
            k_core_windowed,
        )
        from autoaudit_spark.sources import edges as edges_src

        K = 2
        slide = dt.timedelta(microseconds=_WT_SLIDE_US)
        base_us = (
            int(T0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
            // _WT_SLIDE_US + 1
        ) * _WT_SLIDE_US
        base = dt.datetime.fromtimestamp(
            base_us / 1_000_000, dt.timezone.utc
        ).replace(tzinfo=None)

        rows = [
            (a, b, 1.0, base + slot * slide + dt.timedelta(minutes=i))
            for i, (a, b, slot, _r) in enumerate(pairs)
        ]
        d = str(tmp_path / f"kcd{next(_counter)}")
        spark.createDataFrame(
            rows, "user_id long, event_id long, value double, ts timestamp"
        ).write.parquet(f"{d}/events.parquet")

        mult = Counter()
        max_w_us = None
        for a, b, slot, _r in pairs:
            ev_us = base_us + slot * _WT_SLIDE_US
            # the DATA's last window covers ALL events incl. self-loops
            max_w_us = ev_us if max_w_us is None else max(max_w_us, ev_us)
            if a == b:
                continue
            for w_us in (ev_us, ev_us - _WT_SLIDE_US):
                mult[(w_us, min(a, b), max(a, b))] += 1
        by_w = {}
        for (w_us, a, b), m in mult.items():
            if m >= WT_MIN_MULT:
                by_w.setdefault(w_us, set()).add((a, b))
        core = {}
        for w_us, edges in by_w.items():
            nodes = {n for e in edges for n in e}
            while True:
                deg = Counter()
                for a, b in edges:
                    if a in nodes and b in nodes:
                        deg[a] += 1
                        deg[b] += 1
                nxt = {n for n in nodes if deg[n] >= K}
                if nxt == nodes:
                    break
                nodes = nxt
            core[w_us] = nodes
        expect = set()
        for w_us, nodes in core.items():
            if max_w_us is None or w_us >= max_w_us:
                continue  # no successor report observable in the data
            succ = core.get(w_us + _WT_SLIDE_US, set())
            w_ts = dt.datetime.fromtimestamp(
                w_us / 1_000_000, dt.timezone.utc
            ).replace(tzinfo=None)
            expect |= {(w_ts, n) for n in nodes if n not in succ}

        e0 = edges_src(spark, d)
        got = {
            (r["window_start"], r["node"])
            for r in core_dissolution(k_core_windowed(e0, k=K), e0).collect()
        }
        assert got == expect


class TestCoreFormationProperty:
    """The dissolution property mirrored: a node formed at w iff it is
    in w's core, absent from (w−slide)'s, and w FOLLOWS the DATA's
    first event window (min over events of the earlier covering
    window, self-loops included). Driven at k=2 via the parametric
    kernels."""

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pairs=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=5),   # a
                st.integers(min_value=0, max_value=5),   # b
                st.integers(min_value=0, max_value=2),   # slide slot
                st.integers(min_value=0, max_value=3),   # repeat-seed
            ),
            min_size=0,
            max_size=60,
        )
    )
    def test_equals_python_peel_delta(self, spark, tmp_path, pairs):
        from autoaudit_spark.operators.graph import (
            WT_MIN_MULT,
            _WT_SLIDE_US,
            formation,
            k_core_windowed,
        )
        from autoaudit_spark.sources import edges as edges_src

        K = 2
        slide = dt.timedelta(microseconds=_WT_SLIDE_US)
        base_us = (
            int(T0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
            // _WT_SLIDE_US + 1
        ) * _WT_SLIDE_US
        base = dt.datetime.fromtimestamp(
            base_us / 1_000_000, dt.timezone.utc
        ).replace(tzinfo=None)

        rows = [
            (a, b, 1.0, base + slot * slide + dt.timedelta(minutes=i))
            for i, (a, b, slot, _r) in enumerate(pairs)
        ]
        d = str(tmp_path / f"kcf{next(_counter)}")
        spark.createDataFrame(
            rows, "user_id long, event_id long, value double, ts timestamp"
        ).write.parquet(f"{d}/events.parquet")

        mult = Counter()
        min_w_us = None
        for a, b, slot, _r in pairs:
            ev_us = base_us + slot * _WT_SLIDE_US
            # the DATA's first window is the EARLIER of the two windows
            # covering the earliest event (incl. self-loops)
            first = ev_us - _WT_SLIDE_US
            min_w_us = first if min_w_us is None else min(min_w_us, first)
            if a == b:
                continue
            for w_us in (ev_us, ev_us - _WT_SLIDE_US):
                mult[(w_us, min(a, b), max(a, b))] += 1
        by_w = {}
        for (w_us, a, b), m in mult.items():
            if m >= WT_MIN_MULT:
                by_w.setdefault(w_us, set()).add((a, b))
        core = {}
        for w_us, edges in by_w.items():
            nodes = {n for e in edges for n in e}
            while True:
                deg = Counter()
                for a, b in edges:
                    if a in nodes and b in nodes:
                        deg[a] += 1
                        deg[b] += 1
                nxt = {n for n in nodes if deg[n] >= K}
                if nxt == nodes:
                    break
                nodes = nxt
            core[w_us] = nodes
        expect = set()
        for w_us, nodes in core.items():
            if min_w_us is None or w_us <= min_w_us:
                continue  # no predecessor report observable in the data
            prv = core.get(w_us - _WT_SLIDE_US, set())
            w_ts = dt.datetime.fromtimestamp(
                w_us / 1_000_000, dt.timezone.utc
            ).replace(tzinfo=None)
            expect |= {(w_ts, n) for n in nodes if n not in prv}

        e0 = edges_src(spark, d)
        got = {
            (r["window_start"], r["node"])
            for r in formation(
                k_core_windowed(e0, k=K), e0, ("node",)
            ).collect()
        }
        assert got == expect


class TestButterflySrcProperty:
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(pairs=edge_list)
    def test_equals_brute_force_and_dst_sum(self, spark, tmp_path, pairs):
        """Random bipartite-projected multigraphs: per-src butterfly
        counts equal the Python set-intersection reference, and both
        side sums agree (each butterfly counted twice per side)."""
        from collections import defaultdict
        from itertools import combinations

        d = _events_dir(spark, tmp_path, pairs)
        nbrs = defaultdict(set)
        for (s, e, _t) in pairs:
            nbrs[s].add(e % 150)
        expect = defaultdict(int)
        for s1, s2 in combinations(sorted(nbrs), 2):
            c = len(nbrs[s1] & nbrs[s2])
            if c >= 2:
                nb = c * (c - 1) // 2
                expect[s1] += nb
                expect[s2] += nb
        got = {r["node"]: r["butterflies"]
               for r in QUERIES["butterfly_counts_src"](spark, d).collect()}
        assert got == dict(expect)
        dst_total = sum(r["butterflies"]
                        for r in QUERIES["butterfly_counts"](spark, d).collect())
        assert sum(got.values()) == dst_total


class TestPersistenceKernelProperty:
    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        cells=st.sets(
            st.tuples(
                st.integers(min_value=0, max_value=5),   # node
                st.integers(min_value=0, max_value=8),   # window slot
            ),
            min_size=0,
            max_size=30,
        )
    )
    def test_equals_python_islands(self, spark, cells):
        """The keyed `persistence` kernel on arbitrary (window_start,
        node) membership sets equals a Python maximal-run reference —
        gaps split runs, consecutive slots merge, singletons survive,
        per-node independence holds. Kernel-level on synthetic
        membership (no graph needed — any per-window relation is a
        valid input), the planted + real-data tests cover the core
        composition."""
        from autoaudit_spark.operators.graph import (
            _WT_SLIDE_US,
            persistence,
        )

        base_us = (
            int(T0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
            // _WT_SLIDE_US + 1
        ) * _WT_SLIDE_US

        def w(slot):
            return dt.datetime.fromtimestamp(
                (base_us + slot * _WT_SLIDE_US) / 1_000_000, dt.timezone.utc
            ).replace(tzinfo=None)

        expect = []
        for node in sorted({n for n, _s in cells}):
            slots = sorted(s for n, s in cells if n == node)
            run = [slots[0]]
            for s in slots[1:]:
                if s == run[-1] + 1:
                    run.append(s)
                else:
                    expect.append((node, w(run[0]), w(run[-1]), len(run)))
                    run = [s]
            expect.append((node, w(run[0]), w(run[-1]), len(run)))

        if not cells:
            rel = spark.createDataFrame(
                [], "window_start timestamp, node long"
            )
        else:
            rel = spark.createDataFrame(
                [(w(s), n) for n, s in cells],
                "window_start timestamp, node long",
            )
        got = [
            (r["node"], r["run_start"], r["run_end"], r["n_windows"])
            for r in persistence(rel, ("node",)).collect()
        ]
        assert got == expect


class TestHyperballHashInjectivity:
    """The r14 domain-widening claim, checked both ways: the mixer
    matrix determinant is nonzero mod P (the algebraic condition that
    makes the (h1, h2) PAIR a bijection of (hi mod P, lo) pairs), and
    a hypothesis sweep over ids below the 5.4e17 bound finds no pair
    collision (distinct ids → distinct pairs, so ball-size estimates
    cannot saturate — the r13 ADVICE defect)."""

    def test_mixer_determinant_nonzero_mod_p(self):
        from autoaudit_spark.operators.graph import (
            _HB_A1,
            _HB_A2,
            _HB_A3,
            _HB_A4,
            _HB_P,
        )

        assert (_HB_A1 * _HB_A4 - _HB_A2 * _HB_A3) % _HB_P != 0

    @settings(max_examples=300, deadline=None)
    @given(
        ids=st.lists(
            st.integers(min_value=0, max_value=536870915758096383),
            min_size=2,
            max_size=50,
            unique=True,
        )
    )
    def test_pair_hash_injective_below_bound(self, ids):
        from autoaudit_spark.operators.graph import (
            _HB_A1,
            _HB_A2,
            _HB_A3,
            _HB_A4,
            _HB_P,
            _HB_SEED1,
            _HB_SEED2,
            _HB_SPLIT,
        )

        def pair(v):
            hi = (v // _HB_SPLIT) % _HB_P
            lo = v % _HB_SPLIT
            return (
                (hi * _HB_A1 + lo * _HB_A2 + _HB_SEED1) % _HB_P,
                (hi * _HB_A3 + lo * _HB_A4 + _HB_SEED2) % _HB_P,
            )

        pairs = [pair(v) for v in ids]
        assert len(set(pairs)) == len(ids)
        # int64 safety of every intermediate term, worst case
        worst_hi, worst_lo = _HB_P - 1, _HB_SPLIT - 1
        assert worst_hi * _HB_A1 + worst_lo * _HB_A2 + _HB_SEED1 < 2**63
        assert worst_hi * _HB_A3 + worst_lo * _HB_A4 + _HB_SEED2 < 2**63


class TestHyperballProperty:
    """The banked HyperBall kernel (r13): registers are pure integers
    from the portable hash, so the replication is BITWISE — the round-d
    sketch must equal the HLL of the EXACT ball_d membership
    (element-wise max over members' init registers), because max-merge
    propagation is idempotent over revisits. The float estimate layer
    replicates at 1e-12 relative (ln/div ulps differ across runtimes;
    everything beneath them is exact dyadic arithmetic)."""

    @staticmethod
    def _init_regs(v):
        from autoaudit_spark.operators.graph import (
            HB_M,
            HB_RANK_CAP,
            _HB_SEED1,
            _HB_SEED2,
        )

        # independent replication of the split-id injective pair hash
        # (hi = id >> 29 mod P, lo = id & (2^29 - 1); two linear mixes
        # mod P with nonzero matrix determinant — see _hb_init_exprs)
        P = 1000000007
        hi = (v >> 29) % P
        lo = v & ((1 << 29) - 1)
        h1 = (hi * 2654435761 + lo * 737407013 + _HB_SEED1) % P
        idx = h1 % HB_M
        h2 = (hi * 3266489917 + lo * 461845907 + _HB_SEED2) % P
        if h2 == 0:
            rank = HB_RANK_CAP
        else:
            ntz = (h2 & -h2).bit_length() - 1
            rank = min(ntz + 1, HB_RANK_CAP)
        regs = [0] * HB_M
        regs[idx] = rank
        return regs

    @staticmethod
    def _balls(pairs, depth):
        und = {
            (min(a, b), max(a, b))
            for (a, b, _) in pairs
            if a != b
        }
        nodes = {n for (a, b, _) in pairs for n in (a, b)}
        neigh: dict[int, set[int]] = {n: set() for n in nodes}
        for a, b in und:
            neigh[a].add(b)
            neigh[b].add(a)
        balls = {}
        for v in nodes:
            ball = {v}
            frontier = {v}
            per_depth = []
            for _ in range(depth):
                frontier = {
                    w for u in frontier for w in neigh[u]
                } - ball
                ball |= frontier
                per_depth.append(set(ball))
            balls[v] = per_depth
        return balls

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(pairs=edge_list)
    def test_registers_equal_hll_of_exact_balls(
        self, spark, tmp_path, pairs
    ):
        from autoaudit_spark.operators.graph import (
            HB_M,
            adjacency,
            hyperball_registers,
        )

        d = _events_dir(spark, tmp_path, pairs)
        sketches = hyperball_registers(adjacency(spark, d), depth=3)
        balls = self._balls(pairs, 3)
        for depth_i, sk in enumerate(sketches):
            got = {
                r["node"]: [r[f"h{j}"] for j in range(HB_M)]
                for r in sk.collect()
            }
            want = {
                v: [
                    max(self._init_regs(u)[j] for u in per_depth[depth_i])
                    for j in range(HB_M)
                ]
                for v, per_depth in balls.items()
            }
            assert got == want

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(pairs=edge_list)
    def test_estimates_replicate_within_float_tolerance(
        self, spark, tmp_path, pairs
    ):
        import math

        from autoaudit_spark.operators.graph import (
            HB_ALPHA,
            HB_M,
            harmonic_centrality_hyperball,
        )

        d = _events_dir(spark, tmp_path, pairs)
        if not any(a != b for (a, b, _) in pairs):
            return  # empty simple graph -> empty report, nothing to pin
        got = {
            r["node"]: (r["est1"], r["est2"], r["est3"], r["harmonic_est"])
            for r in harmonic_centrality_hyperball(spark, d).collect()
        }
        balls = self._balls(pairs, 3)

        def est(members):
            regs = [
                max(self._init_regs(u)[j] for u in members)
                for j in range(HB_M)
            ]
            s = 0.0
            for r in regs:
                s += 0.5 ** r
            v = sum(1 for r in regs if r == 0)
            raw = HB_ALPHA * (HB_M * HB_M) / s
            if raw <= 2.5 * HB_M and v > 0:
                return HB_M * math.log(HB_M / v)
            return raw

        for node, per_depth in balls.items():
            e1, e2, e3 = (est(m) for m in per_depth)
            h = (e1 - 1.0) / 1.0 + (e2 - e1) / 2.0 + (e3 - e2) / 3.0
            for want, have in zip((e1, e2, e3, h), got[node]):
                assert abs(want - have) <= 1e-12 * max(
                    abs(want), abs(have), 1.0
                )

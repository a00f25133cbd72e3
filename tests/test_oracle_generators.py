"""r8: the CC/harmonic oracle GENERATORS are parametric
(`_harmonic_sql(depth)`, `_cc_hashmin_sql(rounds)`), but the registered
queries pin one parameterization each — these tests exercise the
generators off the registered point, so a bug that only manifests at
another depth/unroll (or in the documented overflow contract) cannot
hide behind the registered sweeps."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest


def _events_fixture(spark, tmp_path, pairs, name):
    """events.parquet whose derived adjacency (src=user_id,
    dst=event_id % 150) equals `pairs` — event ids encode dst mod 150
    while staying unique (the account_succession test trick)."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (n * 150 + dst, t0 + dt.timedelta(hours=n), src, "pay", 1.0, "{}")
        for n, (src, dst) in enumerate(pairs)
    ]
    d = str(tmp_path / name)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    return d


def _duck(sf_dir):
    con = duckdb.connect()
    # Spark writes events.parquet as a part-file directory; DuckDB
    # needs the glob form (the driver testdata uses single files)
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    return con


class TestHarmonicSqlGeneratorOffDefault:
    def test_depth_2_cross_engine(self, spark, tmp_path):
        """depth=2: Spark operator vs the generated DuckDB twin on a
        star + pendant chain — the distance-3 node must NOT score."""
        from autoaudit_spark.operators.graph import (
            _harmonic_sql,
            harmonic_centrality,
        )
        from autoaudit_spark.sources import adjacency

        pairs = [(0, 1), (0, 2), (0, 3), (3, 4), (4, 5)]
        d = _events_fixture(spark, tmp_path, pairs, "h2")
        got = {
            r["node"]: (r["n1"], r["n2"], r["harmonic"])
            for r in harmonic_centrality(
                adjacency(spark, d), depth=2
            ).collect()
        }
        want = {
            row[0]: (row[1], row[2], row[3])
            for row in _duck(d).execute(_harmonic_sql(2)).fetchall()
        }
        assert got == want
        # hand-pin one value: node 5 reaches 4 (d1) and 3 (d2) only
        assert got[5] == (1, 1, 1 + 1 / 2.0)


class TestCCUnrollOverflowContract:
    def test_exceeded_unroll_yields_null_rounds(self, spark, tmp_path):
        """The documented loud-failure contract: a fixpoint beyond the
        unroll leaves rounds_used NULL in the oracle (a driver
        comparison would then mismatch the Spark integer), while the
        closure-derived labels stay correct."""
        from autoaudit_spark.operators.graph import _cc_hashmin_sql

        chain = [(i, i + 1) for i in range(8)]  # ecc(0)=8 → 9 rounds
        d = _events_fixture(spark, tmp_path, chain, "cc_over")
        rows = _duck(d).execute(_cc_hashmin_sql(rounds=3)).fetchall()
        assert rows and all(r[2] is None for r in rows)
        assert {r[1] for r in rows} == {0}  # closure labels unaffected
        # and with a sufficient unroll the count materializes exactly
        rows2 = _duck(d).execute(_cc_hashmin_sql(rounds=12)).fetchall()
        assert {r[2] for r in rows2} == {9}

    def test_jump_and_twostar_generators_agree_on_labels(
        self, spark, tmp_path
    ):
        """All three generators produce identical closure labels on the
        same fixture (the rounds differ by design)."""
        from autoaudit_spark.operators.graph import (
            _cc_hashmin_sql,
            _cc_jump_sql,
            _cc_twostar_sql,
        )

        pairs = [(0, 1), (1, 2), (5, 6), (6, 7), (7, 5), (9, 9)]
        d = _events_fixture(spark, tmp_path, pairs, "cc_three")
        con = _duck(d)
        lab = {}
        rounds = {}
        for name, sql in (
            ("hashmin", _cc_hashmin_sql()),
            ("jump", _cc_jump_sql()),
            ("twostar", _cc_twostar_sql()),
        ):
            rows = con.execute(sql).fetchall()
            lab[name] = {(r[0], r[1]) for r in rows}
            rounds[name] = {r[2] for r in rows}
        assert lab["hashmin"] == lab["jump"] == lab["twostar"]
        assert {(9, 9)} <= lab["hashmin"]  # self-loop node labels itself
        assert all(
            len(v) == 1 and next(iter(v)) >= 1 for v in rounds.values()
        )


class TestWindowedTrussOracleGeneratorOffDefault:
    def test_rounds_1_unroll_equals_registered_output(self, spark, tmp_path):
        """rounds=1 forces the generator's final-supf recompute path on
        a planted K4 (3-truss peels in one round by construction —
        support-0 edges belong to no triangle, so their removal can't
        cascade): the 1-round unroll must already equal the registered
        6-round form AND the Spark operator's output."""
        import datetime as dt

        from autoaudit_spark.operators.graph import (
            _WT_SLIDE_US,
            _k_truss_windowed_oracle,
        )
        from autoaudit_spark.registry import QUERIES

        t = dt.datetime(2024, 4, 1)
        e_us = int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        slot_us = (e_us // _WT_SLIDE_US) * _WT_SLIDE_US
        slot = dt.datetime.fromtimestamp(
            slot_us / 1_000_000, dt.timezone.utc
        ).replace(tzinfo=None)
        rows, i = [], 0
        # K4 on {1..4} at mult 2, plus a triangle-free strong pair (5, 6)
        for a, b in [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 6)]:
            for _ in range(2):
                rows.append(
                    (i * 150 + b, slot + dt.timedelta(minutes=i), a,
                     "pay", 1.0, "{}")
                )
                i += 1
        d = str(tmp_path / "wt_gen")
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).write.parquet(f"{d}/events.parquet")

        con = _duck(d)
        one = sorted(con.execute(_k_truss_windowed_oracle(rounds=1)).fetchall())
        six = sorted(con.execute(_k_truss_windowed_oracle()).fetchall())
        assert one == six
        got = sorted(
            (r["window_start"], r["a"], r["b"], r["support"])
            for r in QUERIES["k_truss_windowed"](spark, d).collect()
        )
        assert got == one
        # the planted content survived: 6 K4 edges × 2 windows, (5,6) peeled
        assert len(one) == 12 and all(r[3] == 2 for r in one)


class TestWindowedKCoreOracleGeneratorOffDefault:
    def test_cascade_needs_multiple_rounds(self, spark, tmp_path):
        """A planted peel CASCADE: a chain 7 → 8 → 9 hangs off a stable
        K7 on {20..26} (7 has 4 core neighbors + 8 = degree 5 and peels
        first; 8 has 7 + 9 + 4 core = 6 until 7 goes; 9 has 8 + 5 core
        = 6 until 8 goes): rounds=1 must still contain chain survivors
        the fixpoint unroll has peeled, and the default unroll must
        equal the registered Spark operator (which exits early on the
        count-provable fixpoint)."""
        import datetime as dt

        from autoaudit_spark.operators.graph import (
            _WT_SLIDE_US,
            _k_core_windowed_oracle,
        )
        from autoaudit_spark.registry import QUERIES

        t = dt.datetime(2024, 7, 1)
        e_us = int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        slot_us = (e_us // _WT_SLIDE_US) * _WT_SLIDE_US
        slot = dt.datetime.fromtimestamp(
            slot_us / 1_000_000, dt.timezone.utc
        ).replace(tzinfo=None)
        pairs = [
            (a, b) for a in range(20, 27) for b in range(a + 1, 27)
        ]
        pairs += [(7, n) for n in range(20, 24)]             # 4 core nbrs
        pairs += [(8, 7), (8, 9)] + [(8, n) for n in range(20, 24)]
        pairs += [(9, n) for n in range(20, 25)]             # 5 core nbrs
        rows, i = [], 0
        for a, b in pairs:
            for _ in range(2):  # mult 2 >= WT_MIN_MULT
                rows.append(
                    (i * 150 + b, slot + dt.timedelta(minutes=i), a,
                     "pay", 1.0, "{}")
                )
                i += 1
        d = str(tmp_path / "kcw_gen")
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).write.parquet(f"{d}/events.parquet")

        con = _duck(d)
        one = sorted(con.execute(_k_core_windowed_oracle(rounds=1)).fetchall())
        fix = sorted(con.execute(_k_core_windowed_oracle()).fetchall())
        # the cascade keeps peeling after round 1: 8 and 9 survive the
        # first peel but not the fixpoint (in both covering windows)
        assert set(fix) < set(one)
        assert {n for (_w, n) in set(one) - set(fix)} == {8, 9}
        got = sorted(
            (r["window_start"], r["node"])
            for r in QUERIES["k_core_windowed"](spark, d).collect()
        )
        assert got == fix
        # the surviving core is exactly the clean K7, in both windows
        assert {n for (_w, n) in fix} == set(range(20, 27))
        assert len(fix) == 14
        # off-default k: at k=2 nothing peels on this fixture (every
        # node has degree >= 2) — generator and parametric kernel must
        # agree cross-engine at a second k, not just the registered one
        from autoaudit_spark.operators.graph import k_core_windowed
        from autoaudit_spark.sources import edges as edges_src

        two = sorted(con.execute(_k_core_windowed_oracle(k=2)).fetchall())
        got2 = sorted(
            (r["window_start"], r["node"])
            for r in k_core_windowed(edges_src(spark, d), k=2).collect()
        )
        assert got2 == two
        assert {n for (_w, n) in two} == set(range(20, 27)) | {7, 8, 9}


class TestWindowedTrussRoundLimitFallback:
    def test_rounds_0_spark_fallback_matches_generated_oracle(
        self, spark, tmp_path, monkeypatch
    ):
        """The pre-fixpoint fallback (round budget exhausted before
        convergence — supports recomputed on the survivors with
        zero-fill) is unreachable at the registered WT_ROUNDS=6, so
        force it: WT_ROUNDS=0 keeps every strong edge unpeeled, and the
        Spark fallback must match _k_truss_windowed_oracle(rounds=0)
        including support-0 rows the converged path never emits."""
        import datetime as dt

        from autoaudit_spark.operators import graph as graph_mod
        from autoaudit_spark.operators.graph import (
            _WT_SLIDE_US,
            _k_truss_windowed_oracle,
        )

        t = dt.datetime(2024, 6, 1)
        e_us = int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        slot_us = (e_us // _WT_SLIDE_US) * _WT_SLIDE_US
        slot = dt.datetime.fromtimestamp(
            slot_us / 1_000_000, dt.timezone.utc
        ).replace(tzinfo=None)
        rows, i = [], 0
        # triangle {1,2,3} + a triangle-free strong pair (5, 6)
        for a, b in [(1, 2), (1, 3), (2, 3), (5, 6)]:
            for _ in range(2):
                rows.append(
                    (i * 150 + b, slot + dt.timedelta(minutes=i), a,
                     "pay", 1.0, "{}")
                )
                i += 1
        d = str(tmp_path / "wt_fb")
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).write.parquet(f"{d}/events.parquet")

        monkeypatch.setattr(graph_mod, "WT_ROUNDS", 0)
        got = sorted(
            (r["window_start"], r["a"], r["b"], r["support"])
            for r in graph_mod.q_k_truss_windowed(spark, d).collect()
        )
        expect = sorted(
            _duck(d).execute(_k_truss_windowed_oracle(rounds=0)).fetchall()
        )
        assert got == expect
        # zero-peel semantics: (5, 6) survives WITH support 0
        assert any(r[1] == 5 and r[2] == 6 and r[3] == 0 for r in got)
        assert all(r[3] == 1 for r in got if r[1] != 5)


class TestDissolutionBuilder:
    def test_truss_form_is_identical_to_the_former_literal(self):
        """Direction-flipped r13 re-gate guard: through r12 the
        registered truss oracle was a LITERAL SQL string and this test
        pinned the keyed `_dissolution_sql` builder's ("a", "b") +
        ("support",) instance whitespace-identical to it, proving the
        re-gate a no-op. Since the re-gate the registration delegates
        to the builder, so the former literal lives HERE instead — any
        drift in the builder (or in the windowed-truss base/slide
        constants it splices) now fails against the frozen literal
        form rather than silently changing the registered oracle."""
        from autoaudit_spark.operators.graph import (
            _WT_SLIDE_US,
            WT_SLIDE,
            _k_truss_windowed_oracle,
            _truss_dissolution_sql,
        )
        from autoaudit_spark.registry import ORACLES

        literal = f"""
        WITH base AS ({_k_truss_windowed_oracle()}),
        mx AS (SELECT make_timestamp((epoch_us(MAX(ts)) // {_WT_SLIDE_US})
                   * {_WT_SLIDE_US}) AS mx FROM events)
        SELECT b.window_start, b.a, b.b, b.support
        FROM base b, mx
        WHERE b.window_start < mx.mx
          AND NOT EXISTS (
            SELECT 1 FROM base n
            WHERE n.a = b.a AND n.b = b.b
              AND n.window_start = b.window_start + INTERVAL '{WT_SLIDE}')
        ORDER BY b.window_start, b.a, b.b
        """
        assert " ".join(literal.split()) == " ".join(
            _truss_dissolution_sql().split()
        )
        # and the REGISTERED oracle is exactly the builder instance
        assert ORACLES["truss_dissolution"] == " ".join(
            _truss_dissolution_sql().split()
        )

    def test_truss_dissolution_spark_parity_with_former_literal(
        self, spark, tmp_path
    ):
        """Direction-flipped r13 re-gate guard (Spark side): through
        r12 the registered body was a literal plan and this test
        pinned `dissolution(truss, e0, ("a", "b"))` equal to it on a
        planted-K4-collapse fixture. Since the re-gate the
        registration IS the kernel call, so the former literal body is
        built inline here and pinned against the registered rows —
        same nonvacuous equivalence, drift guard preserved."""
        import datetime as dt

        from pyspark.sql import functions as F

        from autoaudit_spark.operators.graph import (
            _WT_SLIDE_US,
            WT_SLIDE,
            WT_WINDOW,
            q_k_truss_windowed,
        )
        from autoaudit_spark.registry import QUERIES
        from autoaudit_spark.sources import edges as edges_src

        t = dt.datetime(2024, 9, 1)
        e_us = int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        slot_us = (e_us // _WT_SLIDE_US) * _WT_SLIDE_US
        slot = dt.datetime.fromtimestamp(
            slot_us / 1_000_000, dt.timezone.utc
        ).replace(tzinfo=None)
        slide = dt.timedelta(microseconds=_WT_SLIDE_US)
        # K4 on {1..4} at mult 2 >= WT_MIN_MULT, active in one slot only
        rows = [
            (i * 150 + b, slot + dt.timedelta(minutes=i), a, "pay", 1.0, "{}")
            for i, (a, b) in enumerate(
                [(a, b) for a, b in [(1, 2), (1, 3), (1, 4), (2, 3),
                                     (2, 4), (3, 4)] for _ in range(2)]
            )
        ]
        # noise event one slide later makes the collapse observable
        rows.append((9999, slot + slide, 50, "pay", 1.0, "{}"))
        d = str(tmp_path / "tdis_par")
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).write.parquet(f"{d}/events.parquet")

        reg = sorted(
            (r["window_start"], r["a"], r["b"], r["support"])
            for r in QUERIES["truss_dissolution"](spark, d).collect()
        )
        # the former literal body, verbatim (pre-r13 registration)
        t_lit = q_k_truss_windowed(spark, d).localCheckpoint()
        mx = (
            edges_src(spark, d)
            .select(F.window("ts", WT_WINDOW, WT_SLIDE)["start"].alias("w"))
            .agg(F.max("w").alias("mx"))
        )
        nxt = t_lit.select(
            (F.col("window_start") - F.expr(f"INTERVAL {WT_SLIDE}")).alias(
                "window_start"
            ),
            "a",
            "b",
        )
        lit = sorted(
            (r["window_start"], r["a"], r["b"], r["support"])
            for r in (
                t_lit.crossJoin(F.broadcast(mx))
                .filter(F.col("window_start") < F.col("mx"))
                .drop("mx")
                .join(nxt, ["window_start", "a", "b"], "left_anti")
                .orderBy("window_start", "a", "b")
            ).collect()
        )
        assert lit == reg
        assert reg, "fixture must plant a nonvacuous dissolution"


class TestFormationBuilder:
    def test_core_formation_cross_engine_exact_on_real_data(
        self, spark, sf_root
    ):
        """Spark `core_formation` vs its DuckDB builder twin on the
        real sf0.01 events — every typed row equal (the
        pre-registration value-hash evidence; measured end-r11: 150
        formed nodes at this SF, so the parity is nonvacuous)."""
        sf = f"{sf_root}/sf0.01"
        from autoaudit_spark.operators.graph import (
            _core_formation_sql,
            core_formation,
        )

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf}/events.parquet')"
        )
        expect = con.execute(_core_formation_sql()).fetchall()
        got = [
            (r["window_start"], r["node"])
            for r in core_formation(spark, sf).collect()
        ]
        assert got == expect
        # nonvacuity only — the typed-row equality above is the parity
        # evidence; pinning the measured 150 would break on any fixture
        # regeneration or K_CORE_K/WT retune for non-correctness
        # reasons (r11 ADVICE)
        assert got


class TestPersistenceBuilder:
    def test_core_persistence_cross_engine_exact_on_real_data(
        self, spark, sf_root
    ):
        """Spark `core_persistence` vs its DuckDB builder twin on the
        real sf0.01 events — every typed row equal (the
        pre-registration value-hash evidence; measured end-r11 the
        run-length histogram is {2: 15, 3: 135} at this SF, so the
        parity covers multi-length runs, not a degenerate single
        bucket)."""
        sf = f"{sf_root}/sf0.01"
        from autoaudit_spark.operators.graph import (
            _core_persistence_sql,
            core_persistence,
        )

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf}/events.parquet')"
        )
        expect = con.execute(_core_persistence_sql()).fetchall()
        got = [
            (r["node"], r["run_start"], r["run_end"], r["n_windows"])
            for r in core_persistence(spark, sf).collect()
        ]
        assert got == expect
        assert got
        # the parity must cover >1 distinct run length or the island
        # arithmetic is untested beyond COUNT(*)=k
        assert len({n for *_k, n in got}) > 1

    def test_lifecycle_reports_are_views_of_one_island_decomposition(
        self, spark, sf_root
    ):
        """The three lifecycle reports must reconcile EXACTLY on real
        sf0.01 data — they are projections of one island decomposition
        of the windowed core: Σ n_windows = |core|; the formation
        report = run starts strictly after the data's first window;
        the dissolution report = run ends strictly before the data's
        last window. Computed off ONE shared core materialization so a
        disagreement is in the report algebra, not the peel."""
        sf = f"{sf_root}/sf0.01"
        from autoaudit_spark.operators.graph import (
            WT_SLIDE,
            WT_WINDOW,
            dissolution,
            formation,
            k_core_windowed,
            persistence,
        )
        from autoaudit_spark.sources import edges as edges_src
        from pyspark.sql import functions as F

        e0 = edges_src(spark, sf)
        core = k_core_windowed(e0).localCheckpoint()
        runs = persistence(core, ("node",)).collect()
        formed = {
            (r["window_start"], r["node"])
            for r in formation(core, e0, ("node",)).collect()
        }
        dissolved = {
            (r["window_start"], r["node"])
            for r in dissolution(core, e0, ("node",)).collect()
        }
        w = (
            e0.select(F.window("ts", WT_WINDOW, WT_SLIDE)["start"].alias("w"))
            .agg(F.min("w").alias("mn"), F.max("w").alias("mx"))
            .collect()[0]
        )
        assert sum(r["n_windows"] for r in runs) == core.count()
        assert {
            (r["run_start"], r["node"]) for r in runs if r["run_start"] > w["mn"]
        } == formed
        assert {
            (r["run_end"], r["node"]) for r in runs if r["run_end"] < w["mx"]
        } == dissolved
        assert runs and formed and dissolved


class TestTrussLifecycle:
    """Pre-built r12 birth candidates (NOT registered — window
    capacity): the truss-side formation/persistence compositions
    through the keyed kernels the core side proved."""

    def test_truss_formation_planted_spin_up(self, spark, tmp_path):
        """K4 active in one slot with a noise event two slides BEFORE:
        the truss edges form at their first in-truss window
        (slot − slide) with support 2, and nowhere else — the
        core-formation planted fixture transposed to the edge side."""
        from autoaudit_spark.operators.graph import (
            _WT_SLIDE_US,
            truss_formation,
        )

        t = dt.datetime(2024, 9, 1)
        e_us = int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        slot_us = (e_us // _WT_SLIDE_US) * _WT_SLIDE_US
        slot = dt.datetime.fromtimestamp(
            slot_us / 1_000_000, dt.timezone.utc
        ).replace(tzinfo=None)
        slide = dt.timedelta(microseconds=_WT_SLIDE_US)
        k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
        rows = [
            (i * 150 + b, slot + dt.timedelta(minutes=i), a, "pay", 1.0, "{}")
            for i, (a, b) in enumerate(
                [p for p in k4 for _ in range(2)]
            )
        ]
        rows.append((9999, slot - 2 * slide, 50, "pay", 1.0, "{}"))
        d = str(tmp_path / "tform")
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).write.parquet(f"{d}/events.parquet")

        got = {
            (r["window_start"], r["a"], r["b"], r["support"])
            for r in truss_formation(spark, d).collect()
        }
        assert got == {(slot - slide, a, b, 2) for a, b in k4}

    def test_truss_formation_cross_engine_exact_on_real_data(
        self, spark, sf_root
    ):
        """Spark `truss_formation` vs its DuckDB builder twin on real
        sf0.01 events — typed rows equal (measured 2276 formed edges
        at this SF; nonvacuity asserted, count not pinned)."""
        sf = f"{sf_root}/sf0.01"
        from autoaudit_spark.operators.graph import (
            _truss_formation_sql,
            truss_formation,
        )

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf}/events.parquet')"
        )
        expect = con.execute(_truss_formation_sql()).fetchall()
        got = [
            (r["window_start"], r["a"], r["b"], r["support"])
            for r in truss_formation(spark, sf).collect()
        ]
        assert got == expect
        assert got

    @pytest.mark.parametrize("sfname", ["sf0.001", "sf0.01", "sf0.1"])
    def test_truss_persistence_cross_engine_exact_on_real_data(
        self, spark, sf_root, sfname
    ):
        """Spark `truss_persistence` vs its DuckDB builder twin on real
        events at ALL THREE SFs (r16: widened from sf0.01-only to the
        census/hyperball standing tri-SF pattern ahead of its queued
        r18 registration; measured 24 / 2,279 / 13,209 rows). The
        sf0.01 histogram {1: 1449, 2: 803, 3: 27} has multi-length
        runs, so the island arithmetic is exercised."""
        sf = f"{sf_root}/{sfname}"
        from autoaudit_spark.operators.graph import (
            _truss_persistence_sql,
            truss_persistence,
        )

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf}/events.parquet')"
        )
        expect = con.execute(_truss_persistence_sql()).fetchall()
        got = [
            (r["a"], r["b"], r["run_start"], r["run_end"], r["n_windows"])
            for r in truss_persistence(spark, sf).collect()
        ]
        assert got == expect
        assert got
        if sfname != "sf0.001":
            # multi-length runs only appear from sf0.01 up (sf0.001's
            # 24 runs are all single-window — measured {1})
            assert len({n for *_k, n in got}) > 1

    def test_truss_lifecycle_identity_on_real_data(self, spark, sf_root):
        """The edge-side lifecycle identity on one shared truss
        materialization: Σ n_windows = |truss|; formation = run starts
        after the data's first window; dissolution = run ends before
        the data's last window."""
        sf = f"{sf_root}/sf0.01"
        from autoaudit_spark.operators.graph import (
            WT_SLIDE,
            WT_WINDOW,
            dissolution,
            formation,
            persistence,
            q_k_truss_windowed,
        )
        from autoaudit_spark.sources import edges as edges_src
        from pyspark.sql import functions as F

        e0 = edges_src(spark, sf)
        truss = q_k_truss_windowed(spark, sf).localCheckpoint()
        runs = persistence(truss, ("a", "b")).collect()
        formed = {
            (r["window_start"], r["a"], r["b"])
            for r in formation(truss, e0, ("a", "b")).collect()
        }
        dissolved = {
            (r["window_start"], r["a"], r["b"])
            for r in dissolution(truss, e0, ("a", "b")).collect()
        }
        w = (
            e0.select(F.window("ts", WT_WINDOW, WT_SLIDE)["start"].alias("w"))
            .agg(F.min("w").alias("mn"), F.max("w").alias("mx"))
            .collect()[0]
        )
        assert sum(r["n_windows"] for r in runs) == truss.count()
        assert {
            (r["run_start"], r["a"], r["b"])
            for r in runs
            if r["run_start"] > w["mn"]
        } == formed
        assert {
            (r["run_end"], r["a"], r["b"])
            for r in runs
            if r["run_end"] < w["mx"]
        } == dissolved
        assert runs and formed and dissolved


class TestHyperballSketchOracle:
    """The r13-verdict #5 oracle design: `hyperball_sketch` emits only
    IEEE-determined columns (integer zero counts, exact dyadic register
    sums, one correctly-rounded division), so the DuckDB twin must
    match BIT-EXACTLY — floats compared with ==, at all three SFs.
    This standing check is what makes registration a one-liner when a
    window slot opens."""

    @pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
    def test_cross_engine_exact(self, spark, sf_root, sf):
        import os

        import duckdb as ddb

        from autoaudit_spark.operators.graph import (
            _hyperball_sketch_sql,
            hyperball_sketch,
        )

        d = f"{sf_root}/{sf}"
        if not os.path.exists(f"{d}/events.parquet"):
            pytest.skip(f"no testdata at {d}")
        got = [tuple(r) for r in hyperball_sketch(spark, d).collect()]
        con = ddb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        want = con.execute(_hyperball_sketch_sql()).fetchall()
        assert len(got) == len(want) and got and got == want

    def test_planted_star_registers_and_depth2(self, spark, tmp_path):
        """Off the registered depth (depth=2) on a planted star +
        pendant chain: the generator parameterization must track the
        Spark kernel away from the default point too (the
        _harmonic_sql generator discipline)."""
        import duckdb as ddb

        from autoaudit_spark.operators.graph import (
            _hyperball_sketch_sql,
            adjacency,
            hyperball_registers,
        )

        pairs = [(0, 1), (0, 2), (0, 3), (3, 4), (4, 5)]
        d = _events_fixture(spark, tmp_path, pairs, "hbs2")
        from autoaudit_spark.operators.graph import hyperball_sketch

        got = [tuple(r) for r in hyperball_sketch(spark, d, depth=2).collect()]
        con = _duck(d)
        want = con.execute(_hyperball_sketch_sql(depth=2)).fetchall()
        assert got == want and len(got) == 6
        # depth-2 sketch of node 5 must equal the HLL of {3,4,5}'s
        # init registers (ball_2(5)), independently recomputed
        sk2 = hyperball_registers(adjacency(spark, d), depth=2)[1]
        row5 = [r for r in sk2.collect() if r["node"] == 5][0]
        P = 1000000007

        def init(v):
            hi = (v >> 29) % P
            lo = v & ((1 << 29) - 1)
            h1 = (hi * 2654435761 + lo * 737407013 + 11) % P
            h2 = (hi * 3266489917 + lo * 461845907 + 97) % P
            idx = h1 % 64
            rnk = 24 if h2 == 0 else min((h2 & -h2).bit_length(), 24)
            regs = [0] * 64
            regs[idx] = rnk
            return regs

        want5 = [
            max(init(u)[j] for u in (3, 4, 5)) for j in range(64)
        ]
        assert [row5[f"h{j}"] for j in range(64)] == want5


class TestWindowedComponentCensus:
    """Pre-built r15 birth candidate (NOT registered — window
    capacity): per-window hash-min component census over the shared
    windowed strong-tie relation, closure-oracled like the global CC
    family."""

    def test_planted_consolidation(self, spark, tmp_path):
        """Two disjoint strong-tie pairs → two 2-member components in
        both windows the events fall into; adding a strong bridge
        merges them into ONE 4-member component labeled by the min id
        — the consolidation semantics the census exists to report."""
        from autoaudit_spark.operators.graph import (
            component_census_windowed,
        )
        from autoaudit_spark.sources import edges as edges_src

        frag = _events_fixture(
            spark, tmp_path,
            [(1, 2), (1, 2), (3, 4), (3, 4)],
            "census_frag",
        )
        got = {
            (r["component"], r["n_members"])
            for r in component_census_windowed(
                edges_src(spark, frag)
            ).collect()
        }
        assert got == {(1, 2), (3, 2)}

        merged = _events_fixture(
            spark, tmp_path,
            [(1, 2), (1, 2), (3, 4), (3, 4), (2, 3), (2, 3)],
            "census_merged",
        )
        rows = component_census_windowed(edges_src(spark, merged)).collect()
        assert {(r["component"], r["n_members"]) for r in rows} == {(1, 4)}
        # every event lands in window/slide = 2 sliding windows
        assert len({r["window_start"] for r in rows}) == 2

    def test_weak_tie_excluded(self, spark, tmp_path):
        """A pair seen ONCE in a window is not a strong tie and must
        not bridge components (the WT_MIN_MULT >= 2 contract shared
        with the truss/core family)."""
        from autoaudit_spark.operators.graph import (
            component_census_windowed,
        )
        from autoaudit_spark.sources import edges as edges_src

        d = _events_fixture(
            spark, tmp_path,
            [(1, 2), (1, 2), (3, 4), (3, 4), (2, 3)],
            "census_weak",
        )
        got = {
            (r["component"], r["n_members"])
            for r in component_census_windowed(edges_src(spark, d)).collect()
        }
        assert got == {(1, 2), (3, 2)}

    def test_safety_bound_raises_not_truncates(self, spark, tmp_path):
        """max_iter is the connected_components SAFETY BOUND: a budget
        too small to prove the fixpoint must raise, never return
        non-converged labels that would diverge from the closure
        oracle."""
        from autoaudit_spark.operators.graph import (
            component_census_windowed,
        )
        from autoaudit_spark.sources import edges as edges_src

        d = _events_fixture(
            spark, tmp_path, [(1, 2), (1, 2)], "census_bound"
        )
        with pytest.raises(ValueError, match="converge"):
            component_census_windowed(edges_src(spark, d), max_iter=0)

    @pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
    def test_cross_engine_exact_on_real_data(self, spark, sf_root, sf):
        """Spark census vs the closure-based DuckDB builder twin on
        real events at ALL THREE SFs (the hyperball standing-oracle
        precedent: a registration stays a one-liner only while this
        holds) — typed rows equal. Measured 10/26/77 census rows: a
        fragmented first window consolidating into a giant component
        in later windows."""
        import os

        d = f"{sf_root}/{sf}"
        if not os.path.exists(f"{d}/events.parquet"):
            pytest.skip(f"{sf} testdata absent")
        from autoaudit_spark.operators.graph import (
            _windowed_component_census_sql,
            q_windowed_component_census,
        )

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        expect = con.execute(_windowed_component_census_sql()).fetchall()
        got = [
            (r["window_start"], r["component"], r["n_members"])
            for r in q_windowed_component_census(spark, d).collect()
        ]
        assert got == expect
        assert got
        # the consolidation shape (sf0.01 up): some window holds >1
        # component and some window holds a giant component
        by_w = {}
        for w, _c, n in got:
            by_w.setdefault(w, []).append(n)
        if sf == "sf0.001":
            # measured build-time shape: a 10-row census spanning
            # multiple windows, members conserved per window (every
            # windowed node is in exactly one component, so each
            # window's member sum equals its component-count-weighted
            # total — at minimum, all counts positive and windows >= 2)
            assert len(got) == 10
            assert len(by_w) >= 2
            assert all(n >= 1 for _w, _c, n in got)
        else:
            assert max(len(v) for v in by_w.values()) > 1
            assert max(n for _w, _c, n in got) >= 100


class TestSinkAccountsHighValue:
    """r16: q_sink_accounts restricted to the high-value subgraph
    (weight > SINK_WEIGHT_MIN) — the full-graph form was vacuous at
    every driver SF (the r15 verdict nit: the mod-150 id space gives
    every account an out-edge, so its green row only proved
    empty==empty). These tests plant real sinks and pin nonvacuity on
    the real data."""

    def _fixture(self, spark, tmp_path):
        """events whose derived HIGH-VALUE edge set has two planted
        sinks: 2 (receives 500, sends only a low-value 10) and
        5 (receives 450, sends nothing). 4 receives AND sends high
        (not a sink); 7 only ever receives low value (not in the
        high-value subgraph at all)."""
        t0 = dt.datetime(2024, 1, 1)
        planted = [
            (1, 2, 500.0),  # high: 2 receives
            (2, 3, 10.0),   # low: does NOT disqualify 2
            (3, 4, 400.0),  # high: 4 receives...
            (4, 5, 450.0),  # high: ...and sends, so 4 out / 5 in
            (6, 7, 100.0),  # low: 7 never enters the subgraph
        ]
        rows = [
            (n * 150 + dst, t0 + dt.timedelta(hours=n), src, "pay", w, "{}")
            for n, (src, dst, w) in enumerate(planted)
        ]
        d = str(tmp_path / "sinks")
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).write.parquet(f"{d}/events.parquet")
        return d

    def test_planted_sinks_cross_engine(self, spark, tmp_path):
        from autoaudit_spark.registry import ORACLES, QUERIES

        d = self._fixture(spark, tmp_path)
        got = [r["account"] for r in QUERIES["sink_accounts"](spark, d).collect()]
        assert got == [2, 5]
        expect = [r[0] for r in _duck(d).execute(ORACLES["sink_accounts"]).fetchall()]
        assert got == expect

    @pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
    def test_nonvacuous_and_exact_on_real_data(self, spark, sf_root, sf):
        """The point of the r16 change: nonzero rows at EVERY driver SF
        (measured 1 / 18 / 105) AND typed-row equality vs the oracle."""
        import os

        from autoaudit_spark.registry import ORACLES, QUERIES

        d = f"{sf_root}/{sf}"
        if not os.path.exists(f"{d}/events.parquet"):
            pytest.skip(f"{sf} testdata absent")
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        expect = [r[0] for r in con.execute(ORACLES["sink_accounts"]).fetchall()]
        got = [r["account"] for r in QUERIES["sink_accounts"](spark, d).collect()]
        assert got == expect
        assert len(got) >= 1


class TestIterativeTwinsTriSFStanding:
    """r16 (r15 verdict #7): extend the census/hyperball standing
    tri-SF cross-engine pattern to the iterative unrolled-twin family —
    HITS (the decimal-quantized mutually-recursive pair), seeded PPR,
    and weighted PageRank (the two registered damped_walk consumers —
    between them every damped_walk code path: uniform vs weight-mass
    contribution split and teleport-to-seed vs global teleport). The
    per-round check.py sweeps certify these at rotation time; this
    standing check keeps the oracle builders honest BETWEEN rotations
    (a drift in either engine's unroll shows up on the next suite run,
    not two rounds later at the next driver row)."""

    @pytest.mark.parametrize(
        "name", ["hits_scores", "seeded_ppr", "pagerank_weighted"]
    )
    @pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
    def test_cross_engine_exact_on_real_data(self, spark, sf_root, sf, name):
        import os

        from autoaudit_spark.registry import ORACLES, QUERIES

        d = f"{sf_root}/{sf}"
        if not os.path.exists(f"{d}/events.parquet"):
            pytest.skip(f"{sf} testdata absent")
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        want = con.execute(ORACLES[name]).fetchall()
        got = [tuple(r) for r in QUERIES[name](spark, d).collect()]
        assert len(got) == len(want)
        assert got == want
        assert got, f"{name} vacuous at {sf}"


class TestWindowedLifecycleTriSFStanding:
    """r17 (r16 verdict #8): extend the standing tri-SF cross-engine
    pattern to the REGISTERED windowed-lifecycle oracles — the family
    with the largest unrolled-twin SQL (6-round peel CTE chains), where
    builder drift between rotations would hurt most. Checked against
    the live registry ORACLES (not the builder function) so a drift in
    either the builder OR the registered snapshot shows up on the next
    suite run, not two rounds later at the next driver row. Measured
    shapes (r17): k_truss_windowed 24 / 3,136 / 15,895 rows;
    core_persistence 0 / 150 / 1,373 rows — the sf0.001 core
    persistence result is EMPTY by data (no account holds the k-core
    threshold across consecutive windows at that scale), which is the
    empty-result regime sf0.001 exists to exercise, so nonvacuity is
    asserted from sf0.01 up only."""

    @pytest.mark.parametrize(
        "name", ["k_truss_windowed", "core_persistence"]
    )
    @pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
    def test_cross_engine_exact_on_real_data(self, spark, sf_root, sf, name):
        import os

        from autoaudit_spark.registry import ORACLES, QUERIES

        d = f"{sf_root}/{sf}"
        if not os.path.exists(f"{d}/events.parquet"):
            pytest.skip(f"{sf} testdata absent")
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        want = sorted(con.execute(ORACLES[name]).fetchall())
        got = sorted(tuple(r) for r in QUERIES[name](spark, d).collect())
        assert len(got) == len(want)
        assert got == want
        if not (name == "core_persistence" and sf == "sf0.001"):
            assert got, f"{name} vacuous at {sf}"


class TestWalkCorpus:
    """r16 banked walk-corpus generator: deterministic hash-guided
    truncated walks (DeepWalk-style corpus prep). The cross-engine rows
    prove Spark == DuckDB; the planted test proves BOTH engines == an
    independent from-scratch simulation of the stated rule (argmin of
    the portable polynomial hash over out-neighbors), so an algebra
    slip shared by the two twins cannot hide."""

    def _simulate(self, adj, walks_per_node, depth):
        """Independent reimplementation (plain dicts, no Spark/SQL)."""
        P, R = 1000000007, 2147483648
        rows = []
        for node in sorted(adj):
            for k in range(walks_per_node):
                w = node * walks_per_node + k
                c = node
                rows.append((w, 0, c))
                for t in range(1, depth + 1):
                    cands = adj.get(c)
                    if not cands:
                        break
                    best = None
                    for d in cands:
                        h = (w * 1000003 + t) % P
                        h = (h * 1000003 + d) % P
                        h = (h * 131 + 17) % P
                        key = h * R + d
                        if best is None or key < best:
                            best = key
                    c = best % R
                    rows.append((w, t, c))
        return sorted(rows)

    def test_planted_graph_matches_independent_simulation(
        self, spark, tmp_path
    ):
        from autoaudit_spark.operators.graph import (
            _walk_corpus_sql,
            walk_corpus,
        )

        pairs = [(1, 2), (1, 3), (2, 1), (3, 2)]
        d = _events_fixture(spark, tmp_path, pairs, "walks")
        adj = {1: [2, 3], 2: [1], 3: [2]}
        expect = self._simulate(adj, 2, 6)
        got = [tuple(r) for r in walk_corpus(spark, d).collect()]
        assert got == expect
        assert len(got) == 3 * 2 * 7  # no sinks -> every walk completes
        duck = _duck(d).execute(_walk_corpus_sql()).fetchall()
        assert [tuple(r) for r in duck] == expect

    def test_walk_stops_at_sink(self, spark, tmp_path):
        """A walk reaching a node with no out-edges ends (inner join);
        steps before the sink are still emitted."""
        from autoaudit_spark.operators.graph import walk_corpus

        # 1 -> 2 -> 3 (sink); walks from 3 emit only step 0
        pairs = [(1, 2), (2, 3)]
        d = _events_fixture(spark, tmp_path, pairs, "sink_walks")
        got = [tuple(r) for r in walk_corpus(spark, d).collect()]
        expect = self._simulate({1: [2], 2: [3]}, 2, 6)
        assert got == expect
        by_walk = {}
        for w, t, n in got:
            by_walk.setdefault(w, []).append((t, n))
        # walks starting at 1: 1 -> 2 -> 3, then stop (3 steps)
        assert [n for _t, n in sorted(by_walk[2])] == [1, 2, 3]
        # starts are only out-edge-bearing nodes: 3 never starts a walk
        assert set(by_walk) == {2, 3, 4, 5}

    def test_radix_guard_trips_on_wide_dst(self, spark):
        """r16 advice: dst >= 2^31 would make the packed argmin decode
        the wrong node IDENTICALLY on both engines (the oracle can't
        see it) — the runtime guard must raise loudly instead."""
        from autoaudit_spark.operators.graph import (
            _WALK_RADIX,
            _walk_radix_guard,
        )

        ok = spark.createDataFrame(
            [(1, _WALK_RADIX - 1)], "src LONG, dst LONG"
        )
        assert _walk_radix_guard(ok).count() == 1  # pass-through, no drop
        bad = spark.createDataFrame([(1, _WALK_RADIX)], "src LONG, dst LONG")
        with pytest.raises(Exception, match="radix violated"):
            _walk_radix_guard(bad).count()

    def test_real_edge_derivation_inside_radix(self, spark, sf_root):
        """The current derivation (dst = event_id % 150) trivially fits
        the radix — pin it on real data so a future widening of the
        edge derivation trips THIS test even before any walk runs."""
        from pyspark.sql import functions as F

        from autoaudit_spark.operators.graph import _WALK_RADIX
        from autoaudit_spark.sources import adjacency

        d = f"{sf_root}/sf0.001"
        mx = adjacency(spark, d).agg(F.max("dst")).collect()[0][0]
        assert mx is not None and mx < _WALK_RADIX

    @pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
    def test_cross_engine_exact_on_real_data(self, spark, sf_root, sf):
        """Standing tri-SF check (the banked-pair pattern) + the
        walks-follow-edges invariant on the Spark side."""
        import os

        from autoaudit_spark.operators.graph import (
            _walk_corpus_sql,
            walk_corpus,
        )

        d = f"{sf_root}/{sf}"
        if not os.path.exists(f"{d}/events.parquet"):
            pytest.skip(f"{sf} testdata absent")
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        want = con.execute(_walk_corpus_sql()).fetchall()
        df = walk_corpus(spark, d)
        got = [tuple(r) for r in df.collect()]
        assert got == want
        assert got
        # every consecutive (step t-1 -> t) hop is a real edge
        from autoaudit_spark.sources import adjacency

        edges = {
            (r["src"], r["dst"]) for r in adjacency(spark, d).collect()
        }
        pos = {(w, t): n for w, t, n in got}
        hops = [
            ((pos[(w, t - 1)], n) in edges)
            for (w, t), n in pos.items()
            if t > 0
        ]
        assert hops and all(hops)


class TestWalkSkipgramPairs:
    """r16 banked skip-gram pair extraction over the walk corpus — the
    second stage of the graph-embedding data prep. Same proof shape as
    TestWalkCorpus: both engines vs an independent pair count derived
    from the independently-simulated walks."""

    def _pairs_from_walks(self, rows, window=2):
        by_walk = {}
        for w, t, n in rows:
            by_walk.setdefault(w, []).append((t, n))
        cnt = {}
        for steps in by_walk.values():
            for ta, na in steps:
                for tb, nb in steps:
                    if ta != tb and abs(ta - tb) <= window:
                        cnt[(na, nb)] = cnt.get((na, nb), 0) + 1
        return sorted((c, x, n) for (c, x), n in cnt.items())

    def test_planted_graph_matches_independent_simulation(
        self, spark, tmp_path
    ):
        from autoaudit_spark.operators.graph import (
            _walk_skipgram_sql,
            walk_skipgram_pairs,
        )

        pairs = [(1, 2), (1, 3), (2, 1), (3, 2)]
        d = _events_fixture(spark, tmp_path, pairs, "sg")
        walks = TestWalkCorpus()._simulate({1: [2, 3], 2: [1], 3: [2]}, 2, 6)
        expect = self._pairs_from_walks(walks)
        got = [tuple(r) for r in walk_skipgram_pairs(spark, d).collect()]
        assert got == expect
        duck = _duck(d).execute(_walk_skipgram_sql()).fetchall()
        assert [tuple(r) for r in duck] == expect

    @pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
    def test_cross_engine_exact_on_real_data(self, spark, sf_root, sf):
        """Standing tri-SF check + the symmetry invariant (the window
        condition is symmetric, so pair counts must be too) and the
        mass identity vs the corpus (Σ pair_cnt = Σ per-walk in-window
        ordered position pairs)."""
        import os

        from autoaudit_spark.operators.graph import (
            _walk_corpus_sql,
            _walk_skipgram_sql,
            walk_skipgram_pairs,
        )

        d = f"{sf_root}/{sf}"
        if not os.path.exists(f"{d}/events.parquet"):
            pytest.skip(f"{sf} testdata absent")
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        want = con.execute(_walk_skipgram_sql()).fetchall()
        got = [tuple(r) for r in walk_skipgram_pairs(spark, d).collect()]
        assert got == want
        assert got
        cnt = {(c, x): n for c, x, n in got}
        assert cnt == {(x, c): n for (c, x), n in cnt.items()}
        walks = con.execute(_walk_corpus_sql()).fetchall()
        expect_mass = sum(
            1
            for c, x, n in TestWalkSkipgramPairs()._pairs_from_walks(walks)
            for _ in range(n)
        )
        assert sum(cnt.values()) == expect_mass

"""Unit tests for the mining layer: iForest, sketching, change score,
injector (SURVEY §5.2 — nondeterminism quarantined behind seeds)."""

from __future__ import annotations

import numpy as np
import pytest

from autoaudit_spark.mining.change import _cosine, change_scores_from_matrix
from autoaudit_spark.mining.generator import generate_fold_edges
from autoaudit_spark.mining.iforest import iforest_scores
from autoaudit_spark.mining.sketch import PN, generate_permutation


class TestIForest:
    def test_outlier_ranks_highest(self):
        rng = np.random.RandomState(7)
        X = rng.normal(0, 1, (300, 2))
        X[42] = [9.0, -9.0]
        s = iforest_scores(X, seed=1)
        assert int(np.argmax(s)) == 42
        assert s[42] > 0.6
        assert np.median(s) < 0.55

    def test_scores_in_unit_interval(self):
        X = np.random.RandomState(0).uniform(size=(50, 2))
        s = iforest_scores(X, seed=2)
        assert np.all((s > 0) & (s < 1))

    def test_deterministic_given_seed(self):
        X = np.random.RandomState(3).normal(size=(100, 2))
        assert np.array_equal(iforest_scores(X, seed=5), iforest_scores(X, seed=5))
        assert not np.array_equal(iforest_scores(X, seed=5), iforest_scores(X, seed=6))

    def test_tiny_group(self):
        # groups can be as small as 1-2 points (sparse windows)
        s = iforest_scores(np.array([[0.5, 0.5]]), seed=0)
        assert len(s) == 1 and np.isfinite(s[0])
        s2 = iforest_scores(np.array([[0.0, 0.0], [1.0, 1.0]]), seed=0)
        assert len(s2) == 2

    def test_degenerate_extents_warning_free(self):
        """Heavily tied data drives splits whose children are empty or
        unsplittable; the ±inf placeholder extents of empty node slots
        must be guarded (not left to emit inf−inf NaN RuntimeWarnings
        that would mask a real numeric regression)."""
        import warnings

        X = np.zeros((120, 2))
        X[:5] = np.random.RandomState(9).normal(0, 1, (5, 2))
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            s = iforest_scores(X, seed=4)
        assert np.all(np.isfinite(s))


class TestSketch:
    def test_permutation_deterministic_and_shaped(self):
        sg = np.random.RandomState(0).uniform(size=(500, PN))
        p1 = generate_permutation(500, sg, sketch_num=16, seed=0)
        p2 = generate_permutation(500, sg, sketch_num=16, seed=0)
        assert p1 == p2
        assert len(p1) == 16
        for src_id, dst_id in p1:
            assert len(dst_id) <= 3
            assert len(set(dst_id)) == len(dst_id)
            assert all(0 <= d < PN for d in dst_id)

    def test_greedy_picks_max_coverage_column(self):
        # one src row; column 5 dominates → must be picked first
        sg = np.zeros((10, PN))
        sg[3, 5] = 100.0
        sg[3, 7] = 1.0
        rng = np.random
        rng.seed(0)
        # craft permutation manually through the public API with rates
        # that force src={3}: impossible via RNG — test greedy directly
        from autoaudit_spark.mining.sketch import generate_permutation as gp

        # monkey-free: verify via a permutation whose sampled src rows
        # include row 3 eventually; instead assert the invariant that any
        # chosen dst with positive coverage beats unchosen ones for the
        # same sketch
        # col 5 dominates; whenever it is in the sampled candidate pool of
        # a sketch that sampled row 3, the greedy must pick it FIRST
        p = gp(10, sg, sketch_num=64, s_rate=0.5, d_rate=0.5, seed=1)
        hits = 0
        for src_id, dst_id in p:
            if 3 in src_id and 5 in dst_id:
                assert dst_id[0] == 5
                hits += 1
        assert hits > 0, "no sketch sampled both row 3 and column 5"


class TestChangeScore:
    def test_cosine(self):
        assert _cosine(np.array([1.0, 0.0]), np.array([1.0, 0.0])) == 0.0
        assert abs(_cosine(np.array([1.0, 0.0]), np.array([0.0, 1.0])) - 1.0) < 1e-12

    def test_flat_history_scores_spike(self):
        # 6 windows × 4 sketches; window 5 changes direction sharply
        wins = list(range(6))
        sk = np.ones((6, 4))
        sk[5] = [10.0, 1.0, 1.0, 1.0]
        out = change_scores_from_matrix(wins, sk, back_ws=4)
        assert [w for w, _, _ in out] == [4, 5]
        z = {w: z for w, z, _ in out}
        assert z[5] > z[4]  # the changed window scores higher
        max_sk = {w: m for w, _, m in out}
        assert max_sk[5] == 0  # sketch 0 is the most-changed

    def test_history_excludes_previous_window(self):
        # reference quirk (`AA-AR.py:237`): history is [i-b, i-1) — window
        # i-1 is excluded, so a spike at i-1 must NOT affect z_i's history
        wins = list(range(6))
        base = np.ones((6, 4))
        spiked = base.copy()
        spiked[4] = [99.0, 99.0, 99.0, 99.0]  # i-1 for i=5
        z_base = change_scores_from_matrix(wins, base, back_ws=4)[-1][1]
        z_spiked = change_scores_from_matrix(wins, spiked, back_ws=4)[-1][1]
        assert z_base == pytest.approx(z_spiked)


class TestGenerator:
    BANKS = np.arange(1000, 1100)
    CLIENTS = np.arange(1, 51)

    def test_deterministic(self):
        a = generate_fold_edges(self.BANKS, self.CLIENTS, 10, folds=3, seed=0)
        b = generate_fold_edges(self.BANKS, self.CLIENTS, 10, folds=3, seed=0)
        assert [(sorted(e), l) for e, l in a] == [(sorted(e), l) for e, l in b]

    def test_planted_star_present_and_labeled(self):
        for inj, (src, dst) in generate_fold_edges(
            self.BANKS, self.CLIENTS, 10, folds=5, seed=0
        ):
            mids = {m for s, m in inj if s == src}
            assert len(mids) >= 1
            # every chosen intermediary completes the star into dst
            assert all((m, dst) in inj for m in mids if (src, m) in inj)
            assert src in self.CLIENTS and dst in self.CLIENTS

    def test_noise_uses_other_clients(self):
        for inj, (src, dst) in generate_fold_edges(
            self.BANKS, self.CLIENTS, 20, folds=5, seed=1
        ):
            noise_srcs = {s for s, m in inj if s != src and s in self.CLIENTS}
            assert src not in noise_srcs and dst not in noise_srcs


def test_injection_recovery_end_to_end(spark):
    """Labeled-injection recovery (SURVEY §5.2): the planted smurf
    endpoints must land in the detected blocks."""
    from autoaudit_spark.mining.smurf import smurf_pipeline

    rng = np.random.RandomState(11)
    base = {(int(a), int(b)) for a, b in rng.randint(0, 200, size=(300, 2)) if a != b}
    inj, (src, dst) = generate_fold_edges(
        np.arange(100, 140), np.arange(0, 60), 12, folds=1, seed=3
    )[0]
    all_edges = sorted(base | inj)
    adj = spark.createDataFrame(all_edges, "src long, dst long")
    result, rank_df = smurf_pipeline(
        spark, adj, max_iter=10, max_candidates=100, selection="final", n_nodes=200
    )
    placed = set(result.order)
    assert src in placed and dst in placed


def test_background_edges_rate(spark):
    """J6: kept-pair fraction concentrates around 1 − interact_prob and
    the same seed reproduces the same edge set."""
    from autoaudit_spark.mining.generator import background_edges

    banks = spark.createDataFrame([(i,) for i in range(200)], "bank long").coalesce(1)
    e1 = background_edges(banks, interact_prob=0.95, seed=7)
    got = e1.count()
    assert 0.02 * 200 * 200 < got < 0.08 * 200 * 200
    assert {tuple(r) for r in e1.collect()} == {
        tuple(r) for r in background_edges(banks, interact_prob=0.95, seed=7).collect()
    }

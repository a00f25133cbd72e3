"""Property-based invariants (SURVEY §5.2) — hypothesis drives the
driver-side numpy kernels (fast per example); Spark-level invariants run
once against testdata.

Invariants from the survey:
- MDL never increases across accepted iterations (`AA-Smurf.py:128`);
- reorder is a permutation (J5 preserves the node universe);
- multi-degree ≥ unique-degree; Σ in-weights = Σ out-weights = Σ weight;
- sliding windows tile: each edge lands in exactly ⌈w/stride⌉ = 2 windows.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# -------------------------------------------------------------------------
# driver-side kernels under hypothesis
# -------------------------------------------------------------------------

edge_sets = st.lists(
    st.tuples(st.integers(0, 24), st.integers(0, 24)).filter(lambda t: t[0] != t[1]),
    min_size=5,
    max_size=120,
    unique=True,
)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(edges=edge_sets)
def test_mdl_history_monotone_nonincreasing(edges):
    """Accepted greedy iterations strictly reduce the description length;
    the recorded history (initial cost + accepted steps) never increases."""
    from autoaudit_spark.mining.smurf import smurf_search, two_hop_pairs_numpy

    ru = np.array([s for s, _ in edges], dtype=np.int64)
    rv = np.array([d for _, d in edges], dtype=np.int64)
    n = 25
    cands = two_hop_pairs_numpy(ru, rv, n, min_paths=2)
    res = smurf_search(ru, rv, n, cands, max_iter=8, selection="final")
    hist = res.mdl_history
    assert all(a >= b - 1e-9 for a, b in zip(hist, hist[1:]))


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(edges=edge_sets)
def test_final_layout_is_valid_permutation_prefix(edges):
    """ranks_for_order yields a bijection 0..n-1 for whatever prefix the
    search placed (J5: relabeling must preserve the node universe)."""
    from autoaudit_spark.mining.mdl import ranks_for_order
    from autoaudit_spark.mining.smurf import smurf_search, two_hop_pairs_numpy

    ru = np.array([s for s, _ in edges], dtype=np.int64)
    rv = np.array([d for _, d in edges], dtype=np.int64)
    n = 25
    cands = two_hop_pairs_numpy(ru, rv, n, min_paths=2)
    res = smurf_search(ru, rv, n, cands, max_iter=8, selection="final")
    pos = ranks_for_order(res.order, n)
    assert sorted(pos.tolist()) == list(range(n))


@settings(max_examples=25, deadline=None)
@given(x=st.integers(1, 10**9))
def test_log_star_positive_and_monotone(x):
    from autoaudit_spark.mining.mdl import log_star

    assert log_star(x) > 0
    assert log_star(x + 1) >= log_star(x)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    seed=st.integers(0, 2**16),
    n=st.integers(20, 60),
)
def test_iforest_scores_bounded_and_outlier_ranked(seed, n):
    """Scores live in (0, 1]; a far-away point scores above the cluster
    median (canonical iForest property, deterministic given the seed)."""
    from autoaudit_spark.mining.iforest import iforest_scores

    rng = np.random.RandomState(seed)
    X = np.vstack([rng.normal(0, 1, size=(n, 2)), [[12.0, 12.0]]])
    s = iforest_scores(X, n_estimators=50, seed=seed)
    assert np.all(s > 0) and np.all(s <= 1)
    assert s[-1] > np.median(s[:-1])


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2**16))
def test_change_score_zero_for_stationary_sketches(seed):
    """If every window's sketch equals the (constant) history direction,
    the cosine change score is ~0 for every scored window."""
    from autoaudit_spark.mining.change import change_scores_from_matrix

    rng = np.random.RandomState(seed)
    base = np.abs(rng.normal(1, 0.1, size=16)) + 0.1
    sk = np.tile(base, (8, 1))
    out = change_scores_from_matrix(list(range(8)), sk, back_ws=4)
    assert out and all(abs(z) < 1e-9 for _, z, _ in out)


# -------------------------------------------------------------------------
# Spark-level invariants (single-shot on sf0.001)
# -------------------------------------------------------------------------


def test_window_tiling_each_edge_in_two_windows(spark, sf_dir):
    from autoaudit_spark.sources import edges

    e = edges(spark, sf_dir)
    n_edges = e.count()
    windowed = e.select(F.window("ts", "14 days", "7 days").alias("w"))
    assert windowed.count() == 2 * n_edges


def test_weight_conservation_in_equals_out(spark, sf_dir):
    """Σ over accounts of in-weight = Σ of out-weight = Σ weight (every
    edge contributes once to each side)."""
    from autoaudit_spark.sources import edges

    e = edges(spark, sf_dir)
    total = e.agg(F.sum("weight")).collect()[0][0]
    ins = e.groupBy("dst").agg(F.sum("weight").alias("w")).agg(F.sum("w")).collect()[0][0]
    outs = e.groupBy("src").agg(F.sum("weight").alias("w")).agg(F.sum("w")).collect()[0][0]
    assert ins == pytest.approx(total, rel=1e-9)
    assert outs == pytest.approx(total, rel=1e-9)


def test_multi_degree_dominates_unique_degree(spark, sf_dir):
    from autoaudit_spark.registry import QUERIES

    bad = (
        QUERIES["degree_counts"](spark, sf_dir)
        .filter(F.col("multi_in_deg") < F.col("uniq_in_deg"))
        .count()
    )
    assert bad == 0


class TestCodecProperties:
    @given(
        data=st.binary(min_size=0, max_size=2048),
        width=st.integers(min_value=1, max_value=64),
    )
    @settings(max_examples=60, deadline=None)
    def test_bmp_roundtrip_any_width(self, data, width):
        """encode→decode recovers the input bytes for every width,
        including stride-padding widths (w*3 not divisible by 4)."""
        import numpy as np

        from autoaudit_spark.llm.multimodal import decode_bmp, encode_bmp_gray24

        bmp = encode_bmp_gray24(data, width=width, max_pixels=1024)
        img, w, h = decode_bmp(bmp)
        npix = min(len(data), 1024)
        assert w == width and h == max(1, -(-npix // width))
        flat = img[:, :, 0].reshape(-1)
        assert np.array_equal(
            flat[:npix], np.frombuffer(data[:npix], np.uint8)
        )
        assert (flat[npix:] == 0).all()

    @given(
        v=st.lists(
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
            min_size=1, max_size=16,
        )
    )
    @settings(max_examples=40, deadline=None)
    def test_resize_nearest_preserves_dtype_and_bounds(self, v):
        import numpy as np

        from autoaudit_spark.llm.multimodal import resize_nearest

        img = np.array(v * 8, dtype=np.float64).reshape(8, len(v))
        out = resize_nearest(img, 4)
        assert out.shape[0] <= 4 and out.shape[1] <= max(4, len(v) and 4)
        # every output value exists in the input (nearest-neighbor, no blend)
        assert np.isin(out.reshape(-1), img.reshape(-1)).all()


class TestR4OperatorProperties:
    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=40)
    )
    def test_rle_islands_partition_the_sequence(self, types):
        """Gaps-and-islands invariants on arbitrary sequences: run
        lengths sum to n, and consecutive runs never share a type."""
        runs: list[tuple[str, int]] = []
        for t in types:
            if runs and runs[-1][0] == t:
                runs[-1] = (t, runs[-1][1] + 1)
            else:
                runs.append((t, 1))
        # reference RLE above; the SQL identity below must agree
        rn_all = list(range(1, len(types) + 1))
        seen: dict[str, int] = {}
        groups: dict[tuple[str, int], int] = {}
        for i, t in enumerate(types):
            seen[t] = seen.get(t, 0) + 1
            grp = rn_all[i] - seen[t]
            groups[(t, grp)] = groups.get((t, grp), 0) + 1
        assert sorted(groups.values()) == sorted(l for _, l in runs)
        assert sum(groups.values()) == len(types)

    @settings(max_examples=25, deadline=None)
    @given(st.integers(min_value=0, max_value=10**9))
    def test_dataset_split_stable_under_growth(self, doc_id):
        """A doc's split depends only on (seed, doc_id) — adding other
        docs can never move it (the property rand()-splits lack)."""
        import hashlib

        from autoaudit_spark.llm.text import SPLIT_SEED

        h = hashlib.md5(f"{SPLIT_SEED}{doc_id}".encode()).hexdigest()
        dec = int(h[:8], 16) % 10
        assert 0 <= dec <= 9  # pure function of the id: growth-stable

    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(
            st.floats(min_value=0.01, max_value=500, allow_nan=False),
            min_size=1,
            max_size=30,
        )
    )
    def test_benford_digit_extraction_matches_string_path(self, values):
        """The DECIMAL→string first-[1-9] digit equals the mathematical
        first significant digit for the 2dp-positive domain."""
        import re
        from decimal import Decimal, ROUND_HALF_UP

        for v in values:
            d2 = Decimal(str(v)).quantize(Decimal("0.01"), ROUND_HALF_UP)
            if d2 <= 0:
                continue
            m = re.search(r"[1-9]", str(d2))
            want = None
            x = float(d2)
            while x < 1:
                x *= 10
            while x >= 10:
                x /= 10
            want = str(int(x))
            if m:
                assert m.group(0) == want

    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(st.integers(min_value=1, max_value=100), min_size=2, max_size=20)
    )
    def test_burst_threshold_from_exact_moments(self, counts):
        """The pinned-formula sd from integer moment sums equals
        population stddev computed directly."""
        import math

        n = len(counts)
        sx = sum(counts)
        sxx = sum(c * c for c in counts)
        var = (sxx - sx * sx / n) / n
        mean = sx / n
        direct = sum((c - mean) ** 2 for c in counts) / n
        assert math.isclose(max(var, 0.0), direct, rel_tol=1e-9, abs_tol=1e-9)


# -------------------------------------------------------------------------
# r7 continuation kernels: the math the Spark forms rely on
# -------------------------------------------------------------------------


@settings(max_examples=50, deadline=None)
@given(
    xs=st.lists(st.integers(0, 60_000), min_size=1, max_size=200),
    k=st.integers(1, 10_000),
)
def test_cusum_reflection_identity(xs, k):
    """X75's windowed form S_t = C_t − min(0, running-min C) equals the
    textbook recursion S_t = max(0, S_{t−1} + x_t − k) for EVERY prefix
    of every sequence — the identity the three window passes encode."""
    s = 0
    c = 0
    running_min = 0  # min(0, min of C so far)
    for x in xs:
        s = max(0, s + x - k)
        c += x - k
        running_min = min(running_min, c)
        assert s == c - running_min


@settings(max_examples=50, deadline=None)
@given(
    cents=st.lists(st.integers(0, 60_000), min_size=1, max_size=16),
    seed=st.integers(0, 2**31),
)
def test_ewma_dyadic_sum_is_order_invariant(cents, seed):
    """X80's exactness claim: with dyadic weights 1/2^k and BIGINT
    cents, every term and the ≤16-term sum are exact doubles — so the
    float sum is IDENTICAL under any summation order (a conventional
    float-alpha EWMA fails this)."""
    import random

    terms = [c * (1.0 / (1 << k)) for k, c in enumerate(cents)]
    fwd = sum(terms)
    rev = sum(reversed(terms))
    rng = random.Random(seed)
    shuffled = terms[:]
    rng.shuffle(shuffled)
    assert fwd == rev == sum(shuffled)
    # and each term is exactly representable: round-trip through Fraction
    from fractions import Fraction

    for k, c in enumerate(cents):
        assert Fraction(terms[k]) == Fraction(c, 1 << k)


bipartite_edges = st.lists(
    st.tuples(st.integers(0, 14), st.integers(100, 114)),
    min_size=1,
    max_size=120,
    unique=True,
)


@settings(max_examples=40, deadline=None)
@given(edges=bipartite_edges)
def test_butterfly_side_choice_counts_agree(edges):
    """X72's side-choice argument: the global butterfly count computed
    by wedging on the src side (Σ over dst pairs C(common srcs, 2))
    equals the dst-side wedge form (Σ over src pairs C(common dsts, 2))
    — both enumerate every 2×2 biclique exactly once — and the per-dst
    counts sum to exactly 2× the global count."""
    from collections import defaultdict
    from itertools import combinations

    nb_src = defaultdict(set)  # src -> dsts
    nb_dst = defaultdict(set)  # dst -> srcs
    for s, d in edges:
        nb_src[s].add(d)
        nb_dst[d].add(s)

    def pairs_total(nbrs):
        tot = 0
        for a, b in combinations(sorted(nbrs), 2):
            c = len(nbrs[a] & nbrs[b])
            tot += c * (c - 1) // 2
        return tot

    total_by_dst_pairs = pairs_total(nb_dst)
    total_by_src_pairs = pairs_total(nb_src)
    assert total_by_dst_pairs == total_by_src_pairs

    per_dst = defaultdict(int)
    for d1, d2 in combinations(sorted(nb_dst), 2):
        c = len(nb_dst[d1] & nb_dst[d2])
        nb = c * (c - 1) // 2
        per_dst[d1] += nb
        per_dst[d2] += nb
    assert sum(per_dst.values()) == 2 * total_by_dst_pairs


@settings(max_examples=50, deadline=None)
@given(
    starts=st.lists(st.integers(1, 300), min_size=0, max_size=60, unique=True),
    gap=st.integers(1, 10),
)
def test_island_merge_partitions_starts(starts, gap):
    """X77's gaps-and-islands merge: islands partition the duplicated
    start set, consecutive starts within an island are ≤ gap apart,
    and adjacent islands are separated by > gap."""
    ordered = sorted(starts)
    islands = []
    for p in ordered:
        if islands and p - islands[-1][-1] <= gap:
            islands[-1].append(p)
        else:
            islands.append([p])
    assert [p for isl in islands for p in isl] == ordered
    for isl in islands:
        assert all(b - a <= gap for a, b in zip(isl, isl[1:]))
    for a, b in zip(islands, islands[1:]):
        assert b[0] - a[-1] > gap

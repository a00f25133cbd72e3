"""AA-Smurf golden tests — MDL semantics on hand-computed graphs and the
reference's shipped fixture (`/root/reference/data/sample_matrix.txt`,
254×254, 754 edges — SURVEY §5.1)."""

from __future__ import annotations

from math import ceil, log2

import numpy as np
import pytest

from autoaudit_spark.mining.mdl import compute_mdl, initial_mdl, log_star, ranks_for_order
from autoaudit_spark.mining.smurf import (
    matrix_text_to_edges,
    smurf_pipeline,
    smurf_search,
)

SAMPLE = "/root/reference/data/sample_matrix.txt"


def test_initial_mdl_formula():
    # 4 nodes, 3 edges: (16-3) zeros * 2*ceil(log2 4) = 13*4 = 52
    assert initial_mdl(4, 3) == 52


def test_log_star():
    assert log_star(1) == 1.0
    assert log_star(4) == 5.0


def test_compute_mdl_single_star_block():
    # smurf 0 -> {1,2,3} -> 4 then 3 residual nodes (n=8)
    # order = [0,1,2,3,4], start=[0,5], count=[1,3,1]
    edges = [(0, 1), (0, 2), (0, 3), (1, 4), (2, 4), (3, 4)]
    ru = np.array([e[0] for e in edges])
    rv = np.array([e[1] for e in edges])
    n = 8
    pos = ranks_for_order([0, 1, 2, 3, 4], n)
    mdl, purity = compute_mdl(pos[ru], pos[rv], n, [0, 5], [1, 3, 1])
    # block s=0,e=4,k=5:
    # e1: rows1..3 x cols0..2 -> edges (1,?)/(2,?)/(3,?) with col<=2: none
    #     (0,1),(0,2),(0,3) have row 0 -> excluded; (1,4) col 4 -> excluded
    #     => e1 = 0... wait (0,*) row=0 not in [1,3]; rows 1..3 are srcs 1,2,3
    #     edges from 1,2,3 go to 4 (col 4 > 2) => e1 = 0? No: e1 region is
    #     rows [s+1,e-1]=[1,3], cols [s,e-2]=[0,3-? e-2=3] cols 0..3
    #     (1,4),(2,4),(3,4) have col 4 -> excluded => e1_cnt=0
    # Hmm — the reference's inner slice misses the star edges entirely
    # because 0->mid edges sit on row s. That IS its semantics: e1 covers
    # mid-to-mid rows only. Verify arithmetic instead of intuition:
    # e1 = 0 * 2*ceil(log2(4)) = 0
    # e2/e3: rows/cols beyond e+1=5..n-2=6: no edges there -> 0
    # D: start[-1]=5, side=(8-1)-5=2, box [5,6]x[5,6] edges=0 -> 4*2*ceil(log2 8)=4*6=24
    # headers: ceil(log_star(1)) + ceil(log_star(3)) = 1 + ceil(4.17)=1+5=6
    #          sum(count)=5 * ceil(log2 8)=3 -> 15 ; ceil(log_star(1))=1
    # total = 24 + 6 + 15 + 1 = 46
    assert mdl == 46
    # purity: A-block edges: rows0..3 x cols0..3: (0,1),(0,2),(0,3) => 3
    # sum_abc = 3 (+0+0); purity = (5-2)*2/3 = 2.0
    assert purity == 2.0


def test_smurf_search_recovers_planted_star():
    # 0 -> {10,11,12} -> 5 planted in a 20-node sparse background
    edges = [(0, 10), (0, 11), (0, 12), (10, 5), (11, 5), (12, 5),
             (6, 7), (8, 9), (13, 14)]
    ru = np.array([e[0] for e in edges])
    rv = np.array([e[1] for e in edges])
    candidates = [((0, 5), [10, 11, 12])]
    res = smurf_search(ru, rv, 20, candidates, selection="final")
    assert res.order == [0, 10, 11, 12, 5]
    assert res.start == [0, 5]
    assert res.count == [1, 3, 1]
    # MDL strictly decreased and history is monotone non-increasing
    assert all(b < a for a, b in zip(res.mdl_history, res.mdl_history[1:]))


def test_smurf_reference_selection_prefers_simpler_model():
    # reference quirk (`AA-Smurf.py:162`): with a single accepted
    # iteration, the "10% above minimum" rule steps back to the EMPTY
    # model — idx-1 of the first mdl below 1.1*final
    edges = [(0, 10), (0, 11), (0, 12), (10, 5), (11, 5), (12, 5)]
    ru = np.array([e[0] for e in edges])
    rv = np.array([e[1] for e in edges])
    res = smurf_search(ru, rv, 20, [((0, 5), [10, 11, 12])], selection="reference")
    assert res.selected_iter == 0
    assert res.order == []


def test_matrix_text_scan_matches_loadtxt(spark):
    dense = np.loadtxt(SAMPLE)
    want = set(zip(*np.nonzero(dense)))
    got = {
        (r.src_idx, r.dst_idx)
        for r in matrix_text_to_edges(spark, SAMPLE).collect()
    }
    assert got == {(int(a), int(b)) for a, b in want}
    assert len(got) == 754


@pytest.mark.slow
def test_smurf_pipeline_sample_matrix(spark):
    adj = matrix_text_to_edges(spark, SAMPLE).withColumnsRenamed(
        {"src_idx": "src", "dst_idx": "dst"}
    )
    result, rank_df = smurf_pipeline(
        spark, adj, max_iter=10, max_candidates=None, n_nodes=254
    )
    # invariant: permutation
    ranks = [r["rank"] for r in rank_df.collect()]
    assert sorted(ranks) == list(range(254))
    # MDL monotone decreasing over accepted iterations
    h = result.mdl_history
    assert len(h) >= 2, "sample matrix contains smurf candidates; must accept some"
    assert all(b < a for a, b in zip(h, h[1:]))
    # detected blocks contain >= 3 intermediaries each (candidate threshold)
    assert result.count[0] >= 1
    assert result.count[1] >= 3 * result.count[0]


def test_distributed_pipeline_matches_driver_pipeline(spark):
    """The fully distributed search (edges never collected; box counts
    as Spark partial aggregates, ranks maintained by the vectorized
    shift transform) must produce bit-identical results to the
    driver-resident loop — same blocks, same argmax tie-breaks, same
    MDL floats, same final rank relation."""
    rng = np.random.RandomState(5)
    edges = {(int(a), int(b)) for a, b in rng.randint(0, 40, size=(260, 2)) if a != b}
    # plant a smurf so at least one block is accepted
    edges |= {(0, 30), (0, 31), (0, 32), (30, 5), (31, 5), (32, 5)}
    adj = spark.createDataFrame(sorted(edges), "src long, dst long")

    for selection in ("final", "reference"):
        driver_res, driver_rank = smurf_pipeline(
            spark, adj, max_iter=6, max_candidates=None,
            selection=selection, distribute=False,
        )
        dist_res, dist_rank = smurf_pipeline(
            spark, adj, max_iter=6, max_candidates=None,
            selection=selection, distribute=True,
        )
        assert driver_res.order == dist_res.order
        assert driver_res.start == dist_res.start
        assert driver_res.count == dist_res.count
        assert driver_res.mdl_history == dist_res.mdl_history
        assert driver_res.selected_iter == dist_res.selected_iter
        assert sorted(map(tuple, driver_rank.collect())) == sorted(
            map(tuple, dist_rank.collect())
        )
    assert len(driver_res.mdl_history) >= 2


def test_distributed_pipeline_matrix_fixture_parity(spark):
    """Distributed path on the reference's shipped matrix fixture (with
    n_nodes, identity node indexing) matches the driver path."""
    adj = matrix_text_to_edges(spark, SAMPLE).withColumnsRenamed(
        {"src_idx": "src", "dst_idx": "dst"}
    )
    a, ra = smurf_pipeline(
        spark, adj, max_iter=3, max_candidates=50, n_nodes=254, distribute=False
    )
    b, rb = smurf_pipeline(
        spark, adj, max_iter=3, max_candidates=50, n_nodes=254, distribute=True
    )
    assert a.order == b.order
    assert a.mdl_history == b.mdl_history
    assert a.selected_iter == b.selected_iter
    assert sorted(map(tuple, ra.collect())) == sorted(map(tuple, rb.collect()))


def test_cli_list_and_run(spark, capsys):
    from autoaudit_spark.__main__ import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "two_hop_candidates" in out and "✔" in out
    assert main(["run", "global_argmax", "--sf-dir", "/root/testdata/sf0.001"]) == 0
    assert main(["run", "no_such_query"]) == 2

"""Pins for tools/vacuityscan.py — the tiny-latest-row audit that
institutionalizes the r15 sink_accounts lesson (a 0-row result's green
value-hash proves only empty==empty). The live-history test keeps the
registry honest: any query whose latest driver row shrinks to <=3 rows
must either carry an allowlist reason or a pending-fix note, or the
suite fails."""

from __future__ import annotations

import json
import os
import sys

# location-independent (r16 advice): derive the repo root from this
# file instead of hard-coding the checkout path
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from vacuityscan import ALLOWLIST, PENDING, latest_rows, scan


class TestLiveHistory:
    def test_no_unexplained_tiny_rows(self):
        flags, _pending = scan(REPO)
        assert flags == []

    def test_allowlist_and_pending_entries_are_live_queries(self):
        """A stale allowlist entry (query retired/renamed) would mask a
        future regression under the old name — every entry must still
        exist in the correctness history."""
        known = set(latest_rows(REPO))
        assert set(ALLOWLIST) <= known
        assert set(PENDING) <= known

    def test_pending_entries_are_actually_tiny(self):
        """A PENDING entry whose latest row is no longer tiny has been
        re-gated — the note must be removed (it suppresses nothing but
        would hide a future re-regression)."""
        rows = latest_rows(REPO)
        for name in PENDING:
            _rnd, n = rows[name]
            assert n is not None and n <= 3, (
                f"{name} re-gated (latest row {n} rows) — remove its "
                f"PENDING entry in tools/vacuityscan.py"
            )


class TestScanSemantics:
    def _history(self, tmp_path, records):
        for rnd, recs in records.items():
            (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(
                json.dumps(
                    {
                        n: {
                            "rows_match": True,
                            "schema_match": True,
                            "hash_match": True,
                            "spark_rows": v,
                            "oracle_rows": v,
                            "err": None,
                        }
                        for n, v in recs.items()
                    }
                )
            )
        return str(tmp_path)

    def test_latest_row_wins(self, tmp_path):
        """A query that was tiny in an old round but healthy in its
        latest row is not flagged."""
        repo = self._history(
            tmp_path, {1: {"q_fixed": 0}, 2: {"q_fixed": 500}}
        )
        flags, pending = scan(repo)
        assert flags == [] and pending == []

    def test_unexplained_tiny_row_flags(self, tmp_path):
        repo = self._history(tmp_path, {1: {"q_vacuous": 0}})
        flags, _ = scan(repo)
        assert len(flags) == 1 and "q_vacuous" in flags[0]

    def test_threshold_is_inclusive(self, tmp_path):
        repo = self._history(tmp_path, {1: {"q_small": 3, "q_ok": 4}})
        flags, _ = scan(repo, threshold=3)
        assert len(flags) == 1 and "q_small" in flags[0]

    def test_stray_nonconforming_filename_is_skipped(self, tmp_path):
        """r16 advice: a file matching the glob but without a bare
        integer round (e.g. CORRECTNESS_rXX.json, an editor backup)
        must be ignored, not crash the scan and the standing suite."""
        repo = self._history(tmp_path, {1: {"q_fixed": 0}, 2: {"q_fixed": 9}})
        (tmp_path / "CORRECTNESS_rXX.json").write_text("{}")
        (tmp_path / "CORRECTNESS_r2.json.bak").write_text("not json")
        assert latest_rows(repo) == {"q_fixed": (2, 9)}
        flags, pending = scan(repo)
        assert flags == [] and pending == []

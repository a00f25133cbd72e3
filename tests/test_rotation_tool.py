"""Pins for tools/rotation.py — the window-rotation recount the round
roadmap depends on. The r9 review made `_passed` STRICT (a rows-ok /
hash-mismatch driver row is a regression, not a pass); these tests keep
that from silently loosening, and pin `latest_rounds`' max-over-files
semantics on synthetic CORRECTNESS records."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from rotation import _passed, latest_rounds, unknown_priority


class TestPassCriterion:
    def test_full_match_passes(self):
        assert _passed(
            {"err": None, "rows_match": True, "schema_match": True,
             "hash_match": True}
        )

    def test_hash_mismatch_is_a_regression_not_a_pass(self):
        # the CORRECTNESS_r01/r02 user_sessions precedent
        assert not _passed(
            {"err": None, "rows_match": True, "schema_match": True,
             "hash_match": False}
        )

    def test_schema_mismatch_fails(self):
        assert not _passed(
            {"err": None, "rows_match": True, "schema_match": False,
             "hash_match": True}
        )

    def test_error_fails_even_with_matches(self):
        assert not _passed(
            {"err": "boom", "rows_match": True, "schema_match": True,
             "hash_match": True}
        )

    def test_rows_only_passes_on_recorded_rows(self):
        assert _passed({"err": "no_oracle", "spark_rows": 120})
        assert not _passed({"err": "no_oracle", "spark_rows": None})

    def test_missing_verdict_axes_tolerated_only_without_error(self):
        # None = driver recorded no verdict for that axis
        assert _passed({"err": None, "rows_match": True})


class TestLatestRounds:
    def test_max_over_files_and_never_passed_zero(self, tmp_path):
        (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
            "q_pass": {"err": None, "rows_match": True,
                       "schema_match": True, "hash_match": True},
            "q_regressed": {"err": None, "rows_match": True,
                            "schema_match": True, "hash_match": True},
        }))
        (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
            "q_pass": {"err": None, "rows_match": True,
                       "schema_match": True, "hash_match": True},
            "q_regressed": {"err": None, "rows_match": True,
                            "schema_match": True, "hash_match": False},
            "q_never": {"err": "boom"},
        }))
        latest = latest_rounds(str(tmp_path))
        assert latest["q_pass"] == 2
        # a later REGRESSION must not advance the latest-passing round
        assert latest["q_regressed"] == 1
        # seen but never passed -> 0 (must-rotate immediately)
        assert latest["q_never"] == 0


class TestPredictGuard:
    def test_unknown_priority_names_are_surfaced_not_skipped(self):
        """r10 ADVICE: --predict must refuse a typo'd or unregistered
        _PRIORITY name instead of silently planning an optimistic pool
        around it (main() sys.exits on a non-empty return)."""
        latest = {"real_query": 7, "other": 8}
        assert unknown_priority(["real_query", "typod"], latest) == ["typod"]
        assert unknown_priority(["real_query", "other"], latest) == []


class TestBirthCapacity:
    def test_driver_window_constant_matches_contract_pin(self):
        """rotation.py's capacity line and the entry-contract test must
        agree on the driver's window size — a drift here would make the
        planning view lie about birth feasibility (the r15 lesson: the
        r14 verdict queued swaps into rounds whose pools already filled
        the window)."""
        import rotation

        import test_entry_contract

        assert rotation.DRIVER_WINDOW == test_entry_contract.DRIVER_WINDOW


class TestFillPool:
    def test_fill_takes_next_stalest_by_round_then_name(self):
        from rotation import fill_pool

        latest = {"a": 9, "b": 9, "c": 10, "d": 11, "e": 10}
        # pool (<=9) has 2 names; fill to 4 -> the two r10 names, by name
        assert fill_pool(latest, 9, 4) == ["c", "e"]

    def test_fill_is_empty_when_pool_already_covers_want(self):
        from rotation import fill_pool

        latest = {"a": 9, "b": 9, "c": 10}
        assert fill_pool(latest, 9, 2) == []
        assert fill_pool(latest, 9, 1) == []

    def test_fill_orders_rounds_before_names(self):
        from rotation import fill_pool

        latest = {"a": 9, "z_old": 10, "a_new": 11}
        assert fill_pool(latest, 9, 3) == ["z_old", "a_new"]

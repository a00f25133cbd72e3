"""Vacuity scan: flag registered queries whose latest driver row is so
small that a green value-hash proves (almost) nothing.

The r15 verdict caught `sink_accounts` returning 0 rows at EVERY driver
SF — its passing row only proved empty==empty. This tool institutionalizes
that lesson (the `tools/rotation.py` birth-capacity precedent): it reads
the CORRECTNESS_r*.json history, takes each query's LATEST driver row,
and flags any with `spark_rows <= threshold` that is not on the explicit
by-design allowlist below. Run it whenever a query's definition or the
testdata changes; a FLAG means either fix the query's selectivity (the
sink_accounts r16 fix) or — if the tiny result is the operator's honest
output — add it to the allowlist with a reason.

Usage: python tools/vacuityscan.py [--threshold N] [repo_dir]
Exit status: number of unexplained flags (0 = clean).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

#: queries whose latest driver row is legitimately tiny — each is a
#: scalar statistic, a by-design top-/few-row report, or a per-window
#: score vector at fixture window counts. A tiny result here is the
#: operator's honest output, not a vacuous predicate.
ALLOWLIST: dict[str, str] = {
    "global_argmax": "argmax is one row by definition (O2)",
    "triangle_count": "single global count (X11)",
    "edge_reciprocity": "single reciprocity statistic (X33)",
    "degree_assortativity": "single correlation coefficient (X34)",
    "chisq_type_segment": "single chi-square statistic (X37)",
    "powerlaw_fit": "one fitted (slope, intercept, r2) line (M4)",
    "log_bin_means": "one row per occupied log2 bin — 3 at sf0.01 (A12)",
    "partition_pruned_scan": "2 rows IS the pruning proof (S8 twin)",
    "near_dup_levenshtein": "3 true near-dup pairs at corpus scale (X6)",
    "change_scores": "one SVD score per window boundary (M3)",
    "sketch_change_cosine": "one cosine per window boundary (M3)",
    "stream_change_cosine": "streaming twin of the above (T3)",
    "stream_change_scores": "streaming twin of change_scores (T3)",
    "injection_recovery_eval": "one eval summary row per fold (M7)",
}


#: tiny latest rows already FIXED in the repo whose next driver row has
#: not yet landed (the window rotation decides when) — reported as
#: "pending", not flagged. Remove an entry once the re-gated row lands.
PENDING: dict[str, str] = {
    "sink_accounts": (
        "redefined nonvacuous in r16 (high-value subgraph, weight > 300 "
        "— 18/105 rows at sf0.01/sf0.1, tri-SF exactness tests); its "
        "next driver row rides the r19 rotation and clears this entry"
    ),
}


#: strict round matcher (r16 advice): a stray file like
#: CORRECTNESS_rXX.json must be SKIPPED, not crash the whole scan (and
#: with it the standing test suite).
_ROUND_RE = re.compile(r"CORRECTNESS_r(\d+)\.json$")


def latest_rows(repo: str) -> dict[str, tuple[int, int | None]]:
    """query -> (round, spark_rows) from its LATEST driver row."""
    latest: dict[str, tuple[int, int | None]] = {}
    rounds = []
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = _ROUND_RE.search(f)
        if m:
            rounds.append((int(m.group(1)), f))
    for rnd, f in sorted(rounds):
        for name, rec in json.load(open(f)).items():
            latest[name] = (rnd, rec.get("spark_rows"))
    return latest


def scan(repo: str, threshold: int = 3) -> tuple[list[str], list[str]]:
    """Return (flag_lines, pending_lines) for tiny latest rows."""
    flags: list[str] = []
    pending: list[str] = []
    for name, (rnd, rows) in sorted(latest_rows(repo).items()):
        if rows is None or rows > threshold:
            continue
        if name in ALLOWLIST:
            continue
        if name in PENDING:
            pending.append(
                f"pending {name}: latest row (r{rnd}, {rows} rows) "
                f"predates the fix — {PENDING[name]}"
            )
            continue
        flags.append(
            f"FLAG {name}: latest driver row (r{rnd}) has only {rows} "
            f"row(s) and no allowlist entry — a green value-hash proves "
            f"little; tighten the query (the sink_accounts r16 fix) or "
            f"allowlist it with a reason"
        )
    return flags, pending


def main() -> int:
    args = sys.argv[1:]
    threshold = 3
    if "--threshold" in args:
        i = args.index("--threshold")
        threshold = int(args[i + 1])
        del args[i : i + 2]
    repo = args[0] if args else os.path.dirname(os.path.dirname(__file__))
    flags, pending = scan(repo, threshold)
    for line in pending:
        print(line)
    for line in flags:
        print(line)
    checked = latest_rows(repo)
    tiny = [
        n
        for n, (_r, rows) in checked.items()
        if rows is not None and rows <= threshold
    ]
    print(
        f"{len(checked)} latest rows scanned, {len(tiny)} at or below "
        f"{threshold} rows ({len(tiny) - len(flags) - len(pending)} "
        f"allowlisted, {len(pending)} pending re-gate), "
        f"{len(flags)} flagged"
    )
    return len(flags)


if __name__ == "__main__":
    sys.exit(main())

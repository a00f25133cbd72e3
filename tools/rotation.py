"""Rotation-pool bookkeeping (r9): recompute each registered query's
latest PASSING driver round from ALL CORRECTNESS_r*.json files and
print the stalest pool — the list the next round's window rotation
must cover.

Every round since r5 this recount was done by hand, and twice (r8, r9)
the hand estimate in NOTES drifted from the recount (the r8 lesson:
46, not "~42"). This tool removes that seam the way `check.py
--window` removed the window-order seam: the pool is READ from the
driver's own records, never estimated.

A query PASSES a round if its record has no error and matching rows
(oracled queries), or records a row count with `err == "no_oracle"`
(rows-only queries — the driver's weaker check). Queries never seen in
any CORRECTNESS file report round 0 (must-rotate immediately).

Usage: python tools/rotation.py [--max-round N] [--predict]
    prints the latest-round histogram, then the pool of queries whose
    latest passing round <= the stalest bucket (or <= N if given),
    as both a human list and a ready-to-paste _PRIORITY block.

    --predict (r10): the NEXT-round planning view — assume the current
    `__spark_entry__._PRIORITY` window passes the upcoming driver run
    (round = max recorded + 1), then report the round AFTER that one's
    pool. This is the recount the end-of-round roadmap needs ("assuming
    CORRECTNESS_rN comes back green, the rN+1 pool is ..."), which r10
    still derived by hand; if the driver run later disagrees, the
    normal (non-predict) recount at round start is authoritative.

    --fill N (r13): when the stalest pool is smaller than the window,
    also print the next-stalest queries (ascending latest round, then
    name) up to N names total — the standardized choice for spare
    window slots (pulling a query one round early is always safe: it
    just becomes freshest). Births are NOT in this list; they take
    their slots by the same-round-window rule.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


#: the driver checks exactly the first 50 queries() entries (observed
#: r1-r5; pinned by tests/test_entry_contract.py DRIVER_WINDOW)
DRIVER_WINDOW = 50


def _passed(rec: dict) -> bool:
    if rec.get("err") == "no_oracle":
        return rec.get("spark_rows") is not None
    # oracled rows must pass the FULL check: a value-hash or schema
    # mismatch with a matching row count is a regression, not a pass
    # (r9 review — CORRECTNESS_r01/r02 `user_sessions` is the
    # precedent: rows_match=true, hash_match=false); None means the
    # driver recorded no verdict for that axis, which only occurs
    # alongside err and is excluded by the err check anyway
    return (
        rec.get("err") is None
        and rec.get("rows_match") is True
        and rec.get("schema_match") in (True, None)
        and rec.get("hash_match") in (True, None)
    )


def unknown_priority(
    priority: list[str], latest: dict[str, int]
) -> list[str]:
    """_PRIORITY names absent from the registry-filtered latest map —
    typo'd or unregistered window slots. --predict refuses to plan over
    them (r10 ADVICE: the pre-r11 silent skip produced an optimistic
    pool when the tool ran standalone)."""
    return [q for q in priority if q not in latest]


def fill_pool(
    latest: dict[str, int], cut: int, want: int
) -> list[str]:
    """The next-stalest queries (ascending latest round, then name)
    beyond the <=cut pool, enough to grow it to `want` names — the
    standardized spare-slot choice (pulling early is always safe: the
    pulled query just becomes freshest)."""
    pool_n = sum(1 for r in latest.values() if r <= cut)
    rest = sorted(
        (q for q, r in latest.items() if r > cut),
        key=lambda q: (latest[q], q),
    )
    return rest[: max(0, want - pool_n)]


def latest_rounds(repo_root: str) -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = re.search(r"r0*(\d+)", os.path.basename(f))
        if not m:
            continue
        rnd = int(m.group(1))
        for q, rec in json.load(open(f)).items():
            if _passed(rec):
                latest[q] = max(latest.get(q, 0), rnd)
            else:
                latest.setdefault(q, 0)  # seen but never passed
    return latest


def main() -> None:
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)
    from autoaudit_spark import registry

    registry.load_all()
    latest = latest_rounds(repo_root)
    # registered queries with no driver row at all -> round 0
    for q in registry.QUERIES:
        latest.setdefault(q, 0)
    # stale entries for queries no longer registered are dropped
    latest = {q: r for q, r in latest.items() if q in registry.QUERIES}

    if "--predict" in sys.argv[1:]:
        import __spark_entry__ as entry_mod

        # the upcoming round follows the newest RECORDED file, not the
        # newest passing round (r10 review: an all-regressed or aborted
        # newest round would otherwise shift the prediction by one)
        file_rounds = [
            int(m.group(1))
            for f in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))
            if (m := re.search(r"r0*(\d+)", os.path.basename(f)))
        ]
        nxt = max(file_rounds, default=0) + 1
        # tests/test_entry_contract.py catches the same defect in CI,
        # but the standalone planning view must not lie
        unknown = unknown_priority(entry_mod._PRIORITY, latest)
        if unknown:
            sys.exit(
                "PREDICT: _PRIORITY names not in the registry "
                f"(typo'd or unregistered window slots): {unknown}"
            )
        for q in entry_mod._PRIORITY:
            latest[q] = nxt
        print(f"PREDICT: current window assumed green in round {nxt}; "
              f"pool below is round {nxt + 1}'s")

    hist: dict[int, int] = {}
    for r in latest.values():
        hist[r] = hist.get(r, 0) + 1
    print("latest-round histogram:", dict(sorted(hist.items())))

    cut = None
    args = sys.argv[1:]
    if "--max-round" in args:
        cut = int(args[args.index("--max-round") + 1])
    if cut is None:
        cut = min(latest.values())
    pool = sorted(q for q, r in latest.items() if r <= cut)
    print(f"\npool (latest round <= {cut}): {len(pool)} queries")
    # Birth capacity (r15 lesson): a birth takes a window slot in its
    # own round (the unfreeze rule), so a round whose mandatory pool
    # already fills the 50-slot window CANNOT take a registration
    # without pushing a pool row to age 5. The r14 verdict's r16/r17
    # swap queue missed exactly this; print it so no plan does again.
    # (A retirement of a query INSIDE this pool raises capacity by 1.)
    print(
        f"birth capacity at this pool: {max(0, DRIVER_WINDOW - len(pool))} "
        f"(window {DRIVER_WINDOW} - pool {len(pool)}; retiring a pool "
        "member adds one)"
    )
    for q in pool:
        print(f"  {q}  (r{latest[q]})")
    fill: list[str] = []
    if "--fill" in args:
        want = int(args[args.index("--fill") + 1])
        fill = fill_pool(latest, cut, want)
        print(f"\nfill to {want} (next-stalest, pull-early-is-safe):")
        for q in fill:
            print(f"  {q}  (r{latest[q]})")
    print("\n# ready-to-paste _PRIORITY block:")
    for q in pool + fill:
        print(f'    "{q}",')


if __name__ == "__main__":
    main()

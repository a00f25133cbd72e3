"""Typed-schema audit: catch driver value-hash failures BEFORE the driver.

Round-2 lesson (`user_sessions`): the driver hashes *typed* values, so a
DuckDB oracle emitting HUGEINT (int128, e.g. `SUM(int) OVER`) mismatches a
Spark BIGINT even when every value is equal — and `tools/check.py`'s
Python-equality compare can't see it.

This tool compares the Arrow schema of each DuckDB oracle result with the
Arrow schema of the matching Spark result (both engines speak Arrow
natively) and flags any column whose physical type differs after a small
normalization (timestamp tz/unit, large_string→string, not-null flags).
Types don't depend on scale factor, so it runs at sf0.001 for speed.

Usage: python tools/typeaudit.py [--prebuilt] [sf_dir] [query ...]

--prebuilt: audit the banked pre-built-but-unregistered pairs (the
NOTES "Window capacity" queue) instead of the registry — their
cross-engine tests compare Python values, which an int128-vs-int64
divergence would NOT trip, so run this before each registration.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pyarrow as pa

from autoaudit_spark import registry
from autoaudit_spark.session import get_spark
from autoaudit_spark.sources import TABLES

registry.load_all()


def canon(t: pa.DataType) -> str:
    """Canonical token for an arrow type; two results hash-compatibly only
    if their tokens agree. Timestamps: DuckDB emits us-naive, Spark emits
    us-UTC — the driver compares wall-clock instants, so unit matters but
    tz-naive-vs-UTC does not (both loaders pin UTC)."""
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit}]"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{canon(f.type)}" for f in t)
        return f"struct<{inner}>"
    return str(t)


#: banked (pre-built, not yet registered) Spark/oracle pairs — audited
#: with --prebuilt so a registration round re-checks them without
#: hand-written scripts. Each entry: name -> (callable, oracle SQL
#: builder). Kept in lockstep with NOTES "Window capacity" queue.
def _prebuilt_pairs():
    from autoaudit_spark.operators import graph as g

    return {
        # core_formation graduated r13, core_persistence r14,
        # truss_formation r15 (all audited on the default path now);
        # the banked pre-builds:
        "truss_persistence": (g.truss_persistence, g._truss_persistence_sql),
        # the r14 oracle-safe HyperBall report (tri-SF bit-exact
        # standing test in test_oracle_generators.py)
        "hyperball_sketch": (g.hyperball_sketch, g._hyperball_sketch_sql),
        # the r15 per-window component census (closure-oracled,
        # tri-SF exact at build time; consolidation timeline)
        "windowed_component_census": (
            g.q_windowed_component_census,
            g._windowed_component_census_sql,
        ),
        # the r16 deterministic walk-corpus generator (tri-SF exact at
        # build time; unrolled portable-hash argmin oracle) and its
        # skip-gram pair-extraction companion
        "walk_corpus": (g.walk_corpus, g._walk_corpus_sql),
        "walk_skipgram_pairs": (g.walk_skipgram_pairs, g._walk_skipgram_sql),
    }


def main() -> int:
    args = sys.argv[1:]
    prebuilt = "--prebuilt" in args
    args = [a for a in args if a != "--prebuilt"]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    only = [a for a in args if "/" not in a]
    spark = get_spark("typeaudit")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    if prebuilt:
        pairs = {n: (fn, mk()) for n, (fn, mk) in _prebuilt_pairs().items()}
        names = only or list(pairs)
    else:
        pairs = None
        names = only or [
            n for n in registry.QUERIES if n in registry.ORACLES
        ]
    bad = 0
    for name in names:
        if pairs is not None and name not in pairs:
            # explicit name outside the prebuilt dict (r12 ADVICE):
            # report cleanly instead of crashing the whole audit
            print(f"ERR  {name}: not a prebuilt pair")
            bad += 1
            continue
        sql = pairs[name][1] if pairs else registry.ORACLES.get(name)
        if sql is None:
            print(f"skip {name}: rows-only")
            continue
        try:
            duck = con.execute(sql).fetch_arrow_table().schema
            sdf = (pairs[name][0] if pairs else registry.QUERIES[name])(
                spark, sf_dir
            )
            sp = sdf.limit(0).toArrow().schema
        except Exception as e:  # noqa: BLE001 — audit must survey everything
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            bad += 1
            continue
        d = {f.name.lower(): canon(f.type) for f in duck}
        s = {f.name.lower(): canon(f.type) for f in sp}
        diffs = [
            f"{c}: spark={s.get(c, '∅')} duck={d.get(c, '∅')}"
            for c in sorted(set(d) | set(s))
            if d.get(c) != s.get(c)
        ]
        if diffs:
            print(f"TYPE {name}: " + "; ".join(diffs))
            bad += 1
        else:
            print(f"ok   {name}")
    print(f"\n{len(names) - bad}/{len(names)} type-clean")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

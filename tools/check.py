"""Local replica of the driver's correctness gate.

Runs every registered Spark query and its DuckDB oracle at the given sf,
compares row count, schema width, and order-insensitive values (sorted by
column name, rows sorted, floats compared to 1e-6 relative tolerance so we
catch real semantic mismatches while tolerating summation-order ulps).

Usage: python tools/check.py [--exact] [--window] [sf_dir] [query ...]

--window: check exactly the driver's first-50 window (read live from
__spark_entry__.queries(), so the re-cert can't drift from the real
window order). Overrides any [query ...] names.

--exact: require bitwise float equality (repr-identical), replicating a
driver that hashes values exactly rather than comparing with tolerance.
Summation-order ulps on large double SUMs fail this mode — the fix is to
make the arithmetic order-independent (DECIMAL money math, rounded sums),
not to loosen the check.
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from autoaudit_spark import registry
from autoaudit_spark.session import get_spark
from autoaudit_spark.sources import TABLES

registry.load_all()


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


EXACT = False


def values_match(a, b, rel=1e-6):
    if type(a) is tuple and type(b) is tuple:
        return len(a) == len(b) and all(values_match(x, y, rel) for x, y in zip(a, b))
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        if EXACT:
            return repr(fa) == repr(fb)
        return math.isclose(fa, fb, rel_tol=rel, abs_tol=1e-9)
    return a == b


def compare(name, spark_rows, spark_cols, duck_rows, duck_cols):
    if len(spark_rows) != len(duck_rows):
        return f"ROWCOUNT spark={len(spark_rows)} duck={len(duck_rows)}"
    if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
        return f"SCHEMA spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    # sort columns by name, then rows
    s_ix = [i for i, _ in sorted(enumerate(spark_cols), key=lambda t: t[1].lower())]
    d_ix = [i for i, _ in sorted(enumerate(duck_cols), key=lambda t: t[1].lower())]
    skey = sorted((tuple(norm(r[i]) for i in s_ix) for r in spark_rows), key=repr)
    dkey = sorted((tuple(norm(r[i]) for i in d_ix) for r in duck_rows), key=repr)
    for i, (sr, dr) in enumerate(zip(skey, dkey)):
        if not values_match(sr, dr):
            return f"VALUES row#{i}: spark={sr!r} duck={dr!r}"
    return None


def main():
    global EXACT
    args = [a for a in sys.argv[1:] if a not in ("--exact", "--window")]
    EXACT = "--exact" in sys.argv[1:]
    window_only = "--window" in sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]
    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    if window_only:
        # replicate the driver's first-50 selection from the live
        # contract module, so the window re-cert can't drift from what
        # the driver will actually check
        import __spark_entry__ as entry_mod

        if only:
            # r8 ADVICE: --window overrides explicit names; make the
            # override visible instead of silently running all 50
            print(
                f"WARNING: --window ignores the {len(only)} explicit "
                f"query name(s) given ({', '.join(only[:5])}"
                f"{', ...' if len(only) > 5 else ''}); "
                "running the full first-50 window instead",
                file=sys.stderr,
            )
        names = list(entry_mod.queries())[:50]
    else:
        names = only or list(registry.QUERIES)
    failures = 0
    for name in names:
        fn = registry.QUERIES[name]
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        sql = registry.ORACLES.get(name)
        if sql is None:
            print(f"okROWS {name}: rows={len(spark_rows)} (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(sql)
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        err = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        if err:
            print(f"FAIL {name}: {err} [{time.time()-t0:.1f}s]")
            failures += 1
        else:
            print(f"ok   {name}: rows={len(spark_rows)} [{time.time()-t0:.1f}s]")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

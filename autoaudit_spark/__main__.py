"""CLI entry points — the engine equivalent of the reference's three
scripts (`AA-Smurf.py --f --o --i`, `AA-AR.py --f --o ...`,
`smurf_generator.py --f --i --l --r`), driven through the query registry.

    python -m autoaudit_spark list
    python -m autoaudit_spark run <query> [--sf-dir DIR] [--limit N] [--out PARQUET]
    python -m autoaudit_spark smurf --matrix data/sample_matrix.txt [--max-iter K] [--out PARQUET]

`run` executes any registered query and shows (or writes) the result;
`smurf` reproduces the AA-Smurf pipeline on a whitespace-delimited 0/1
matrix fixture exactly like the reference's default mode.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    from . import registry
    from .session import get_spark

    registry.load_all()

    ap = argparse.ArgumentParser(prog="autoaudit_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries (oracle-checked marked ✔)")

    runp = sub.add_parser("run", help="run a registered query")
    runp.add_argument("query")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    runp.add_argument("--limit", type=int, default=20)
    runp.add_argument("--out", default=None, help="write full result as parquet")

    smp = sub.add_parser("smurf", help="AA-Smurf on a 0/1 matrix fixture")
    smp.add_argument("--matrix", required=True)
    smp.add_argument("--max-iter", type=int, default=10)
    smp.add_argument("--out", default=None)

    args = ap.parse_args(argv)

    if args.cmd == "list":
        for name in sorted(registry.QUERIES):
            mark = "✔" if name in registry.ORACLES else " "
            print(f"{mark} {name}")
        return 0

    spark = get_spark("autoaudit_cli")
    if args.cmd == "run":
        if args.query not in registry.QUERIES:
            print(f"unknown query: {args.query} (see `list`)", file=sys.stderr)
            return 2
        df = registry.QUERIES[args.query](spark, args.sf_dir)
        if args.out:
            df.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        else:
            df.show(args.limit, truncate=False)
        return 0

    if args.cmd == "smurf":
        from .mining.smurf import matrix_text_to_edges, smurf_pipeline

        adj = matrix_text_to_edges(spark, args.matrix).withColumnsRenamed(
            {"src_idx": "src", "dst_idx": "dst"}
        )
        n = adj.selectExpr("max(greatest(src, dst))").collect()[0][0] + 1
        result, rank_df = smurf_pipeline(
            spark, adj, max_iter=args.max_iter, max_candidates=None, n_nodes=int(n)
        )
        print(f"MDL history: {[round(m, 1) for m in result.mdl_history]}")
        print(f"selected iteration: {result.selected_iter}")
        print(f"blocks: {len(result.start) - 1}, placed nodes: {len(result.order)}")
        if args.out:
            rank_df.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        else:
            rank_df.orderBy("rank").show(20)
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())

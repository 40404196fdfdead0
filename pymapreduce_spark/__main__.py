"""Command-line entry point: run, list, explain, or oracle-check any
registered operator — the job-submission surface a MapReduce-framework
user expects (`hadoop jar` / `mrjob run` analogue).

Usage:
    python -m pymapreduce_spark list [substring]
    python -m pymapreduce_spark run <query> [--sf-dir DIR] [--limit N]
    python -m pymapreduce_spark explain <query> [--sf-dir DIR]
    python -m pymapreduce_spark check <query> [--sf-dir DIR]

`run` prints the result table (first --limit rows, default 20);
`explain` prints the formatted physical plan (the 100 TB sanity check:
look for PushedFilters / BroadcastHashJoin / partial aggregates);
`check` executes BOTH the Spark query and its DuckDB oracle and diffs
them — the same differential the verification driver runs.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m pymapreduce_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("substring", nargs="?", default="")

    for name in ("run", "explain", "check"):
        p = sub.add_parser(name)
        p.add_argument("query")
        p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        if name == "run":
            p.add_argument("--limit", type=int, default=20)

    p_sql = sub.add_parser("sql", help="run ad-hoc SQL over the fixtures")
    p_sql.add_argument("text")
    p_sql.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_sql.add_argument("--limit", type=int, default=20)
    args = ap.parse_args(argv)

    from pymapreduce_spark import registry

    if args.cmd == "sql":
        from pymapreduce_spark.session import get_spark
        from pymapreduce_spark.sqlfront import run_sql

        spark = get_spark(app_name="pymapreduce-sql")
        spark.sparkContext.setLogLevel("ERROR")
        run_sql(spark, args.sf_dir, args.text).show(
            args.limit, truncate=False
        )
        return 0

    if args.cmd == "list":
        for name in sorted(registry.QUERIES):
            if args.substring in name:
                kind = "oracle" if name in registry.ORACLES else "rows-only"
                print(f"{name:32s} {kind}")
        return 0

    if args.query not in registry.QUERIES:
        near = [n for n in registry.QUERIES if args.query in n]
        print(f"unknown query: {args.query}", file=sys.stderr)
        if near:
            print(f"did you mean: {', '.join(sorted(near)[:5])}",
                  file=sys.stderr)
        return 2

    from pymapreduce_spark.session import get_spark

    spark = get_spark(app_name=f"pymapreduce-{args.cmd}-{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    df = registry.QUERIES[args.query](spark, args.sf_dir)

    if args.cmd == "run":
        df.show(args.limit, truncate=False)
        return 0
    if args.cmd == "explain":
        df.explain("formatted")
        return 0

    # check: the driver-equivalent Spark-vs-DuckDB differential.
    if args.query not in registry.ORACLES:
        n = df.count()
        print(f"{args.query}: rows-only query, ran clean ({n} rows)")
        return 0
    from pymapreduce_spark.testing import compare_frames, make_duckdb

    con = make_duckdb(args.sf_dir)
    try:
        compare_frames(args.query, df, con, registry.ORACLES[args.query])
    except AssertionError as exc:
        print(f"MISMATCH {args.query}:\n{exc}", file=sys.stderr)
        return 1
    print(f"{args.query}: hash-match vs DuckDB oracle at {args.sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

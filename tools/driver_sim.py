#!/usr/bin/env python
"""Driver simulation: the exact correctness gate, runnable locally.

Creates a PLAIN SparkSession (no engine configs — exercising
``ensure_runtime_configs`` self-healing, the driver's environment),
then runs every ``__spark_entry__.oracle_sql()`` entry through BOTH
engines at the given SF and strict-stringify-compares the sorted rows.
Harsher than the driver's canonical hash: engine type skew (DATE vs
TIMESTAMP, Decimal vs float) fails here even when values agree.

Run:  python tools/driver_sim.py [sf_dir]   (default /root/testdata/sf0.01)
Exit: number of mismatched queries.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main(sf: str = "/root/testdata/sf0.01") -> int:
    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    print("entry rows:", len(entry.entry(spark).collect()), flush=True)
    queries, oracles = entry.queries(), entry.oracle_sql()
    bad = []
    for i, name in enumerate(sorted(oracles)):
        sdf = queries[name](spark, sf)
        si = sorted(range(len(sdf.columns)), key=lambda j: sdf.columns[j])
        got = sorted(tuple(str(r[j]) for j in si) for r in sdf.collect())
        cur = con.execute(oracles[name])
        di = sorted(
            range(len(cur.description)), key=lambda j: cur.description[j][0]
        )
        want = sorted(tuple(str(r[j]) for j in di) for r in cur.fetchall())
        if got != want:
            bad.append(name)
            print(f"MISMATCH {name}: {len(got)} vs {len(want)} rows",
                  flush=True)
        if (i + 1) % 50 == 0:
            print(f"  ... {i + 1}/{len(oracles)} ({len(bad)} bad)",
                  flush=True)
    print("mismatches:", bad or "NONE", flush=True)
    return len(bad)


if __name__ == "__main__":
    sys.exit(min(main(*sys.argv[1:]), 99))

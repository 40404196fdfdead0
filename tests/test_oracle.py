"""Differential correctness: every registered oracle-backed query vs
DuckDB — the same check the driver runs at sf0.01 (SURVEY §5.2/5.3)."""

from __future__ import annotations

import pytest

import pymapreduce_spark  # noqa: F401  (registers operators)
from pymapreduce_spark.registry import ORACLES, QUERIES
from pymapreduce_spark.testing import (
    assert_driver_canonicalizable,
    compare_frames,
)


#: Legitimately empty at the smallest fixture only (~6k lineitem rows
#: cannot satisfy these multi-level selective TPC-H predicates); at the
#: driver's gate scale (sf0.01) and above, EVERY query must be
#: non-empty — compare_frames enforces that (the q11 lesson).
_EMPTY_OK_AT_SF0001 = {
    "q7_volume_shipping",
    "q11_important_stock",
    "q20_dominant_supplier",
    "q21_suppliers_kept_waiting",
}


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle(name: str, spark, duck, sf_dir: str) -> None:
    sdf = QUERIES[name](spark, sf_dir)
    tiny = sf_dir.rstrip("/").endswith("sf0.001")
    min_rows = 0 if (tiny and name in _EMPTY_OK_AT_SF0001) else 1
    compare_frames(name, sdf, duck, ORACLES[name], min_rows=min_rows)


def test_all_queries_run(spark, sf_dir: str) -> None:
    """Rows-only ops (no oracle) must still execute, return a schema,
    and survive the driver's pandas canonicalizer (scalar-only cols —
    rows-only results are canonicalized too; see llm_minhash_sig r3)."""
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, sf_dir)
        assert df.columns, name
        assert_driver_canonicalizable(name, df)
        assert df.count() >= 1, f"{name}: vacuously empty rows-only op"


def test_entry_smoke(spark) -> None:
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"l_orderkey", "revenue", "o_orderdate"}

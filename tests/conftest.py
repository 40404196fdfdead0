"""Shared fixtures: one SparkSession + one DuckDB connection per session.

TEST_SF_DIR selects the scale factor (default sf0.01 — the driver's
correctness-gate scale)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from pymapreduce_spark.session import get_spark

    spark = get_spark(app_name="pymapreduce-spark-tests")
    yield spark


@pytest.fixture(scope="session")
def duck():
    from pymapreduce_spark.testing import make_duckdb

    con = make_duckdb(SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR

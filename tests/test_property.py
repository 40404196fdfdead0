"""Property-based differential testing (SURVEY §5.3 stretch goal):
hypothesis generates random predicate/aggregation queries from a tiny
AST; the SAME AST is compiled to a Spark DataFrame plan and to DuckDB
SQL, and results must match exactly. Catches operator-semantics drift
the hand-written corpus doesn't cover (comparison edge cases, NULL
handling combinations, AND/OR nesting)."""

from __future__ import annotations

from dataclasses import dataclass

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Column
from pyspark.sql import functions as F

import pymapreduce_spark  # noqa: F401
from pymapreduce_spark.functions.checked import cents
from pymapreduce_spark.io import load_table

# --- predicate AST over the events table ------------------------------

EVENT_TYPES = ["view", "click", "signup", "purchase", "error"]
NUM_OPS = ["<", "<=", ">", ">=", "=", "!="]


@dataclass(frozen=True)
class NumCmp:
    col: str  # value | user_id | event_id
    op: str
    const: float | int

    def spark(self) -> Column:
        c = F.col(self.col)
        return {
            "<": c < self.const,
            "<=": c <= self.const,
            ">": c > self.const,
            ">=": c >= self.const,
            "=": c == self.const,
            "!=": c != self.const,
        }[self.op]

    def sql(self) -> str:
        return f"({self.col} {self.op} {self.const!r})"


@dataclass(frozen=True)
class TypeEq:
    etype: str
    negate: bool

    def spark(self) -> Column:
        e = F.col("event_type") == self.etype
        return ~e if self.negate else e

    def sql(self) -> str:
        op = "!=" if self.negate else "="
        return f"(event_type {op} '{self.etype}')"


@dataclass(frozen=True)
class BoolNode:
    op: str  # AND | OR
    left: object
    right: object

    def spark(self) -> Column:
        l, r = self.left.spark(), self.right.spark()
        return (l & r) if self.op == "AND" else (l | r)

    def sql(self) -> str:
        return f"({self.left.sql()} {self.op} {self.right.sql()})"


num_leaf = st.builds(
    NumCmp,
    col=st.sampled_from(["value", "user_id", "event_id"]),
    op=st.sampled_from(NUM_OPS),
    const=st.one_of(
        st.integers(min_value=0, max_value=200),
        st.floats(
            min_value=0.0,
            max_value=500.0,
            allow_nan=False,
            allow_infinity=False,
        ).map(lambda x: round(x, 2)),
    ),
)
type_leaf = st.builds(
    TypeEq, etype=st.sampled_from(EVENT_TYPES), negate=st.booleans()
)
leaf = st.one_of(num_leaf, type_leaf)
pred = st.one_of(
    leaf,
    st.builds(BoolNode, op=st.sampled_from(["AND", "OR"]), left=leaf, right=leaf),
    st.builds(
        BoolNode,
        op=st.sampled_from(["AND", "OR"]),
        left=st.builds(
            BoolNode, op=st.sampled_from(["AND", "OR"]), left=leaf, right=leaf
        ),
        right=leaf,
    ),
)


@pytest.fixture(scope="module")
def events_df(spark, sf_dir):
    df = load_table(spark, sf_dir, "events").persist()
    df.count()
    return df


@settings(
    max_examples=30,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(p=pred, group=st.sampled_from(["event_type", "user_id"]))
def test_random_filter_agg_matches_duckdb(p, group, spark, duck, events_df):
    got = {
        tuple(r)
        for r in events_df.where(p.spark())
        .groupBy(group)
        .agg(
            F.count("*").alias("n"),
            (F.sum(cents("value")) / 100.0).alias("sv"),
        )
        .collect()
    }
    want = {
        tuple(r)
        for r in duck.execute(
            f"""
            SELECT {group}, count(*) AS n,
                   sum(round(value * 100)::BIGINT) / 100.0 AS sv
            FROM events WHERE {p.sql()} GROUP BY {group}
            """
        ).fetchall()
    }
    assert got == want, f"pred={p.sql()} group={group}"


# --- random join shapes over orders × customer ------------------------

order_pred = st.builds(
    NumCmp,
    col=st.sampled_from(["o_totalprice", "o_custkey"]),
    op=st.sampled_from(NUM_OPS),
    const=st.integers(min_value=0, max_value=5000),
)
cust_pred = st.builds(
    NumCmp,
    col=st.sampled_from(["c_acctbal", "c_nationkey"]),
    op=st.sampled_from(NUM_OPS),
    const=st.integers(min_value=-5000, max_value=10000),
)


@pytest.fixture(scope="module")
def orders_df(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders").persist()
    df.count()
    return df


@pytest.fixture(scope="module")
def customer_df(spark, sf_dir):
    df = load_table(spark, sf_dir, "customer").persist()
    df.count()
    return df


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(po=order_pred, pc=cust_pred, how=st.sampled_from(["inner", "left"]))
def test_random_join_matches_duckdb(
    po, pc, how, spark, duck, orders_df, customer_df
):
    o = orders_df.where(po.spark())
    c = customer_df.where(pc.spark())
    got = {
        tuple(r)
        for r in o.join(c, o.o_custkey == c.c_custkey, how)
        .agg(
            F.count("*").alias("n"),
            (F.sum(cents("o_totalprice")) / 100.0).alias("st"),
            (F.sum(cents("c_acctbal")) / 100.0).alias("sb"),
        )
        .collect()
    }
    jt = "JOIN" if how == "inner" else "LEFT JOIN"
    want = {
        tuple(r)
        for r in duck.execute(
            f"""
            SELECT count(*) AS n,
                   sum(round(o_totalprice * 100)::BIGINT) / 100.0 AS st,
                   sum(round(c_acctbal * 100)::BIGINT) / 100.0 AS sb
            FROM (SELECT * FROM orders WHERE {po.sql()}) o
            {jt} (SELECT * FROM customer WHERE {pc.sql()}) c
              ON o.o_custkey = c.c_custkey
            """
        ).fetchall()
    }
    assert got == want, f"po={po.sql()} pc={pc.sql()} how={how}"


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(po=order_pred, pc=cust_pred, anti=st.booleans())
def test_random_semi_anti_join_matches_duckdb(
    po, pc, anti, spark, duck, orders_df, customer_df
):
    o = orders_df.where(po.spark())
    c = customer_df.where(pc.spark())
    how = "left_anti" if anti else "left_semi"
    got = {
        tuple(r)
        for r in o.join(c, o.o_custkey == c.c_custkey, how)
        .agg(
            F.count("*").alias("n"),
            (F.sum(cents("o_totalprice")) / 100.0).alias("st"),
        )
        .collect()
    }
    ex = "NOT EXISTS" if anti else "EXISTS"
    want = {
        tuple(r)
        for r in duck.execute(
            f"""
            SELECT count(*) AS n,
                   sum(round(o_totalprice * 100)::BIGINT) / 100.0 AS st
            FROM orders WHERE {po.sql()}
              AND {ex} (SELECT 1 FROM customer
                        WHERE {pc.sql()} AND c_custkey = o_custkey)
            """
        ).fetchall()
    }
    assert got == want, f"po={po.sql()} pc={pc.sql()} anti={anti}"


# --- random window shapes over orders ---------------------------------

WINDOW_FNS = ["row_number", "lag1", "lead2", "runsum_all", "runsum_3"]


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(fn=st.sampled_from(WINDOW_FNS), po=order_pred)
def test_random_window_matches_duckdb(fn, po, spark, duck, orders_df):
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    tp = cents("o_totalprice")
    spark_col = {
        "row_number": F.row_number().over(w).cast("long"),
        "lag1": F.lag(tp, 1).over(w) / 100.0,
        "lead2": F.lead(tp, 2).over(w) / 100.0,
        "runsum_all": F.sum(tp).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
        / 100.0,
        "runsum_3": F.sum(tp).over(w.rowsBetween(-3, 0)) / 100.0,
    }[fn]
    got = {
        tuple(r)
        for r in orders_df.where(po.spark())
        .select("o_orderkey", spark_col.alias("w"))
        .collect()
    }
    over = "OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"
    tp_sql = "round(o_totalprice * 100)::BIGINT"
    sql_col = {
        "row_number": f"row_number() {over})",
        "lag1": f"lag({tp_sql}, 1) {over}) / 100.0",
        "lead2": f"lead({tp_sql}, 2) {over}) / 100.0",
        "runsum_all": (
            f"sum({tp_sql}) {over} ROWS BETWEEN UNBOUNDED PRECEDING"
            " AND CURRENT ROW) / 100.0"
        ),
        "runsum_3": (
            f"sum({tp_sql}) {over} ROWS BETWEEN 3 PRECEDING"
            " AND CURRENT ROW) / 100.0"
        ),
    }[fn]
    want = {
        tuple(r)
        for r in duck.execute(
            f"SELECT o_orderkey, {sql_col} AS w FROM orders WHERE {po.sql()}"
        ).fetchall()
    }
    assert got == want, f"fn={fn} po={po.sql()}"


def test_arrow_try_cents_matches_duckdb_try_cast():
    """Round-11 ADVICE #3: the shared Arrow cents kernel must map BOTH
    TRY_CAST null modes — non-finite AND huge-but-finite (|v*100| >=
    2^63) — to null instead of raising ArrowInvalid, differentially
    against DuckDB's TRY_CAST on the exact same doubles."""
    import duckdb
    import pyarrow as pa

    from pymapreduce_spark.operators.udfs import _arrow_try_cents

    vals = [
        0.0, 1.005, -1.005, None,
        float("nan"), float("inf"), float("-inf"),
        2.0**63, -(2.0**63), 2.0**62, 1e300, -1e300,
        (2.0**63 - 1024) / 100.0,   # largest double*100 below 2^63
        9.3e16,                      # castable large finite
        -(2.0**63) / 100.0,          # v*100 == -2^63 exactly: CASTABLE
        # (INT64_MIN — the asymmetric boundary, r12 ADVICE #1)
    ]
    got = _arrow_try_cents(pa.array(vals, pa.float64())).to_pylist()
    duck = duckdb.connect()
    want = [
        duck.execute(
            "SELECT TRY_CAST(round(?::DOUBLE * 100) AS BIGINT)", [v]
        ).fetchone()[0]
        if v is not None
        else None
        for v in vals
    ]
    assert got == want

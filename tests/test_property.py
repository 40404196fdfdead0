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

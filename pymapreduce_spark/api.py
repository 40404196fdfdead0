"""MapReduceJob — the reference framework's programming surface,
re-expressed on Spark (SURVEY §1.1 / §3.1).

The reference is a Python MapReduce framework: users write ``map(record)
→ pairs``, ``reduce(key, values) → rows`` and chain jobs. This facade
gives that exact mental model on DataFrames:

    result = (
        MapReduceJob.from_table(spark, sf_dir, "documents")
        .flat_map(lambda row: ({"word": w} for w in row["text"].split(" ")),
                  schema="word string")
        .reduce_by_key(["word"], lambda key, rows: {"word": key[0],
                                                    "cnt": len(rows)},
                       schema="word string, cnt long")
        .to_df()
    )

Execution semantics vs the MR loop (SURVEY §3.1): ``map/flat_map/filter``
run as Arrow-batched ``mapInPandas`` (the mapper, batch-at-a-time);
``reduce_by_key`` with a Python reducer is ``applyInPandas`` (the reducer
— the whole key group in memory, exactly an MR values-iterator's
contract); ``reduce_agg`` is the declarative fast path where the reducer
is expressible as aggregate expressions (Catalyst plans map-side partial
aggregation — the combiner — automatically). Chained jobs build ONE
Spark DAG: no materialization barrier between them.

At 100 TB the guidance printed in every docstring applies: prefer the
declarative fast paths (``select_expr``/``where_expr``/``reduce_agg``);
the Python hooks exist for genuinely imperative logic and stream through
constant memory per task, but cross the JVM↔Arrow boundary.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pymapreduce_spark.io import load_table

Row = dict[str, Any]


def _records(pdf: pd.DataFrame) -> Iterator[Row]:
    for rec in pdf.to_dict("records"):
        yield rec


class MapReduceJob:
    """Chainable MapReduce-style pipeline over a DataFrame."""

    def __init__(self, df: DataFrame):
        self.df = df

    # -- sources -------------------------------------------------------

    @classmethod
    def from_table(
        cls, spark: SparkSession, sf_dir: str, name: str
    ) -> "MapReduceJob":
        return cls(load_table(spark, sf_dir, name))

    @classmethod
    def from_df(cls, df: DataFrame) -> "MapReduceJob":
        return cls(df)

    # -- mapper side ---------------------------------------------------

    def map(self, fn: Callable[[Row], Row], schema: str) -> "MapReduceJob":
        """1→1 record transform (MR mapper emitting one pair).
        Runs batch-at-a-time over Arrow; prefer ``select_expr`` when the
        transform is expressible as column expressions."""

        def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = [fn(rec) for rec in _records(pdf)]
                if out:
                    yield pd.DataFrame(out)

        return MapReduceJob(self.df.mapInPandas(runner, schema))

    def flat_map(
        self, fn: Callable[[Row], Iterable[Row]], schema: str
    ) -> "MapReduceJob":
        """1→N emit (the classic mapper)."""

        def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = [o for rec in _records(pdf) for o in fn(rec)]
                if out:
                    yield pd.DataFrame(out)

        return MapReduceJob(self.df.mapInPandas(runner, schema))

    def filter(self, fn: Callable[[Row], bool]) -> "MapReduceJob":
        """1→{0,1} emit with a Python predicate (schema unchanged).
        Prefer ``where_expr`` — a Column predicate reaches the scan."""
        schema = self.df.schema

        def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                mask = [bool(fn(rec)) for rec in _records(pdf)]
                out = pdf[pd.Series(mask, index=pdf.index)]
                if len(out):
                    yield out

        return MapReduceJob(self.df.mapInPandas(runner, schema))

    # -- declarative fast paths (use these at scale) -------------------

    def select_expr(self, *exprs: str) -> "MapReduceJob":
        return MapReduceJob(self.df.selectExpr(*exprs))

    def where_expr(self, expr: str) -> "MapReduceJob":
        return MapReduceJob(self.df.where(expr))

    # -- reducer side --------------------------------------------------

    def reduce_by_key(
        self,
        keys: list[str],
        fn: Callable[[tuple, pd.DataFrame], Row | Iterable[Row]],
        schema: str,
    ) -> "MapReduceJob":
        """The MR reducer verbatim: ``fn(key, group)`` sees the whole
        key group (as a pandas DataFrame) and emits one or more rows.
        One shuffle on ``keys``; group must fit in worker memory — the
        same contract as an MR reducer's values iterator."""

        def runner(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            out = fn(key, pdf)
            rows = [out] if isinstance(out, dict) else list(out)
            return pd.DataFrame(rows)

        return MapReduceJob(
            self.df.groupBy(*keys).applyInPandas(runner, schema)
        )

    def reduce_agg(
        self, keys: list[str], *aggs: Column
    ) -> "MapReduceJob":
        """Declarative reducer: aggregate expressions → Catalyst plans
        partial (map-side combine) + final aggregation. The scale path."""
        return MapReduceJob(self.df.groupBy(*keys).agg(*aggs))

    def reduce_by_key_sorted(
        self,
        keys: list[str],
        sort_cols: list[str],
        fn: Callable[[tuple, pd.DataFrame], Row | Iterable[Row]],
        schema: str,
    ) -> "MapReduceJob":
        """MR secondary sort: the reducer's values iterator arrives
        ordered by ``sort_cols`` within each key group. Hadoop achieves
        this with a composite shuffle key + grouping comparator; here
        the group is sorted engine-side before the reducer sees it —
        same contract, and the sort is per-group (bounded by the key's
        fan-in), never global."""

        def runner(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            ordered = pdf.sort_values(sort_cols, kind="mergesort")
            out = fn(key, ordered)
            rows = [out] if isinstance(out, dict) else list(out)
            return pd.DataFrame(rows)

        return MapReduceJob(
            self.df.groupBy(*keys).applyInPandas(runner, schema)
        )

    # -- counters (MR task counters) -----------------------------------

    def with_counters(self, **counters: Column):
        """MR counters: named aggregate expressions observed on the rows
        flowing through this stage, collected driver-side after the
        next action — Spark's ``Observation`` is the accumulator-backed
        equivalent of Hadoop's task counters (zero extra passes; the
        metrics piggyback on the job). Returns ``(job, observation)``;
        read ``observation.get`` after an action."""
        from pyspark.sql import Observation

        obs = Observation()
        observed = self.df.observe(
            obs, *[c.alias(n) for n, c in counters.items()]
        )
        return MapReduceJob(observed), obs

    # -- shuffle/layout controls (MR partitioner & secondary sort) -----

    def partition_by(self, n: int, *cols: str) -> "MapReduceJob":
        return MapReduceJob(self.df.repartition(n, *cols))

    def sort_within_partitions(self, *cols: str) -> "MapReduceJob":
        return MapReduceJob(self.df.sortWithinPartitions(*cols))

    # -- side data (MR distributed cache) ------------------------------

    def join_cached(
        self, small: DataFrame, on: Column | list[str], how: str = "inner"
    ) -> "MapReduceJob":
        """Join against a broadcast side table (the distributed cache)."""
        return MapReduceJob(self.df.join(F.broadcast(small), on, how))

    # -- sinks ---------------------------------------------------------

    def to_df(self) -> DataFrame:
        return self.df

    def collect(self):
        return self.df.collect()

    def write_parquet(self, path: str, partition_by: list[str] | None = None):
        w = self.df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

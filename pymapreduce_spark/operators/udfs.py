"""UDF / UDAF / UDTF surface (SURVEY.md §2-K).

The MapReduce reference's mapper and reducer are literally
``mapInPandas`` (iterator of batches → batches) and ``applyInPandas``
(key group → DataFrame): these are the two ops a user of the reference
would reach for first, so they get the most direct treatment.

Performance doctrine (SURVEY §4): Python UDFs are the slow path. Every op
here is Arrow-batched (``spark.sql.execution.arrow.pyspark.enabled`` is
pinned in session.py) — the row-at-a-time ``udf_python`` exists only to
cover the API surface and its docstring says so. At 100 TB you use the
built-in expression whenever one exists; these queries deliberately pick
logic that IS expressible in SQL so the oracle can check them — real
deployments would use the SQL form (each docstring shows it).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pymapreduce_spark.io import load_table
from pymapreduce_spark.registry import query


def _arrow_try_cents(v):
    """``TRY_CAST(round(v * 100) AS BIGINT)`` in Arrow kernels: exact
    integer cents with half-away-from-zero rounding (Arrow's default
    half_to_even splits the engines on half-cent values), with BOTH
    failure modes of the checked cast mapped to null the way the
    DuckDB oracle's TRY_CAST maps them — non-finite inputs AND
    huge-but-FINITE magnitudes (|v*100| >= 2^63), which Arrow's safe
    int64 cast would otherwise raise ArrowInvalid on and kill the
    query (round-11 ADVICE #3). Vectorized C++ kernels throughout, no
    per-row Python."""
    import pyarrow as pa
    import pyarrow.compute as pc

    r = pc.round(
        pc.multiply(v, pa.scalar(100.0)),
        round_mode="half_towards_infinity",
    )
    # one mask for both TRY_CAST null modes: is_finite is False for
    # NaN/±Inf, and 2^63 is exactly representable as a double. The
    # int64 range is ASYMMETRIC: -2^63 itself is castable (DuckDB/Spark
    # TRY_CAST(-9223372036854775808.0) returns INT64_MIN — r12 ADVICE
    # #1), so the mask is r >= -2^63 AND r < 2^63, not abs(r) < 2^63.
    ok = pc.and_kleene(
        pc.is_finite(r),
        pc.and_kleene(
            pc.greater_equal(r, pa.scalar(float(-(1 << 63)))),
            pc.less(r, pa.scalar(float(1 << 63))),
        ),
    )
    return pc.cast(
        pc.if_else(ok, r, pa.scalar(None, pa.float64())), pa.int64()
    )


def _cents_half_away(values: pd.Series) -> pd.Series:
    """value×100 rounded HALF AWAY FROM ZERO — the convention Spark's
    round() and DuckDB's round() share. pandas/numpy .round() is
    half-to-EVEN, so any value landing exactly on a half-cent (e.g.
    0.005) silently splits the engines by one cent (caught by the
    degenerate-input audit). NaN (a NULL value) propagates.

    Rounds via the shortest decimal repr exactly like Spark
    (BigDecimal.valueOf + HALF_UP): the earlier floor(abs+0.5) idiom
    double-rounds — for cents one ulp below a half (0.49999999999999994)
    the +0.5 lands on exactly 1.0 in IEEE754 and floors to 1 where both
    engines' round() yields 0 (r6 advisor finding)."""
    from decimal import ROUND_HALF_UP, Decimal

    one = Decimal("1")

    def rnd(x) -> float:
        if x is None:
            return float("nan")
        x = float(x)
        if x != x or x in (float("inf"), float("-inf")):
            # non-finite carries no usable magnitude: NaN here becomes
            # NULL downstream (dropna / Int64 <NA>), exactly matching
            # the engines' TRY_CAST(round(x*100) AS BIGINT) → NULL.
            # Passing ±Inf through instead crashes astype("Int64")
            # (round-7 nan_inf axis).
            return float("nan")
        return float(
            Decimal(repr(x * 100.0)).quantize(one, rounding=ROUND_HALF_UP)
        )

    return values.map(rnd)


@query(
    "udf_python",
    oracle="""
    SELECT doc_id,
           CASE WHEN n_chars < 100 THEN 'short'
                WHEN n_chars < 300 THEN 'medium'
                ELSE 'long' END AS length_class
    FROM documents
    """,
)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time scalar UDF — correctness baseline ONLY (each row
    crosses JVM→Python individually; ~10-100× slower than the CASE
    expression in the oracle, which is what production code should use)."""

    @F.udf(returnType=T.StringType())
    def length_class(n_chars: int) -> str:
        if n_chars < 100:
            return "short"
        if n_chars < 300:
            return "medium"
        return "long"

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", length_class("n_chars").alias("length_class"))


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT event_id,
           CASE WHEN isnan(value) THEN NULL
                ELSE round((value - 50.0) / 25.0, 6) END AS value_z
    FROM events
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized Series→Series pandas UDF (Arrow batches; the fast
    Python path). Identical float ops in identical order → bit-equal
    results across engines; rounded anyway per §5.4.

    NaN contract: a float64 pandas Series cannot distinguish NaN from
    NULL, so the Arrow return path coerces a NaN result to NULL — the
    oracle says so explicitly (±Inf survives the boundary and matches
    IEEE arithmetic in both engines; round-7 nan_inf axis)."""

    @F.pandas_udf("double")
    def zscore(v: pd.Series) -> pd.Series:
        return (v - 50.0) / 25.0

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.round(zscore("value"), 6).alias("value_z")
    )


@query(
    "udaf_pandas_agg",
    oracle="""
    SELECT user_id,
           sum(TRY_CAST(round(value * 100) AS BIGINT)) / (100.0 * count(*))
               AS mean_value,
           round(quantile_cont(CASE WHEN NOT isnan(value) THEN value END,
                               0.5), 4) AS median_value
    FROM events
    GROUP BY user_id
    """,
)
def udaf_pandas_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (Series→scalar) used inside groupBy().agg.
    pandas ``median`` == DuckDB ``quantile_cont(0.5)`` (both interpolate
    the middle pair). The mean goes through exact integer cents (value
    is a 2-decimal money column): Σcents/(100·n) is ONE double division
    of identical operands in both engines — bit-identical, emitted
    UNROUNDED (a round(4) would half-tie whenever cents·10⁴/(100n) lands
    on .5, e.g. any 64-event group — caught by the sf0.1 oracle sweep).
    The median never ties at round(4): the middle pair's average has at
    most 3 decimals."""

    @F.pandas_udf("double")
    def pmean(v: pd.Series) -> float:
        # SQL semantics: sum skips NULLs, count(*) counts every row;
        # a group with no usable cents means NULL, never a fabricated 0.
        # The guard must look at the DAMAGED cents series, not v: a
        # group of only non-finites with at least one ±Inf (e.g.
        # [inf, nan]) has v.notna() hits, but _cents_half_away maps
        # ±Inf to NaN so the cents sum is over nothing — the oracle's
        # sum(TRY_CAST(...)) over all-NULL cents yields NULL there too.
        c = _cents_half_away(v).dropna()
        if len(c) == 0:
            return None
        return float(c.astype("int64").sum()) / (100.0 * len(v))

    @F.pandas_udf("double")
    def pmedian(v: pd.Series) -> float:
        m = v.median()  # pandas skips NaN, as quantile_cont skips NULL
        return None if pd.isna(m) else float(m)

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        pmean("value").alias("mean_value"),
        F.round(pmedian("value"), 4).alias("median_value"),
    )


@query(
    "udf_grouped_map",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           round(quantile_cont(CASE WHEN NOT isnan(value) THEN value END,
                               0.5), 4) AS median_value,
           round(max(CASE WHEN NOT isnan(value) THEN value END)
                 - min(CASE WHEN NOT isnan(value) THEN value END),
                 4) AS value_range
    FROM events
    GROUP BY user_id
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``applyInPandas``: the MapReduce *reducer* made literal — the
    whole key group arrives as one pandas DataFrame. At scale the group
    (one user's events) must fit in a worker's memory; that bound is the
    operator's contract, same as an MR reducer's values iterator."""

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "median_value": [round(float(v.median()), 4)],
                "value_range": [round(float(v.max() - v.min()), 4)],
            }
        )

    ev = load_table(spark, sf_dir, "events")
    schema = (
        "user_id bigint, n_events bigint, median_value double, "
        "value_range double"
    )
    return ev.groupBy("user_id").applyInPandas(per_user, schema)


@query(
    "udf_map_partitions",
    oracle="""
    SELECT event_id, user_id,
           TRY_CAST(round(value * 100) AS BIGINT) AS value_cents
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def udf_map_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInPandas``: the MapReduce *mapper* made literal — an
    iterator of Arrow batches in, batches out, with per-partition
    filtering + transformation. Batch-wise, so a 100 TB scan streams
    through constant memory per task."""

    def to_cents(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            purchases = pdf[pdf["event_type"] == "purchase"]
            if len(purchases):
                yield pd.DataFrame(
                    {
                        "event_id": purchases["event_id"],
                        "user_id": purchases["user_id"],
                        # half-away cents (the Spark/DuckDB round
                        # convention — see _cents_half_away). Nullable
                        # Int64 (not int64): a NULL value must stay
                        # NULL through Arrow, not crash the cast —
                        # matching the oracle's ::BIGINT of NULL
                        "value_cents": _cents_half_away(
                            purchases["value"]
                        ).astype("Int64"),
                    }
                )

    ev = load_table(spark, sf_dir, "events")
    schema = "event_id bigint, user_id bigint, value_cents bigint"
    return ev.mapInPandas(to_cents, schema)


@query(
    "udtf_python",
    oracle="""
    SELECT doc_id,
           unnest(range(1, len(str_split(text, ' ')) + 1)) AS pos,
           unnest(str_split(text, ' ')) AS word
    FROM documents
    WHERE doc_id < 100
    """,
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 3.5+): one input row → N typed output rows
    (word + 1-based position). Registered and applied via SQL LATERAL —
    the declarative form Catalyst can plan around."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, word string")
    class WordPos:
        def eval(self, text: str):
            if text is None:  # NULL text → zero rows, like the
                return  # oracle's unnest over a NULL split
            for i, w in enumerate(text.split(" "), start=1):
                yield i, w

    spark.udtf.register("word_pos", WordPos)
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, wp.pos, wp.word
        FROM documents_udtf d, LATERAL word_pos(d.text) wp
        WHERE d.doc_id < 100
        """
    )


@query(
    "udf_map_arrow",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           sum(TRY_CAST(round(value * 100) AS BIGINT))::BIGINT AS cents_total
    FROM events
    GROUP BY event_type
    """,
)
def udf_map_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow-native UDF surface (mapInArrow): the function receives
    raw pyarrow RecordBatches — no pandas materialization at all, the
    leanest possible Python hop. The batch fn scales values to exact
    integer cents with pyarrow.compute kernels (C++ vectorized, no
    per-row Python); the aggregation stays declarative above it, so
    Catalyst still plans partial/final around the shuffle. Use this
    surface over mapInPandas when the transform is expressible in
    Arrow kernels — it skips the pandas conversion both ways."""
    import pyarrow as pa

    def to_cents(batches):
        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [batch.column("event_type"), _arrow_try_cents(batch.column("value"))],
                ["event_type", "cents"],
            )

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    mapped = ev.mapInArrow(to_cents, "event_type string, cents long")
    return mapped.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("cents").alias("cents_total"),
    )


@query(
    "udf_cogrouped_map",
    oracle="""
    WITH o AS (
        SELECT o_orderkey AS k, count(*) AS n_orders,
               coalesce(sum(TRY_CAST(round(o_totalprice * 100) AS BIGINT)),
                        0) AS o_cents
        FROM orders
        WHERE o_orderkey % 1000 = 0 OR o_orderkey IS NULL
        GROUP BY 1
    ), l AS (
        SELECT l_orderkey AS k, count(*) AS n_lines,
               coalesce(sum(TRY_CAST(round(l_extendedprice * 100) AS BIGINT)),
                        0) AS l_cents
        FROM lineitem
        WHERE l_orderkey % 1000 = 0 OR l_orderkey IS NULL
        GROUP BY 1
    )
    SELECT coalesce(o.k, l.k) AS orderkey,
           coalesce(n_orders, 0)::BIGINT AS n_orders,
           coalesce(n_lines, 0)::BIGINT AS n_lines,
           coalesce(o_cents, 0)::BIGINT AS o_cents,
           coalesce(l_cents, 0)::BIGINT AS l_cents
    FROM o FULL JOIN l ON o.k IS NOT DISTINCT FROM l.k
    """,
)
def udf_cogrouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COGROUPED-map pandas UDF — ``df.groupBy(k).cogroup(other
    .groupBy(k)).applyInPandas(...)`` — the one Arrow-UDF surface the
    registry didn't exercise, and the MapReduce-native primitive behind
    it (reduce-side cogroup: both relations shuffled once on the key,
    the reducer sees BOTH key-groups together). Each orderkey's orders
    rows and lineitem rows arrive as two pandas frames; the merge emits
    one reconciliation row per key.

    Cogroup semantics under hostile keys, encoded in both engines: the
    key set is the UNION of both sides (full-outer, absent side = empty
    frame → zero counts/sums), and a NULL key is ONE cogroup — the
    oracle joins the per-side aggregates with IS NOT DISTINCT FROM,
    because a plain FULL JOIN would split the NULL cogroup into two
    rows (null_ids doctrine).

    Exactness: money goes to integer cents SPARK-SIDE (the cents
    contract nullifies non-finite values), so the pandas stage only
    sums — pandas skips NA like SQL sum skips NULL, empty/all-NA sums
    are 0 matching the oracle's coalesce, and float64 sums of cents
    stay exact far below 2^53. At 100 TB: one co-partitioned shuffle
    per side, per-key working set bounded by the key's rows.

    The conformance slice is 0.1% of keys (``k % 1000 = 0``, NULL keys
    KEPT — they're the doctrine case): cogroup dispatches one Python
    call per key, so the surface's inherent cost is per-key round
    trips. MEASURED breakdown at sf0.1 (r10 verdict #6 — the r10 bench
    read 3.94 s on the then-1% slice and its 0.34 ms/call model only
    explained an eighth): the two filtered scans cost ~0.3 s each and
    the pure-SQL shuffle twin 0.12 s; virtually all the rest was
    per-key Python dispatch at ~2 ms/key/side RUN SERIALLY — AQE
    coalesces the 1500-key exchanges to ONE task at fixture scale
    (stage shows 1/1 tasks), so 1500 keys × 2 sides ≈ 4.5 s even with
    a trivial merge fn (the 0.34 ms figure was wall-clock over 32
    parallel tasks on the unsliced 150 k-key run, 51.7 s). At
    production scale the key count dwarfs the partition count, AQE
    keeps the exchange wide, and the ~2 ms/key dispatch parallelizes —
    per-key round trips stay the surface's real cost model. A
    production cogroup carries coarse keys or heavy per-key logic;
    this op's job is to prove the API end-to-end, bounded."""

    def merge(key, odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        (k,) = key
        return pd.DataFrame(
            {
                "orderkey": [k],
                "n_orders": [len(odf)],
                "n_lines": [len(ldf)],
                "o_cents": [int(odf["oc"].sum())],
                "l_cents": [int(ldf["lc"].sum())],
            }
        )

    from pymapreduce_spark.functions.checked import cents

    keep_o = (F.col("o_orderkey") % 1000 == 0) | F.col("o_orderkey").isNull()
    keep_l = (F.col("l_orderkey") % 1000 == 0) | F.col("l_orderkey").isNull()
    o = (
        load_table(spark, sf_dir, "orders")
        .where(keep_o)
        .select(F.col("o_orderkey").alias("k"), cents("o_totalprice").alias("oc"))
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(keep_l)
        .select(F.col("l_orderkey").alias("k"), cents("l_extendedprice").alias("lc"))
    )
    return (
        o.groupBy("k")
        .cogroup(li.groupBy("k"))
        .applyInPandas(
            merge,
            "orderkey bigint, n_orders bigint, n_lines bigint,"
            " o_cents bigint, l_cents bigint",
        )
    )


@query(
    "udf_cogrouped_arrow",
    oracle="""
    WITH o AS (
        SELECT o_orderkey AS k, count(*) AS n_orders,
               coalesce(sum(TRY_CAST(round(o_totalprice * 100) AS BIGINT)),
                        0) AS o_cents
        FROM orders
        WHERE o_orderkey % 1000 = 500 OR o_orderkey IS NULL
        GROUP BY 1
    ), l AS (
        SELECT l_orderkey AS k, count(*) AS n_lines,
               coalesce(sum(TRY_CAST(round(l_extendedprice * 100) AS BIGINT)),
                        0) AS l_cents
        FROM lineitem
        WHERE l_orderkey % 1000 = 500 OR l_orderkey IS NULL
        GROUP BY 1
    )
    SELECT coalesce(o.k, l.k) AS orderkey,
           coalesce(n_orders, 0)::BIGINT AS n_orders,
           coalesce(n_lines, 0)::BIGINT AS n_lines,
           coalesce(o_cents, 0)::BIGINT AS o_cents,
           coalesce(l_cents, 0)::BIGINT AS l_cents
    FROM o FULL JOIN l ON o.k IS NOT DISTINCT FROM l.k
    """,
)
def udf_cogrouped_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ARROW-native cogroup — ``cogroup(...).applyInArrow`` (Spark
    4, SPARK-38098 family): the same reduce-side cogroup shape as
    udf_cogrouped_map, but the merge receives two ``pyarrow.Table``s
    and returns one, skipping the pandas conversion both ways. On
    one-row-per-key conformance frames the saving is inside noise
    (measured 1.80 s vs the pandas twin's 1.89 s at sf0.1 — the
    per-key ROUND TRIP dominates tiny frames, per udf_cogrouped_map's
    breakdown); the surface's real wins are (a) wide per-key frames,
    where the double pandas conversion is O(bytes), and (b) exactness:
    ``pyarrow.compute.sum`` over int64 is EXACT, while the pandas
    path's float64 staging of nullable longs needs a magnitude clamp
    to stay exact (see tests' _CG_CENTS_BOUND).

    Same full-outer + NULL-cogroup doctrine as the pandas twin (absent
    side = zero-row Table; NULL key is ONE cogroup; the oracle joins
    with IS NOT DISTINCT FROM). Slice offset 500 keeps this op's key
    set disjoint from the pandas twin's so the two driver rows attest
    different data."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def merge(key, otab: "pa.Table", ltab: "pa.Table") -> "pa.Table":
        (k,) = key  # pa.Scalar; .as_py() → None for the NULL cogroup
        osum = pc.sum(otab.column("oc")).as_py() if otab.num_rows else None
        lsum = pc.sum(ltab.column("lc")).as_py() if ltab.num_rows else None
        return pa.table(
            {
                "orderkey": pa.array([k.as_py()], pa.int64()),
                "n_orders": pa.array([otab.num_rows], pa.int64()),
                "n_lines": pa.array([ltab.num_rows], pa.int64()),
                "o_cents": pa.array([osum or 0], pa.int64()),
                "l_cents": pa.array([lsum or 0], pa.int64()),
            }
        )

    from pymapreduce_spark.functions.checked import cents

    keep_o = (F.col("o_orderkey") % 1000 == 500) | F.col("o_orderkey").isNull()
    keep_l = (F.col("l_orderkey") % 1000 == 500) | F.col("l_orderkey").isNull()
    o = (
        load_table(spark, sf_dir, "orders")
        .where(keep_o)
        .select(F.col("o_orderkey").alias("k"), cents("o_totalprice").alias("oc"))
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(keep_l)
        .select(F.col("l_orderkey").alias("k"), cents("l_extendedprice").alias("lc"))
    )
    return (
        o.groupBy("k")
        .cogroup(li.groupBy("k"))
        .applyInArrow(
            merge,
            "orderkey bigint, n_orders bigint, n_lines bigint,"
            " o_cents bigint, l_cents bigint",
        )
    )


@query(
    "udf_grouped_arrow",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           coalesce(sum(TRY_CAST(round(value * 100) AS BIGINT)), 0)::BIGINT
               AS cents_total,
           max(TRY_CAST(round(value * 100) AS BIGINT)) AS cents_max
    FROM events
    GROUP BY event_type
    """,
)
def udf_grouped_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-side ARROW grouped map — ``groupBy(k).applyInArrow``
    (Spark 4): the whole key group arrives as ONE ``pyarrow.Table``
    and the reducer returns a Table, completing the Arrow-UDF matrix
    (mapInArrow = udf_map_arrow, cogrouped = udf_cogrouped_arrow,
    pandas grouped map = udf_grouped_map). Versus applyInPandas the
    group never materializes as pandas objects — for wide string-heavy
    groups that's the difference between O(bytes) zero-copy Arrow
    access and a full object conversion.

    Exactness doctrine in Arrow kernels (shared _arrow_try_cents):
    round_mode='half_towards_infinity' (Arrow's default half_to_even
    splits the engines on half-cent values), non-finite AND
    out-of-int64-range magnitudes nulled BEFORE the cast exactly like
    the oracle's TRY_CAST, and pc.sum over int64 is exact with no
    float staging. Group-per-event_type (13 groups):
    coarse keys are the production cogroup/grouped-map shape — the
    per-key dispatch cost model (udf_cogrouped_map) stays negligible.
    At 100 TB: one co-partitioned shuffle, per-group working set
    bounded by the group's rows (the MR reducer contract)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def per_type(tab: "pa.Table") -> "pa.Table":
        et = tab.column("event_type")[0] if tab.num_rows else None
        cents = _arrow_try_cents(tab.column("value"))
        s = pc.sum(cents).as_py()
        m = pc.max(cents).as_py()
        return pa.table(
            {
                "event_type": pa.array(
                    [et.as_py() if et is not None else None], pa.string()
                ),
                "n_events": pa.array([tab.num_rows], pa.int64()),
                "cents_total": pa.array([s if s is not None else 0], pa.int64()),
                "cents_max": pa.array([m], pa.int64()),
            }
        )

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    return ev.groupBy("event_type").applyInArrow(
        per_type,
        "event_type string, n_events bigint,"
        " cents_total bigint, cents_max bigint",
    )

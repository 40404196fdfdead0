"""IO-layer tests: the split-layout cache must be value-transparent.

The fixture ships one parquet file per table with a single row group, so
Spark cannot parallelize the scan. ``load_table`` serves big tables from
a multi-file re-layout under .artifacts; these tests pin (a) the copy is
byte-equivalent to the raw table and (b) it actually splits.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pymapreduce_spark.io import (
    _SPLIT_MIN_BYTES,
    _fix_events,
    load_table,
    table_path,
)

SF01 = "/root/testdata/sf0.1"


def _xor_hash(df) -> int:
    cols = ",".join(df.columns)
    return df.select(F.expr(f"bit_xor(xxhash64({cols}))").alias("h")).first().h


def test_split_cache_equivalent_and_parallel(spark):
    import os

    for name in ("lineitem", "orders", "events"):
        assert os.path.getsize(table_path(SF01, name)) >= _SPLIT_MIN_BYTES
        served = load_table(spark, SF01, name)
        raw = spark.read.parquet(table_path(SF01, name))
        if name == "events":
            raw = _fix_events(raw)
        assert served.count() == raw.count(), name
        assert _xor_hash(served) == _xor_hash(raw), name
        assert served.rdd.getNumPartitions() > 1, (
            f"{name}: split layout did not parallelize the scan"
        )


def test_small_tables_served_raw(spark):
    # Below the size threshold the raw fixture file is read directly —
    # no cache materialization cost for small dims.
    df = load_table(spark, SF01, "region")
    assert df.count() == 5


def test_split_cache_keeps_pushdown(spark):
    # Filters and column pruning must reach the parquet scan of the
    # split-layout copy exactly as they do on the raw file.
    from pyspark.sql import functions as F

    li = load_table(spark, SF01, "lineitem")
    plan = (
        li.where(F.col("l_shipdate") <= F.lit("1995-01-01"))
        .select("l_orderkey", "l_quantity")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan, plan
    assert "ReadSchema" in plan
    # pruned read: only the referenced columns reach the scan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema


def test_stable_scratch_previous_epoch_stays_readable(spark, sf_dir):
    """Versioned scratch epochs: a DataFrame returned by the PREVIOUS
    invocation of an operator must stay lazily readable while the next
    invocation runs (the interleaved A/B pattern), and the footprint
    stays bounded at <= 2 epochs."""
    import os

    from pymapreduce_spark.io import stable_scratch
    from pymapreduce_spark.registry import QUERIES

    def canon(rows):
        # order-insensitive: an unordered parquet scan's row order is
        # not stable across collects (file listing / partition count),
        # and the retention property under test is about READABILITY
        return sorted(map(tuple, rows))

    first = QUERIES["etl_compact_execute"](spark, sf_dir)
    rows_before = canon(first.collect())
    # second invocation wipes epochs older than the newest prior one
    QUERIES["etl_compact_execute"](spark, sf_dir).collect()
    # the frame returned by invocation 1 must still produce its rows
    assert canon(first.collect()) == rows_before
    # footprint bound: at most 2 epoch dirs exist afterwards
    newest = stable_scratch(sf_dir, "epoch_probe")
    base = os.path.dirname(newest)
    stable_scratch(sf_dir, "epoch_probe")
    stable_scratch(sf_dir, "epoch_probe")
    epochs = [e for e in os.listdir(base) if e.isdigit()]
    assert len(epochs) <= 2, epochs


def test_python_ds_source_scales_partitions(spark):
    """The custom Python Data Source's split planning is an option, not
    a constant (round-9 verdict task 7): n/partitions flow through to
    InputPartition count, and the scan stays value-exact at a
    non-default size."""
    from pymapreduce_spark.registry import QUERIES

    # registering the source is a side effect of the conformance op
    QUERIES["source_python_ds"](spark, "/root/testdata/sf0.001").collect()
    df = (
        spark.read.format("pymr_synthetic_log")
        .option("n", "1000")
        .option("partitions", "5")
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    got = df.agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    ).collect()[0]
    assert got["n"] == 1000
    assert got["s"] == sum((k * 2654435761) % 1000003 for k in range(1000))


def test_csv_permissive_per_line_classification_pinned(spark, tmp_path):
    """Pin the Spark 4 / univocity PERMISSIVE parser behavior that
    scan_csv_malformed's oracle constants (n_corrupt=5,
    recovered_cents=1087) are derived from — per MALFORMED LINE, not
    just in aggregate. If any assert here fires after a Spark upgrade,
    the parser's corrupt-line classification changed and the oracle
    constants in sources/scans.py (scan_csv_malformed) must be
    re-measured — the op would otherwise go silently red (r10 advice)."""
    from pyspark.sql import types as T

    p = tmp_path / "pin.csv"
    p.write_text(
        "1,2,3.5\n"  # control: a good line
        "not_a_number,7,1.23\n"  # type mismatch
        "901,3\n"  # under-arity
        "902,4,3.14,surplus,again\n"  # over-arity
        '903,"unterminated,6.50\n'  # unterminated quote
        "904,5,6.50,extra\n"  # over-arity
    )
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("nat", T.LongType()),
            T.StructField("bal", T.DoubleType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(p), schema=schema)
        .cache()
    )
    rows = {r["_corrupt_record"]: r for r in df.collect()}
    df.unpersist()
    vermsg = (
        "univocity-parser behavior changed across Spark versions: "
        "re-measure scan_csv_malformed's oracle constants"
    )
    # the good line parses clean
    assert None in rows and rows[None].bal == 3.5, vermsg
    # each malformed line is ONE corrupt row carrying its raw text,
    # with the parseable fields still recovered (partial recovery)
    assert len(rows) == 6, vermsg  # esp.: bad quote did NOT swallow lines
    bad = {k: v for k, v in rows.items() if k is not None}
    assert bad["not_a_number,7,1.23"].bal == 1.23, vermsg
    assert bad["901,3"].bal is None, vermsg  # under-arity: no bal
    assert bad["902,4,3.14,surplus,again"].bal == 3.14, vermsg
    # unterminated quote stays a SINGLE corrupt row, balance lost
    assert bad['903,"unterminated,6.50'].bal is None, vermsg
    assert bad["904,5,6.50,extra"].bal == 6.5, vermsg
    # the aggregate fingerprint the oracle hardcodes: 123+314+650
    got = sum(
        round(v.bal * 100) for v in bad.values() if v.bal is not None
    )
    assert got == 1087, vermsg

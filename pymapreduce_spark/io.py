"""Fixture IO: path → typed DataFrame, owning the events nanos fix.

Every query reads fixture tables through :func:`load_table`; nothing else
in the engine calls ``spark.read.parquet`` on fixtures directly. This is
what keeps the SURVEY §1.2 gotcha (ns timestamps in ``events.parquet``)
centralized: with ``spark.sql.legacy.parquet.nanosAsLong=true`` the ``ts``
column arrives as long nanoseconds and is converted here — via integer
division, not float, to avoid ulp drift — to a microsecond TimestampType
that matches DuckDB's ``ts::TIMESTAMP`` truncation.
"""

from __future__ import annotations

import contextlib
import os
import shutil
import tempfile
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymapreduce_spark.session import ensure_runtime_configs

#: All fixture tables (TESTDATA.md / FIXTURES.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Split-layout cache (ingest-time compaction, inverted): the fixture
#: ships each table as ONE parquet file with ONE row group, and Spark can
#: only split parquet at row-group boundaries — so every scan of the big
#: tables is a single task no matter how many cores the executor has.
#: Tables at or above _SPLIT_MIN_BYTES are re-laid-out once per sf into a
#: multi-file copy under .artifacts/<sf>/split/ sized ~_SPLIT_TARGET_BYTES
#: per file; all queries then scan in parallel. This is the local-mode
#: mirror of what a 100 TB ingest does anyway (write splittable,
#: right-sized files); at real scale the source layout already has many
#: row groups and this cache is a no-op.
_SPLIT_MIN_BYTES = 1_500_000
_SPLIT_TARGET_BYTES = 768 * 1024
_SPLIT_MAX_FILES = 16

#: Bytes-on-disk underestimate the work a scan FEEDS for some tables:
#: every documents row explodes into ~30 token rows downstream, and
#: embeddings rows feed O(n²)/HOF vector kernels. The effective size
#: (size × multiplier) drives the split decision so these tables scan
#: in parallel too — measured ~2× on BM25/ngram-shaped text queries at
#: sf0.1, which otherwise tokenize 5 000 docs on ONE core (the 594 KB
#: file sits under the byte threshold). Multipliers are tuned so sf0.1
#: lands near 8 files: interleaved A/B showed 8-way matches raw-scan
#: cost on trivial single-pass queries while capturing the full win on
#: HOF-heavy ones; 16-way taxed the trivial class ~0.1 s of pure task
#: overhead.
_WORK_MULTIPLIER = {"documents": 12, "embeddings": 8}
_ARTIFACTS_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".artifacts")

# DataFrame catalog: fixtures are immutable, so the analyzed relation
# (file listing + parquet footer schema) is reused per session. Saves
# ~0.1-0.3 s of re-listing/footer reads on EVERY query. Keyed by the
# Spark applicationId (unique per context — unlike id(spark), which can
# be reused after GC and would serve plans bound to a dead session).
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def fixture_stamp(path: str) -> str:
    """Identity stamp for a fixture file, used to key every derived-data
    cache (split layout, partitioned copy, streaming replay, scratch
    JSONL, semdedup probe memo). ``size:mtime_ns`` alone is spoofable by
    an mtime-preserving restore (``cp -p`` / ``tar -x`` / LFS checkout)
    that happens to match the old size — so the stamp also folds in the
    inode and a CRC of the file's head+tail 64 KiB (the parquet footer
    lives in the tail, so schema/row-group changes always land there;
    data edits almost always move the size). Raises OSError when the
    path is unreadable — callers decide their own fallback."""
    st = os.stat(path)
    crc = 0
    if os.path.isfile(path):
        with open(path, "rb") as fh:
            crc = zlib.crc32(fh.read(65536))
            if st.st_size > 131072:
                fh.seek(-65536, os.SEEK_END)
            crc = zlib.crc32(fh.read(65536), crc)
    return f"{st.st_size}:{st.st_mtime_ns}:i{st.st_ino}:c{crc:08x}"


def _fix_events(df: DataFrame) -> DataFrame:
    """Convert the ns-as-long ``ts`` column to a proper µs timestamp.

    ``ts div 1000`` is integer (floor) division on the long nanos value —
    exact, and identical to DuckDB's ns→µs cast truncation for the
    positive-epoch fixture range (2024). A float division here would lose
    precision (2024 epoch-nanos ≈ 1.7e18 exceeds double's 53-bit mantissa).
    """
    dtypes = dict(df.dtypes)
    if dtypes.get("ts") == "bigint":
        # Session tz is pinned UTC (session.py) so the zoned→NTZ cast is
        # wall-clock-preserving for the micros value.
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    elif dtypes.get("ts") == "timestamp":
        # Legacy zoned encodings normalize to NTZ under the pinned-UTC
        # session tz (wall-clock-preserving).
        df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    # timestamp_ntz (newer fixtures): already the engine's canonical type.
    #
    # Round-8 clock/timezone doctrine: ``ts`` is NAIVE WALL-CLOCK DATA
    # (exactly what the parquet stores and what DuckDB's TIMESTAMP is),
    # so it stays TimestampNTZType end-to-end. The zoned TimestampType
    # this used to cast to carries an instant whose *collection* back to
    # Python goes through datetime.fromtimestamp — i.e. the DRIVER
    # PROCESS's OS timezone — so every checked timestamp output column
    # silently shifted by the host's UTC offset on a non-UTC machine
    # (measured: TZ=Asia/Kathmandu shifts collect() by +05:45 while the
    # DuckDB oracle stays naive). NTZ collection is tz-free by
    # construction: no session tz, no OS tz, no DST gaps, ever.
    return df


def _split_layout(spark: SparkSession, sf_dir: str, name: str) -> str | None:
    """Return the path of the table's split-layout copy, materializing it
    on first use; None when the raw file is small enough to leave alone
    or the cache directory is unusable."""
    raw = table_path(sf_dir, name)
    try:
        size = os.path.getsize(raw)
    except OSError:
        return None
    eff_size = size * _WORK_MULTIPLIER.get(name, 1)
    if eff_size < _SPLIT_MIN_BYTES:
        return None
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join(_ARTIFACTS_DIR, sf_tag, "split", name)
    marker = os.path.join(path, "_SPLIT_READY")
    # The marker is keyed to the raw file's identity (fixture_stamp:
    # size + mtime + inode + head/tail CRC) AND the target layout
    # (n_files): a regenerated fixture at the same path OR a re-tuned
    # split sizing invalidates the cached copy instead of silently
    # serving stale data (the events ts re-encoding already forced the
    # same versioning on the streaming replay dir).
    n_files = max(2, min(_SPLIT_MAX_FILES, eff_size // _SPLIT_TARGET_BYTES))
    try:
        stamp = f"{fixture_stamp(raw)}:n{n_files}"
    except OSError:
        return None
    try:
        with open(marker) as fh:
            if fh.read().strip() == stamp:
                return path
    except OSError:
        pass
    try:
        df = spark.read.parquet(raw)
        if name == "events":
            df = _fix_events(df)  # cache the normalized timestamps
        df.repartition(n_files).write.mode("overwrite").parquet(path)
        with open(marker, "w") as fh:
            fh.write(stamp)
    except Exception:  # pragma: no cover - read-only FS etc.
        return None
    return path


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a typed DataFrame.

    Plain ``spark.read.parquet`` — schema comes from the parquet footer, so
    Catalyst gets real column types for pushdown/pruning. Only ``events``
    needs post-read normalization. Large single-row-group fixture files
    are served from the split-layout cache (see :data:`_SPLIT_MIN_BYTES`)
    so scans parallelize.
    """
    # Heal BEFORE the cache check: the self-heal contract is per-QUERY,
    # and a query whose every load_table is a cache hit must still get
    # it. Round-8 clock axis catch: with the heal on the miss path
    # only, a hostile session timezone set between queries survived
    # into any query whose tables were already cached — fn_date's
    # DATE→TIMESTAMP epoch resolved to midnight-Kathmandu, and the
    # streaming window ops aligned buckets to :45 (the sweep's --only
    # single-query runs all passed, which is exactly the signature of
    # an ordering-dependent defect).
    ensure_runtime_configs(spark)
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    split = _split_layout(spark, sf_dir, name)
    df = spark.read.parquet(split or table_path(sf_dir, name))
    if name == "events":
        df = _fix_events(df)
    _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def read_back(
    spark: SparkSession, path: str, schema, fmt: str = "parquet"
) -> DataFrame:
    """Read a directory this engine just wrote, with the writer's schema
    made EXPLICIT. An empty write leaves a directory with no part files
    (or, if zero batches ran, no directory at all) — footer inference
    then throws UNABLE_TO_INFER_SCHEMA, so every sink→read-back would
    crash on legitimately empty data (an empty route, day, or filter
    result is routine at 100 TB). Explicit schema + an ensured directory
    returns an honest empty frame instead. Works for partitioned layouts
    too: declare partition columns in the schema and Spark casts the
    directory values to the declared types."""
    os.makedirs(path, exist_ok=True)
    return spark.read.schema(schema).format(fmt).load(path)


def partitioned_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    part_col: str,
    part_expr,
) -> DataFrame:
    """Hive-partitioned copy of a fixture table (directory per
    ``part_col`` value, computed by ``part_expr``), materialized once
    under ``.artifacts/<sf>/part/`` and keyed to the raw file's identity
    (:func:`fixture_stamp`) exactly like the split cache — a regenerated
    fixture invalidates the copy instead of serving stale data.

    This is the layout a 100 TB lake already has (date-partitioned
    directories); materializing it locally lets partition-pruning
    operators exercise the REAL pruned-scan path (PartitionFilters /
    dynamicpruning in the physical plan) rather than simulate it.
    Falls back to the unpartitioned table (with ``part_col`` appended)
    when the artifacts dir is unwritable — results stay identical, only
    the pruning physics is lost."""
    raw = table_path(sf_dir, name)
    fallback = load_table(spark, sf_dir, name).withColumn(
        part_col, part_expr
    )
    try:
        src_stamp = fixture_stamp(raw)
    except OSError:
        return fallback
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join(
        _ARTIFACTS_DIR, sf_tag, "part", f"{name}_by_{part_col}"
    )
    marker = os.path.join(path, "_PART_READY")
    # Stamp includes a fingerprint of the partition EXPRESSION, not just
    # the source file: a caller that redefines part_expr (say year ->
    # year*100+month) under the same table/part_col name must invalidate
    # the cached layout — the same staleness class the split cache's
    # :n{n_files} component guards against.
    try:
        expr_fp = str(part_expr._jc)
    except Exception:
        expr_fp = str(part_expr)
    stamp = f"{src_stamp}:e{zlib.crc32(expr_fp.encode()):08x}"
    try:
        with open(marker) as fh:
            if fh.read().strip() == stamp:
                return read_back(spark, path, fallback.schema)
    except OSError:
        pass
    try:
        fallback.write.partitionBy(part_col).mode("overwrite").parquet(
            path
        )
        with open(marker, "w") as fh:
            fh.write(stamp)
    except Exception:  # pragma: no cover - read-only FS etc.
        return fallback
    # schema-explicit (read_back): an empty source writes a partitioned
    # dir with zero part files, which footer inference cannot read
    return read_back(spark, path, fallback.schema)


def stable_scratch(sf_dir: str, name: str) -> str:
    """Bounded scratch location for operators whose RESULT lazily reads
    files they wrote (compaction read-back, mergeSchema, JSONL round
    trip, CDC state): a fixed per-(sf, operator) directory under
    ``.artifacts``, wiped at each invocation start. Repeated bench /
    differential-suite invocations overwrite the same footprint instead
    of leaking a fresh ``tempfile.mkdtemp`` copy of the table per call;
    the files outlive the call so the returned DataFrame's deferred
    scan still works. Falls back to a plain mkdtemp when the artifacts
    dir is unwritable (read-only checkout) — correctness is unchanged,
    only the bounded-footprint property is lost.

    Versioned epochs: each invocation gets a fresh ``<name>/<epoch>``
    subdirectory and older sibling epochs are deleted EXCEPT the most
    recent one — so a DataFrame returned by the PREVIOUS invocation of
    the same operator stays lazily readable while the new invocation
    runs (the interleaved A/B pattern holds exactly one result from
    each arm), and the footprint stays bounded at ≤2 epochs instead of
    an unmanaged mkdtemp per call."""
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = os.path.join(_ARTIFACTS_DIR, sf_tag, "scratch", name)
    try:
        os.makedirs(base, exist_ok=True)
        epochs = sorted(
            (e for e in os.listdir(base) if e.isdigit()), key=int
        )
        nxt = (int(epochs[-1]) + 1) if epochs else 0
        # keep the newest prior epoch readable; drop everything older
        for stale in epochs[:-1]:
            shutil.rmtree(os.path.join(base, stale), ignore_errors=True)
        path = os.path.join(base, str(nxt))
        os.makedirs(path, exist_ok=True)
    except OSError:
        return tempfile.mkdtemp(prefix=f"{name}_")
    return path


@contextlib.contextmanager
def scratch_dir(prefix: str = "pmr_"):
    """Self-cleaning temp directory for operators that must exercise a
    real write→read-back sink path (multi-output, compaction,
    write-audit-publish, CDC replay). Bench's median-of-3 and the
    295-query differential suite re-invoke those operators repeatedly;
    an unmanaged ``tempfile.mkdtemp`` per call leaks hundreds of
    parquet copies of lineitem/orders/events into /tmp per session.
    The result DataFrame must be fully materialized (collected or
    re-created from local rows) before the ``with`` block exits — the
    files are gone afterwards."""
    path = tempfile.mkdtemp(prefix=prefix)
    try:
        yield path
    finally:
        shutil.rmtree(path, ignore_errors=True)


def table_row_count(sf_dir: str, name: str) -> int:
    """Exact row count of a fixture table from the parquet footer — no
    Spark job. Used by operator scale guards (e.g. the kNN broadcast
    bound) where only the corpus size matters, not the data."""
    import pyarrow.parquet as pq

    path = table_path(sf_dir, name)
    if os.path.isdir(path):
        # Real tables are DIRECTORIES of part files (possibly hive-
        # partitioned); ParquetFile only opens a single file. The
        # dataset API counts rows from footer metadata across the
        # whole tree without reading data.
        import pyarrow.dataset as pads

        return pads.dataset(path, format="parquet").count_rows()
    return pq.ParquetFile(path).metadata.num_rows

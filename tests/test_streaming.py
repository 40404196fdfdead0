"""Streaming scenario tests that the replay-based oracles can't cover:
late-data dropping under a watermark with a controlled two-file replay,
and batch-equivalence spot checks (SURVEY §5.3)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

import pymapreduce_spark  # noqa: F401
from pymapreduce_spark.registry import QUERIES


def test_watermark_drops_late_rows(spark, tmp_path):
    """Three files replayed in order. Spark's watermark advances at
    batch boundaries and takes effect one batch later, so the late event
    arrives in batch 3 — well after the watermark passed its window —
    and must NOT be counted (its hour stays at 1)."""
    src = str(tmp_path / "late_src")
    os.makedirs(src)
    rows1 = [(i, f"2024-01-01 {h:02d}:00:01", "x") for i, h in enumerate(range(12))]
    # benign file: lets the already-computed watermark take effect
    rows2 = [(50, "2024-01-01 11:30:00", "x")]
    # late event: hour 01 again, delivered two batches after hour 11
    rows3 = [(100, "2024-01-01 01:00:02", "late"), (101, "2024-01-01 12:00:01", "x")]

    def write_file(rows, name, mtime):
        df = spark.createDataFrame(rows, "event_id long, ts_s string, tag string")
        df = df.select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "tag")
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / name))
        part = str(tmp_path / name)
        for f in os.listdir(part):
            if f.endswith(".parquet"):
                dst = os.path.join(src, name + ".parquet")
                os.rename(os.path.join(part, f), dst)
                os.utime(dst, (mtime, mtime))

    write_file(rows1, "f1", 1_700_000_000)
    write_file(rows2, "f2", 1_700_000_100)
    write_file(rows3, "f3", 1_700_000_200)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("ws"), "n")
    )
    name = f"late_test_{int(time.time()*1000)}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.ws.isoformat(): r.n for r in spark.table(name).collect()}
    # hour 01 was finalized with exactly 1 event; the late duplicate of
    # hour 01 must not have been added.
    assert got.get("2024-01-01T01:00:00") == 1, got


def test_stream_tumbling_equals_batch(spark, sf_dir):
    """Drained stream result == the batch windowed aggregate, computed
    independently Spark-side (not just the DuckDB oracle)."""
    from pymapreduce_spark.io import load_table

    streamed = QUERIES["stream_tumbling"](spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_stream_watermark_emits_finalized_prefix(spark, sf_dir):
    """Append-mode watermarked windows: emitted set must be a prefix of
    the batch windows (nothing fabricated), and re-running must be
    deterministic."""
    from pymapreduce_spark.io import load_table

    a = {
        (r.window_start, r.n_events)
        for r in QUERIES["stream_watermark"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    batch = {
        (r.ws, r.n)
        for r in ev.groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("ws"), F.col("n"))
        .collect()
    }
    assert a <= batch
    assert len(a) > 0
    b = {
        (r.window_start, r.n_events)
        for r in QUERIES["stream_watermark"](spark, sf_dir).collect()
    }
    assert a == b


def test_checkpoint_restart_exactly_once(spark, sf_dir, tmp_path):
    """Exactly-once across a restart: drain half the replay files into a
    parquet sink with a checkpoint, add the rest, resume with the SAME
    checkpoint — the second run must process only the new files and the
    final sink must equal the batch result with zero duplicates. This is
    the recovery contract a production file→sink topology relies on."""
    import shutil

    from pymapreduce_spark.io import load_table
    from pymapreduce_spark.streaming.core import replay_dir

    replay = replay_dir(spark, sf_dir)
    days = sorted(d for d in os.listdir(replay) if d.startswith("day="))
    src = tmp_path / "src"
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    src.mkdir()

    def arm(day_subset):
        for d in day_subset:
            if not (src / d).exists():
                shutil.copytree(os.path.join(replay, d), src / d)

    def run_once():
        schema = spark.read.parquet(replay).schema
        s = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 4)
            .parquet(str(src))
            .drop("day")
        )
        if dict(s.dtypes).get("ts") == "timestamp_ntz":
            s = s.withColumn("ts", F.col("ts").cast("timestamp"))
        s = s.where(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "value"
        )
        q = (
            s.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sum(p["numInputRows"] for p in q.recentProgress)

    half = len(days) // 2
    arm(days[:half])
    rows_first = run_once()
    arm(days)  # add the remaining days
    rows_second = run_once()

    got = spark.read.parquet(sink)
    ev = load_table(spark, sf_dir, "events")
    n_batch = ev.where(F.col("event_type") == "purchase").count()
    assert got.count() == n_batch  # nothing lost, nothing duplicated
    assert got.select("event_id").distinct().count() == n_batch
    # the restart resumed from the checkpoint: source-side numInputRows
    # across both runs sums to EXACTLY the event total — a restart that
    # reprocessed the first half would exceed it
    n_events = ev.count()
    assert rows_first + rows_second == n_events
    assert 0 < rows_first < n_events and 0 < rows_second < n_events


def test_stream_python_ds_replay_between_offsets(spark, tmp_path):
    """Round-9 verdict task 3: the Python Data Source stream's
    ``readBetweenOffsets`` — the exactly-once REPLAY contract the
    docstring advertises — driven for real, not just the happy
    single-``read()`` availableNow path.

    Engineering the replay: a SimpleDataSourceStreamReader's offsets
    are written to the checkpoint WAL *before* the batch runs, and the
    prefetch cache lives in the query's reader instance. So a batch
    that FAILS after offset-logging (foreachBatch raises) leaves a
    planned-but-uncommitted range in the WAL; the restarted query's
    fresh reader has an empty cache and MUST reproduce exactly that
    range via readBetweenOffsets(start, end). Bounded 512-row slices
    per read() make the drain multi-restart (availableNow snapshots one
    prefetch per run), so the committed-offset resume is also exercised
    on every subsequent run."""
    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    n_total, slice_rows = 2048, 512
    marker = str(tmp_path / "replay_invoked")
    ckpt = str(tmp_path / "ckpt")

    class _Reader(SimpleDataSourceStreamReader):
        def initialOffset(self):
            return {"k": 0}

        def read(self, start):
            k0 = int(start["k"])
            k1 = min(k0 + slice_rows, n_total)
            rows = [(k, k % 10) for k in range(k0, k1)]
            return iter(rows), {"k": k1}

        def readBetweenOffsets(self, start, end):
            with open(marker, "a") as fh:
                fh.write(f"{start['k']}..{end['k']}\n")
            return iter(
                (k, k % 10) for k in range(int(start["k"]), int(end["k"]))
            )

    class _Source(DataSource):
        @classmethod
        def name(cls):
            return "pymr_replay_probe"

        def schema(self):
            return "k bigint, bucket bigint"

        def simpleStreamReader(self, schema):
            return _Reader()

    spark.dataSource.register(_Source)
    seen: list[int] = []

    def run(on_batch):
        q = (
            spark.readStream.format("pymr_replay_probe")
            .load()
            .writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            q.stop()

    def fail_batch(df, epoch_id):
        raise RuntimeError("injected failure after offset WAL write")

    def collect_batch(df, epoch_id):
        seen.extend(r["k"] for r in df.collect())

    # Run 1: offsets [0, 512) hit the WAL, the batch fails uncommitted.
    with pytest.raises(Exception):
        run(fail_batch)
    # Restarts drain the rest; cap generously (one slice per run).
    for _ in range(2 * (n_total // slice_rows) + 2):
        run(collect_batch)
        if len(seen) >= n_total:
            break

    # Exactly-once across the failure boundary: every k exactly once.
    assert sorted(seen) == list(range(n_total))
    # And the replay leg actually ran — the restarted reader served the
    # WAL-planned-but-uncommitted range through readBetweenOffsets.
    assert os.path.exists(marker), "readBetweenOffsets never invoked"
    first_replay = open(marker).read().splitlines()[0]
    assert first_replay == f"0..{slice_rows}"


def test_registered_stream_python_ds_replay(spark, tmp_path):
    """r10 verdict #4: the REGISTERED ``pymr_synthetic_log_stream``
    reader (not a purpose-built probe) driven through its
    ``readBetweenOffsets`` replay leg. Bounded 512-row slices make the
    availableNow drain multi-restart; an injected foreachBatch failure
    after the first offset WAL write leaves a planned-but-uncommitted
    range that the restarted query's fresh reader MUST reproduce via
    the registered class's replay method — the marker file records the
    ranges it actually served."""
    from pymapreduce_spark.sources.scans import (
        register_synthetic_log_stream,
    )

    n_total, slice_rows = 2048, 512
    marker = str(tmp_path / "replay_invoked")
    ckpt = str(tmp_path / "ckpt")
    register_synthetic_log_stream(spark)
    seen: list[int] = []

    def run(on_batch):
        q = (
            spark.readStream.format("pymr_synthetic_log_stream")
            .option("n", str(n_total))
            .option("slice", str(slice_rows))
            .option("replay_marker", marker)
            .load()
            .writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            q.stop()

    def fail_batch(df, epoch_id):
        raise RuntimeError("injected failure after offset WAL write")

    def collect_batch(df, epoch_id):
        seen.extend(r["k"] for r in df.collect())

    # Run 1: offsets [0, 512) hit the WAL, the batch fails uncommitted.
    with pytest.raises(Exception):
        run(fail_batch)
    # Restarts drain the rest; cap generously (one slice per run).
    for _ in range(2 * (n_total // slice_rows) + 2):
        run(collect_batch)
        if len(seen) >= n_total:
            break

    # Exactly-once across the failure boundary, lossless restart.
    assert sorted(seen) == list(range(n_total))
    # The registered reader's replay leg fired on the WAL-planned range.
    assert os.path.exists(marker), (
        "the registered reader's readBetweenOffsets never invoked"
    )
    first_replay = open(marker).read().splitlines()[0]
    assert first_replay == f"0..{slice_rows}"
    # Value integrity of the replayed payload: the full drain's v-sum
    # equals the deterministic sequence's.
    assert sum((k * 2654435761) % 1000003 for k in seen) == sum(
        (k * 2654435761) % 1000003 for k in range(n_total)
    )


def test_tws_processor_matches_legacy_track():
    """stream_stateful_timers ships two implementation paths — the
    transformWithStateInPandas processor (requires google.protobuf,
    absent in this container) and the applyInPandasWithState
    EventTimeTimeout form (the executable, driver-attested path). This
    pins their session logic EQUIVALENT with fake handles/state, so
    the protobuf-gated path is covered by construction: same gap
    splits, same emitted frames, same timer arithmetic, same
    strictly-greater watermark boundary."""
    import pandas as pd

    from pymapreduce_spark.streaming.core import (
        _SESSION_GAP_US,
        _SessionTimeoutProcessor,
        _session_due_ms,
        _session_timeout_track,
    )

    def batch(ts_us, ids):
        return pd.DataFrame(
            {
                "ts": pd.to_datetime(pd.Series(ts_us), unit="us"),
                "event_id": ids,
            }
        )

    base = 1_600_000_000_000_000  # some µs epoch
    gap = _SESSION_GAP_US
    # batch 1: two events 10 min apart; batch 2: a gap split then one
    # more event in the new session (non-ms-aligned µs on purpose)
    b1 = batch([base + 1, base + 600_000_000 + 3], [7, 9])
    b2 = batch(
        [base + 600_000_000 + 3 + gap + 5, base + 600_000_000 + 3 + gap + 10],
        [11, 12],
    )

    # --- TWS processor with fakes ---
    class FakeValueState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

        def clear(self):
            self.v = None

    class FakeHandle:
        def __init__(self):
            self.state = FakeValueState()
            self.timers = []

        def getValueState(self, name, schema):
            return self.state

        def listTimers(self):
            return iter(list(self.timers))

        def deleteTimer(self, t):
            self.timers.remove(t)

        def registerTimer(self, t):
            self.timers.append(t)

    class FakeTimerValues:
        def __init__(self, wm_ms):
            self._wm = wm_ms

        def getCurrentWatermarkInMs(self):
            return self._wm

    class FakeExpiredTimerInfo:
        def __init__(self, t_ms):
            self._t = t_ms

        def getExpiryTimeInMs(self):
            return self._t

    proc = _SessionTimeoutProcessor()
    handle = FakeHandle()
    proc.init(handle)
    tws_out = []
    tws_out += list(proc.handleInputRows((42,), iter([b1]), None))
    tws_out += list(proc.handleInputRows((42,), iter([b2]), None))
    assert len(handle.timers) == 1  # exactly one armed timer
    due = handle.timers[0]
    # a timer at/below the due boundary must NOT emit (re-arms instead)
    assert not list(
        proc.handleExpiredTimer(
            (42,), FakeTimerValues(due), FakeExpiredTimerInfo(due)
        )
    )
    tws_out += list(
        proc.handleExpiredTimer(
            (42,), FakeTimerValues(due + 1), FakeExpiredTimerInfo(due)
        )
    )
    assert handle.state.v is None  # state evicted on firing

    # --- legacy EventTimeTimeout form with a fake GroupState ---
    class FakeGroupState:
        def __init__(self):
            self.v = None
            self.hasTimedOut = False
            self.timeout = None
            self.wm = 0

        @property
        def exists(self):
            return self.v is not None

        @property
        def get(self):
            return self.v

        def update(self, v):
            self.v = v

        def remove(self):
            self.v = None

        def setTimeoutTimestamp(self, t):
            self.timeout = t

        def getCurrentWatermarkMs(self):
            return self.wm

    st = FakeGroupState()
    legacy_out = []
    legacy_out += list(_session_timeout_track((42,), iter([b1]), st))
    legacy_out += list(_session_timeout_track((42,), iter([b2]), st))
    assert st.timeout == due  # same timer arithmetic
    st.hasTimedOut = True
    legacy_out += list(_session_timeout_track((42,), iter([]), st))
    assert st.v is None

    # identical emissions: the batch-2 gap split + the timed-out tail
    assert len(tws_out) == len(legacy_out) == 2
    for a, b in zip(tws_out, legacy_out):
        pd.testing.assert_frame_equal(a, b)
    # and the due-time math is the pinned ceil-to-ms
    last_us = int(b2["ts"].iloc[-1].value // 1000)
    assert due == _session_due_ms(last_us)
    assert due == -((-(last_us + _SESSION_GAP_US)) // 1000)


def test_legacy_clamp_branch_divergence():
    """Round-11 ADVICE #2: exercise the legacy path's defensive clamp
    (``setTimeoutTimestamp(max(due, wm+1))``) — the branch where the
    batch's session due-time is already at/below the current watermark
    (a born-late event). The TWS twin registers the raw due time and
    fires as soon as ``wm > due``; the legacy surface can only arm at
    ``wm+1``, so it under-emits until the watermark advances PAST
    ``wm+1``. This pins the divergence as designed-and-documented
    (streaming/core.py clamp comment) rather than silent."""
    import pandas as pd

    from pymapreduce_spark.streaming.core import (
        _SESSION_GAP_US,
        _session_due_ms,
        _session_timeout_track,
    )

    class FakeGroupState:
        def __init__(self, wm_ms):
            self.v = None
            self.hasTimedOut = False
            self.timeout = None
            self.wm = wm_ms

        @property
        def exists(self):
            return self.v is not None

        @property
        def get(self):
            return self.v

        def update(self, v):
            self.v = v

        def remove(self):
            self.v = None

        def setTimeoutTimestamp(self, t):
            assert t > self.wm, "Spark rejects timeouts at/below the wm"
            self.timeout = t

        def getCurrentWatermarkMs(self):
            return self.wm

    base = 1_600_000_000_000_000
    b = pd.DataFrame(
        {
            "ts": pd.to_datetime(pd.Series([base + 1]), unit="us"),
            "event_id": [1],
        }
    )
    due = _session_due_ms(base + 1)
    # watermark already an hour past the session's due time at update
    wm = due + 3_600_000
    st = FakeGroupState(wm)
    out = list(_session_timeout_track((42,), iter([b]), st))
    assert out == []  # no gap split in a single-event batch
    # CLAMPED: armed at wm+1, NOT at the (already-passed) due time —
    # this is exactly the boundary shift the docstring documents
    assert st.timeout == wm + 1
    assert st.timeout > due
    # oracle / TWS boundary would have emitted at any wm' > due; the
    # legacy path stays silent until Spark fires the wm+1 timeout
    # (i.e. under-emits if the watermark never advances past wm+1)


def test_session_fold_out_of_order_in_gap():
    """Round-11 ADVICE #1: an in-gap out-of-order event arriving in a
    LATER micro-batch (mu < last) must not move the session end
    backward — ``last`` is the max event time, matching the oracle's
    max(mu), so subsequent gap splits stay aligned."""
    import numpy as np

    from pymapreduce_spark.streaming.core import (
        _SESSION_GAP_US,
        _session_fold_events,
    )

    # the fold's r14 input contract: sorted int64 µs (the
    # _concat_sorted output)
    def ts(us_list):
        return np.array(us_list, dtype="int64")

    base = 1_600_000_000_000_000
    closed: list = []
    # batch 1 ends the session at base+600s
    start, last, n = _session_fold_events(
        ts([base, base + 600_000_000]), None, None, 0, closed
    )
    assert (start, last, n) == (base, base + 600_000_000, 2)
    # batch 2: one in-gap event 10 min EARLIER than the session end
    start, last, n = _session_fold_events(
        ts([base + 1_000]), start, last, n, closed
    )
    assert last == base + 600_000_000, "session end moved backward"
    assert n == 3 and closed == []
    # a next event GAP+1µs after the true max must split — with the
    # backward-moving bug it would have been absorbed into the session
    split_at = base + 600_000_000 + _SESSION_GAP_US + 1
    start, last, n = _session_fold_events(
        ts([split_at]), start, last, n, closed
    )
    assert closed == [(base, base + 600_000_000, 3)]
    assert (start, last, n) == (split_at, split_at, 1)


def test_concat_sorted_and_emit_pdf_vectorized_values():
    """r14 per-key vectorization (guide §4.2): _concat_sorted returns
    the globally-sorted int64 µs array across chunks of EITHER pandas
    timestamp unit (ns is Spark's Arrow default, us is pandas-2
    native), flooring exactly like Timestamp.value // 1000 did; and
    _session_emit_pdf's datetime64[us] columns carry the same values
    the per-value pd.Timestamp(x, unit='us') construction produced."""
    import numpy as np
    import pandas as pd

    from pymapreduce_spark.streaming.core import (
        _SESSION_GAP_US,
        _concat_sorted,
        _session_emit_pdf,
    )

    base = 1_600_000_000_000_000 + 123  # non-ms-aligned µs on purpose
    # chunk A in ns unit, deliberately out of time order vs chunk B
    a = pd.DataFrame(
        {"ts": pd.to_datetime(pd.Series([base + 50, base + 10]), unit="us")}
    )
    assert a["ts"].values.dtype == np.dtype("datetime64[ns]")
    b = pd.DataFrame(
        {"ts": pd.Series(np.array([base + 20], dtype="datetime64[us]"))}
    )
    empty = a.iloc[:0]
    mus = _concat_sorted(iter([a, empty, b]))
    assert mus.dtype == np.dtype("int64")
    assert mus.tolist() == [base + 10, base + 20, base + 50]
    assert _concat_sorted(iter([empty])) is None

    out = _session_emit_pdf(42, [(base, base + 7, 3), (base + 9, base + 11, 1)])
    assert out["user_id"].tolist() == [42, 42]
    assert out["n_events"].tolist() == [3, 1]
    assert out["session_start"].tolist() == [
        pd.Timestamp(base, unit="us"),
        pd.Timestamp(base + 9, unit="us"),
    ]
    assert out["session_end"].tolist() == [
        pd.Timestamp(base + 7 + _SESSION_GAP_US, unit="us"),
        pd.Timestamp(base + 11 + _SESSION_GAP_US, unit="us"),
    ]
    # NULL grouping key keeps the nullable object column — for BOTH
    # null spellings (None, and the float NaN the stateful key tuple
    # delivers; an int64 cast would turn NaN into INT64_MIN)
    out_null = _session_emit_pdf(None, [(base, base + 7, 3)])
    assert out_null["user_id"].tolist() == [None]
    out_nan = _session_emit_pdf(float("nan"), [(base, base + 7, 3)])
    assert out_nan["user_id"].tolist() == [None]


def test_fold_correct_when_key_spans_arrow_chunks(spark, duck, sf_dir):
    """r13 find: the per-key iterator delivers a key's rows in multiple
    Arrow chunks once a partition's data crosses the Arrow batch limit,
    and chunk order does not follow event time — a chunk-by-chunk fold
    mis-splits sessions (one user's trailing n_events read 13 instead
    of 1 at sf0.1 under a 4-partition drain). Force the regime hard at
    sf0.01 — ONE state partition, 200-row Arrow chunks — and require
    the timers op to still match its DuckDB oracle exactly."""
    from pymapreduce_spark.registry import ORACLES, QUERIES

    arrow_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old_arrow = spark.conf.get(arrow_key)
    os.environ["SPARK_GRAFT_STREAM_PARTITIONS"] = "1"
    spark.conf.set(arrow_key, "200")
    try:
        sdf = QUERIES["stream_stateful_timers"](spark, sf_dir)
        got = sorted(
            tuple(str(x) for x in r) for r in sdf.collect()
        )
    finally:
        del os.environ["SPARK_GRAFT_STREAM_PARTITIONS"]
        spark.conf.set(arrow_key, old_arrow)
    want = sorted(
        tuple(str(x) for x in r)
        for r in duck.execute(ORACLES["stream_stateful_timers"]).fetchall()
    )
    assert got == want

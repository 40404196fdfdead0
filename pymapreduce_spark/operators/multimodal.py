"""Multimodal binary-column pipeline steps (driver mandate, BASELINE.json:6):
decode → resize → frame-sample → feature-extract over opaque ``binary``
payloads, each as an Arrow-batched ``mapInPandas`` operator.

The decoder bodies (image/audio/video libs) are STUBBED with deterministic
fakes — the libs aren't in this container — but the Spark-side plumbing is
real and what actually matters at 100 TB: binary columns flow through Arrow
batches, UDFs are iterator-of-batches (constant memory per task, no
per-row Python), output schemas are typed, and 1→N frame expansion happens
inside the batch so Catalyst sees an ordinary ``mapInPandas`` node whose
output partitioning inherits the scan's. Swapping a fake for
PIL/ffmpeg/soundfile changes only the marked function body.

100 TB doctrine: payload-bearing tables are the heaviest by bytes, so every
op here is single-pass, shuffle-free, and pushes column pruning to the scan
(only ``doc_id`` + payload are read). Frame expansion multiplies rows ≤4×
inside the task — no explode-shuffle. Feature extraction keeps arithmetic
in int64 (exact) so the DuckDB oracle hash-matches bit-for-bit despite the
Python↔SQL engine boundary (SURVEY.md §5.4 determinism rules).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymapreduce_spark.io import load_table
from pymapreduce_spark.registry import query

FRAME_BYTES = 64  # fake "frame" size within a video payload
MAX_FRAMES = 4  # frames sampled per payload
RESIZE_W, RESIZE_H = 224, 224  # resize-stub target (the usual vision size)


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text as an opaque binary payload column.

    The deterministic fakes below are oracle-checked in SQL at the BYTE
    level against the same source: ``encode(text)`` is the UTF-8 blob
    Spark's binary cast produces, ``octet_length`` mirrors
    ``len(payload)``, and individual bytes are extracted from
    ``hex(encode(text))`` two hex digits at a time — so the check holds
    on non-ASCII corpora (where char offsets diverge from byte offsets;
    the unicode-fixture audit caught the oracles using per-character
    ``ascii``/``substring``) and on fixtures whose ``n_chars`` metadata
    column disagrees with the text (the skew audit caught the oracles
    trusting that second source of truth). A real pipeline would read
    true image/audio bytes here.
    """
    # NULL text → no payload row: the frame/audio stubs emit zero
    # output for a missing asset (their oracles filter identically);
    # the decode op keeps NULL rows and does its own select. The
    # frame sampler additionally drops zero-byte payloads at its own
    # select (audio keeps them: a 0-sample clip is a NULL-stats row).
    return (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", F.col("text").cast("binary").alias("payload"))
    )


@query(
    "llm_frame_sample",
    oracle=f"""
    WITH f AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n_bytes,
               greatest(1, octet_length(encode(text)) // {FRAME_BYTES})
                   AS n_frames
        FROM documents
        -- a NULL or zero-byte video has no frames (greatest(1, 0)
        -- would otherwise force one frame whose first_byte cast
        -- ('0x')::INT errors on one engine and indexes b'' on the
        -- other)
        WHERE text IS NOT NULL AND octet_length(encode(text)) > 0
    ), s AS (
        SELECT *, (n_frames + {MAX_FRAMES - 1}) // {MAX_FRAMES} AS stride
        FROM f
    ), ex AS (
        SELECT doc_id, hx, n_bytes, stride,
               unnest(range(0, (n_frames + stride - 1) // stride)) AS samp
        FROM s
    )
    SELECT doc_id,
           samp * stride AS frame_idx,
           samp * stride * {FRAME_BYTES} AS byte_offset,
           least({FRAME_BYTES}, n_bytes - samp * stride * {FRAME_BYTES})
               AS frame_len,
           ('0x' || substring(hx,
                2 * samp * stride * {FRAME_BYTES} + 1, 2))::INT
               AS first_byte,
           {RESIZE_W} AS out_w, {RESIZE_H} AS out_h
    FROM ex
    """,
)
def llm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling + resize stub: payload → ≤4 evenly-strided
    frames, each "resized" to 224×224.

    1→N expansion happens inside the Arrow batch (pandas repeat), not via
    an explode after a Python round-trip — one mapInPandas node, no
    shuffle, output rows ≤4× input rows.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len).to_numpy(dtype=np.int64)
            n_frames = np.maximum(1, n_bytes // FRAME_BYTES)
            stride = -(-n_frames // MAX_FRAMES)  # ceil
            n_samp = -(-n_frames // stride)
            doc_idx = np.repeat(np.arange(len(pdf)), n_samp)
            # frame index within each doc: 0, stride, 2*stride, ...
            local = np.concatenate([np.arange(k) for k in n_samp])
            frame_idx = local * stride[doc_idx]
            offset = frame_idx * FRAME_BYTES
            payloads = pdf["payload"].to_numpy()
            # STUB: a real decoder would extract + resize pixels here.
            first_byte = np.fromiter(
                (payloads[d][o] for d, o in zip(doc_idx, offset)),
                dtype=np.int64,
                count=len(doc_idx),
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy()[doc_idx],
                    "frame_idx": frame_idx,
                    "byte_offset": offset,
                    "frame_len": np.minimum(
                        FRAME_BYTES, n_bytes[doc_idx] - offset
                    ),
                    "first_byte": first_byte.astype(np.int32),
                    "out_w": np.int32(RESIZE_W),
                    "out_h": np.int32(RESIZE_H),
                }
            )

    schema = (
        "doc_id bigint, frame_idx bigint, byte_offset bigint, "
        "frame_len bigint, first_byte int, out_w int, out_h int"
    )
    return (
        _payloads(spark, sf_dir)
        .where(F.length("payload") > 0)
        .mapInPandas(sample, schema)
    )


@query(
    "llm_audio_features",
    oracle="""
    WITH h AS (
        SELECT doc_id, hex(encode(text)) AS hx FROM documents
        WHERE text IS NOT NULL  -- a NULL clip has no samples
    ), b AS (
        SELECT doc_id,
               list_transform(range(1, len(hx) // 2 + 1),
                   i -> ('0x' || substring(hx, 2 * i - 1, 2))::BIGINT)
                   AS amp
        FROM h
    ), sums AS (
        SELECT doc_id,
               len(amp) AS n_samples,
               list_aggregate(amp, 'sum') AS s1,
               list_aggregate(list_transform(amp, x -> x * x), 'sum') AS s2,
               list_aggregate(amp, 'max') AS peak
        FROM b
    )
    SELECT doc_id, n_samples,
           s1 / n_samples::DOUBLE AS mean_amp,
           s2 / n_samples::DOUBLE
               - (s1 / n_samples::DOUBLE) * (s1 / n_samples::DOUBLE)
               AS var_amp,
           peak AS peak_amp,
           (n_samples * 1000000) // 16000 AS duration_us
    FROM sums
    """,
)
def llm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature-extraction stub: payload bytes as 8-bit PCM samples →
    mean/variance amplitude, peak, duration (µs) at a fake 16 kHz rate.

    The numpy math is real (vectorized over the Arrow batch); only the
    "bytes are PCM" premise is the stub. Sums are exact int64, and mean/
    variance are emitted UNROUNDED: both engines perform the identical
    IEEE divisions on identical integers, so the doubles are already
    bit-equal — while a round() would half-tie whenever n is a power of
    two times a divisor of s1 (35991/384 = 93.7265625 ties at round(6);
    Python rounds half-even, DuckDB half-away — caught by the sf0.1
    oracle sweep). SURVEY.md §5.4 discipline across an engine boundary.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                a = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n = len(a)
                if n == 0:
                    # zero-byte clip: no samples → NULL stats (the
                    # oracle's empty-list aggregates are NULL and the
                    # division is NULL); a.max() on an empty array
                    # would raise, mean would divide by zero
                    out.append((0, None, None, None, 0))
                    continue
                s1 = int(a.sum())
                s2 = int((a * a).sum())
                mean = s1 / n
                # duration in exact integer µs — a float seconds value
                # hits round-half ties that differ between engines
                out.append((n, mean, s2 / n - mean * mean, int(a.max()), n * 1_000_000 // 16000))
            cols = list(zip(*out))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_samples": cols[0],
                    "mean_amp": cols[1],
                    "var_amp": cols[2],
                    "peak_amp": cols[3],
                    "duration_us": cols[4],
                }
            )

    schema = (
        "doc_id bigint, n_samples bigint, mean_amp double, "
        "var_amp double, peak_amp bigint, duration_us bigint"
    )
    return _payloads(spark, sf_dir).mapInPandas(extract, schema)

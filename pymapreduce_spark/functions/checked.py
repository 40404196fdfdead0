"""Determinism helpers for hash-checked numeric aggregates (SURVEY §5.4.2).

The driver's value-hash is order-insensitive but *exact* — IEEE double
summation order differs between Spark and DuckDB (and between Spark runs),
and decimal rounding of a binary double is tie-sensitive when the true
value has more decimals than the rounding keeps.

Policy, mirrored in every oracle:

- Fixture money/quantity columns are exact 2-decimal values stored as
  doubles (verified: ``x == round(x, 2)`` for all rows). Casting to
  DECIMAL recovers the exact value, so products and sums computed in
  DECIMAL are *bit-identical* across engines; the final cast back to
  double is a unique nearest-double conversion.
- Quantities whose true value is NOT exact decimal (avg, stddev, corr…)
  are rounded to a precision several orders above both engines' numeric
  noise (≤1e-9 observed): round(4) for magnitudes ≥1, round(6) for small
  ratios.

``dec2`` uses DECIMAL(12,2): enough for every fixture magnitude
(≤ 5e5 per value) while keeping triple products within DECIMAL(38,_) so
neither engine hits precision-overflow rounding.

``cents`` is the *hot-path* variant: the same exactness via integer
arithmetic (value × 100 as long). Long sums run ~4.5× faster than
decimal sums in whole-stage codegen (measured: q1 at sf0.1 — decimal
1.47 s, double 0.43 s, cents 0.32 s) and the final ``Σcents / 100.0``
division is a unique int→double conversion, identical in both engines.
Products compose: Σ price_c·(100−disc_c) / 10⁴ is the exact
Σ price·(1−disc).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC2 = "decimal(12,2)"


def dec2(col: Column | str) -> Column:
    """Exact 2-decimal view of a money/quantity column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC2)


def dsum(col: Column | str) -> Column:
    """Exact decimal sum, returned as double (deterministic bits)."""
    return F.sum(dec2(col)).cast("double")


def finite(col: Column | str) -> Column:
    """``col`` with NaN/±Infinity nullified (finite passes through).

    Spark's ``floor()``/``cast`` SATURATE non-finite doubles (floor(NaN)
    → 0, floor(∞) → Long.MaxValue) where DuckDB's ``floor`` propagates
    NaN and ``TRY_CAST`` nulls it — so any integer bucketing of a raw
    double must nullify non-finite first or the engines silently place
    damaged rows in different buckets (round-7 nan_inf axis). Mirrors
    the oracle-side ``CASE WHEN isfinite(x) THEN x END``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(~F.isnan(c) & (F.abs(c) != float("inf")), c)


def round_sane(col: Column | str, scale: int = 6) -> Column:
    """round(col, scale) for |col| < 1e9, identity above (NaN/±Inf fall
    through untouched).

    DuckDB's round() computes x·10^scale and divides back, which
    perturbs last ulps once the product exceeds 2^53 (observed: a
    1.2e29 dot product shifted 2 ulps), while Spark rounds exactly via
    BigDecimal of the shortest repr. Above 1e9 a double carries fewer
    than 6 decimal digits anyway, so skipping the round on BOTH sides
    loses nothing; below 1e9 both engines round exactly. Oracles
    mirror with ``CASE WHEN abs(x) < 1e9 THEN round(x, ...) ELSE x
    END`` (round-7 zero_embed axis)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.abs(c) < 1e9, F.round(c, scale)).otherwise(c)


def cents(col: Column | str) -> Column:
    """Exact integer-cents view of a 2-decimal money column.
    round(x·100) recovers the true integer for positives AND negatives
    (a bare +0.5-floor trick breaks on negatives).

    ``try_cast``, not ``cast``: a NaN/±Infinity measurement (upstream
    division damage — routine in 100 TB telemetry) must become NULL
    ("no usable magnitude"), not crash the whole job with ANSI
    CAST_OVERFLOW. DuckDB's ``TRY_CAST(... AS BIGINT)`` returns NULL
    for exactly the same inputs (NaN, ±Inf, out-of-int64 finite), so
    the oracles mirror this bit-for-bit; on in-envelope 2-decimal
    values try_cast ≡ cast (round-7 nan_inf adversarial axis)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100, 0).try_cast("long")


def epoch_micros(col: Column | str) -> Column:
    """Integer-microsecond view of the engine's canonical NAIVE
    timestamp type (TimestampNTZType — round-8 clock/timezone
    doctrine, io._fix_events).

    ``unix_micros`` only accepts the zoned TimestampType, so the NTZ
    wall-clock is cast through it first. The cast interprets the
    wall-clock in the SESSION timezone, which every query entry point
    pins to UTC (session.ensure_runtime_configs) — offset zero, no DST,
    so the resulting integer is exactly the naive value's micros since
    1970-01-01 00:00:00, matching DuckDB's ``epoch_us(ts)`` on the same
    naive timestamp. The zoned value exists only INSIDE this
    expression; it is never a query output, so driver-side collection
    (which converts zoned values through the host OS timezone) never
    sees it."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def trunc_ntz(unit: str, col: Column | str) -> Column:
    """``date_trunc`` that stays in the engine's canonical NAIVE
    timestamp type. Spark's date_trunc coerces TimestampNTZType input
    to the zoned TimestampType (measured on 4.1; window() by contrast
    preserves NTZ), and a zoned OUTPUT column is the round-8 clock
    hazard: driver-side collect() converts zoned values through the
    host OS timezone, silently shifting every timestamp by the host's
    UTC offset on a non-UTC machine. The session tz is pinned UTC at
    every entry point, so the zoned intermediate is wall-clock-exact
    and the cast back to NTZ loses nothing."""
    return F.date_trunc(unit, col).cast("timestamp_ntz")

"""Timestamp normalization across parquet TIMESTAMP(NANOS) read modes.

The test tables store event time as parquet TIMESTAMP(NANOS,false)
(TESTDATA.md). Depending on the Spark version and session confs that
column surfaces three different ways:

- ``LongType`` nanos-since-epoch (``spark.sql.legacy.parquet.nanosAsLong``);
- ``TimestampNTZType`` (Spark 4.1+ native nanos read, truncated to micros);
- ``TimestampType`` (if some writer produced micros-with-timezone).

The engine canonicalizes batch reads to **TIMESTAMP_NTZ**: it is
timezone-independent (no session-timezone dependence in arithmetic or
rendering) and renders identically to DuckDB's naive TIMESTAMP, which is
what the correctness oracle compares against. Streaming watermarks are the
one place Spark *requires* TIMESTAMP, so the stream reader converts
NTZ -> instant by interpreting the wall clock as UTC, and windowed outputs
convert back; both directions are session-timezone-free by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _q(name: str) -> str:
    """Backtick-quote a (possibly dotted) column identifier for F.expr.

    Names needing quoting (spaces, hyphens, keywords) parse correctly;
    dots stay qualifier separators, each part quoted individually."""
    return ".".join(
        "`" + part.replace("`", "``") + "`" for part in name.split(".")
    )


def normalize_ts_ntz(df: DataFrame, col: str) -> DataFrame:
    """Return ``df`` with ``col`` as TIMESTAMP_NTZ whatever it was read as."""
    if col not in df.columns:
        return df
    t = df.schema[col].dataType.typeName()
    if t == "long":  # nanos since epoch
        return df.withColumn(
            col,
            F.expr(f"timestampadd(MICROSECOND, {_q(col)} div 1000, {EPOCH_NTZ})"),
        )
    if t == "timestamp":  # an instant; take its UTC wall clock
        return df.withColumn(
            col,
            F.expr(f"timestampadd(MICROSECOND, unix_micros({_q(col)}), {EPOCH_NTZ})"),
        )
    return df  # timestamp_ntz (or anything else): leave untouched


def epoch_us(df: DataFrame, col: str) -> Column:
    """Microseconds since epoch for a timestamp column of any flavor.

    For NTZ the wall clock is interpreted as UTC (matches DuckDB's
    ``epoch_us`` on its naive timestamps); for TIMESTAMP it is the real
    instant; both are deterministic regardless of session timezone.
    """
    t = df.schema[col].dataType.typeName()
    if t == "timestamp":
        return F.unix_micros(F.col(col))
    if t == "long":  # nanos since epoch — integer division: float /1000
        # loses microsecond precision past 2^53 nanos (double mantissa)
        return F.expr(f"{_q(col)} div 1000")
    return F.expr(f"timestampdiff(MICROSECOND, {EPOCH_NTZ}, {_q(col)})")


def ntz_to_instant(col: str) -> Column:
    """TIMESTAMP_NTZ -> TIMESTAMP, reading the wall clock as UTC.

    Session-timezone-free (unlike ``cast``, which localizes)."""
    return F.expr(
        f"timestamp_micros(timestampdiff(MICROSECOND, {EPOCH_NTZ}, {_q(col)}))"
    )


def instant_to_ntz(col: str) -> Column:
    """TIMESTAMP -> TIMESTAMP_NTZ carrying the UTC wall clock.

    Inverse of :func:`ntz_to_instant`; session-timezone-free."""
    return F.expr(f"timestampadd(MICROSECOND, unix_micros({_q(col)}), {EPOCH_NTZ})")

"""Exact integer arithmetic shared by the trainable operators.

Rounded division in pure integers (no float touches the value) is the
cross-engine determinism primitive for training trajectories: Python,
Spark SQL, and DuckDB all floor-divide non-negative ints identically, so
``round(s / n)`` half-away-from-zero is replayable bit-for-bit — unlike
``round(double)`` whose input already depends on libm/codegen details.
"""

from __future__ import annotations


def rounded_div(s: int, n: int) -> int:
    """round(s / n) half away from zero, exact integer arithmetic (n > 0).

    For even n the half point n//2 is exact (away-from-zero); for odd n
    an exact half cannot occur and (|s| + n//2) // n is nearest-rounding.
    """
    half = n // 2
    return (s + half) // n if s >= 0 else -((-s + half) // n)


def rounded_div_sql(s: str, n: str) -> str:
    """DuckDB fragment mirroring :func:`rounded_div` (BIGINT operands)."""
    return (
        f"CASE WHEN {s} >= 0 THEN ({s} + {n} // 2) // {n}"
        f" ELSE -((-({s}) + {n} // 2) // {n}) END"
    )


def rounded_div_col(s, n):
    """Spark Column version of :func:`rounded_div` (n > 0).

    Both operands must be integral Columns with |values| < 2^53: the
    division goes through double (Spark's ``/``), which is exact for
    integers below the mantissa limit, and ``floor`` lands back on the
    identical integer the pure-int form produces.
    """
    from pyspark.sql import functions as F

    half = F.floor(n / 2).cast("long")
    pos = F.floor((s + half) / n).cast("long")
    neg = (-F.floor((-s + half) / n)).cast("long")
    return F.when(s >= 0, pos).otherwise(neg)

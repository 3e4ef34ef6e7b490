"""Vector math over array<float> embedding columns — native higher-order
functions only (no UDFs), so similarity search stays inside codegen.

All arithmetic is done in double with a *sequential* left fold, which is
bit-reproducible and matches DuckDB's list_dot_product/list_reduce exactly
(verified by the similarity oracle queries).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def to_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double."""
    return F.aggregate(
        F.zip_with(to_double(a), to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def cosine_arrow(a: Column, b: Column) -> Column:
    """Arrow-batched cosine, BIT-IDENTICAL to :func:`cosine`.

    ``np.add.accumulate`` is a strict left-to-right running sum — the
    exact IEEE double addition sequence of the native sequential fold
    (which starts from 0.0, and 0.0 + x0 == x0 exactly) — and the
    float32→float64 casts and multiplies are the same operand set, so
    every output double matches the fold bit for bit (pinned on the real
    embeddings table in tests/test_similarity.py). Use in wide scoring
    projections: the interpreted higher-order fold costs ~µs/element,
    this is one vectorized numpy pass per batch. Null / length-mismatch
    rows return 0.0 (the native expression's null-condition fallthrough
    path; equal-length non-null input is the operators' contract)."""
    @F.pandas_udf(DoubleType())
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        n = len(va)
        out = np.zeros(n, dtype=np.float64)
        valid = np.fromiter(
            (
                x is not None and y is not None and len(x) == len(y) and len(x)
                for x, y in zip(va, vb)
            ),
            bool,
            count=n,
        )
        if valid.any():
            A = np.stack(
                [np.asarray(x, dtype=np.float64) for x, ok in zip(va, valid) if ok]
            )
            B = np.stack(
                [np.asarray(y, dtype=np.float64) for y, ok in zip(vb, valid) if ok]
            )
            dot_ = np.add.accumulate(A * B, axis=1)[:, -1]
            na = np.sqrt(np.add.accumulate(A * A, axis=1)[:, -1])
            nb = np.sqrt(np.add.accumulate(B * B, axis=1)[:, -1])
            ok2 = (na > 0) & (nb > 0)
            s = np.zeros(len(dot_), dtype=np.float64)
            s[ok2] = dot_[ok2] / (na[ok2] * nb[ok2])
            out[valid] = s
        return pd.Series(out)

    return _cos(a, b)

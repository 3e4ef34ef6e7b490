"""Common-direction removal (ABTT) — integer power iteration quality.

The oracle test (test_oracle.py) proves Spark == DuckDB bit-for-bit; these
tests prove the algebra is RIGHT: on data with a planted dominant
direction the integer pipeline must recover numpy's exact top eigenvector
and removing it must shrink per-row energy by roughly that component's
share.
"""

from __future__ import annotations

import numpy as np
import pytest

from llm_data_pipeline_spark.functions.intmath import rounded_div
from llm_data_pipeline_spark.operators.pca import (
    MICRO,
    centered_gram,
    common_direction_removal,
    dimension_sums,
    power_iteration,
)


def _planted(n=240, d=16, seed=7):
    rng = np.random.default_rng(seed)
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    coefs = rng.normal(scale=0.8, size=n)
    noise = rng.normal(scale=0.1, size=(n, d))
    return coefs[:, None] * u[None, :] + noise, u


@pytest.fixture(scope="module")
def planted_df(spark):
    x, u = _planted()
    rows = [(i, [float(v) for v in x[i]], int(i % 3)) for i in range(len(x))]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    return df, x, u


def test_gram_matches_numpy_exact_integers(planted_df):
    df, x, _ = planted_df
    sums, n = dimension_sums(df)
    assert n == len(x)
    mean_mu = [rounded_div(s, n) for s in sums]
    g = centered_gram(df, mean_mu)
    # reference: same quantization convention (round half away from zero on
    # the float32-widened doubles), exact int64 algebra
    xm = np.asarray(x, dtype=np.float32).astype(np.float64) * MICRO
    xq = np.where(xm >= 0, np.floor(xm + 0.5), np.ceil(xm - 0.5)).astype(
        np.int64
    )
    cent = xq - np.asarray(mean_mu, dtype=np.int64)
    assert np.array_equal(g, cent.T @ cent)


def test_power_iteration_recovers_top_eigenvector(planted_df):
    df, x, u = planted_df
    out = {
        (r["kind"], r["key"]): r["val"]
        for r in common_direction_removal(df, iters=12).collect()
    }
    d = x.shape[1]
    v = np.array([out[("dir", p)] for p in range(d)], dtype=np.float64)
    v /= np.linalg.norm(v)
    cos = abs(float(v @ u))
    assert cos > 0.995, cos

    # removing the dominant component must shrink energy substantially:
    # planted coef var 0.64 vs residual noise ~0.15 => ratio ~0.21
    xc = x - x.mean(axis=0)
    total = float((xc**2).sum(axis=1).mean()) * MICRO**2
    resid = np.mean([out[("resid", k)] for k in range(3)])
    assert resid < 0.25 * total

    # gains trajectory exists and is positive once aligned
    gains = [out[("gain", t)] for t in range(12)]
    assert all(g > 0 for g in gains)

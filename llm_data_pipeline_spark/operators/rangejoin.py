"""Banded range join: pairs of rows within a time distance, per key.

The naive plan for ``|a.ts - b.ts| <= band`` is a key-equi join with an
inequality residual — Spark executes it, but at 100 TB the per-key cross
product explodes on hot keys. The banded construction bounds the work:

1. bucket every row to ``floor(ts / band)`` — a qualifying pair's buckets
   differ by at most 1;
2. the probe side emits each row into buckets {b-1, b, b+1} (3x
   duplication of ids+timestamps only), the build side stays in its home
   bucket;
3. equi-join on (key, bucket) and filter the exact band predicate. The
   join bucket always equals the build row's home bucket, so every
   qualifying pair matches exactly once — no dedup pass.

Shuffle is by (key, bucket): time-uniform data spreads evenly even when
raw keys are skewed, and per-task work is bounded by rows-per-band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_within(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    band_micros: int,
    id_col: str,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """All pairs (u, v) with u.id < v.id, equal key, |ts_u - ts_v| <= band.

    ``ts_col`` must be a timestamp; the band is in microseconds. Returns
    (key, u, v, dt_micros = ts_v - ts_u) plus ``u_<col>``/``v_<col>`` for
    each requested value column.
    """
    from llm_data_pipeline_spark.functions.time import epoch_us

    value_cols = value_cols or []
    us = epoch_us(df, ts_col)
    base = df.select(
        F.col(key_col).alias("_k"),
        F.col(id_col).alias("_id"),
        us.alias("_us"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    ).withColumn("_bucket", F.floor(F.col("_us") / band_micros))

    probe = base.withColumn(
        "_jb",
        F.explode(
            F.array(
                F.col("_bucket") - 1, F.col("_bucket"), F.col("_bucket") + 1
            )
        ),
    ).select(
        "_k",
        F.col("_jb").alias("_join_bucket"),
        F.col("_id").alias("u"),
        F.col("_us").alias("_us_u"),
        *[F.col(f"_v_{c}").alias(f"u_{c}") for c in value_cols],
    )
    build = base.select(
        "_k",
        F.col("_bucket").alias("_join_bucket"),
        F.col("_id").alias("v"),
        F.col("_us").alias("_us_v"),
        *[F.col(f"_v_{c}").alias(f"v_{c}") for c in value_cols],
    )
    return (
        probe.join(build, ["_k", "_join_bucket"])
        .where(
            (F.col("u") < F.col("v"))
            & (F.abs(F.col("_us_u") - F.col("_us_v")) <= band_micros)
        )
        .select(
            F.col("_k").alias(key_col),
            "u",
            "v",
            (F.col("_us_v") - F.col("_us_u")).alias("dt_micros"),
            *[f"u_{c}" for c in value_cols],
            *[f"v_{c}" for c in value_cols],
        )
    )

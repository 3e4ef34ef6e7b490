"""Skew and co-location utilities (SURVEY.md §4 scale toolbox).

AQE's skew-join handling covers sort-merge joins automatically; these
helpers cover the cases AQE cannot:

- ``salted_join``: explicit key salting for aggregate-then-join patterns or
  when one hot key dominates a shuffle hash join. The big side gets a
  random salt in [0, n_salts); the small side is exploded n_salts times so
  every (key, salt) bucket can pair. Correct for inner/left joins on
  equality keys.
- ``salted_group_count``: two-phase aggregation for skewed group keys —
  partial counts on (key, salt) then a final roll-up on key. (Spark's
  hash aggregate already does map-side partials; explicit salting matters
  when the *reduce* side of a single hot key exceeds one task, e.g. for
  collect_list-style aggregations.)
- ``write_bucketed`` / ``read_bucketed_join``: persistently bucketed tables
  so repeated large-large joins on the same key are shuffle-free
  (SortMergeJoin with both sides pre-bucketed reads co-located buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys: salt the big side, replicate the small.

    The replicated small side stays small (|small| * n_salts rows) and the
    hot key's rows spread over n_salts reduce tasks instead of one.

    Only inner/left are valid: an unmatched small-side key appears once per
    salt, so right/outer would emit n_salts duplicate null-extended rows.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how in ('inner', 'left'), got {how!r}: "
            "replicating the small side breaks right/outer semantics"
        )
    big_s = big.withColumn(
        "_salt", (F.rand(seed=7) * n_salts).cast("int")
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")


def salted_group_count(
    df: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Two-phase count for skewed keys: (key, salt) partials then roll-up."""
    return (
        df.withColumn("_salt", (F.rand(seed=7) * n_salts).cast("int"))
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").alias("n"))
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 16,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) table; ``path`` makes
    it external (bucketing metadata still lives in the catalog)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def read_bucketed_join(
    spark: SparkSession, table_a: str, table_b: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Spark
    plans a shuffle-free SortMergeJoin (no Exchange on either side)."""
    return spark.table(table_a).join(spark.table(table_b), key)

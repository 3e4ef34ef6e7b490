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

from llm_data_pipeline_spark.functions.hashing import portable_hash60


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


def rendezvous_assign(
    df: DataFrame,
    key_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "hrw-v1",
    out_col: str = "shard",
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment.

    Unlike ``key % n`` (which remaps ~(n-1)/n of all keys when n changes),
    HRW guarantees that growing n -> n+1 moves ONLY the keys won by the
    new shard (expected 1/(n+1) of the corpus) and every move lands ON the
    new shard — the minimal-movement property that makes resharding a
    100-TB corpus store an incremental copy instead of a full rewrite.

    score(key, s) = portable_hash60('{salt}:' || s || ':' || key);
    assignment = argmax_s score (ties, cosmically unlikely at 60 bits,
    break to the LARGEST shard id — pinned so both engines agree).
    Narrow shape: n scores per row via an inline array + array_max; no
    explode, no shuffle — assignment happens inside the scan stage.
    """
    key = F.col(key_col).cast("string")
    scored = F.array(
        *[
            F.struct(
                portable_hash60(
                    F.concat(F.lit(f"{salt}:{s}:"), key)
                ).alias("score"),
                F.lit(s).alias("s"),
            )
            for s in range(n_shards)
        ]
    )
    return df.withColumn(out_col, F.array_max(scored).getField("s"))


def range_shard_report(
    df: DataFrame,
    bkey: "F.Column",
    sample_key: "F.Column",
    n_shards: int = 8,
    sample_k: int = 128,
) -> DataFrame:
    """Balanced RANGE sharding with sample-derived boundaries — the
    deterministic twin of ``repartitionByRange`` (whose internal sampling
    is not replayable): boundaries come from a bottom-k hash sample
    (mergeable top-k, no global sort), every row maps to
    ``#(boundaries <= bkey)`` via a broadcast literal array (narrow map),
    and the report grades the TWO properties range sharding exists for:
    orderedness (max of shard i strictly below min of shard i+1 — ``bkey``
    must be a total order) and balance (each shard within [n/2S, 2n/S]).

    Length-ordered shard export is the padding-reduction layout for
    training batches; at 100 TB the same boundaries feed an actual
    ``df.write.partitionBy``/repartitionByRange, and the sample pass is
    the only extra scan. Returns one row per non-empty shard:
    (shard_id, n_rows, min_bkey, max_bkey, ordered_ok, balanced_ok).
    """
    from pyspark.sql.window import Window

    from llm_data_pipeline_spark.operators.sketches import bottomk_sample

    keyed = df.select(bkey.alias("bk"), sample_key.alias("_sk"))
    samp = bottomk_sample(keyed, F.col("_sk"), sample_k, ("bk",))
    ranked = samp.select(
        "bk",
        F.row_number().over(Window.orderBy("bk", "hk")).alias("rn"),
    )
    m_eff = ranked.agg(F.max("rn").alias("m")).collect()[0]["m"] or 0
    # boundary ranks j*k/S, clamped to the sample size; duplicates are
    # kept when the sample is shorter than the last rank — the DuckDB
    # twin replays the identical boundary multiset
    want_ranks = (
        [min(j * sample_k // n_shards, m_eff) for j in range(1, n_shards)]
        if m_eff
        else []
    )
    rank_to_bk = {
        r["rn"]: int(r["bk"])
        for r in ranked.where(F.col("rn").isin(sorted(set(want_ranks)))).collect()
    }
    arr = (
        F.array(*[F.lit(rank_to_bk[rk]).cast("long") for rk in want_ranks])
        if want_ranks
        else F.array().cast("array<long>")
    )
    assigned = keyed.select(
        "bk",
        F.size(F.filter(arr, lambda x: x <= F.col("bk"))).alias("shard_id"),
    )
    agg = assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("bk").alias("min_bkey"),
        F.max("bk").alias("max_bkey"),
    )
    w = Window.orderBy("shard_id")
    total = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return agg.select(
        "shard_id",
        "n_rows",
        "min_bkey",
        "max_bkey",
        (
            F.col("max_bkey")
            < F.coalesce(
                F.lead("min_bkey").over(w), F.col("max_bkey") + F.lit(1)
            )
        )
        .cast("int")
        .alias("ordered_ok"),
        (
            (F.col("n_rows") * F.lit(2 * n_shards) >= F.sum("n_rows").over(total))
            & (F.col("n_rows") * F.lit(n_shards) <= F.sum("n_rows").over(total) * 2)
        )
        .cast("int")
        .alias("balanced_ok"),
    )

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F
import pytest

from llm_data_pipeline_spark.operators.bloom import (
    build_bloom_bits,
    incremental_exact_dedup,
    with_bloom_hit,
)


def _digests(spark, n, prefix):
    return spark.range(n).select(
        F.md5(F.concat(F.lit(prefix), F.col("id").cast("string"))).alias("digest")
    )


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    base = _digests(spark, 2000, "member-")
    bits = build_bloom_bits(base, "digest", m_bits=1 << 16, k=7)
    # every member must hit
    hits = with_bloom_hit(base, "digest", bits, m_bits=1 << 16, k=7)
    assert hits.where(~F.col("bloom_hit")).count() == 0
    # non-members: fp rate stays near the design point
    # (m/n = 32.8 bits/key, k=7 -> theoretical fp ~ 0.004%)
    others = _digests(spark, 5000, "outsider-")
    fp = with_bloom_hit(others, "digest", bits, m_bits=1 << 16, k=7).where(
        F.col("bloom_hit")
    ).count()
    assert fp <= 50, fp  # generous: <=1% observed vs ~0.004% theoretical
    # bitmap population sanity: k probes per key, minus collisions
    popcount = int(
        np.unpackbits(np.frombuffer(bits, dtype=np.uint8)).sum()
    )
    assert 0 < popcount <= 2000 * 7


def test_incremental_exact_dedup_matches_plain_semijoin(spark):
    base = _digests(spark, 1000, "member-")
    new = (
        _digests(spark, 300, "member-")  # re-ingested: all dups
        .unionByName(_digests(spark, 300, "fresh-"))
        .withColumn("row_id", F.monotonically_increasing_id())
    )
    got = incremental_exact_dedup(base, new, digest_col="digest")
    # reference: plain semi-join semantics
    expected = new.join(
        base.select("digest").distinct().withColumnRenamed("digest", "d2"),
        new.digest == F.col("d2"),
        "left_outer",
    ).select("digest", F.col("d2").isNotNull().alias("is_dup"))
    g = sorted((r.digest, r.is_dup) for r in got.select("digest", "is_dup").collect())
    e = sorted((r.digest, r.is_dup) for r in expected.collect())
    assert g == e
    assert got.where(F.col("is_dup")).count() == 300
    # schema contract: input columns preserved + is_dup appended
    assert set(got.columns) == {"digest", "row_id", "is_dup"}


@pytest.mark.full  # gauntlet-length; default profile skips (pytest.ini)
def test_incremental_dedup_duplicate_digests_in_increment(spark):
    """Duplicate texts INSIDE the increment must not multiply output rows:
    the confirm join is keyed on distinct digests, so the result stays
    row-for-row with the increment (one is_dup flag per input row)."""
    base = _digests(spark, 200, "member-")
    dup_slice = _digests(spark, 50, "member-")  # each digest appears 3x
    fresh_dup = _digests(spark, 30, "fresh-")  # non-base digests, twice each
    new = (
        dup_slice.unionByName(dup_slice)
        .unionByName(dup_slice)
        .unionByName(fresh_dup)
        .unionByName(fresh_dup)
        .withColumn("row_id", F.monotonically_increasing_id())
    )
    n_in = new.count()
    got = incremental_exact_dedup(base, new, digest_col="digest")
    assert got.count() == n_in  # no row multiplication
    assert got.where(F.col("is_dup")).count() == 150  # 50 digests x 3 rows
    assert got.where(~F.col("is_dup")).count() == 60
    # sharded path agrees
    got4 = incremental_exact_dedup(base, new, digest_col="digest", n_shards=4)
    assert sorted(
        (r.digest, r.is_dup) for r in got.select("digest", "is_dup").collect()
    ) == sorted(
        (r.digest, r.is_dup) for r in got4.select("digest", "is_dup").collect()
    )


def test_sharded_filter_matches_unsharded(spark):
    from llm_data_pipeline_spark.operators.bloom import (
        build_bloom_bits_sharded,
        with_bloom_hit_sharded,
    )

    base = _digests(spark, 1500, "member-")
    new = _digests(spark, 400, "member-").unionByName(_digests(spark, 400, "out-"))
    shard_bits = build_bloom_bits_sharded(base, "digest", n_shards=4, m_bits=1 << 16)
    hits = with_bloom_hit_sharded(new, "digest", shard_bits, m_bits=1 << 16)
    # no false negatives on the member half
    assert hits.where(~F.col("bloom_hit")).count() <= 400  # outsiders only
    members = _digests(spark, 400, "member-")
    mh = with_bloom_hit_sharded(members, "digest", shard_bits, m_bits=1 << 16)
    assert mh.where(~F.col("bloom_hit")).count() == 0
    # end-to-end sharded dedup equals the unsharded (and the plain join)
    g1 = sorted(
        (r.digest, r.is_dup)
        for r in incremental_exact_dedup(base, new, "digest").collect()
    )
    g4 = sorted(
        (r.digest, r.is_dup)
        for r in incremental_exact_dedup(base, new, "digest", n_shards=4).collect()
    )
    assert g1 == g4
    assert sum(1 for _, d in g4 if d) == 400

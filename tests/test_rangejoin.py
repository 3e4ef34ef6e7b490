"""Banded range join tests: bucket-boundary coverage + exact-band edges."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from llm_data_pipeline_spark.operators.rangejoin import range_join_within


def _expected(rows, band):
    out = set()
    for (i1, k1, t1), (i2, k2, t2) in itertools.combinations(rows, 2):
        if k1 == k2 and abs(t1 - t2) <= band:
            u, v = sorted((i1, i2))
            out.add((k1, u, v))
    return out


def test_range_join_matches_bruteforce(spark):
    # timestamps engineered around bucket boundaries of band=10s:
    # same-bucket, adjacent-bucket in both ID orders, exactly-band apart,
    # just-over-band apart, and a different key
    band = 10_000_000  # 10s in micros
    rows = [
        (1, 100, 5_000_000),
        (2, 100, 9_999_999),   # same bucket as id 1
        (3, 100, 10_000_001),  # next bucket, within band of 1 and 2
        (4, 100, 15_000_000),  # exactly band from id 1
        (5, 100, 25_000_000),  # exactly band from id 4, > band from others
        (6, 200, 5_000_000),   # different key
        (7, 100, 4_999_999),   # id ordered after, time before id 1
    ]
    df = spark.createDataFrame(
        [(i, k, t) for i, k, t in rows], "event_id: long, user_id: long, us: long"
    ).select("event_id", "user_id", F.expr("timestamp_micros(us)").alias("ts"))
    got = {
        (r["user_id"], r["u"], r["v"])
        for r in range_join_within(
            df, "user_id", "ts", band, "event_id"
        ).collect()
    }
    assert got == _expected(rows, band)
    # sanity on the engineered cases
    assert (100, 1, 4) in got      # exactly band apart -> included
    assert (100, 4, 5) in got      # adjacent bucket pair
    assert (100, 1, 7) in got      # later id, earlier time (reverse bucket)
    assert all(k != 200 or (u, v) == (6, 6) for k, u, v in got) or (
        200 not in {k for k, _, _ in got}
    )


def test_range_join_no_duplicate_pairs(spark):
    df = spark.createDataFrame(
        [(i, 1, i * 1_000_000) for i in range(50)],
        "event_id: long, user_id: long, us: long",
    ).select("event_id", "user_id", F.expr("timestamp_micros(us)").alias("ts"))
    out = range_join_within(df, "user_id", "ts", 5_000_000, "event_id")
    pairs = [(r["u"], r["v"]) for r in out.collect()]
    assert len(pairs) == len(set(pairs))  # exactly-once matching, no dedup pass
    assert len(pairs) == sum(min(5, 49 - i) for i in range(50))
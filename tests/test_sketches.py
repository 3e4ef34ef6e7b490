"""Approximate-sketch operators: the 100 TB defaults for distinct counts
and frequency estimates, accuracy-bounded against exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = o.select(F.countDistinct("o_custkey").alias("n")).first()["n"]
    approx = o.select(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n")
    ).first()["n"]
    assert abs(approx - exact) / exact < 0.1


def test_approx_percentile_brackets_exact(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    approx = li.select(
        F.percentile_approx("l_extendedprice", [0.5, 0.95], 10_000).alias("p")
    ).first()["p"]
    import duckdb

    con = duckdb.connect()
    exact = con.sql(
        f"SELECT quantile_cont(l_extendedprice, [0.5, 0.95]) "
        f"FROM read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchone()[0]
    for a, e in zip(approx, exact):
        assert abs(a - e) / max(e, 1e-9) < 0.02


def test_count_min_sketch_frequencies(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    sketch = e.select(
        F.count_min_sketch("event_type", F.lit(0.001), F.lit(0.99), F.lit(42)).alias("s")
    ).first()["s"]
    assert sketch is not None and len(bytes(sketch)) > 0
    # CMS never undercounts; with eps=0.001 over ~10k rows it is near-exact
    exact = {
        r["event_type"]: r["count"]
        for r in e.groupBy("event_type").count().collect()
    }
    assert sum(exact.values()) == e.count()

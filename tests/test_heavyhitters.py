"""Heavy-hitters (frequent n-gram mining) correctness pins.

The operator's claim is exactness under ANY partitioning when capacity is
left at the provable default — pinned here against the naive full
groupBy-count plan, including adversarial repartitioning and the
below-bound-capacity subset behaviour.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_data_pipeline_spark.operators.heavyhitters import (
    frequent_ngrams,
    ngram_stream,
)


def _naive(docs, n, min_count):
    return (
        ngram_stream(docs, n)
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )


def _rows(df):
    return sorted((r["gram"], r["cnt"]) for r in df.collect())


def test_matches_naive_plan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    got = _rows(frequent_ngrams(docs, n=2, min_count=3))
    exp = _rows(_naive(docs, 2, 3))
    assert got == exp and len(exp) > 0


def test_partition_independent(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    exp = _rows(_naive(docs, 2, 3))
    for parts in (1, 3, 13):
        got = _rows(frequent_ngrams(docs.repartition(parts), n=2, min_count=3))
        assert got == exp, f"diverged at {parts} partitions"


def test_provable_capacity_boundary(spark):
    # 60-gram stream: 'a b' x20, 'b c' x12, tail of 28 unique bigrams.
    rows = (
        [("a b x%d" % i,) for i in range(10)]  # 10x 'a b'
        + [("a b",)] * 10  # 10 more 'a b' (2-token docs)
        + [("b c",)] * 12
        + [("u%d v%d" % (i, i),) for i in range(28)]
    )
    docs = spark.createDataFrame(rows, "text string").repartition(7)
    exp = _rows(_naive(docs, 2, 12))
    # default capacity = N // min_count + 1 — provable superset
    assert _rows(frequent_ngrams(docs, n=2, min_count=12)) == exp
    # explicit capacity at the bound still exact
    total = ngram_stream(docs, 2).count()
    cap = total // 12 + 1
    assert _rows(frequent_ngrams(docs, n=2, min_count=12, capacity=cap)) == exp


def test_below_bound_capacity_is_subset(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    exp = set(_rows(_naive(docs, 2, 3)))
    got = set(_rows(frequent_ngrams(docs.repartition(8), n=2, min_count=3, capacity=5)))
    # counts of surviving candidates are still exact — only coverage may shrink
    assert got <= exp


def test_nulls_and_short_docs(spark):
    docs = spark.createDataFrame(
        [(None,), ("",), ("one",), ("two words",), ("two words",), ("two words",)],
        "text string",
    )
    assert _rows(frequent_ngrams(docs, n=2, min_count=3)) == [("two words", 3)]
    assert _rows(frequent_ngrams(docs, n=5, min_count=1)) == []


def test_incremental_matches_union_naive(spark, sf_dir):
    from llm_data_pipeline_spark.operators.heavyhitters import (
        frequent_ngrams_incremental,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.select("text")
    inc = docs.limit(30).select("text")
    union = base.unionByName(inc)
    exp = _rows(_naive(union, 2, 3))
    got = _rows(
        frequent_ngrams_incremental(base.repartition(5), inc.repartition(3),
                                    n=2, min_count=3)
    )
    assert got == exp and len(exp) > 0


def test_incremental_catches_split_threshold_grams(spark):
    # 'a b' is frequent ONLY in the union (2 base + 3 inc, min_count 5):
    # neither corpus alone crosses the bar; the merged summaries must.
    base = spark.createDataFrame(
        [("a b",)] * 2 + [("u%d v%d" % (i, i),) for i in range(20)],
        "text string",
    ).repartition(4)
    inc = spark.createDataFrame(
        [("a b",)] * 3 + [("w%d x%d" % (i, i),) for i in range(20)],
        "text string",
    ).repartition(4)
    from llm_data_pipeline_spark.operators.heavyhitters import (
        frequent_ngrams_incremental,
    )

    got = _rows(frequent_ngrams_incremental(base, inc, n=2, min_count=5))
    assert got == [("a b", 5)]

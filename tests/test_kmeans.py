"""Integer-exact k-means pins: partition independence, monotone inertia,
the empty-cluster keep rule, and the smallest-id tie break."""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_data_pipeline_spark.operators.kmeans import (
    assign_clusters,
    kmeans_cluster_stats,
    kmeans_fit,
    quantize_micro,
)


def _emb(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
    )


def test_centroids_partition_independent(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    c1, _ = kmeans_fit(emb.repartition(1), k=4, iters=2)
    c9, _ = kmeans_fit(emb.repartition(9), k=4, iters=2)
    assert c1 == c9


def test_inertia_monotone_nonincreasing(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    inertias = []
    for iters in (1, 2, 3):
        stats = kmeans_cluster_stats(emb, k=4, iters=iters)
        inertias.append(stats.agg(F.sum("inertia").alias("s")).first()["s"])
    # Lloyd never increases inertia (integer rounding can plateau, not climb
    # beyond the half-unit-per-dim quantization slack, which the synthetic
    # spread dwarfs)
    assert inertias[0] >= inertias[1] >= inertias[2]


def test_empty_cluster_keeps_centroid(spark):
    # two tight groups far apart + k=3 with the third seed inside group one:
    # the third cluster empties after step 1 and must keep its centroid.
    rows = [(i, [0.001 * i, 0.0]) for i in range(3)]  # seeds 0,1,2 near origin
    rows += [(i, [10.0, 10.0]) for i in range(3, 20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, base = kmeans_fit(df, k=3, iters=2)
    assert len(cents) == 3
    stats = {
        r["cluster"]: r["n_members"]
        for r in assign_clusters(base, cents)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .collect()
    }
    assert sum(stats.values()) == 20  # every vector assigned exactly once


def test_tie_breaks_to_smallest_cluster(spark):
    # identical centroids -> every point ties -> all go to cluster 0
    df = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [1.0, 1.0]), (2, [2.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    base = df.select("vec_id", quantize_micro(F.col("embedding")).alias("xq"))
    out = assign_clusters(base, [[1_000_000, 1_000_000], [1_000_000, 1_000_000]])
    assert {r["cluster"] for r in out.collect()} == {0}


def test_fewer_vectors_than_k(spark):
    df = spark.createDataFrame(
        [(10, [0.0, 0.0]), (20, [5.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    cents, base = kmeans_fit(df, k=8, iters=2)  # non-contiguous ids, n < k
    assert len(cents) == 2
    stats = kmeans_cluster_stats(df, k=8, iters=2).collect()
    assert sum(r["n_members"] for r in stats) == 2

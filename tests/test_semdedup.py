from __future__ import annotations

import itertools
import math

from pyspark.sql import Row

from llm_data_pipeline_spark.operators.semdedup import (
    assign_clusters,
    semantic_dedup,
)


def _cents(spark):
    # Two well-separated cluster centers.
    return spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "list_id long, cvec array<double>",
    )


def _emb(spark):
    rows = [
        # cluster 0: 0 and 1 are semantic dups (cos ~0.9999);
        # 1 sits closer to the centroid, so SemDeDup drops 1, keeps 0.
        Row(vec_id=0, embedding=[0.95, 0.05, 0.0]),
        Row(vec_id=1, embedding=[0.97, 0.03, 0.0]),
        # cluster 0 loner: similar to nothing above threshold=0.99
        Row(vec_id=2, embedding=[0.7, 0.0, 0.7]),
        # cluster 1: a dup pair with IDENTICAL centroid similarity —
        # tie drops the higher vec_id (4), keeps 3.
        Row(vec_id=3, embedding=[0.05, 0.95, 0.0]),
        Row(vec_id=4, embedding=[-0.05, 0.95, 0.0]),
    ]
    return spark.createDataFrame(rows)


def test_assignment_nearest_centroid(spark):
    res = {
        r.vec_id: r.list_id
        for r in assign_clusters(_emb(spark), _cents(spark)).collect()
    }
    assert res == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1}


def test_keeps_low_centroid_sim_member(spark):
    kept = sorted(
        r.vec_id
        for r in semantic_dedup(
            _emb(spark), _cents(spark), threshold=0.99
        ).collect()
    )
    # pair (0,1): 1 has higher centroid_sim -> dropped; tie pair (3,4)
    # by symmetry has equal centroid_sim -> higher id 4 dropped.
    assert kept == [0, 2, 3]


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return num / (na * nb) if na > 0 and nb > 0 else 0.0


def test_no_kept_pair_above_threshold(spark, sf_dir):
    """Every >=threshold same-cluster pair loses exactly one member, so
    the kept set can never contain such a pair — checked brute-force on
    the real sf0.001 embeddings with the trained codebook."""
    from llm_data_pipeline_spark.data.codebooks import ivf_codebook_df
    from llm_data_pipeline_spark.queries import table

    emb = table(spark, sf_dir, "embeddings")
    cents = ivf_codebook_df(spark)
    thr = 0.3
    kept = semantic_dedup(emb, cents, threshold=thr).collect()
    vecs = {r.vec_id: r.embedding for r in emb.collect()}
    by_cluster: dict[int, list[int]] = {}
    for r in kept:
        by_cluster.setdefault(r.list_id, []).append(r.vec_id)
    assert len(kept) < len(vecs)  # something was actually dropped
    for members in by_cluster.values():
        for u, v in itertools.combinations(sorted(members), 2):
            assert round(_cos(vecs[u], vecs[v]), 6) < thr, (u, v)


def test_group_variant_keeps_one_per_chain(spark):
    """On a duplicate CHAIN a~b, b~c (a!~c) the group variant keeps
    exactly one member (the per-group argmin of centroid similarity),
    while pairwise dominance keeps the two extreme ends — the documented
    difference between the variants."""
    from llm_data_pipeline_spark.operators.semdedup import (
        semantic_dedup_groups,
    )

    d25, d50 = math.radians(25), math.radians(50)
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),                      # a
        Row(vec_id=1, embedding=[math.cos(d25), math.sin(d25), 0.0]),  # b
        Row(vec_id=2, embedding=[math.cos(d50), math.sin(d50), 0.0]),  # c
    ]
    emb = spark.createDataFrame(rows)
    cents = spark.createDataFrame(
        [(0, [math.cos(d25), math.sin(d25), 0.0]), (1, [0.0, 0.0, 1.0])],
        "list_id long, cvec array<double>",
    )
    # cos(25 deg) ~ 0.906 >= 0.9 links a~b and b~c; cos(50 deg) ~ 0.643
    # keeps a!~c out. Centroid sims: b = 1.0, a = c ~ 0.906 (tie).
    grp = semantic_dedup_groups(emb, cents, threshold=0.9).collect()
    assert len(grp) == 3 and len({r.component for r in grp}) == 1
    assert sorted(r.vec_id for r in grp if r.kept) == [0]   # argmin, tie->id
    pairwise = semantic_dedup(emb, cents, threshold=0.9).collect()
    assert sorted(r.vec_id for r in pairwise) == [0, 2]     # both chain ends


def test_gemm_pairs_bit_identical_to_fold_path(spark, sf_dir):
    """cluster_pairs_gemm must emit exactly the pairs and scores of the
    interpreted fold path (the blocked-GEMM lossless-margin contract)."""
    from llm_data_pipeline_spark.data.codebooks import ivf_codebook_df
    from llm_data_pipeline_spark.operators.semdedup import (
        assign_clusters,
        cluster_pairs,
        cluster_pairs_gemm,
    )
    from llm_data_pipeline_spark.queries import table

    emb = table(spark, sf_dir, "embeddings")
    cents = ivf_codebook_df(spark)
    assigned = assign_clusters(emb, cents)
    cols = ["_ua", "_ca", "_ub", "_cb", "_psim"]
    plain = sorted(tuple(r[c] for c in cols)
                   for r in cluster_pairs(assigned, 0.3).collect())
    gemm = sorted(tuple(r[c] for c in cols)
                  for r in cluster_pairs_gemm(assigned, 0.3).collect())
    assert plain == gemm and len(plain) > 0


def test_incremental_base_wins_and_new_dominance(spark):
    from llm_data_pipeline_spark.operators.semdedup import (
        semantic_dedup_incremental,
    )

    cents = _cents(spark)
    base = spark.createDataFrame(
        [Row(vec_id=0, embedding=[0.95, 0.05, 0.0])]
    )
    inc = spark.createDataFrame(
        [
            # duplicates the base row -> dropped even though its centroid
            # sim is LOWER (base always wins, dominance does not apply)
            Row(vec_id=100, embedding=[0.9, 0.1, 0.0]),
            # new x new duplicate pair in cluster 1: equal centroid sims
            # -> higher id dropped
            Row(vec_id=101, embedding=[0.05, 0.95, 0.0]),
            Row(vec_id=102, embedding=[0.05, 0.95, 0.0]),
            # fresh: orthogonal-ish to everything
            Row(vec_id=103, embedding=[0.0, 0.0, 1.0]),
        ]
    )
    kept = sorted(
        r.vec_id
        for r in semantic_dedup_incremental(
            base, inc, cents, threshold=0.99
        ).collect()
    )
    assert kept == [101, 103]
    # base rows are never in the output
    assert 0 not in kept


def test_gemm_path_survives_null_and_mixed_dim_rows(spark):
    """One bad row (null embedding, or a vector of the wrong dimension)
    must degrade like the fold path (pair score 0.0 -> not a duplicate),
    not crash the numpy GEMM on an inhomogeneous array."""
    from llm_data_pipeline_spark.operators.semdedup import semantic_dedup

    rows = [
        (0, [1.0, 0.1]),
        (1, [1.0, 0.11]),   # near-dup of 0
        (2, None),          # null embedding
        (3, [0.5, 0.5, 0.5]),  # wrong dimension
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0])], "list_id long, cvec array<double>"
    )
    fold = sorted(
        r["vec_id"]
        for r in semantic_dedup(df, cents, threshold=0.9, use_gemm=False).collect()
    )
    gemm = sorted(
        r["vec_id"]
        for r in semantic_dedup(df, cents, threshold=0.9, use_gemm=True).collect()
    )
    assert fold == gemm
    assert 2 in gemm and 3 in gemm  # degenerate rows kept, never paired

    import pytest

    from llm_data_pipeline_spark.operators.semdedup import cluster_pairs_gemm

    with pytest.raises(ValueError):
        cluster_pairs_gemm(df.withColumn("list_id", df.vec_id * 0), 0.0)

"""Integer PageRank: brute-force equivalence, teleport floor, determinism."""

from __future__ import annotations

from llm_data_pipeline_spark.operators.pagerank import (
    MICRO,
    TELEPORT,
    pagerank_integer,
)


def _brute(edges, iters):
    """Reference fold over [(src, dst, w)] in plain python ints."""
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    rank = {n: MICRO for n in nodes}
    for _ in range(iters):
        inc = {n: 0 for n in nodes}
        for s, d, w in edges:
            inc[d] += (rank[s] * w) // outw[s]
        rank = {n: TELEPORT + (85 * inc[n]) // 100 for n in nodes}
    return rank


EDGES = [
    ("a", "b", 3),
    ("a", "c", 1),
    ("b", "c", 2),
    ("c", "a", 1),
    ("d", "a", 5),  # d has no in-edges -> teleport floor
    ("b", "b", 1),  # self-loop
]


def test_pagerank_matches_brute_force(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string, w int")
    got = {
        r.node: r.rank for r in pagerank_integer(df, iters=10).collect()
    }
    assert got == _brute(EDGES, 10)
    # node with no in-edges sits exactly on the teleport floor
    assert got["d"] == TELEPORT
    # popular node outranks the dangling-source one
    assert got["a"] > got["d"]


def test_pagerank_deterministic_across_partitionings(spark):
    df1 = spark.createDataFrame(EDGES, "src string, dst string, w int")
    df8 = df1.repartition(8)
    r1 = {r.node: r.rank for r in pagerank_integer(df1, iters=5).collect()}
    r8 = {r.node: r.rank for r in pagerank_integer(df8, iters=5).collect()}
    assert r1 == r8


def test_pagerank_mass_bounded(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string, w int")
    ranks = [r.rank for r in pagerank_integer(df, iters=10).collect()]
    # every rank >= teleport floor; total mass never exceeds the initial
    # N * MICRO (integer divisions only leak mass, never create it)
    assert all(r >= TELEPORT for r in ranks)
    assert sum(ranks) <= len(ranks) * MICRO

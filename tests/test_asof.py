"""As-of join unit tests (union+window construction)."""

from __future__ import annotations

from llm_data_pipeline_spark.operators.asof import asof_join


def test_asof_basic_and_edges(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 5, "b"), (1, 2, "c"), (2, 7, "d"), (3, 1, "e")],
        "k: long, t: long, tag: string",
    )
    right = spark.createDataFrame(
        [(1, 3, 30.0), (1, 5, 50.0), (1, 9, 90.0), (2, 8, 80.0)],
        "k: long, t: long, v: double",
    )
    out = {
        r["tag"]: r["asof_v"]
        for r in asof_join(
            left, right, "k", "k", "t", "t", value_cols=["v"]
        ).collect()
    }
    assert out["a"] == 90.0  # latest at-or-before 10
    assert out["b"] == 50.0  # exact-timestamp match counts ("at or before")
    assert out["c"] is None  # no right row precedes t=2
    assert out["d"] is None  # right row at t=8 is after t=7
    assert out["e"] is None  # key with no right rows at all


def test_asof_atomic_multi_value(spark):
    # multiple value columns must come from the SAME right row even when
    # some of them are null
    left = spark.createDataFrame([(1, 10)], "k: long, t: long")
    right = spark.createDataFrame(
        [(1, 3, 30.0, "x"), (1, 6, None, "y")],
        "k: long, t: long, v: double, s: string",
    )
    row = asof_join(
        left, right, "k", "k", "t", "t", value_cols=["v", "s"]
    ).first()
    # latest right row is (t=6, v=NULL, s='y'): v must be NULL, not 30.0
    assert row["asof_s"] == "y"
    assert row["asof_v"] is None

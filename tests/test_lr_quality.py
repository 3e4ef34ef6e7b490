"""LR quality classifier pins: it must actually LEARN on separable data,
train identically under any partitioning, and handle degenerate docs."""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_data_pipeline_spark.operators.lr_quality import (
    quality_classifier_scores,
    train_quality_classifier,
)


def _separable(spark):
    rows = []
    for i in range(40):
        rows.append((i, "excellent prose with careful citations and structure", 1))
    for i in range(40, 80):
        rows.append((i, "click here buy now spam spam free offer", 0))
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def test_learns_separable_vocab(spark):
    docs = _separable(spark)
    w = train_quality_classifier(docs, iters=3)
    scored = quality_classifier_scores(docs, w).select("doc_id", "y", "score_micro")
    rows = scored.collect()
    pos = [r["score_micro"] for r in rows if r["y"] == 1]
    neg = [r["score_micro"] for r in rows if r["y"] == 0]
    assert min(pos) > 0 and max(neg) < 0  # perfect separation on disjoint vocab


def test_training_partition_independent(spark):
    docs = _separable(spark)
    w1 = train_quality_classifier(docs.repartition(1), iters=3)
    w7 = train_quality_classifier(docs.repartition(7), iters=3)
    assert w1 == w7
    assert len(w1) <= 512


def test_empty_docs_score_zero(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta", 1), (1, None, 0), (2, "", 0)],
        "doc_id long, text string, y int",
    )
    w = train_quality_classifier(docs, iters=2)
    got = {
        r["doc_id"]: r["score_micro"]
        for r in quality_classifier_scores(docs, w).collect()
    }
    assert got[1] == 0 and got[2] == 0


def test_more_iterations_grow_margin(spark):
    docs = _separable(spark)
    w1 = train_quality_classifier(docs, iters=1)
    w3 = train_quality_classifier(docs, iters=3)
    assert w3 != w1  # trajectory keeps moving after step 1

    def pos_margin(w):
        return (
            quality_classifier_scores(docs, w)
            .where(F.col("y") == 1)
            .agg(F.sum("score_micro").alias("s"))
            .first()["s"]
        )

    assert pos_margin(w3) > pos_margin(w1)  # GD keeps widening the margin


def test_empty_corpus_returns_no_weights(spark):
    docs = spark.createDataFrame([], "doc_id long, text string, y int")
    assert train_quality_classifier(docs, iters=2) == {}

from __future__ import annotations

from pyspark.sql import Row

from llm_data_pipeline_spark.operators.hashed_embedding import (
    hashed_trigram_embedding,
)


def test_shapes_and_zero_vector(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="hello world"),
            Row(doc_id=1, text="ab"),        # shorter than gram width
            Row(doc_id=2, text=None),        # null text
        ]
    )
    out = {r.doc_id: r.embedding for r in hashed_trigram_embedding(df).collect()}
    assert set(out) == {0, 1, 2}
    assert all(len(v) == 64 for v in out.values())
    assert out[1] == [0.0] * 64
    assert out[2] == [0.0] * 64
    assert any(x != 0.0 for x in out[0])
    # mass conservation: |sum of abs values| <= n_grams, and total signed
    # mass equals the sum of per-gram signs (each gram contributes +-1)
    assert sum(abs(x) for x in out[0]) <= len("hello world") - 2


def test_identical_texts_identical_vectors(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="the quick brown fox"),
            Row(doc_id=1, text="the quick brown fox"),
            Row(doc_id=2, text="a completely different document here"),
        ]
    )
    out = {r.doc_id: r.embedding for r in hashed_trigram_embedding(df).collect()}
    assert out[0] == out[1]
    assert out[0] != out[2]


def test_case_insensitive(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, text="Hello World"), Row(doc_id=1, text="hello world")]
    )
    out = {r.doc_id: r.embedding for r in hashed_trigram_embedding(df).collect()}
    assert out[0] == out[1]

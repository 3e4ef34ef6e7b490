"""Unit tests for within-document repetition signals (functions/repetition.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from llm_data_pipeline_spark.functions.repetition import (
    duplicate_gram_fraction,
    max_word_run,
    top_gram_char_fraction,
    word_diversity,
)

CASES = [
    # (text, top2_frac, dup5_frac, max_run, diversity)
    # "a b a b a b": bigrams [a b, b a, a b, b a, a b] -> counts "a b"=3,
    # "b a"=2 -> top ("a b", 3), len 3, text_len 11 -> 9/11; the two
    # 5-grams ("a b a b a", "b a b a b") are distinct -> dup5 = 0
    ("a b a b a b", 9 / 11, 0.0, 1, 2 / 6),
    # all same word: "x x x x": bigrams 3x "x x" -> 3*3/7; 5-grams none
    # (4 words < 5) -> 0; run 4; diversity 1/4
    ("x x x x", 9 / 7, 0.0, 4, 1 / 4),
    # no repetition: every bigram count 1, tie -> lexicographically
    # largest gram "two three" (len 9), text_len 27
    ("one two three four five six", 9 / 27, 0.0, 1, 1.0),
    # empty and whitespace-only
    ("", 0.0, 0.0, 0, 0.0),
    ("   ", 0.0, 0.0, 0, 0.0),
    # single word: shorter than n=2 -> no grams -> 0 fractions, run 1
    ("hello", 0.0, 0.0, 1, 1.0),
    # case/whitespace normalization folds "A  a" into a run of 2
    ("A  a b", 3 / 5, 0.0, 2, 2 / 3),
]


@pytest.fixture(scope="module")
def frame(spark):
    rows = [(i, t) for i, (t, *_) in enumerate(CASES)]
    return spark.createDataFrame(rows, ["id", "text"])


def test_repetition_signals_exact(frame):
    t = F.col("text")
    got = {
        r["id"]: r
        for r in frame.select(
            "id",
            top_gram_char_fraction(t, 2).alias("top2"),
            duplicate_gram_fraction(t, 5).alias("dup5"),
            max_word_run(t).alias("run"),
            word_diversity(t).alias("div"),
        ).collect()
    }
    for i, (text, top2, dup5, run, div) in enumerate(CASES):
        r = got[i]
        assert r["top2"] == pytest.approx(top2, abs=0), (i, text, r["top2"])
        assert r["dup5"] == pytest.approx(dup5, abs=0), (i, text, r["dup5"])
        assert r["run"] == run, (i, text, r["run"])
        assert r["div"] == pytest.approx(div, abs=0), (i, text, r["div"])


def test_null_text_is_zero(spark):
    df = spark.createDataFrame([(0, None)], "id INT, text STRING")
    r = df.select(
        top_gram_char_fraction(F.col("text"), 2).alias("top2"),
        max_word_run(F.col("text")).alias("run"),
    ).collect()[0]
    assert r["top2"] == 0.0
    assert r["run"] == 0


def test_tie_breaks_to_lexicographically_larger_gram(spark):
    # "c d a b c d a b": "c d"=2, "a b"=2, "d a"=2, "b c"=1 ->
    # tie at 2 among {a b, c d, d a}; winner must be "d a" (largest)
    df = spark.createDataFrame([(0, "c d a b c d a b")], ["id", "text"])
    # winner length 3, count 2, text_len 15
    r = df.select(top_gram_char_fraction(F.col("text"), 2).alias("f")).collect()[0]
    assert r["f"] == pytest.approx(6 / 15, abs=0)

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from llm_data_pipeline_spark.functions import analysis as A
from llm_data_pipeline_spark.operators.quality import run_quality


def _score(spark, texts):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id int, text string",
    )
    return (
        df.select(
            "doc_id",
            A.detect_language(F.col("text")).alias("lang"),
            A.quality_score(F.col("text")).alias("q"),
            A.whitespace_token_count(F.col("text")).alias("ws"),
            A.wordlike_token_count(F.col("text")).alias("wl"),
            A.fingerprint(F.col("text")).alias("fp"),
        )
        .orderBy("doc_id")
        .collect()
    )


def test_language_detection(spark):
    rows = _score(
        spark,
        [
            "the cat and the dog went to the house in a hurry",
            "el perro y la casa de que los gatos una vez",
            "der hund und das haus ist ein gutes nicht schlechtes",
            "le chien et les maisons des un une dans paris",
            "这是一个中文文档的内容示例没有空格",
            "zzz qqq xxx www",
            None,
        ],
    )
    assert [r.lang for r in rows] == ["en", "es", "de", "fr", "zh", "und", "und"]


def test_quality_score_ordering(spark):
    rows = _score(
        spark,
        [
            "the quick brown fox jumps over the lazy dog in a field",
            "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))",
        ],
    )
    assert rows[0].q > rows[1].q
    assert 0.0 <= rows[1].q <= 1.0


def test_token_counts(spark):
    rows = _score(spark, ["hello world, it's 42 degrees"])
    r = rows[0]
    assert r.ws == 5
    # hello | world | , | it | ' | s | 42 | degrees
    assert r.wl == 8


def test_fingerprint_normalization_invariance(spark):
    rows = _score(spark, ["Hello   World", "hello world"])
    assert rows[0].fp == rows[1].fp


def test_run_quality_contract(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat and the dog went to the house in a hurry"),
            Row(doc_id=2, text="el perro y la casa de que los gatos una vez"),
        ]
    )
    out = {r.doc_id: r for r in run_quality(df).collect()}
    assert out[1].quality_keep and out[1].lang_pred == "en"
    assert not out[2].quality_keep and out[2].lang_pred == "es"


def test_winnow_fingerprints_robust_to_local_edits(spark):
    from llm_data_pipeline_spark.functions.analysis import add_winnow_fingerprints

    base = (
        "the quick brown fox jumps over the lazy dog and then naps in the "
        "afternoon sun beside the garden wall for quite a long while today"
    )
    edited = base.replace("naps", "rests")  # one local edit
    df = spark.createDataFrame(
        [(0, base), (1, edited), (2, ""), (3, "ab")],
        "doc_id: long, text: string",
    )
    fp = {
        r["doc_id"]: set(r["fingerprints"])
        for r in add_winnow_fingerprints(df).collect()
    }
    # winnowing guarantee: fingerprints far from the edit are identical
    overlap = len(fp[0] & fp[1]) / len(fp[0] | fp[1])
    assert overlap > 0.6, overlap
    assert fp[2] == set()  # empty text -> empty fingerprint set
    assert len(fp[3]) == 1  # sub-k text -> single gram hash


def test_winnow_strategies_equivalent(spark, sf_dir):
    from llm_data_pipeline_spark.functions.analysis import add_winnow_fingerprints

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    a = {
        r["doc_id"]: list(r["fingerprints"])
        for r in add_winnow_fingerprints(docs, strategy="pandas").collect()
    }
    b = {
        r["doc_id"]: list(r["fingerprints"])
        for r in add_winnow_fingerprints(docs, strategy="native").collect()
    }
    assert a == b


def test_staged_language_heuristic_equivalent(spark, sf_dir):
    """with_language_heuristic / with_quality_score (staged, plan-hygiene
    rule 1) must be value-identical to the Column-expression forms."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    expr = docs.select(
        "doc_id",
        A.detect_language(F.col("text")).alias("lang_pred"),
        A.language_score(F.col("text")).alias("lang_score"),
        A.quality_score(F.col("text")).alias("q"),
    ).orderBy("doc_id")
    staged = (
        A.with_quality_score(A.with_language_heuristic(docs), out_col="q")
        .select("doc_id", "lang_pred", "lang_score", "q")
        .orderBy("doc_id")
    )
    a, b = expr.collect(), staged.collect()
    assert len(a) == len(b) == 200
    for ra, rb in zip(a, b):
        assert ra == rb
    # staged temp columns must not leak into the output schema
    assert staged.columns == ["doc_id", "lang_pred", "lang_score", "q"]


def test_lm_bigram_score_ranks_gibberish_below_natural(spark):
    """Documents whose transitions the corpus has seen often must outscore
    permuted/gibberish transitions (the CCNet filter property)."""
    from pyspark.sql import Row

    from llm_data_pipeline_spark.operators.lm_score import add_lm_score

    natural = "the cat sat on the mat and the dog sat on the rug"
    rows = [Row(doc_id=i, text=natural) for i in range(8)]
    rows.append(Row(doc_id=100, text="mat the on rug sat dog cat and the on"))
    rows.append(Row(doc_id=101, text="one"))
    rows.append(Row(doc_id=102, text=None))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r for r in add_lm_score(df).collect()}
    assert out[0].lm_logprob > out[100].lm_logprob
    assert out[101].n_bigrams == 0 and out[101].lm_logprob == 0.0
    assert out[102].n_bigrams == 0 and out[102].lm_logprob == 0.0
    # input columns preserved
    assert set(out[0].asDict()) == {"doc_id", "text", "lm_logprob", "n_bigrams"}

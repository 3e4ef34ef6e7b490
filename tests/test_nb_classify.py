from __future__ import annotations

from pyspark.sql import Row

from llm_data_pipeline_spark.operators.nb_classify import (
    char_ngrams,
    nb_predict,
    train_nb,
)


def _fixture(spark):
    # Genuinely separable classes: English vs pseudo-French function words.
    en = [
        "the cat sat on the mat and the dog ran",
        "this is the house that jack built with wood",
        "where there is a will there is a way",
        "the quick brown fox jumps over the lazy dog",
    ]
    fr = [
        "le chat est sur le tapis et le chien court",
        "c'est la maison que jacques a construite en bois",
        "quand on veut on peut toujours trouver le chemin",
        "le renard brun saute par dessus le chien paresseux",
    ]
    rows = [
        Row(doc_id=i, text=t, lang="en") for i, t in enumerate(en)
    ] + [
        Row(doc_id=100 + i, text=t, lang="fr") for i, t in enumerate(fr)
    ]
    return spark.createDataFrame(rows)


def test_char_ngrams_edges(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [Row(s="abcd"), Row(s="ab"), Row(s="")]
    ).select(char_ngrams(F.col("s"), 3).alias("g"))
    got = [r.g for r in df.collect()]
    assert got == [["abc", "bcd"], [], []]


def test_learns_separable_languages(spark):
    df = _fixture(spark)
    # Hold one doc out per class; train on the rest.
    train = df.where("doc_id NOT IN (3, 103)")
    test = df.where("doc_id IN (3, 103)")
    model = train_nb(train)
    pred = {r.doc_id: r.pred_label for r in nb_predict(model, test).collect()}
    assert pred == {3: "en", 103: "fr"}


def test_empty_text_predicts_prior(spark):
    df = _fixture(spark)
    # 5 en train docs vs 4 fr -> prior favors en; an empty doc must get
    # the majority prior and a score equal to round(ln(5/9)*1e6).
    import math

    train = df.union(
        spark.createDataFrame([Row(doc_id=200, text="extra en", lang="en")])
    )
    test = spark.createDataFrame([Row(doc_id=300, text="", lang="en")])
    model = train_nb(train)
    [row] = nb_predict(model, test).collect()
    assert row.pred_label == "en"
    assert row.score_micro == round(math.log(5 / 9) * 1_000_000)


def test_gram_paths_agree_on_multibyte(spark):
    """The expression-level char_ngrams and _doc_grams' staged
    split-once path must produce identical grams, including multi-byte
    code points."""
    import pyspark.sql.functions as F

    from llm_data_pipeline_spark.operators.nb_classify import _doc_grams

    rows = [
        Row(doc_id=0, text="héllo wörld"),
        Row(doc_id=1, text="你好世界欢迎"),
        Row(doc_id=2, text="ab"),
        Row(doc_id=3, text=""),
    ]
    df = spark.createDataFrame(rows)
    slow = (
        df.select(
            "doc_id",
            F.explode(char_ngrams(F.lower(F.col("text")), 3)).alias("gram"),
        )
        .collect()
    )
    fast = _doc_grams(df, "text", "doc_id", 3).collect()
    assert sorted((r.doc_id, r.gram) for r in slow) == sorted(
        (r.doc_id, r.gram) for r in fast
    )

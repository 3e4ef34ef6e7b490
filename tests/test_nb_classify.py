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


def test_case_expanding_unicode_gram_count(spark):
    """U+0130 lowercases to two code points: the per-doc gram count must
    follow the LOWERED text the grams are extracted from, or the
    smoothing term diverges from the model's gram stream (and from the
    DuckDB oracle, which counts over lower(text))."""
    from llm_data_pipeline_spark.operators.nb_classify import (
        _doc_grams,
        nb_predict,
        train_nb,
    )
    import pyspark.sql.functions as F

    text = "İstanbul"  # 8 code points; lowers to 9
    docs = spark.createDataFrame(
        [(0, text, "tr"), (1, "plain text here", "en")],
        "doc_id long, text string, lang string",
    )
    n_grams = _doc_grams(docs, "text", "doc_id", 3).where("doc_id = 0").count()
    model = train_nb(docs)
    out = nb_predict(model, docs.where("doc_id = 0"))
    # reconstruct g from the score identity: with every gram seen in
    # training, score = prior + seen - g*lntv; easier: check the internal
    # contract directly
    g = (
        docs.where("doc_id = 0")
        .select(F.greatest(F.length(F.lower("text")) - F.lit(2), F.lit(0)))
        .collect()[0][0]
    )
    assert n_grams == g == 7
    assert out.count() == 1  # and the pipeline runs end to end


def test_gramless_class_keeps_its_prior(spark):
    """A class whose training docs are all shorter than n chars must stay
    in the model with T=0 smoothing, not vanish."""
    from llm_data_pipeline_spark.operators.nb_classify import (
        nb_predict,
        train_nb,
    )

    docs = spark.createDataFrame(
        [(0, "normal english text", "en"), (1, "ab", "xx"), (2, "cd", "xx")],
        "doc_id long, text string, lang string",
    )
    model = train_nb(docs)
    labels = {r["label"] for r in model["classes"].collect()}
    assert labels == {"en", "xx"}
    # an empty test doc scores prior only -> majority class 'xx' wins
    test = spark.createDataFrame([(10, "")], "doc_id long, text string")
    pred = nb_predict(model, test).collect()[0]
    assert pred["pred_label"] == "xx"

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from llm_data_pipeline_spark.functions.text import CleanThresholds
from llm_data_pipeline_spark.operators.clean import score_documents, split_kept

RULES = CleanThresholds(min_chars=10, max_chars=100, min_lines_for_dup=3)


def _score(spark, texts, rules=RULES):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    return score_documents(df, rules=rules).orderBy("doc_id").collect()


def test_too_short_and_too_long(spark):
    rows = _score(spark, ["hi", "x" * 200, "a decent length text here"])
    assert rows[0].drop_reason == "too_short"
    assert rows[1].drop_reason == "too_long"
    assert rows[2].drop_reason == "ok" and rows[2].kept


def test_sparse_and_punct(spark):
    # mostly whitespace -> too_sparse
    sparse = "a   " * 10
    # mostly punctuation -> low_language_signal fires first (alpha ratio low)
    punct = "!!!???;;;###$$$%%%^^^&&&"
    rows = _score(spark, [sparse, punct])
    assert rows[0].drop_reason == "too_sparse"
    assert rows[1].drop_reason == "low_language_signal"


def test_punct_rule_fires_when_alpha_ok(spark):
    # enough letters to pass alpha ratio, but >25% punctuation
    t = "abcdefgh!!!!" * 3  # 8 alpha, 4 punct per repeat -> 33% punct
    rows = _score(spark, [t])
    assert rows[0].drop_reason == "too_much_punct"


def test_dup_lines(spark):
    t = "\n".join(["same line here"] * 6)
    rows = _score(spark, [t])
    assert rows[0].drop_reason == "dup_lines"
    assert rows[0].m_dup_line == 1.0


def test_dup_line_ratio_below_min_lines(spark):
    t = "one line\nsame\nsame"  # only 3 lines < min 3? (min_lines=3 -> applies)
    rules = CleanThresholds(min_chars=5, min_lines_for_dup=5)
    rows = _score(spark, [t], rules)
    assert rows[0].m_dup_line == 0.0


def test_normalization_applied(spark):
    t = "start here ok\r\n\r\n\r\n\r\nend line ok"
    rows = _score(spark, [t])
    assert "\r" not in rows[0].text
    assert "\n\n\n" not in rows[0].text


def test_null_text(spark):
    df = spark.createDataFrame([Row(doc_id=1, text=None)], "doc_id int, text string")
    r = score_documents(df, rules=RULES).collect()[0]
    assert r.drop_reason == "too_short" and not r.kept


def test_split_kept(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a good enough document right here"),
         Row(doc_id=2, text="no")]
    )
    scored = score_documents(df, rules=RULES)
    kept, dropped = split_kept(scored)
    assert kept.count() == 1 and dropped.count() == 1


def test_cjk_counts_as_language_signal(spark):
    t = "这是一个足够长的中文文档内容示例这是一个足够长的中文文档内容示例"
    rows = _score(spark, [t])
    assert rows[0].kept, rows[0]
    assert rows[0].m_alpha_cjk > 0.9

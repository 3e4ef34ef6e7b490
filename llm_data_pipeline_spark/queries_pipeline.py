"""Pipeline-operator queries over the ``documents`` table (clean stage).

The oracle SQL strings are generated from the same regex constants the Spark
implementation uses (functions/text.py), so the two sides can only diverge on
engine semantics, not on transcription mistakes.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from llm_data_pipeline_spark.functions import text as T
from llm_data_pipeline_spark.operators.clean import (
    drop_reason_distribution,
    score_documents,
)
from llm_data_pipeline_spark.queries import query, table

# ---------------------------------------------------------------------------
# Shared SQL fragments (DuckDB dialect) mirroring functions/text.py
# ---------------------------------------------------------------------------

NORM_SQL = (
    "regexp_replace(trim(regexp_replace(regexp_replace(coalesce(text, ''), "
    "'\\r\\n', chr(10), 'g'), '\\r', chr(10), 'g')), "
    "'\\n{3,}', chr(10) || chr(10), 'g')"
)


def _cnt(expr: str, char_class: str) -> str:
    # DuckDB standard strings keep backslashes literal, so \S / \w / \s pass
    # through to RE2 unescaped — same pattern text Spark's Java regex sees.
    return f"(length({expr}) - length(regexp_replace({expr}, '{char_class}', '', 'g')))"


def _ratio(expr: str, char_class: str) -> str:
    return (
        f"CASE WHEN length({expr}) > 0 "
        f"THEN {_cnt(expr, char_class)} / length({expr}) ELSE 0.0 END"
    )


_R = T.CleanThresholds()

CLEAN_METRICS_SQL = f"""
WITH normed AS (
  SELECT doc_id, {NORM_SQL} AS t FROM documents
), lined AS (
  SELECT doc_id, t,
         list_filter(list_transform(string_split(t, chr(10)), x -> trim(x)),
                     x -> x <> '') AS lines
  FROM normed
), m AS (
  SELECT doc_id, t,
         {_ratio('t', T.NON_WS_CLASS)} AS m_non_ws,
         {_ratio('t', T.ALPHA_CLASS)} + {_ratio('t', T.CJK_CLASS)} AS m_alpha_cjk,
         {_ratio('t', T.PUNCT_CLASS)} AS m_punct,
         CASE WHEN len(lines) < {_R.min_lines_for_dup} THEN 0.0
              ELSE len(list_filter(lines,
                       l -> len(list_filter(lines, x -> x = l)) > 1))
                   / greatest(len(lines), 1) END AS m_dup_line
  FROM lined
), judged AS (
  SELECT doc_id, m_non_ws, m_alpha_cjk, m_punct, m_dup_line,
         CASE WHEN length(t) < {_R.min_chars} THEN 'too_short'
              WHEN length(t) > {_R.max_chars} THEN 'too_long'
              WHEN m_non_ws < {_R.min_non_ws_ratio} THEN 'too_sparse'
              WHEN m_alpha_cjk < {_R.min_alpha_cjk_ratio} THEN 'low_language_signal'
              WHEN m_punct > {_R.max_punct_ratio} THEN 'too_much_punct'
              WHEN m_dup_line > {_R.max_dup_line_ratio} THEN 'dup_lines'
              ELSE 'ok' END AS drop_reason
  FROM m
)
"""

# NOTE on m_alpha_cjk: the Spark side computes (alpha_cnt + cjk_cnt) / n in one
# division; the SQL above sums two ratios. For bit-exactness the SQL must
# match, so we express it as a single division too:
CLEAN_METRICS_SQL = CLEAN_METRICS_SQL.replace(
    f"{_ratio('t', T.ALPHA_CLASS)} + {_ratio('t', T.CJK_CLASS)}",
    (
        f"CASE WHEN length(t) > 0 THEN "
        f"({_cnt('t', T.ALPHA_CLASS)} + {_cnt('t', T.CJK_CLASS)}) / length(t) "
        f"ELSE 0.0 END"
    ),
)


@query(
    "clean_judge",
    oracle=CLEAN_METRICS_SQL
    + """
SELECT doc_id,
       (drop_reason = 'ok') AS kept,
       drop_reason, m_non_ws, m_alpha_cjk, m_punct, m_dup_line
FROM judged
ORDER BY doc_id
""",
    tags=("pipeline", "clean"),
)
def clean_judge(spark: SparkSession, sf_dir: str):
    docs = table(spark, sf_dir, "documents", scatter=True)
    scored = score_documents(docs)
    return scored.select(
        "doc_id", "kept", "drop_reason", "m_non_ws", "m_alpha_cjk", "m_punct", "m_dup_line"
    ).orderBy("doc_id")


@query(
    "clean_reason_distribution",
    oracle=CLEAN_METRICS_SQL
    + """
SELECT drop_reason, count(*) AS n_docs
FROM judged
GROUP BY drop_reason
ORDER BY drop_reason
""",
    tags=("pipeline", "clean", "aggregation"),
)
def clean_reason_distribution(spark: SparkSession, sf_dir: str):
    docs = table(spark, sf_dir, "documents", scatter=True)
    return drop_reason_distribution(score_documents(docs)).orderBy("drop_reason")


@query(
    "basic_clean_normalize",
    oracle=f"""
SELECT doc_id, {NORM_SQL} AS norm_text
FROM documents
ORDER BY doc_id
""",
    tags=("pipeline", "clean"),
)
def basic_clean_normalize(spark: SparkSession, sf_dir: str):
    docs = table(spark, sf_dir, "documents", scatter=True)
    return docs.select(
        "doc_id", T.basic_clean(F.coalesce(F.col("text"), F.lit(""))).alias("norm_text")
    ).orderBy("doc_id")

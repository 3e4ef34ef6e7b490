"""End-to-end pipeline composition query: clean -> quality -> pii in one
DataFrame chain, graded against one composed SQL oracle.

Each stage already has its own graded query; this one pins the
INTEGRATION semantics the reference's DAG relies on (pipeline.py:85-95
step order): quality only sees clean survivors, pii only redacts quality
survivors, and the text each stage consumes is the ORIGINAL text (clean
normalizes only for scoring). The oracle is the composition of the three
stage oracles over chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from llm_data_pipeline_spark.functions import pii as P
from llm_data_pipeline_spark.operators.clean import score_documents
from llm_data_pipeline_spark.operators.quality import run_quality
from llm_data_pipeline_spark.queries import query, table
from llm_data_pipeline_spark.queries_pii import PAYLOAD_SQL, _payload_spark, _redact_sql
from llm_data_pipeline_spark.queries_pipeline import CLEAN_METRICS_SQL
from llm_data_pipeline_spark.queries_text import (
    TEXT_BASE_SQL,
    _lang_case,
    _LANG_SCORE,
)

_PIPELINE_SQL = (
    CLEAN_METRICS_SQL
    + """
, clean_kept AS (
  SELECT d.doc_id, d.text
  FROM documents d JOIN judged j USING (doc_id)
  WHERE j.drop_reason = 'ok'
),
"""
    + TEXT_BASE_SQL.strip().replace("FROM documents", "FROM clean_kept")
    + f"""
, scored AS (
  SELECT doc_id, {_lang_case()} AS lang_pred, {_LANG_SCORE} AS lang_score
  FROM feat
),
q_kept AS (
  SELECT s.doc_id, s.lang_pred, s.lang_score, c.text
  FROM scored s JOIN clean_kept c USING (doc_id)
  WHERE s.lang_pred IN ('zh', 'en') AND s.lang_score >= 0.05
),
piid AS (
  SELECT doc_id, lang_pred, lang_score,
         CASE WHEN doc_id % 3 = 0 THEN {PAYLOAD_SQL} || coalesce(text, '')
              ELSE coalesce(text, '') END AS t
  FROM q_kept
)
SELECT doc_id, lang_pred, lang_score,
       md5({_redact_sql("t")}) AS redacted_md5
FROM piid
ORDER BY doc_id
"""
)


@query(
    "pipeline_clean_quality_pii",
    oracle=_PIPELINE_SQL,
    tags=("pipeline", "e2e", "clean", "quality", "pii"),
)
def pipeline_clean_quality_pii(spark: SparkSession, sf_dir: str):
    """Three pipeline stages chained exactly as the orchestrator runs them
    (core/pipeline.py): clean scoring + keep filter, the staged LID
    quality keep, then structured PII redaction (deterministic payload on
    every third doc so the regex chain has real work), with the final
    redacted text pinned by md5."""
    docs = table(spark, sf_dir, "documents", scatter=True)
    cleaned = score_documents(docs).where(F.col("kept")).select("doc_id", "text")
    # threshold 0.05: the synthetic word-soup corpus tops out at
    # lang_score ~0.17 (few stopwords), so the production default 0.4
    # would grade an empty composition; 0.05 keeps ~half the 'en' docs
    # and the full three-stage flow stays non-trivial at every sf
    q = run_quality(cleaned, keep_only=True, threshold=0.05)
    aug = q.select(
        "doc_id",
        "lang_pred",
        "lang_score",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(_payload_spark(), F.coalesce(F.col("text"), F.lit(""))),
        )
        .otherwise(F.coalesce(F.col("text"), F.lit("")))
        .alias("t"),
    )
    return aug.select(
        "doc_id",
        "lang_pred",
        "lang_score",
        F.md5(P.redact_structured(F.col("t"))).alias("redacted_md5"),
    ).orderBy("doc_id")

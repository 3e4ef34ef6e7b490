"""PII-stage queries with DuckDB oracles.

The synthetic documents table contains no digits/uppercase, so raw text
never triggers the PII patterns. To make the oracle comparison exercise the
regex dialects for real, these queries append a deterministic PII payload
derived from ``doc_id`` (same expression on both engines) before redacting.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from llm_data_pipeline_spark.functions import pii as P
from llm_data_pipeline_spark.queries import query, table

# ---------------------------------------------------------------------------
# deterministic PII payload (Spark + SQL twins)
# ---------------------------------------------------------------------------


def _payload_spark() -> F.Column:
    i = F.col("doc_id")
    return F.concat(
        F.lit("Contact John Smith: user"),
        i.cast("string"),
        F.lit("@example.com ip 10.0."),
        (i % 256).cast("string"),
        F.lit(".7 tel 212-555-"),
        F.lpad((i % 10000).cast("string"), 4, "0"),
        F.lit(" ssn 123-45-6789 v6 2001:db8::1 联系我 "),
    )


PAYLOAD_SQL = (
    "'Contact John Smith: user' || CAST(doc_id AS VARCHAR) || '@example.com ip 10.0.' "
    "|| CAST(doc_id % 256 AS VARCHAR) || '.7 tel 212-555-' "
    "|| lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') "
    "|| ' ssn 123-45-6789 v6 2001:db8::1 联系我 '"
)


def _redact_sql(expr: str) -> str:
    out = expr
    for pat, repl in P.REDACTIONS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


@query(
    "pii_redact_structured",
    oracle=f"""
WITH aug AS (
  SELECT doc_id, {PAYLOAD_SQL} || coalesce(text, '') AS t FROM documents
)
SELECT doc_id, {_redact_sql('t')} AS redacted
FROM aug
ORDER BY doc_id
""",
    tags=("pipeline", "pii"),
)
def pii_redact_structured(spark: SparkSession, sf_dir: str):
    docs = table(spark, sf_dir, "documents", scatter=True)
    aug = docs.select(
        "doc_id",
        F.concat(_payload_spark(), F.coalesce(F.col("text"), F.lit(""))).alias("t"),
    )
    return aug.select(
        "doc_id", P.redact_structured(F.col("t")).alias("redacted")
    ).orderBy("doc_id")


@query(
    "pii_gating_flags",
    oracle=f"""
WITH aug AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 3 = 0 THEN {PAYLOAD_SQL} || coalesce(text, '')
              ELSE coalesce(text, '') END AS t
  FROM documents
)
SELECT doc_id,
       regexp_matches(t, '{P.EMAIL_RE}') AS pii_has_email,
       regexp_matches(t, '{P.IPV4_RE}')  AS pii_has_ip4,
       regexp_matches(t, '{P.IPV6_RE}')  AS pii_has_ip6,
       regexp_matches(t, '{P.PHONE_RE}') AS pii_has_phone,
       regexp_matches(t, '{P.SSN_RE}')   AS pii_has_ssn,
       (regexp_matches(t, '{P.EMAIL_RE}') OR regexp_matches(t, '{P.IPV4_RE}')
        OR regexp_matches(t, '{P.IPV6_RE}') OR regexp_matches(t, '{P.PHONE_RE}')
        OR regexp_matches(t, '{P.SSN_RE}') OR contains(t, '@')
        OR regexp_matches(t, '{P.CONTACT_KW_RE}')
        OR regexp_matches(t, '{P.NAME_SHAPE_EN_RE}')) AS need_ner,
       CASE WHEN lang IS NOT NULL AND length(lang) >= 2 THEN lower(substr(lang, 1, 2))
            WHEN regexp_matches(t, '{P.CJK_ANY_RE}') THEN 'zh' ELSE 'en' END AS ner_lang
FROM aug
ORDER BY doc_id
""",
    tags=("pipeline", "pii"),
)
def pii_gating_flags(spark: SparkSession, sf_dir: str):
    docs = table(spark, sf_dir, "documents", scatter=True)
    aug = docs.select(
        "doc_id",
        "lang",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(_payload_spark(), F.coalesce(F.col("text"), F.lit(""))),
        )
        .otherwise(F.coalesce(F.col("text"), F.lit("")))
        .alias("t"),
    )
    t = F.col("t")
    flags = P.pii_flags(t)
    return aug.select(
        "doc_id",
        *[c.alias(n) for n, c in flags.items()],
        P.need_ner(t).alias("need_ner"),
        P.ner_lang(t, F.col("lang")).alias("ner_lang"),
    ).orderBy("doc_id")


@query(
    "pii_gate_rate_by_lang",
    oracle=f"""
WITH aug AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 3 = 0 THEN {PAYLOAD_SQL} || coalesce(text, '')
              ELSE coalesce(text, '') END AS t
  FROM documents
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN (regexp_matches(t, '{P.EMAIL_RE}') OR regexp_matches(t, '{P.IPV4_RE}')
        OR regexp_matches(t, '{P.IPV6_RE}') OR regexp_matches(t, '{P.PHONE_RE}')
        OR regexp_matches(t, '{P.SSN_RE}') OR contains(t, '@')
        OR regexp_matches(t, '{P.CONTACT_KW_RE}')
        OR regexp_matches(t, '{P.NAME_SHAPE_EN_RE}')) THEN 1 ELSE 0 END) AS BIGINT) AS n_gated
FROM aug
GROUP BY lang
ORDER BY lang
""",
    tags=("pipeline", "pii", "aggregation"),
)
def pii_gate_rate_by_lang(spark: SparkSession, sf_dir: str):
    docs = table(spark, sf_dir, "documents", scatter=True)
    aug = docs.select(
        "lang",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(_payload_spark(), F.coalesce(F.col("text"), F.lit(""))),
        )
        .otherwise(F.coalesce(F.col("text"), F.lit("")))
        .alias("t"),
    )
    return (
        aug.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(P.need_ner(F.col("t")).cast("int")).alias("n_gated"),
        )
        .orderBy("lang")
    )


@query(
    "pii_full_stage_with_ner_fallback",
    oracle=f"""
WITH aug AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 3 = 0 THEN {PAYLOAD_SQL} || coalesce(text, '')
              ELSE coalesce(text, '') END AS t
  FROM documents
), g AS (
  SELECT doc_id, lang, t,
         (regexp_matches(t, '{P.EMAIL_RE}') OR regexp_matches(t, '{P.IPV4_RE}')
          OR regexp_matches(t, '{P.IPV6_RE}') OR regexp_matches(t, '{P.PHONE_RE}')
          OR regexp_matches(t, '{P.SSN_RE}') OR contains(t, '@')
          OR regexp_matches(t, '{P.CONTACT_KW_RE}')
          OR regexp_matches(t, '{P.NAME_SHAPE_EN_RE}')) AS need_ner,
         CASE WHEN lang IS NOT NULL AND length(lang) >= 2 THEN lower(substr(lang, 1, 2))
              WHEN regexp_matches(t, '{P.CJK_ANY_RE}') THEN 'zh' ELSE 'en' END AS ner_lang
  FROM aug
), r AS (
  SELECT doc_id, need_ner, ner_lang, {_redact_sql('t')} AS rt FROM g
)
SELECT doc_id,
       CASE WHEN need_ner AND ner_lang IN ('en', 'zh')
            THEN regexp_replace(rt, '{P.NAME_SHAPE_EN_RE}', '<NAME>', 'g')
            ELSE rt END AS redacted
FROM r
ORDER BY doc_id
""",
    tags=("pipeline", "pii", "ner"),
)
def pii_full_stage_with_ner_fallback(spark: SparkSession, sf_dir: str):
    """The whole PII stage (C7-C10): structured redaction + NER gating +
    gated slow-path name redaction + union, end to end. In this
    environment the slow path is the deterministic name-shape fallback
    (Presidio absent), which the oracle replays — hash-checking the
    split/process/union plumbing, the gating logic, and both regex
    dialects at once."""
    from llm_data_pipeline_spark.operators.pii import run_pii

    docs = table(spark, sf_dir, "documents", scatter=True)
    aug = docs.select(
        "doc_id",
        "lang",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(_payload_spark(), F.coalesce(F.col("text"), F.lit(""))),
        )
        .otherwise(F.coalesce(F.col("text"), F.lit("")))
        .alias("text"),
    )
    out = run_pii(aug, lang_col="lang", enable_person_ner=True)
    return out.select("doc_id", F.col("text").alias("redacted")).orderBy("doc_id")

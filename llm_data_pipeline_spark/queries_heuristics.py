"""Graded queries: within-document repetition / quality heuristics
(Gopher & RefinedWeb filter family) over the documents table.

Signals are exact rational arithmetic (see functions/repetition.py), so
the oracles replay them bit-identically with plain SQL over unnested
n-grams — no float-summation hazards anywhere.

Thresholds are tuned to split THIS corpus (a ~40-word vocabulary word
soup has naturally high bigram repetition): the point of the graded
query is the signal computation and the cascade shape, not Gopher's web
constants, which are documented alongside.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from llm_data_pipeline_spark.functions.repetition import add_repetition_signals
from llm_data_pipeline_spark.queries import query, table

# Gopher (web text) uses 0.20/0.18/0.16 for top-2/3/4-gram char coverage
# and ~0.15 for duplicated 5-grams; this corpus's tiny vocabulary shifts
# the distributions right, so the graded cascade uses corpus-calibrated
# cuts that actually partition the data (sf0.01: keep=190/500; each of
# top2/diversity/run rejects docs — 129/172/25. dup5 never fires on this
# synthetic corpus — random word soup has no repeated 5-grams — but stays
# in the cascade: it is the live RefinedWeb rule for real web text).
TOP2_MAX = 0.09
DUP5_MAX = 0.04
RUN_MAX = 2
DIVERSITY_MIN = 0.40

_NORM_TOKS = (
    "list_filter(string_split(trim(regexp_replace(lower(coalesce(text, '')),"
    " '\\s+', ' ', 'g')), ' '), x -> x <> '')"
)


def _grams_sql(n: int) -> str:
    return (
        f"CASE WHEN len(toks) < {n} THEN []::VARCHAR[] "
        f"ELSE list_transform(range(len(toks) - {n} + 1), "
        f"i -> array_to_string(toks[i+1:i+{n}], ' ')) END"
    )


_SIGNALS_CTE = f"""
toks AS (
  SELECT doc_id, source, {_NORM_TOKS} AS toks FROM documents
),
base AS (
  SELECT doc_id, source, toks,
         {_grams_sql(2)} AS g2,
         {_grams_sql(5)} AS g5,
         length(array_to_string(toks, ' ')) AS text_len
  FROM toks
),
counts2 AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, unnest(g2) AS g FROM base)
  GROUP BY doc_id, g
),
top2 AS (
  SELECT doc_id, max(c) AS top_c FROM counts2 GROUP BY doc_id
),
topg2 AS (
  SELECT c.doc_id, t.top_c, max(c.g) AS top_g
  FROM counts2 c JOIN top2 t ON t.doc_id = c.doc_id AND c.c = t.top_c
  GROUP BY c.doc_id, t.top_c
),
idx AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
         j -> struct_pack(w := toks[j], i := j))) AS s
  FROM base
),
runs AS (
  SELECT doc_id, s.w AS w, s.i AS i,
         s.i - row_number() OVER (PARTITION BY doc_id, s.w ORDER BY s.i)
           AS grp
  FROM idx
),
runlen AS (
  SELECT doc_id, max(n) AS max_run
  FROM (SELECT doc_id, w, grp, count(*) AS n FROM runs GROUP BY doc_id, w, grp)
  GROUP BY doc_id
),
signals AS (
  SELECT b.doc_id, b.source,
         CASE WHEN b.text_len > 0
              THEN CAST(coalesce(t.top_c, 0) * length(coalesce(t.top_g, ''))
                        AS DOUBLE) / b.text_len
              ELSE 0.0 END AS top2_frac,
         CASE WHEN len(b.g5) > 0
              THEN CAST(len(b.g5) - len(list_distinct(b.g5)) AS DOUBLE)
                   / len(b.g5)
              ELSE 0.0 END AS dup5_frac,
         CAST(coalesce(r.max_run, 0) AS INT) AS max_run,
         CASE WHEN len(b.toks) > 0
              THEN CAST(len(list_distinct(b.toks)) AS DOUBLE) / len(b.toks)
              ELSE 0.0 END AS diversity
  FROM base b
  LEFT JOIN topg2 t ON t.doc_id = b.doc_id
  LEFT JOIN runlen r ON r.doc_id = b.doc_id
),
judged AS (
  SELECT *,
         (top2_frac <= {TOP2_MAX} AND dup5_frac <= {DUP5_MAX}
          AND max_run <= {RUN_MAX} AND diversity >= {DIVERSITY_MIN}) AS keep
  FROM signals
)
"""


@query(
    "repetition_signals",
    oracle=f"""
    WITH {_SIGNALS_CTE.strip()}
    SELECT doc_id, top2_frac, dup5_frac, max_run, diversity, keep
    FROM judged
    ORDER BY doc_id
    """,
    tags=("heuristics", "quality"),
)
def repetition_signals(spark: SparkSession, sf_dir: str):
    """Per-document repetition signals + Gopher-style keep cascade.

    One narrow codegen'd map over the scan — no shuffle, no UDF; at
    100 TB this is the same shape as the reference's clean stage
    (clean/rules.py): embarrassingly parallel per-document compute.
    """
    docs = table(spark, sf_dir, "documents", scatter=True)
    sig = add_repetition_signals(docs, "text").select(
        "doc_id", "top2_frac", "dup5_frac", "max_run", "diversity"
    )
    return sig.withColumn(
        "keep",
        (F.col("top2_frac") <= TOP2_MAX)
        & (F.col("dup5_frac") <= DUP5_MAX)
        & (F.col("max_run") <= RUN_MAX)
        & (F.col("diversity") >= DIVERSITY_MIN),
    ).orderBy("doc_id")


@query(
    "repetition_filter_by_source",
    oracle=f"""
    WITH {_SIGNALS_CTE.strip()}
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
             AS keep_rate
    FROM judged
    GROUP BY source
    ORDER BY source
    """,
    tags=("heuristics", "quality", "agg"),
)
def repetition_filter_by_source(spark: SparkSession, sf_dir: str):
    """Keep-rate of the repetition cascade per source — the per-corpus
    yield report a curation run emits before mixing (int/int division,
    engine-exact)."""
    docs = table(spark, sf_dir, "documents", scatter=True)
    judged = add_repetition_signals(docs, "text").select(
        "source",
        (
            (F.col("top2_frac") <= TOP2_MAX)
            & (F.col("dup5_frac") <= DUP5_MAX)
            & (F.col("max_run") <= RUN_MAX)
            & (F.col("diversity") >= DIVERSITY_MIN)
        ).alias("keep"),
    )
    return (
        judged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("keep").cast("int")).alias("n_kept"),
        )
        .withColumn(
            "keep_rate",
            F.col("n_kept").cast("double") / F.col("n_docs").cast("double"),
        )
        .orderBy("source")
    )

"""Graded queries: user-function registration surface (UDF/UDAF/UDTF).

Each query registers the functions and then uses them FROM SQL (not the
DataFrame API), so what is verified is the registration path end to end:
scalar pandas UDF in a projection, grouped-agg pandas UDF in GROUP BY, and
a Python UDTF in LATERAL position. Oracles re-derive the same results with
DuckDB primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from llm_data_pipeline_spark.functions.registry import register_all
from llm_data_pipeline_spark.queries import query, table


def _setup(spark: SparkSession, sf_dir: str, name: str, view: str) -> None:
    register_all(spark)
    table(spark, sf_dir, name).createOrReplaceTempView(view)


@query(
    "udtf_chunk_text",
    oracle=r"""
    WITH words AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(coalesce(text, '')), '\s+'),
                         w -> w <> '') AS ws
      FROM documents
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_idx,
           array_to_string(list_slice(ws, i * 10 + 1, i * 10 + 10), ' ') AS chunk,
           CAST(least(10, len(ws) - i * 10) AS INT) AS n_words
    FROM words, unnest(range((len(ws) + 9) // 10)) t(i)
    ORDER BY doc_id, chunk_idx
    """,
    tags=("udf-surface", "udtf"),
)
def udtf_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF in LATERAL position: passage windowing (10-word chunks,
    one row per chunk)."""
    _setup(spark, sf_dir, "documents", "documents_v")
    return spark.sql(
        """
        SELECT doc_id, chunk_idx, chunk, n_words
        FROM documents_v, LATERAL chunk_text(text, 10)
        ORDER BY doc_id, chunk_idx
        """
    )


@query(
    "udaf_geomean_price",
    oracle="""
    SELECT l_returnflag,
           round(exp(avg(ln(l_extendedprice))), 4) AS geo_price
    FROM lineitem
    WHERE l_extendedprice > 0
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("udf-surface", "udaf"),
)
def udaf_geomean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (UDAF) in SQL GROUP BY: geometric mean price
    per return flag; oracle uses the exp(avg(ln)) identity. (Spark forbids
    mixing grouped-agg pandas UDFs with built-in aggregates in one
    aggregation, so the UDAF stands alone here.)"""
    _setup(spark, sf_dir, "lineitem", "lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag,
               round(geomean(l_extendedprice), 4) AS geo_price
        FROM lineitem_v
        WHERE l_extendedprice > 0
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@query(
    "udf_word_share",
    oracle=r"""
    WITH words AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(coalesce(text, '')), '\s+'),
                         w -> w <> '') AS ws
      FROM documents
    )
    SELECT doc_id,
           round(CASE WHEN len(ws) = 0 THEN 0.0
                      ELSE len(list_filter(ws, w -> regexp_matches(w, '^[A-Za-z]+$')))
                           / len(ws) END, 6) AS alpha_share
    FROM words
    ORDER BY doc_id
    """,
    tags=("udf-surface", "scalar-udf"),
)
def udf_word_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Arrow-batched pandas UDF from SQL: alphabetic-token share."""
    _setup(spark, sf_dir, "documents", "documents_v")
    return spark.sql(
        """
        SELECT doc_id, round(word_share(text), 6) AS alpha_share
        FROM documents_v
        ORDER BY doc_id
        """
    )

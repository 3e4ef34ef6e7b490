"""Graded queries: corpus keyword search (BM25 family) over documents.

A training-data curation stack needs targeted retrieval ("pull the docs
that mention X") alongside embedding ANN; BM25 is the standard lexical
scorer. The graded variant uses the *rational-idf* form — the classic
``(N - df + 0.5) / (df + 0.5)`` without the final ``ln`` — because both
engines evaluate +,*,/ as correctly-rounded IEEE doubles (bit-identical)
while ``ln`` carries a 1-ulp cross-library hazard. The rational form is
strictly monotone in the log form, so ranking (the thing BM25 is for) is
unchanged; only the score scale differs. k1 = 1.2, b = 0.75.

Plan shape at 100 TB: term frequencies come straight off the token array
(one narrow map — no posting-list join needed for a fixed query), corpus
statistics (N, total length, per-term document frequencies) are ONE
1-row aggregate broadcast back, and the final top-k is a TakeOrdered.
Nothing wider than the doc scan ever shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from llm_data_pipeline_spark.queries import query, table

K1 = 1.2
B = 0.75
TERMS = ("table", "hash", "row")
TOP_N = 25

_NORM_TOKS = (
    "list_filter(string_split(trim(regexp_replace(lower(coalesce(text, '')),"
    " '\\s+', ' ', 'g')), ' '), x -> x <> '')"
)


def _toks(text: Column) -> Column:
    norm = F.trim(
        F.regexp_replace(F.lower(F.coalesce(text, F.lit(""))), r"\s+", " ")
    )
    return F.filter(F.split(norm, " "), lambda x: x != "")


def _term_score_sql(t: str) -> str:
    """One term's BM25 contribution (DuckDB side), 0 when absent."""
    return (
        f"CASE WHEN tf_{t} > 0 THEN "
        f"((n_docs - df_{t} + 0.5) / (df_{t} + 0.5)) * "
        f"(tf_{t} * ({K1} + 1.0)) / "
        f"(tf_{t} + {K1} * (1.0 - {B} + {B} * dl / avgdl)) "
        f"ELSE 0.0 END"
    )


def _term_score_col(t: str) -> Column:
    tf = F.col(f"tf_{t}").cast("double")
    df_t = F.col(f"df_{t}").cast("double")
    n = F.col("n_docs").cast("double")
    dl = F.col("dl").cast("double")
    return F.when(
        F.col(f"tf_{t}") > 0,
        ((n - df_t + F.lit(0.5)) / (df_t + F.lit(0.5)))
        * (tf * F.lit(K1 + 1.0))
        / (tf + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dl / F.col("avgdl"))),
    ).otherwise(F.lit(0.0))


@query(
    "bm25_keyword_search",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, toks, len(toks) AS dl,
             {', '.join(f"len(list_filter(toks, x -> x = '{t}')) AS tf_{t}" for t in TERMS)}
      FROM (SELECT doc_id, {_NORM_TOKS} AS toks FROM documents)
    ),
    stats AS (
      SELECT count(*) AS n_docs,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
             {', '.join(f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}" for t in TERMS)}
      FROM tf
    ),
    scored AS (
      SELECT doc_id,
             round({' + '.join(f"({_term_score_sql(t)})" for t in TERMS)}, 6) AS score
      FROM tf, stats
    )
    SELECT doc_id, score FROM scored
    WHERE score > 0
    ORDER BY score DESC, doc_id
    LIMIT {TOP_N}
    """,
    tags=("search", "ranking"),
)
def bm25_keyword_search(spark: SparkSession, sf_dir: str):
    """Top-25 documents for the fixed query {table, hash, row} under
    rational-idf BM25. Scores are rounded to 6dp on both engines before the
    order/cut (raw doubles agree only to ~1 ulp across engines)."""
    docs = table(spark, sf_dir, "documents", scatter=True).select(
        "doc_id", _toks(F.col("text")).alias("toks")
    )
    def term_count(t: str) -> Column:
        # NB: a `lambda x, t=t:` default-arg closure would be read by
        # F.filter as its two-arg (element, index) form — the index would
        # silently replace t. Close over t with a factory instead.
        return F.size(F.filter(F.col("toks"), lambda x: x == F.lit(t)))

    tf = docs.select(
        "doc_id",
        F.size("toks").alias("dl"),
        *[term_count(t).alias(f"tf_{t}") for t in TERMS],
    )
    stats = tf.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("int")).alias(f"df_{t}")
            for t in TERMS
        ],
    )
    score = None
    for t in TERMS:
        s = _term_score_col(t)
        score = s if score is None else score + s
    # Round to 6dp BEFORE the order/cut: the raw doubles agree with DuckDB
    # only to ~1 ulp (operand evaluation order differs inside the term
    # quotients), and ordering by the rounded score makes the top-N cut
    # itself deterministic across engines (ties broken by doc_id).
    return (
        tf.crossJoin(F.broadcast(stats))
        .select("doc_id", F.round(score, 6).alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.desc("score"), "doc_id")
        .limit(TOP_N)
    )


_RRF_K = 60
_RRF_TOP = 10
_DENSE_ANCHOR = 0  # vec_id whose embedding is the dense twin of the query


def _rrf_contrib_sql(rank: str) -> str:
    """Integer-micro RRF contribution round(1e6 / (k + rank))."""
    return f"(1000000 + ({_RRF_K} + {rank}) // 2) // ({_RRF_K} + {rank})"


@query(
    "hybrid_search_rrf",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, toks, len(toks) AS dl,
             {', '.join(f"len(list_filter(toks, x -> x = '{t}')) AS tf_{t}" for t in TERMS)}
      FROM (SELECT doc_id, {_NORM_TOKS} AS toks FROM documents)
    ),
    stats AS (
      SELECT count(*) AS n_docs,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
             {', '.join(f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}" for t in TERMS)}
      FROM tf
    ),
    lex AS (
      SELECT doc_id, rank FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        FROM (
          SELECT doc_id,
                 round({' + '.join(f"({_term_score_sql(t)})" for t in TERMS)},
                       6) AS score
          FROM tf, stats
        ) WHERE score > 0
      ) WHERE rank <= {TOP_N}
    ),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    anchor AS (SELECT v AS av FROM e WHERE vec_id = {_DENSE_ANCHOR}),
    dense AS (
      SELECT vec_id AS doc_id, rank FROM (
        SELECT e.vec_id,
               row_number() OVER (
                 ORDER BY round(CASE
                   WHEN sqrt(list_dot_product(av, av)) > 0
                    AND sqrt(list_dot_product(e.v, e.v)) > 0
                   THEN list_dot_product(av, e.v)
                        / (sqrt(list_dot_product(av, av))
                           * sqrt(list_dot_product(e.v, e.v)))
                   ELSE 0.0 END, 6) DESC, e.vec_id) AS rank
        FROM e, anchor
        WHERE e.vec_id <> {_DENSE_ANCHOR}
      ) WHERE rank <= {TOP_N}
    ),
    contribs AS (
      SELECT doc_id, {_rrf_contrib_sql('rank')} AS c FROM lex
      UNION ALL
      SELECT doc_id, {_rrf_contrib_sql('rank')} AS c FROM dense
    ),
    fused AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_micro,
             CAST(count(*) AS BIGINT) AS n_lists
      FROM contribs GROUP BY doc_id
    )
    SELECT doc_id, rrf_micro, n_lists, rank FROM (
      SELECT doc_id, rrf_micro, n_lists,
             CAST(row_number() OVER (ORDER BY rrf_micro DESC, doc_id)
                  AS BIGINT) AS rank
      FROM fused
    ) WHERE rank <= {_RRF_TOP}
    ORDER BY rank
    """,
    tags=("search", "ranking", "hybrid", "fusion"),
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str):
    """Hybrid lexical + dense retrieval fused by reciprocal-rank fusion —
    the standard two-tower serving pattern (BM25 posting scan and
    embedding ANN each produce a top-N; RRF merges them rank-only, so no
    score calibration between the incomparable scales is needed). The
    lexical list is the graded BM25 query's top-25; the dense list is
    exact cosine top-25 around a fixed anchor embedding (vec_id 0 — the
    dense twin of the query, documents and embeddings share the id
    space). Contributions are round(1e6/(60+rank)) summed as exact
    BIGINTs (the float 1/(60+r) would be cross-engine-identical too, but
    integer micro-units keep the repo's no-float-aggregation contract).
    Both lists are TakeOrdered top-Ns and the fusion is a tiny union —
    nothing wider than the two scans shuffles at any scale."""
    from llm_data_pipeline_spark.functions.intmath import rounded_div_col
    from llm_data_pipeline_spark.operators.similarity import brute_force_topk
    from pyspark.sql.window import Window

    lex = (
        bm25_keyword_search(spark, sf_dir)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
            .alias("rank"),
        )
    )
    emb = table(spark, sf_dir, "embeddings", scatter=True)
    anchor = emb.where(F.col("vec_id") == _DENSE_ANCHOR).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    dense = brute_force_topk(emb, anchor, k=TOP_N).select(
        F.col("vec_id").alias("doc_id"), "rank"
    )
    contribs = lex.unionByName(dense).select(
        "doc_id",
        rounded_div_col(
            F.lit(1_000_000).cast("long"),
            (F.lit(_RRF_K) + F.col("rank")).cast("long"),
        ).alias("c"),
    )
    fused = contribs.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("rrf_micro"),
        F.count(F.lit(1)).cast("long").alias("n_lists"),
    )
    return (
        fused.select(
            "doc_id",
            "rrf_micro",
            "n_lists",
            F.row_number()
            .over(Window.orderBy(F.desc("rrf_micro"), F.asc("doc_id")))
            .cast("long")
            .alias("rank"),
        )
        .where(F.col("rank") <= _RRF_TOP)
        .orderBy("rank")
    )

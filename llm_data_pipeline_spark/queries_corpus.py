"""Corpus-operations queries: frequent-pattern mining, training-shard
assignment, snapshot diffing, and robust length filtering.

These are engine-native additions (no reference counterpart — SURVEY.md §2
extension set): the operational layer a production pretraining pipeline
runs around the core clean/dedup/tokenize stages. Every query follows the
registry determinism policy (stable ORDER BY, identical aliases, portable
md5 hashing from functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from llm_data_pipeline_spark.functions.hashing import DUCKDB_HASH60, portable_hash60
from llm_data_pipeline_spark.queries import query, table

# ---------------------------------------------------------------------------
# frequent n-gram mining (exact heavy hitters)
# ---------------------------------------------------------------------------

_HH_N = 3
_HH_MIN = 5
_HH_TOPK = 100


@query(
    "frequent_ngram_mining",
    oracle=f"""
    WITH toks AS (
      SELECT list_filter(string_split(trim(regexp_replace(lower(coalesce(text,'')),
                         '\\s+', ' ', 'g')), ' '), x -> x <> '') AS toks
      FROM documents
    ),
    grams AS (
      SELECT unnest(CASE WHEN len(toks) >= {_HH_N} THEN
               list_transform(range(0, len(toks) - {_HH_N} + 1),
                 i -> array_to_string(toks[i+1:i+{_HH_N}], ' '))
             ELSE []::VARCHAR[] END) AS gram
      FROM toks
    )
    SELECT gram, CAST(count(*) AS BIGINT) AS cnt
    FROM grams GROUP BY gram HAVING count(*) >= {_HH_MIN}
    ORDER BY cnt DESC, gram LIMIT {_HH_TOPK}
    """,
    tags=("corpus", "mining", "heavyhitters"),
)
def frequent_ngram_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top boilerplate/memorization phrases: every word 3-gram repeating
    >= {min} times corpus-wide, EXACTLY, without shuffling the n-gram
    stream — per-partition Misra–Gries candidate summaries with a provable
    superset capacity, then a broadcast-confirmed exact count
    (operators/heavyhitters.py). The oracle runs the naive full
    groupBy-count; equality IS the correctness claim of the two-pass plan.
    """
    from llm_data_pipeline_spark.operators.heavyhitters import frequent_ngrams

    docs = table(spark, sf_dir, "documents", scatter=True).select("text")
    out = frequent_ngrams(docs, n=_HH_N, min_count=_HH_MIN)
    return out.orderBy(F.desc("cnt"), "gram").limit(_HH_TOPK)


# ---------------------------------------------------------------------------
# deterministic training-shard assignment
# ---------------------------------------------------------------------------

_SHARD_SALT = "shard-v1:"
_N_SHARDS = 8
_SHARD_HASH_SQL = DUCKDB_HASH60.format(s=f"('{_SHARD_SALT}' || doc_id::VARCHAR)")


@query(
    "training_shard_assignment",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, n_chars,
             {_SHARD_HASH_SQL} AS hv,
             {_SHARD_HASH_SQL} % {_N_SHARDS} AS shard
      FROM documents
    ),
    ranked AS (
      SELECT shard, doc_id, n_chars,
             row_number() OVER (PARTITION BY shard ORDER BY hv, doc_id) AS rn
      FROM h
    )
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(rn * doc_id) AS BIGINT) AS order_checksum
    FROM ranked GROUP BY shard ORDER BY shard
    """,
    tags=("corpus", "sharding", "training"),
)
def training_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + sharding for training-data export: a
    salted portable hash assigns every doc a shard and a stable within-shard
    order (the hash IS the shuffle — reproducible across runs and engines,
    unlike rand()). The position-weighted id checksum pins the exact
    interleave order per shard, not just membership. At scale this is
    ``repartition(n_shards, shard) + sortWithinPartitions(hv)`` — one
    shuffle, no global sort, one writer task per shard with n_shards chosen
    so shards land at the file-size target (1-4 GB)."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    hv = portable_hash60(
        F.concat(F.lit(_SHARD_SALT), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("shard").orderBy("hv", "doc_id")
    return (
        docs.select(
            "doc_id",
            "n_chars",
            hv.alias("hv"),
            (hv % _N_SHARDS).alias("shard"),
        )
        .withColumn("rn", F.row_number().over(w))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum(F.col("rn") * F.col("doc_id")).cast("long").alias("order_checksum"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# corpus snapshot diff (dataset versioning)
# ---------------------------------------------------------------------------

_ADDED_OFFSET = 900_000


def _digest(text_col) -> F.Column:
    return F.md5(F.coalesce(text_col, F.lit("")))


@query(
    "corpus_snapshot_diff",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, lang, md5(coalesce(text, '')) AS digest FROM documents
    ),
    v2 AS (
      SELECT doc_id, lang,
             md5(CASE WHEN doc_id % 5 = 0
                      THEN coalesce(text, '') || ' v2-edit'
                      ELSE coalesce(text, '') END) AS digest
      FROM documents WHERE doc_id % 7 <> 3
      UNION ALL
      SELECT doc_id + {_ADDED_OFFSET} AS doc_id, lang,
             md5('added snapshot doc ' || doc_id::VARCHAR) AS digest
      FROM documents WHERE doc_id % 11 = 0
    ),
    diff AS (
      SELECT coalesce(b.lang, v.lang) AS lang,
             coalesce(b.doc_id, v.doc_id) AS doc_id,
             CASE WHEN b.doc_id IS NULL THEN 'added'
                  WHEN v.doc_id IS NULL THEN 'removed'
                  WHEN b.digest <> v.digest THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM base b FULL OUTER JOIN v2 v ON b.doc_id = v.doc_id
    )
    SELECT lang, status,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM diff GROUP BY lang, status ORDER BY lang, status
    """,
    tags=("corpus", "versioning", "diff"),
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-versioning diff between two corpus snapshots: v2 is derived
    deterministically (every 7th doc removed, every 5th edited, every 11th
    re-added under a new id), then one full-outer join on doc_id with a
    content-digest compare classifies added/removed/changed/unchanged. The
    per-(lang,status) id checksum pins classification membership. At scale
    this is the standard snapshot-reconciliation plan: one co-partitioned
    join on the id, digests computed scan-side so full text never
    shuffles."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    base = docs.select("doc_id", "lang", _digest(F.col("text")).alias("digest"))
    kept = docs.where(F.col("doc_id") % 7 != 3).select(
        "doc_id",
        "lang",
        _digest(
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(F.coalesce("text", F.lit("")), F.lit(" v2-edit")),
            ).otherwise(F.coalesce("text", F.lit("")))
        ).alias("digest"),
    )
    added = docs.where(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + _ADDED_OFFSET).alias("doc_id"),
        "lang",
        F.md5(
            F.concat(F.lit("added snapshot doc "), F.col("doc_id").cast("string"))
        ).alias("digest"),
    )
    v2 = kept.unionByName(added)
    b = base.alias("b")
    v = v2.alias("v")
    diff = b.join(v, F.col("b.doc_id") == F.col("v.doc_id"), "full_outer").select(
        F.coalesce(F.col("b.lang"), F.col("v.lang")).alias("lang"),
        F.coalesce(F.col("b.doc_id"), F.col("v.doc_id")).alias("doc_id"),
        F.when(F.col("b.doc_id").isNull(), F.lit("added"))
        .when(F.col("v.doc_id").isNull(), F.lit("removed"))
        .when(F.col("b.digest") != F.col("v.digest"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )
    return (
        diff.groupBy("lang", "status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
        .orderBy("lang", "status")
    )


# ---------------------------------------------------------------------------
# robust length filter (exact per-group percentiles + IQR fences)
# ---------------------------------------------------------------------------

_IQR_LONG_OFFSET = 700_000
_IQR_SHORT_OFFSET = 800_000


@query(
    "doc_length_iqr_filter",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, lang, n_chars FROM documents
      UNION ALL
      SELECT doc_id + {_IQR_LONG_OFFSET}, lang, n_chars * 40
      FROM documents WHERE doc_id % 50 = 0
      UNION ALL
      SELECT doc_id + {_IQR_SHORT_OFFSET}, lang, 2
      FROM documents WHERE doc_id % 61 = 0
    ),
    s AS (
      SELECT lang,
             quantile_cont(n_chars, 0.25) AS q1,
             quantile_cont(n_chars, 0.75) AS q3
      FROM corpus GROUP BY lang
    )
    SELECT c.lang,
           round(q1 - 1.5 * (q3 - q1), 4) AS lo_fence,
           round(q3 + 1.5 * (q3 - q1), 4) AS hi_fence,
           CAST(sum(CASE WHEN n_chars < q1 - 1.5 * (q3 - q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS dropped_short,
           CAST(sum(CASE WHEN n_chars > q3 + 1.5 * (q3 - q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS dropped_long,
           CAST(sum(CASE WHEN n_chars >= q1 - 1.5 * (q3 - q1)
                          AND n_chars <= q3 + 1.5 * (q3 - q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS kept
    FROM corpus c JOIN s ON c.lang = s.lang
    GROUP BY c.lang, q1, q3 ORDER BY c.lang
    """,
    tags=("corpus", "quality", "filter"),
)
def doc_length_iqr_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-language length filtering with Tukey fences on EXACT
    quartiles (Spark ``percentile`` is sort-based and bit-identical to
    DuckDB ``quantile_cont`` — no summation-order issue, so fences compare
    exactly). Outlier variants are planted deterministically (40x-length
    concatenation artifacts, 2-char truncations) so the fences genuinely
    fire. At scale: quartiles are one per-group aggregate over the tiny
    (lang, n_chars) projection, fences broadcast back — the full text is
    never read (column pruning keeps the scan to two int/string columns).
    """
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    corpus = (
        docs.unionByName(
            docs.where(F.col("doc_id") % 50 == 0).select(
                (F.col("doc_id") + _IQR_LONG_OFFSET).alias("doc_id"),
                "lang",
                (F.col("n_chars") * 40).alias("n_chars"),
            )
        )
        .unionByName(
            docs.where(F.col("doc_id") % 61 == 0).select(
                (F.col("doc_id") + _IQR_SHORT_OFFSET).alias("doc_id"),
                "lang",
                F.lit(2).cast("long").alias("n_chars"),
            )
        )
    )
    stats = corpus.groupBy("lang").agg(
        F.percentile("n_chars", F.lit(0.25)).alias("q1"),
        F.percentile("n_chars", F.lit(0.75)).alias("q3"),
    )
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return (
        corpus.join(F.broadcast(stats), "lang")
        .groupBy("lang", "q1", "q3")
        .agg(
            F.sum((F.col("n_chars") < lo).cast("int")).cast("long").alias(
                "dropped_short"
            ),
            F.sum((F.col("n_chars") > hi).cast("int")).cast("long").alias(
                "dropped_long"
            ),
            F.sum(
                ((F.col("n_chars") >= lo) & (F.col("n_chars") <= hi)).cast("int")
            )
            .cast("long")
            .alias("kept"),
        )
        .select(
            "lang",
            F.round(lo, 4).alias("lo_fence"),
            F.round(hi, 4).alias("hi_fence"),
            "dropped_short",
            "dropped_long",
            "kept",
        )
        .orderBy("lang")
    )

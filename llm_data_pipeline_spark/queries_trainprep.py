"""Training-data preparation queries beyond the reference surface:
long-context windowing, curriculum scheduling, best-of-n candidate
selection, and skip-gram pair generation. All native-expression Spark
plans with full DuckDB oracle replays (the reference has none of these;
they are the operators a 100 TB pre-training pipeline runs between dedup
and tokenize)."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from llm_data_pipeline_spark.functions.hashing import (
    DUCKDB_HASH60,
    portable_hash60,
)
from llm_data_pipeline_spark.functions.intmath import (
    rounded_div_col,
    rounded_div_sql,
)
from llm_data_pipeline_spark.queries import query, table

_NORM = "trim(regexp_replace(lower(coalesce(text,'')), '\\s+', ' ', 'g'))"
_TOKS = f"list_filter(string_split({_NORM}, ' '), x -> x <> '')"

_WIN = 256
_STRIDE = 192


@query(
    "doc_sliding_windows",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_NORM} AS t, length({_NORM}) AS len
      FROM documents WHERE length({_NORM}) > 0
    ),
    wins AS (
      SELECT doc_id, i AS win_id, (i * {_STRIDE})::BIGINT AS win_start,
             substr(t, i * {_STRIDE} + 1, {_WIN}) AS wt
      FROM base,
           unnest(range(CASE WHEN len <= {_WIN} THEN 1
                        ELSE (len - {_WIN} + {_STRIDE} - 1) // {_STRIDE} + 1
                        END)) u(i)
    )
    SELECT doc_id, CAST(win_id AS BIGINT) AS win_id, win_start,
           CAST(length(wt) AS BIGINT) AS win_len,
           {DUCKDB_HASH60.format(s="wt")} AS win_hash
    FROM wins
    ORDER BY doc_id, win_id
    """,
    tags=("trainprep", "windowing"),
)
def doc_sliding_windows(spark: SparkSession, sf_dir: str):
    """Long-context training windows: each document splits into
    {_WIN}-char windows at stride {_STRIDE} (64-char overlap so no
    boundary context is lost), the standard chunking ahead of tokenize
    for context lengths shorter than documents. Start positions are pure
    integer arithmetic (count = ceil((len - W)/S) + 1, floor-div form),
    the tail window is short rather than padded, and each window emits
    its portable content hash so the oracle checks the exact window TEXT,
    not just offsets. Narrow map + explode — no shuffle before the
    presentation sort; at 100 TB this is a zero-shuffle pass."""
    from llm_data_pipeline_spark.functions.text import norm_ws

    docs = table(spark, sf_dir, "documents", scatter=True)
    base = docs.select(
        "doc_id", norm_ws(F.col("text")).alias("t")
    ).withColumn("len", F.length("t")).where(F.col("len") > 0)
    n_wins = F.when(F.col("len") <= _WIN, F.lit(1)).otherwise(
        F.expr(f"(len - {_WIN} + {_STRIDE} - 1) div {_STRIDE}") + 1
    )
    wins = base.select(
        "doc_id",
        "t",
        F.explode(F.sequence(F.lit(0), n_wins.cast("long") - 1)).alias(
            "win_id"
        ),
    ).select(
        "doc_id",
        F.col("win_id").cast("long").alias("win_id"),
        (F.col("win_id") * _STRIDE).cast("long").alias("win_start"),
        F.substring(
            F.col("t"), (F.col("win_id") * _STRIDE + 1).cast("int"), _WIN
        ).alias("wt"),
    )
    return wins.select(
        "doc_id",
        "win_id",
        "win_start",
        F.length("wt").cast("long").alias("win_len"),
        portable_hash60(F.col("wt")).alias("win_hash"),
    ).orderBy("doc_id", "win_id")


@query(
    "curriculum_phases",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, length({_NORM}) AS difficulty
      FROM documents
    ),
    phased AS (
      SELECT doc_id, lang, difficulty,
             ntile(4) OVER (ORDER BY difficulty, doc_id) AS phase
      FROM scored
    )
    SELECT CAST(phase AS BIGINT) AS phase,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(difficulty) AS BIGINT) AS min_difficulty,
           CAST(max(difficulty) AS BIGINT) AS max_difficulty,
           CAST(sum(difficulty) AS BIGINT) AS total_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM phased
    GROUP BY phase
    ORDER BY phase
    """,
    tags=("trainprep", "curriculum"),
)
def curriculum_phases(spark: SparkSession, sf_dir: str):
    """Length-based curriculum schedule (short -> long, the classic
    pre-training curriculum): docs rank by normalized length with a
    deterministic (difficulty, doc_id) tie-break, ntile(4) cuts the
    ranking into four equal phases, and the output is the per-phase
    manifest a training scheduler consumes (doc counts, difficulty range,
    token mass, language spread). ntile's quotient/remainder split is
    standard SQL semantics — Spark and DuckDB agree exactly. One window
    + one aggregate; at scale the window is a range-partitioned global
    sort on an int key."""
    docs = table(spark, sf_dir, "documents")
    from llm_data_pipeline_spark.functions.text import norm_ws

    scored = docs.select(
        "doc_id", "lang", F.length(norm_ws(F.col("text"))).alias("difficulty")
    )
    w = Window.orderBy("difficulty", "doc_id")
    phased = scored.withColumn("phase", F.ntile(4).over(w))
    return (
        phased.groupBy("phase")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("difficulty").cast("long").alias("min_difficulty"),
            F.max("difficulty").cast("long").alias("max_difficulty"),
            F.sum("difficulty").cast("long").alias("total_chars"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
        )
        .select(
            F.col("phase").cast("long").alias("phase"),
            "n_docs",
            "min_difficulty",
            "max_difficulty",
            "total_chars",
            "n_langs",
        )
        .orderBy("phase")
    )


_BON_N = 4  # candidates per prompt


@query(
    "best_of_n_selection",
    oracle=f"""
    WITH prompts AS (
      SELECT doc_id AS prompt_id, {_TOKS} AS toks
      FROM documents WHERE doc_id < 100
    ),
    cands AS (
      SELECT prompt_id, k AS cand_id,
             list_slice(toks, k + 1, len(toks)) AS ctoks
      FROM prompts, unnest(range({_BON_N})) t(k)
      WHERE len(toks) > {_BON_N}
    ),
    rewarded AS (
      SELECT prompt_id, cand_id,
             CAST(len(ctoks) AS BIGINT) AS n_toks,
             CAST(len(list_distinct(ctoks)) AS BIGINT) AS n_distinct,
             {rounded_div_sql('len(list_distinct(ctoks)) * 1000000',
                              'len(ctoks)')} AS reward_ppm
      FROM cands
    )
    SELECT prompt_id, CAST(cand_id AS BIGINT) AS cand_id, n_toks,
           n_distinct, reward_ppm
    FROM (
      SELECT *, row_number() OVER (PARTITION BY prompt_id
                                   ORDER BY reward_ppm DESC, cand_id) AS rk
      FROM rewarded
    ) WHERE rk = 1
    ORDER BY prompt_id
    """,
    tags=("trainprep", "rlhf", "selection"),
)
def best_of_n_selection(spark: SparkSession, sf_dir: str):
    """Best-of-n candidate selection — the rejection-sampling step of an
    RLHF/RFT data pipeline: per prompt, n candidate generations are
    scored by a reward and only the argmax survives. The fixture derives
    {_BON_N} deterministic candidates per prompt (suffix variants of the
    doc's token list) and uses lexical diversity (distinct/total tokens,
    integer ppm via exact rounded division) as the in-engine reward; the
    selection is one window top-1 with (reward desc, cand_id) ties. Swap
    the reward column for a model score at deployment — the plan shape
    (explode candidates -> narrow reward -> per-prompt top-1) is the
    whole operator. Oracle replays candidate derivation, reward, and
    argmax."""
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    from llm_data_pipeline_spark.functions.text import norm_ws

    toks = F.filter(
        F.split(norm_ws(F.col("text")), " "), lambda x: x != ""
    )
    prompts = docs.select(
        F.col("doc_id").alias("prompt_id"), toks.alias("toks")
    ).where(F.size("toks") > _BON_N)
    cands = prompts.select(
        "prompt_id",
        F.explode(F.sequence(F.lit(0), F.lit(_BON_N - 1))).alias("cand_id"),
        "toks",
    ).select(
        "prompt_id",
        "cand_id",
        F.slice(
            F.col("toks"), F.col("cand_id") + 1, F.size("toks")
        ).alias("ctoks"),
    )
    rewarded = cands.select(
        "prompt_id",
        "cand_id",
        F.size("ctoks").cast("long").alias("n_toks"),
        F.size(F.array_distinct("ctoks")).cast("long").alias("n_distinct"),
    ).withColumn(
        "reward_ppm",
        rounded_div_col(F.col("n_distinct") * 1_000_000, F.col("n_toks")),
    )
    w = Window.partitionBy("prompt_id").orderBy(
        F.desc("reward_ppm"), F.asc("cand_id")
    )
    return (
        rewarded.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "prompt_id",
            F.col("cand_id").cast("long").alias("cand_id"),
            "n_toks",
            "n_distinct",
            "reward_ppm",
        )
        .orderBy("prompt_id")
    )


_SG_WINDOW = 2
_SG_NEG = 2
_SG_BUCKETS = 1024


@query(
    "skipgram_training_pairs",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_TOKS} AS toks
      FROM documents WHERE doc_id < 50
    ),
    pos AS (
      SELECT doc_id, i AS p, toks[i + 1] AS w
      FROM base, unnest(range(len(toks))) t(i)
    ),
    pairs AS (
      SELECT c.doc_id, c.p AS center_pos, c.w AS center,
             x.p AS context_pos, x.w AS context
      FROM pos c
      JOIN pos x ON x.doc_id = c.doc_id
       AND x.p BETWEEN c.p - {_SG_WINDOW} AND c.p + {_SG_WINDOW}
       AND x.p <> c.p
    )
    SELECT doc_id, CAST(center_pos AS BIGINT) AS center_pos, center,
           CAST(context_pos AS BIGINT) AS context_pos, context,
           {DUCKDB_HASH60.format(
               s="center || '|' || center_pos::VARCHAR || '|0'")}
             % {_SG_BUCKETS} AS neg_0,
           {DUCKDB_HASH60.format(
               s="center || '|' || center_pos::VARCHAR || '|1'")}
             % {_SG_BUCKETS} AS neg_1
    FROM pairs
    ORDER BY doc_id, center_pos, context_pos
    """,
    tags=("trainprep", "embeddings", "skipgram"),
)
def skipgram_training_pairs(spark: SparkSession, sf_dir: str):
    """Skip-gram (center, context) pair generation with hashed negative
    samples — the word2vec/fastText training-data shape, at corpus scale:
    positions explode once, context pairs come from an EQUI-join on
    (doc_id, position-offset range) (never a per-doc n^2), and each pair
    carries {_SG_NEG} deterministic negatives drawn from a {_SG_BUCKETS}-
    bucket hashed vocabulary (portable hash of center|pos|k — replayable,
    no RNG state). At 100 TB the join key is (doc_id, pos), co-partitioned
    by the explode — one shuffle. Oracle replays tokenization, the window
    join, and the negative hashes."""
    docs = table(spark, sf_dir, "documents", scatter=True).where(
        F.col("doc_id") < 50
    )
    from llm_data_pipeline_spark.functions.text import norm_ws

    toks = F.filter(F.split(norm_ws(F.col("text")), " "), lambda x: x != "")
    pos = docs.select(
        "doc_id", F.posexplode(toks).alias("p", "w")
    ).localCheckpoint(eager=False)
    c = pos.select(
        "doc_id", F.col("p").alias("center_pos"), F.col("w").alias("center")
    )
    x = pos.select(
        F.col("doc_id").alias("doc_id2"),
        F.col("p").alias("context_pos"),
        F.col("w").alias("context"),
    )
    pairs = c.join(
        x,
        (F.col("doc_id") == F.col("doc_id2"))
        & (F.col("context_pos") >= F.col("center_pos") - _SG_WINDOW)
        & (F.col("context_pos") <= F.col("center_pos") + _SG_WINDOW)
        & (F.col("context_pos") != F.col("center_pos")),
    ).drop("doc_id2")

    def neg(k: int):
        return portable_hash60(
            F.concat_ws(
                "|",
                F.col("center"),
                F.col("center_pos").cast("string"),
                F.lit(str(k)),
            )
        ) % _SG_BUCKETS

    return pairs.select(
        "doc_id",
        F.col("center_pos").cast("long").alias("center_pos"),
        "center",
        F.col("context_pos").cast("long").alias("context_pos"),
        "context",
        neg(0).alias("neg_0"),
        neg(1).alias("neg_1"),
    ).orderBy("doc_id", "center_pos", "context_pos")

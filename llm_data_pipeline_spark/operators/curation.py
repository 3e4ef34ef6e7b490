"""Corpus curation operators a training-data pipeline needs beyond the
reference surface: benchmark decontamination, deterministic dataset
splitting, and token-budget corpus mixing.

All three are pure relational plans (no Python in the hot path) built on
the engine-portable md5 hash family (functions/hashing.py) so every one is
DuckDB-oracle-checkable end-to-end.

Scale notes (100 TB):

- ``decontaminate`` — the benchmark side is an eval suite (thousands of
  docs, millions of n-grams at most): its distinct shingle-hash set
  broadcasts; the corpus side is one narrow explode + broadcast join +
  groupBy(doc_id) — a single shuffle keyed by doc.
- ``split_dataset`` — stateless row-local hash arithmetic; zero shuffles.
  Hash-of-id splitting is stable under corpus growth (a doc never changes
  split when new data arrives), unlike randomSplit.
- ``mix_corpus`` — per-source window cumsum; shuffles once on source.
  Sources are typically hundreds (crawls, curated sets), so per-partition
  skew is bounded by the largest source; for a pathological single-source
  corpus, pre-split the source upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from llm_data_pipeline_spark.functions.hashing import portable_hash60
from llm_data_pipeline_spark.functions.text import norm_ws
from llm_data_pipeline_spark.operators.dedup import word_ngrams_from_toks


def _staged_shingles(df: DataFrame, n: int, text_col: str, *keep: str) -> DataFrame:
    """(keep..., shingle) rows with the token array staged behind a column
    boundary first — an inline tokenize inside the n-gram transform lambda
    re-tokenizes the document per position (see word_ngrams_from_toks)."""
    toked = df.select(
        *keep,
        F.filter(F.split(norm_ws(F.col(text_col)), " "), lambda x: x != "").alias(
            "_toks"
        ),
    )
    return toked.select(
        *keep,
        F.explode(
            F.array_distinct(word_ngrams_from_toks(F.col("_toks"), n))
        ).alias("shingle"),
    )


def benchmark_ngram_hashes(
    benchmark: DataFrame, n: int = 5, text_col: str = "text"
) -> DataFrame:
    """Distinct word-n-gram hashes of an eval/benchmark set: (h) rows."""
    return (
        _staged_shingles(benchmark, n, text_col)
        .select(portable_hash60(F.col("shingle")).alias("h"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    threshold: float = 0.2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag training docs that leak benchmark content (n-gram overlap).

    The standard decontamination defense (public practice since GPT-2/3
    reports: drop training docs sharing long n-grams with the eval suite).
    Appends:

    - ``n_shingles``        — distinct word n-grams in the doc
    - ``n_contaminated``    — of those, how many appear in the benchmark
    - ``contamination``     — ratio (0 for shingle-less docs)
    - ``contaminated``      — contamination >= threshold

    Exact containment on hashed shingles (equality-only use — the portable
    md5 family is free, functions/hashing.py).
    """
    doc_sh = _staged_shingles(docs, n, text_col, id_col).select(
        id_col, portable_hash60(F.col("shingle")).alias("h")
    )
    bench = benchmark_ngram_hashes(benchmark, n, text_col).withColumn(
        "_hit", F.lit(1)
    )
    per_doc = (
        doc_sh.join(F.broadcast(bench), "h", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_contaminated"),
        )
    )
    out = docs.join(per_doc, id_col, "left").select(
        docs["*"],
        F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
        F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
    )
    contamination = F.when(
        F.col("n_shingles") > 0,
        F.col("n_contaminated") / F.col("n_shingles"),
    ).otherwise(F.lit(0.0))
    return out.withColumn(
        "contamination", F.round(contamination, 6)
    ).withColumn("contaminated", F.col("contamination") >= threshold)


def split_dataset(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
    id_col: str = "doc_id",
    buckets: int = 1000,
) -> DataFrame:
    """Append a deterministic ``split`` label by hashed-id bucketing.

    bucket = portable_hash60(id || ':' || salt) % buckets; cumulative weight
    thresholds carve the bucket range. Stable: a doc's split never changes
    as the corpus grows (the failure mode of randomSplit / rand()), and a
    new salt re-deals the deck reproducibly. Zero shuffles.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    bucket = portable_hash60(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
    ) % buckets
    acc = 0.0
    expr = None
    # iterate in insertion order; last split absorbs rounding remainder
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cond = bucket < int(round(acc * buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def mix_corpus(
    df: DataFrame,
    token_budget: int,
    source_weights: dict[str, float] | None = None,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
) -> DataFrame:
    """Deterministic token-budget sampling per source (corpus mixing).

    Every source gets ``token_budget * weight`` tokens (equal weights by
    default, computed over the sources present). Docs within a source are
    ordered by a salted hash (a reproducible shuffle), and kept while the
    exclusive running token total stays under the source budget — so the
    kept set is stable, ordering-independent, and each source's first doc
    always survives a nonzero budget.

    Appends ``n_tokens`` (whitespace tokens) and keeps only sampled rows.
    """
    tokens = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    )
    h = portable_hash60(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
    )
    tagged = df.withColumn("n_tokens", tokens).withColumn("_h", h)
    w = (
        Window.partitionBy(source_col)
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_run = tagged.withColumn(
        "_run", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    if source_weights:
        total_w = sum(source_weights.values())
        mapping = F.create_map(
            *[
                F.lit(x)
                for kv in source_weights.items()
                for x in (kv[0], kv[1] / total_w)
            ]
        )
        budget = (mapping[F.col(source_col)] * token_budget).cast("long")
    else:
        n_sources = df.select(source_col).distinct().count()
        budget = F.lit(int(token_budget / max(1, n_sources)))
    return (
        with_run.where(F.col("_run") < budget)
        .drop("_h", "_run")
    )


def temperature_mixture(
    df: DataFrame,
    budget_frac: float = 0.5,
    alpha: float = 0.5,
    source_col: str = "source",
    size_col: str = "n_chars",
    id_col: str = "doc_id",
    salt: str = "mix-t-v1",
) -> DataFrame:
    """Temperature-weighted corpus sampling with weights LEARNED from the
    corpus itself (the multilingual-LM alpha-sampling recipe: XLM /
    mBERT rescale each source's natural share q_s to q_s^alpha, which
    upsamples rare sources). ``mix_corpus`` takes the weights as input;
    this derives them:

        w_s ∝ (chars_s)^alpha;  p_s = min(1, budget_frac * w_s * C / chars_s)

    then keeps a doc iff its salted portable-hash uniform < p_s — the
    stable per-row Bernoulli, so membership never changes as other
    sources grow and the whole decision is one broadcast join against a
    |sources|-row table. Zero window functions, zero shuffles beyond the
    tiny per-source count.

    Determinism contract: alpha=0.5 uses sqrt (correctly-rounded IEEE in
    both engines, unlike pow); sqrt weights are quantized to integer
    micro-units before the cross-source sum so partial-agg order cannot
    shift the shares; u = hash60/2^60 and every division is a
    deterministic double op on exact integer inputs. Other alphas use
    F.pow and are NOT oracle-gradeable (cross-engine pow rounding).
    """
    micro = 1_000_000
    sizes = df.groupBy(source_col).agg(
        F.sum(size_col).cast("long").alias("_chars")
    )
    wcol = (
        F.sqrt(F.col("_chars"))
        if alpha == 0.5
        else F.pow(F.col("_chars"), F.lit(alpha))
    )
    sq = sizes.withColumn(
        "_sqm", F.round(wcol * micro).cast("long")
    )
    tot = sq.agg(
        F.sum("_sqm").cast("long").alias("_sqtot"),
        F.sum("_chars").cast("long").alias("_ctot"),
    )
    probs = sq.crossJoin(F.broadcast(tot)).select(
        source_col,
        F.least(
            F.lit(1.0),
            F.lit(budget_frac)
            * (F.col("_sqm") / F.col("_sqtot"))
            * F.col("_ctot")
            / F.col("_chars"),
        ).alias("_p"),
    )
    u = portable_hash60(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
    ) / F.lit(float(1 << 60))
    # null-safe equality: groupBy puts NULL-source docs in their own
    # probability row, but a plain equi-join would never match it back
    # (NULL != NULL) and silently DROP untagged docs from the mixture
    return (
        df.join(
            F.broadcast(probs.withColumnRenamed(source_col, "_mix_src")),
            F.col(source_col).eqNullSafe(F.col("_mix_src")),
        )
        .where(u < F.col("_p"))
        .drop("_p", "_mix_src")
    )


def k_anonymize(
    df: DataFrame,
    quasi_cols: tuple[str, str, str] = ("lang", "source", "len_bucket"),
    k: int = 5,
) -> DataFrame:
    """k-anonymous metadata release with a 2-step generalization ladder.

    Engine-native governance extension: before publishing corpus
    statistics keyed by quasi-identifiers (the classic re-identification
    vector), every released group must contain >= k rows. Groups failing
    k at the full key (a, b, c) generalize to (a, '*', c); still-failing
    groups generalize to ('*', '*', '*'); the catch-all is released with
    its own size (callers may withhold it if it too is < k — the flag
    says). Deterministic: no sampling, pure aggregation.

    100-TB shape: three groupBys, each strictly coarser than the last, so
    each re-aggregates only the FAILING slice of the previous level (the
    survivors never re-shuffle); partial aggregation bounds every shuffle
    by the (tiny) quasi-identifier domain, not corpus rows.

    Returns (a, b, c, n, level) — level 0/1/2 by how far the group had to
    generalize; every level-0/1 row has n >= k.
    """
    a, b, c = quasi_cols
    g0 = df.groupBy(a, b, c).agg(F.count("*").alias("n"))
    ok0 = g0.filter(F.col("n") >= k).withColumn("level", F.lit(0))
    fail0 = g0.filter(F.col("n") < k)
    g1 = (
        fail0.groupBy(a, c)
        .agg(F.sum("n").alias("n"))
        .withColumn(b, F.lit("*"))
    )
    ok1 = g1.filter(F.col("n") >= k).withColumn("level", F.lit(1))
    fail1 = g1.filter(F.col("n") < k)
    g2 = (
        fail1.agg(F.sum("n").alias("n"))
        .withColumn(a, F.lit("*"))
        .withColumn(b, F.lit("*"))
        .withColumn(c, F.lit(-1))
        .filter(F.col("n").isNotNull())  # empty fail-set -> no catch-all row
        .withColumn("level", F.lit(2))
    )
    cols = [a, b, c, "n", "level"]
    return (
        ok0.select(*cols)
        .unionByName(ok1.select(*cols))
        .unionByName(g2.select(*cols))
    )

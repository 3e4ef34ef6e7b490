"""In-engine trained multinomial Naive Bayes text classifier.

The reference gates language ID behind an external fastText model
(reference src/llm_data_pipeline/quality/model.py:267-340 — a model
artifact this sandbox cannot download). This operator closes the
semantic gap the honest way: it TRAINS a real statistical classifier —
multinomial Naive Bayes over character n-grams, the same feature family
fastText's LID models use — inside the engine, with nothing but
DataFrame aggregations, and applies it distributively. No model file,
no UDF, no driver loop.

Training (one pass of groupBys, all vocabulary-bounded):
- c(lang, gram)  — char-n-gram occurrence counts per class;
- T(lang)        — total gram occurrences per class;
- V              — distinct grams across the train corpus;
- prior(lang)    — class document counts.

Scoring with Laplace (add-1) smoothing:
    score(d, lang) = ln P(lang) + sum_g ln((c(lang,g) + 1) / (T + V))
                   = ln P(lang) + sum_{g seen} ln(c+1)  -  G_d * ln(T+V)
because unseen grams contribute ln(1) = 0 to the first sum — so the
scoring join only touches grams present in the model (an equi-join on
the gram key against the vocabulary-bounded model; broadcast when it
fits, shuffle join at trillion-token vocab, same plan otherwise), and
the per-document gram count G_d folds the smoothing denominator in with
one multiplication.

Determinism contract (same as lm_score/pq_adc): every ln is quantized
to INTEGER MICRO-UNITS (round(ln(x)*1e6) as int64) before any
aggregation; per-(doc, lang) totals are exact int64 sums, so partial-
aggregation order cannot change the result; argmax ties break on the
lexicographically smallest label.

Scale shape: explode-grams is a narrow pass; the model is Heaps'-law
bounded; prediction is one join + one groupBy + one small window. At
100 TB nothing here is corpus-quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from llm_data_pipeline_spark.functions.checkpoint import cut_lineage

MICRO = 1_000_000


def char_ngrams(col, n: int = 3):
    """Array of overlapping character n-grams of ``col`` (empty when the
    string is shorter than n). Native functions only.

    Expression-level helper (usable anywhere a Column fits) — but
    positional substr is O(position), so corpus-scale gram extraction
    goes through ``_doc_grams``' staged split-once path instead; both
    are code-point based and produce identical grams
    (tests/test_nb_classify.py pins the edge cases)."""
    length = F.length(col)
    return F.when(
        length >= n,
        F.transform(
            F.sequence(F.lit(1), length - F.lit(n - 1)),
            lambda i: col.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _doc_grams(
    df: DataFrame, text_col: str, id_col: str, n: int, *keep: str
) -> DataFrame:
    """(doc_id, *keep, gram) — one row per gram OCCURRENCE (multinomial
    NB), with any ``keep`` columns (e.g. the class label) carried through
    the explode so no re-join is needed.

    Two staging rules make this linear instead of quadratic in document
    length (README perf rules #1/#2): positional ``substr`` on a string
    rescans from the start per call (code-point addressing), so the text
    is split ONCE into a char array — behind a real column boundary so
    the lambda doesn't re-inline the split per element — and grams are
    built from O(1) ``element_at`` accesses.
    """
    chars = df.select(
        F.col(id_col).alias("doc_id"),
        *keep,
        F.split(F.lower(F.col(text_col)), "").alias("_chars"),
    )
    sz = F.size(F.col("_chars"))
    grams = F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(1), sz - F.lit(n - 1)),
            lambda i: F.concat(
                *[F.element_at(F.col("_chars"), i + F.lit(j)) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return chars.select("doc_id", *keep, F.explode(grams).alias("gram"))


def train_nb(
    train: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    n: int = 3,
) -> dict[str, DataFrame]:
    """Train the model; returns {'grams': (label, gram, lw_micro),
    'classes': (label, base_micro)} where

    - lw_micro   = round(ln(c+1) * 1e6)            (per seen gram)
    - base_micro = round(ln(prior)*1e6)            (per class), plus
      lnTV_micro = round(ln(T+V)  * 1e6) carried separately so the
      caller can apply the G_d multiplication.
    """
    labeled = train.select(
        F.col(id_col).alias("doc_id"), F.col(label_col).alias("label"), text_col
    )
    grams = _doc_grams(labeled, text_col, "doc_id", n, "label")
    # Three consumers (model weights, class totals, vocab size) read this
    # vocabulary-bounded frame — a lazy checkpoint pins ONE evaluation of
    # the explode+count subtree instead of three (README perf rule #2).
    gram_counts = (
        grams.groupBy("label", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(cut_lineage, eager=False)
    )
    totals = gram_counts.groupBy("label").agg(F.sum("c").alias("t"))
    vocab = gram_counts.select("gram").distinct().agg(
        F.count(F.lit(1)).alias("v")
    )
    priors = labeled.groupBy("label").agg(F.count(F.lit(1)).alias("n_docs"))
    n_total = labeled.agg(F.count(F.lit(1)).alias("n_all"))

    model_grams = gram_counts.select(
        "label",
        "gram",
        F.round(F.log(F.col("c") + F.lit(1)) * MICRO)
        .cast("long")
        .alias("lw_micro"),
    )
    classes = (
        priors.crossJoin(n_total)
        # LEFT join: a class whose training docs are all shorter than n
        # characters has no grams but still has a prior — an inner join
        # would silently delete it from the model (its smoothing term is
        # ln(0 + V), the correct multinomial-NB value for T=0)
        .join(totals, "label", "left")
        .crossJoin(vocab)
        .select(
            "label",
            F.round(F.log(F.col("n_docs") / F.col("n_all")) * MICRO)
            .cast("long")
            .alias("prior_micro"),
            F.round(
                F.log(F.coalesce(F.col("t"), F.lit(0)) + F.col("v")) * MICRO
            )
            .cast("long")
            .alias("lntv_micro"),
        )
    )
    return {"grams": model_grams, "classes": classes}


def nb_predict(
    model: dict[str, DataFrame],
    test: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    broadcast_model: bool = True,
) -> DataFrame:
    """(doc_id, pred_label, score_micro) — argmax class per document.

    ``broadcast_model`` controls the join hint on the gram-weight table.
    The hint is needed because the model rides a localCheckpoint (its
    aggregate stats are lost, so auto-broadcast can't see it is small —
    the measured checkpoint-stats trap); keep it True for any realistic
    vocabulary, pass False at a vocabulary too large to broadcast so
    Spark plans the shuffle equi-join instead (the module contract)."""
    docs = test.select(F.col(id_col).alias("doc_id"), text_col)
    grams = _doc_grams(docs, text_col, "doc_id", n)
    # Per-doc gram count is just len - (n-1), clamped — no second explode
    # pass over the corpus for a number the row already knows. The length
    # must be taken over the LOWERED text (grams are extracted from it,
    # and Unicode case expansion — e.g. U+0130 lowering to two code
    # points — changes the count).
    g_counts = docs.select(
        "doc_id",
        F.greatest(
            F.length(F.lower(F.col(text_col))) - F.lit(n - 1), F.lit(0)
        ).alias("g"),
    )
    mg = F.broadcast(model["grams"]) if broadcast_model else model["grams"]
    mc = F.broadcast(model["classes"]) if broadcast_model else model["classes"]
    seen = (
        grams.join(mg, "gram")
        .groupBy("doc_id", "label")
        .agg(F.sum("lw_micro").alias("seen_micro"))
    )
    grid = (
        docs.select("doc_id")
        .join(g_counts, "doc_id", "left")
        .na.fill({"g": 0})
        .crossJoin(mc)
        .join(seen, ["doc_id", "label"], "left")
        .na.fill({"seen_micro": 0})
        .select(
            "doc_id",
            "label",
            (
                F.col("prior_micro")
                + F.col("seen_micro")
                - F.col("g") * F.col("lntv_micro")
            ).alias("score_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_micro"), F.asc("label")
    )
    return (
        grid.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("doc_id", F.col("label").alias("pred_label"), "score_micro")
    )

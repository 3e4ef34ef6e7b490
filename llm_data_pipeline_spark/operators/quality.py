"""Quality stage: language identification + keep decision.

Capability parity with the reference quality step (SURVEY.md §2.3 C5-C6;
reference quality/run.py, quality/model.py:267-340): per-row language label
+ confidence, keep iff label in the allow-list and confidence >= threshold.

Model routing follows the engine's standard pattern:
- if the optional fastText stack is importable, LID runs as an
  Arrow-batched ``mapInPandas`` with a per-executor model singleton
  (batched predict — the reference's row-at-a-time ds.map is one of the
  inefficiencies we do not reproduce, SURVEY.md §4.2(6));
- otherwise the deterministic stopword/CJK heuristic
  (functions/analysis.detect_language) provides the same column contract
  natively — which is also the DuckDB-oracle-checkable path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from llm_data_pipeline_spark.functions.analysis import with_language_heuristic

DEFAULT_ALLOWED_LANGS = ("zh", "en")
DEFAULT_THRESHOLD = 0.4

# Per-worker-process model cache: mapInPandas closures deserialize fresh in
# every Python worker, so the singleton must live at module level, keyed by
# how the model is obtained.
_MODEL_CACHE: dict = {}


def _fasttext_factory(model_path: str | None):
    import fasttext  # type: ignore

    return fasttext.load_model(model_path)


def _get_model(key, factory):
    m = _MODEL_CACHE.get(key)
    if m is None:
        try:
            m = factory()
        except Exception:
            m = False
        _MODEL_CACHE[key] = m
    return m or None


def add_language(
    df: DataFrame,
    text_col: str = "text",
    model_path: str | None = None,
    model_factory=None,
) -> DataFrame:
    """Append ``lang_pred: string`` and ``lang_score: double``.

    ``model_factory`` is a picklable zero-arg callable returning a
    fastText-shaped model (``.predict(list[str]) -> (labels, probs)``),
    constructed lazily ONCE per executor Python worker (the reference's
    actor-pool model singleton, quality/model.py:267-340, as a worker-local
    cache). Defaults to loading fastText from ``model_path`` when that
    stack is installed; with neither, the native heuristic columns run
    instead (the oracle-checkable path).
    """
    if model_factory is None:
        if model_path is None or _get_model(
            ("fasttext", model_path),
            lambda: _fasttext_factory(model_path),
        ) is None:
            # staged variant: tokenize once per row, hit counts behind a
            # projection boundary (plan-hygiene rule 1) — the Column-expr
            # forms re-tokenize ~9x and re-inline under downstream refs
            return with_language_heuristic(df, text_col)
        factory = lambda: _fasttext_factory(model_path)  # noqa: E731
        cache_key = ("fasttext", model_path)
    else:
        factory = model_factory
        cache_key = ("custom", getattr(model_factory, "__qualname__", repr(model_factory)))

    # build a NEW StructType: df.schema returns the frame's own cached
    # object and StructType.add mutates in place (would corrupt df.columns)
    from pyspark.sql.types import DoubleType, StringType, StructField, StructType

    schema = StructType(
        list(df.schema.fields)
        + [
            StructField("lang_pred", StringType()),
            StructField("lang_score", DoubleType()),
        ]
    )

    def predict(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = _get_model(cache_key, factory)
        for pdf in batches:
            texts = [
                " ".join(str(t).split()) for t in pdf[text_col].fillna("")
            ]
            labels, probs = m.predict(texts)
            pdf = pdf.copy()
            pdf["lang_pred"] = [l[0].replace("__label__", "") for l in labels]
            pdf["lang_score"] = [float(p[0]) for p in probs]
            yield pdf

    return df.mapInPandas(predict, schema=schema)


def run_quality(
    df: DataFrame,
    text_col: str = "text",
    allowed_langs: tuple[str, ...] = DEFAULT_ALLOWED_LANGS,
    threshold: float = DEFAULT_THRESHOLD,
    model_path: str | None = None,
    keep_only: bool = False,
    model_factory=None,
) -> DataFrame:
    """Append ``quality_keep: bool``; optionally filter to kept rows."""
    out = add_language(df, text_col, model_path, model_factory).withColumn(
        "quality_keep",
        F.col("lang_pred").isin(list(allowed_langs))
        & (F.col("lang_score") >= threshold),
    )
    return out.filter(F.col("quality_keep")) if keep_only else out


def language_distribution(df_scored: DataFrame) -> DataFrame:
    """Group-counts by (lang_pred) and by (lang_pred, quality_keep) — the
    reference's stage stats (quality/run.py:108-117)."""
    return df_scored.groupBy("lang_pred", "quality_keep").agg(
        F.count("*").alias("n_docs")
    )

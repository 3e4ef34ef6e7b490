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

from llm_data_pipeline_spark.functions.analysis import (
    detect_language,
    language_score,
)

DEFAULT_ALLOWED_LANGS = ("zh", "en")
DEFAULT_THRESHOLD = 0.4

_FASTTEXT = None


def _load_fasttext(model_path: str | None):
    global _FASTTEXT
    if _FASTTEXT is None:
        try:
            import fasttext  # type: ignore

            _FASTTEXT = fasttext.load_model(model_path)
        except Exception:
            _FASTTEXT = False
    return _FASTTEXT or None


def add_language(
    df: DataFrame,
    text_col: str = "text",
    model_path: str | None = None,
) -> DataFrame:
    """Append ``lang_pred: string`` and ``lang_score: double``."""
    model = _load_fasttext(model_path) if model_path else None
    if model is None:
        text = F.col(text_col)
        return df.withColumn("lang_pred", detect_language(text)).withColumn(
            "lang_score", language_score(text)
        )

    fields = df.schema.fieldNames()
    schema = df.schema.add("lang_pred", "string").add("lang_score", "double")

    def predict(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = _load_fasttext(model_path)
        for pdf in batches:
            texts = [
                " ".join(str(t).split()) for t in pdf[text_col].fillna("")
            ]
            labels, probs = m.predict(texts)
            pdf = pdf.copy()
            pdf["lang_pred"] = [l[0].replace("__label__", "") for l in labels]
            pdf["lang_score"] = [float(p[0]) for p in probs]
            yield pdf

    _ = fields
    return df.mapInPandas(predict, schema=schema)


def run_quality(
    df: DataFrame,
    text_col: str = "text",
    allowed_langs: tuple[str, ...] = DEFAULT_ALLOWED_LANGS,
    threshold: float = DEFAULT_THRESHOLD,
    model_path: str | None = None,
    keep_only: bool = False,
) -> DataFrame:
    """Append ``quality_keep: bool``; optionally filter to kept rows."""
    out = add_language(df, text_col, model_path).withColumn(
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

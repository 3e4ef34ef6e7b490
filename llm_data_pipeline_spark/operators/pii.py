"""PII stage: fast structured redaction + gated NER slow path.

Two-phase design (capability parity with reference pii/run.py:302-416,
re-architected for Spark):

1. **Fast path** (every row): native regexp_replace chain + boolean gate
   columns — pure codegen, no shuffle, linear scale.
2. **Slow path** (gated minority): person-name redaction via
   Arrow-batched ``mapInPandas`` with a per-executor model singleton.
   When Presidio/spaCy are unavailable (they are not part of this
   environment), a clearly-marked deterministic fallback redacts English
   full-name shapes by regex so the distributed plumbing stays real and
   testable.

The split/process/union is expressed as two filters over one persisted
frame + unionByName — Catalyst keeps the fast path entirely JVM-side.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from llm_data_pipeline_spark.functions import pii as P
from llm_data_pipeline_spark.functions.checkpoint import cut_lineage

_NER_SUPPORTED_LANGS = ("en", "zh")


def apply_structured(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str | None = "lang",
    keep_stats: bool = False,
) -> DataFrame:
    """Redact structured PII in-place and append gating columns
    (``need_ner``, ``ner_lang``; plus per-family flags if keep_stats)."""
    text = F.col(text_col)
    lang = F.col(lang_col) if lang_col and lang_col in df.columns else None
    out = df.withColumn("need_ner", P.need_ner(text))
    if keep_stats:
        out = out.withColumns(P.pii_flags(text))
    out = out.withColumn("ner_lang", P.ner_lang(text, lang))
    return out.withColumn(text_col, P.redact_structured(text))


# ---------------------------------------------------------------------------
# Slow path: PERSON-name redaction
# ---------------------------------------------------------------------------

# Per-worker-process engine cache (mapInPandas closures deserialize fresh
# in every Python worker; the singleton must be module-level).
_NER_CACHE: dict = {}


def _presidio_factory():
    from presidio_analyzer import AnalyzerEngine  # type: ignore

    return AnalyzerEngine()


def _load_ner_engine(engine_factory=None):
    """Per-executor lazy singleton. Returns an AnalyzerEngine-shaped object
    (``.analyze(text=, entities=, language=) -> spans with .start/.end``):
    the injected ``engine_factory``'s product, a Presidio AnalyzerEngine if
    that optional stack is installed, else None (fallback mode)."""
    factory = engine_factory or _presidio_factory
    key = getattr(factory, "__qualname__", repr(factory))
    engine = _NER_CACHE.get(key)
    if engine is None:
        try:
            engine = factory()
        except Exception:
            engine = False
        _NER_CACHE[key] = engine
    return engine or None


def _redact_names_batch(texts: pd.Series, engine_factory=None) -> pd.Series:
    engine = _load_ner_engine(engine_factory)
    if engine is not None:
        def one(t: str) -> str:
            try:
                spans = engine.analyze(text=t, entities=["PERSON"], language="en")
                for s in sorted(spans, key=lambda s: -s.start):
                    t = t[: s.start] + "<NAME>" + t[s.end :]
                return t
            except Exception:
                return t  # fail-soft per row, matching reference behaviour

        return texts.map(one)
    # Deterministic fallback (no model available in this environment):
    # redact English FullName shapes. Marked as a stand-in, not NER.
    return texts.str.replace(P.NAME_SHAPE_EN_RE, "<NAME>", regex=True)


def apply_person_ner(
    df: DataFrame,
    text_col: str = "text",
    supported_langs: tuple[str, ...] = _NER_SUPPORTED_LANGS,
    engine_factory=None,
) -> DataFrame:
    """Run the slow path only over gated rows, union the rest back.

    At 100 TB the gated fraction is what bounds cost: the ungated majority
    never leaves the JVM. ``engine_factory`` (picklable zero-arg callable)
    injects the NER engine, built once per executor Python worker.
    """
    gated = F.col("need_ner") & F.col("ner_lang").isin(list(supported_langs))
    # Both branches scan df; localCheckpoint (not persist) shares the single
    # materialization without leaving a permanent CacheManager entry — the
    # ContextCleaner frees the blocks when the result frame is GC'd.
    df = df.transform(cut_lineage, eager=False)
    fast = df.filter(~gated)
    slow = df.filter(gated)

    schema = df.schema
    text_idx = schema.fieldNames().index(text_col)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf.iloc[:, text_idx] = _redact_names_batch(
                pdf.iloc[:, text_idx], engine_factory
            )
            yield pdf

    slow_done = slow.mapInPandas(process, schema=schema)
    return fast.unionByName(slow_done)


def run_pii(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str | None = "lang",
    enable_person_ner: bool = True,
    keep_stats: bool = False,
    engine_factory=None,
) -> DataFrame:
    """Full PII stage. Drops internal gating columns unless keep_stats."""
    out = apply_structured(df, text_col, lang_col, keep_stats)
    if enable_person_ner:
        out = apply_person_ner(out, text_col, engine_factory=engine_factory)
    if not keep_stats:
        out = out.drop("need_ner", "ner_lang")
    return out

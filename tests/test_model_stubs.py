"""Exercise the model-backed mapInPandas singleton paths with stub models.

The real fastText / Presidio stacks are not installed in this environment;
these tests inject picklable stand-ins (llm_data_pipeline_spark.testing)
through the factory hooks so the per-executor-worker singleton branches
(the paths a real model would take) actually execute in CI, batch shapes
and schema contracts included.
"""

from __future__ import annotations

import pandas as pd

from llm_data_pipeline_spark.operators.pii import apply_person_ner, run_pii
from llm_data_pipeline_spark.operators.quality import add_language, run_quality
from llm_data_pipeline_spark.testing import (
    broken_factory,
    fake_fasttext_factory,
    fake_ner_factory,
)


def test_add_language_model_branch(spark):
    df = spark.createDataFrame(
        [(0, "spark engine shuffles data"), (1, "totally different words")],
        "doc_id long, text string",
    )
    out = add_language(df, model_factory=fake_fasttext_factory)
    rows = {r["doc_id"]: r for r in out.collect()}
    # labels/scores can only come from the stub (heuristic never emits stub_*)
    assert rows[0]["lang_pred"] == "stub_en"
    assert rows[1]["lang_pred"] == "stub_other"
    for r in rows.values():
        assert r["lang_score"] in (0.25, 0.75)
    # schema contract identical to the heuristic branch (names + types;
    # nullability flags legitimately differ between withColumn and
    # mapInPandas output)
    heur = add_language(df)
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in heur.schema.fields
    ]


def test_run_quality_with_stub_model(spark):
    df = spark.createDataFrame(
        [(0, "spark spark"), (1, "other text here")],
        "doc_id long, text string",
    )
    out = run_quality(
        df,
        allowed_langs=("stub_en",),
        threshold=0.0,
        model_factory=fake_fasttext_factory,
    )
    keep = {r["doc_id"]: r["quality_keep"] for r in out.collect()}
    assert keep == {0: True, 1: False}


def test_apply_person_ner_engine_branch(spark):
    df = spark.createDataFrame(
        [
            (0, "met AgentX at noon", True, "en"),
            (1, "met AgentX at noon", False, "en"),  # ungated: untouched
            (2, "AgentX saw AgentX", True, "en"),
            (3, "met AgentX at noon", True, "xx"),  # unsupported lang
        ],
        "doc_id long, text string, need_ner boolean, ner_lang string",
    )
    out = apply_person_ner(df, engine_factory=fake_ner_factory)
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert texts[0] == "met <NAME> at noon"
    assert texts[1] == "met AgentX at noon"
    assert texts[2] == "<NAME> saw <NAME>"
    assert texts[3] == "met AgentX at noon"


def test_run_pii_threads_engine_factory(spark):
    df = spark.createDataFrame(
        # structured-PII hit (email) gates the row into the NER slow path
        [(0, "mail john@x.com about AgentX", "en")],
        "doc_id long, text string, lang string",
    )
    out = run_pii(df, engine_factory=fake_ner_factory)
    t = out.first()["text"]
    assert "john@x.com" not in t
    assert "AgentX" not in t


def test_ner_batch_fallback_without_engine():
    """Direct batch call without any engine: regex fallback shape."""
    from llm_data_pipeline_spark.operators.pii import _redact_names_batch

    s = pd.Series(["Alice Smith wrote this", "no names here"])
    out = _redact_names_batch(s)
    assert out[0] == "<NAME> wrote this"
    assert out[1] == "no names here"


def test_factory_failure_falls_back(spark):
    """A factory that raises must fail-soft to the regex fallback."""
    df = spark.createDataFrame(
        [(0, "Alice Smith met AgentX", True, "en")],
        "doc_id long, text string, need_ner boolean, ner_lang string",
    )
    out = apply_person_ner(df, engine_factory=broken_factory)
    assert out.first()["text"] == "<NAME> met AgentX"

from __future__ import annotations

from pyspark.sql import Row

from llm_data_pipeline_spark.operators.pii import (
    apply_person_ner,
    apply_structured,
    run_pii,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, lang="en",
                text="email alice.smith+news@sub.example.co.uk please"),
            Row(doc_id=2, lang="en", text="server at 192.168.1.1 and 2001:db8::1"),
            Row(doc_id=3, lang="en", text="call 212-555-1234 or +1 212 555 1234"),
            Row(doc_id=4, lang="en", text="ssn is 123-45-6789 ok"),
            Row(doc_id=5, lang="zh", text="联系我 电话 13812345678"),
            Row(doc_id=6, lang="en", text="regards John Smith"),
            Row(doc_id=7, lang="fr", text="rien a signaler ici"),
            Row(doc_id=8, lang=None, text="这里 有 中文 内容 而已"),
        ]
    )


def test_structured_redaction(spark):
    out = {r.doc_id: r for r in apply_structured(_docs(spark), keep_stats=True).collect()}
    assert "<EMAIL>" in out[1].text and out[1].pii_has_email
    assert out[2].text.count("<IP>") >= 2 and out[2].pii_has_ip4 and out[2].pii_has_ip6
    assert "<PHONE>" in out[3].text and out[3].pii_has_phone
    assert "<SSN>" in out[4].text and out[4].pii_has_ssn
    assert "<PHONE>" in out[5].text  # CN mobile matches the phone heuristic
    assert out[7].text == "rien a signaler ici"


def test_gating(spark):
    out = {r.doc_id: r for r in apply_structured(_docs(spark)).collect()}
    assert out[1].need_ner and out[5].need_ner and out[6].need_ner
    assert not out[7].need_ner
    assert out[5].ner_lang == "zh"
    assert out[7].ner_lang == "fr"  # lang column wins over heuristic
    assert out[8].ner_lang == "zh"  # heuristic fallback on null lang


def test_person_ner_fallback(spark):
    df = apply_structured(_docs(spark))
    out = {r.doc_id: r for r in apply_person_ner(df).collect()}
    assert "<NAME>" in out[6].text  # gated row redacted (fallback shape regex)
    assert out[7].text == "rien a signaler ici"  # ungated rows untouched
    assert len(out) == 8  # union preserves all rows


def test_run_pii_drops_internal_cols(spark):
    out = run_pii(_docs(spark))
    assert "need_ner" not in out.columns and "ner_lang" not in out.columns
    assert out.count() == 8

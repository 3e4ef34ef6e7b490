"""PII detection/redaction regexes as native Column expressions.

Capability parity with the reference's structured PII fast path
(SURVEY.md §2.3 C7-C9; reference pii/run.py:37-67,104-146). Patterns are
written in the lookaround-free common subset of Java regex (Spark) and RE2
(DuckDB/Arrow), so the identical pattern text runs on both engines — this is
verified by the oracle queries.

The redaction chain is applied in a fixed order (email → ipv4 → ipv6 →
phone → ssn); order matters because e.g. phone patterns can match inside
already-redacted spans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- pattern text shared verbatim with the SQL oracles -------------------
EMAIL_RE = r"(?i)\b[a-z0-9._%+\-]+@[a-z0-9.\-]+\.[a-z]{2,}\b"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
IPV6_RE = r"\b(?:[0-9A-Fa-f]{0,4}:){2,7}[0-9A-Fa-f]{0,4}\b"
PHONE_RE = r"\b(?:\+?\d{1,3}[-.\s]?)?(?:\(?\d{2,4}\)?[-.\s]?)?\d{3}[-.\s]?\d{4}\b"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
CONTACT_KW_RE = (
    r"(?i)\b(contact|call|email\s+me|reach\s+me|tel|phone|ssn|wechat|whatsapp"
    r"|line|telegram)\b"
    r"|联系我|电话|手机号|邮箱|微信|QQ|WhatsApp|Telegram|Line"
)
NAME_SHAPE_EN_RE = r"\b[A-Z][a-z]+ [A-Z][a-z]+\b"
CJK_ANY_RE = "[一-鿿]"

# (pattern, replacement) in application order.
REDACTIONS: list[tuple[str, str]] = [
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (IPV6_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
    (SSN_RE, "<SSN>"),
]

FLAG_PATTERNS: dict[str, str] = {
    "pii_has_email": EMAIL_RE,
    "pii_has_ip4": IPV4_RE,
    "pii_has_ip6": IPV6_RE,
    "pii_has_phone": PHONE_RE,
    "pii_has_ssn": SSN_RE,
}


def pii_flags(text: Column) -> dict[str, Column]:
    """Boolean match flags for each structured PII family."""
    return {name: text.rlike(pat) for name, pat in FLAG_PATTERNS.items()}


def redact_structured(text: Column) -> Column:
    """Apply the full structured-redaction chain (JVM regex, codegen)."""
    out = text
    for pat, repl in REDACTIONS:
        out = F.regexp_replace(out, pat, repl)
    return out


def need_ner(text: Column) -> Column:
    """Cheap high-recall gate: route a row to the (100x slower) NER path iff
    any structured hit OR '@' OR contact keyword OR English full-name shape.
    Keeping this gate is the semantic optimization that makes per-row NER
    affordable at scale (reference pii/run.py:117-118)."""
    flags = pii_flags(text)
    structured = None
    for c in flags.values():
        structured = c if structured is None else (structured | c)
    return (
        structured
        | text.contains("@")
        | text.rlike(CONTACT_KW_RE)
        | text.rlike(NAME_SHAPE_EN_RE)
    )


def ner_lang(text: Column, lang: Column | None = None) -> Column:
    """Route NER language: 2-letter prefix of the lang column when present,
    else CJK-content heuristic → zh/en (reference pii/run.py:148-179)."""
    heuristic = F.when(text.rlike(CJK_ANY_RE), F.lit("zh")).otherwise(F.lit("en"))
    if lang is None:
        return heuristic
    return F.when(
        lang.isNotNull() & (F.length(lang) >= 2), F.lower(F.substring(lang, 1, 2))
    ).otherwise(heuristic)

"""Deterministic stand-ins for the optional model stacks.

These encode the exact object contracts the model-backed mapInPandas paths
expect (``operators/quality.add_language`` and
``operators/pii.apply_person_ner``), so the per-executor singleton branches
can run in any environment. They live in the package (not tests/) because
executor Python workers must be able to import the factory by module path
when the closure is pickled by reference.
"""

from __future__ import annotations


class FakeFastText:
    """fastText-shaped: ``predict(list[str]) -> (labels, probs)``.

    Deterministic: label depends on whether the text contains 'spark';
    score alternates 0.25/0.75 with text length parity.
    """

    def predict(self, texts):
        labels = [
            ("__label__stub_en" if "spark" in t else "__label__stub_other",)
            for t in texts
        ]
        probs = [(0.25 + 0.5 * (len(t) % 2),) for t in texts]
        return labels, probs


def fake_fasttext_factory():
    return FakeFastText()


class Span:
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class FakeNEREngine:
    """Presidio-AnalyzerEngine-shaped:
    ``analyze(text=, entities=, language=) -> [Span(start, end), ...]``.
    Flags every occurrence of the literal ``AgentX``."""

    TARGET = "AgentX"

    def analyze(self, text, entities, language):
        spans = []
        i = text.find(self.TARGET)
        while i >= 0:
            spans.append(Span(i, i + len(self.TARGET)))
            i = text.find(self.TARGET, i + 1)
        return spans


def fake_ner_factory():
    return FakeNEREngine()


def broken_factory():
    """Factory that always fails — exercises the fail-soft fallback."""
    raise RuntimeError("model unavailable")

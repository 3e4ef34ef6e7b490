"""Pure-Column expression function library (no Python UDFs).

Each submodule exports ``Column -> Column`` helpers that stay inside
Catalyst whole-stage codegen: text heuristics, PII regexes, hashing,
vector math, and text analysis.
"""

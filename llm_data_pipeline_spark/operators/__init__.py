"""DataFrame -> DataFrame pipeline operators.

Each operator is a pure function of DataFrames (plus config), declared with
the DataFrame API so Catalyst owns the physical plan. Model-backed operators
(tokenizers, NER) use Arrow-vectorized pandas UDFs with per-executor lazy
singletons.
"""

"""Unigram-LM tokenizer (Kudo 2018 — the SentencePiece algorithm) run
natively in the engine: Viterbi segmentation under committed integer
micro-nat piece costs.

The reference's core tokenizer is SentencePiece
(/root/reference/src/llm_data_pipeline/tokenizer/train.py:90-264); the
sentencepiece wheel cannot be installed in this container, so the
ALGORITHM is implemented here instead of wrapped: a trained unigram piece
vocabulary (scripts/gen_unigram_vocab.py — seed n-grams, hard-EM
reweighting, prune; costs = round(1e6*ln(total/count)) committed as
literals in data/unigram_vocab.py) and exact Viterbi decoding. All
query-time arithmetic is integer compares and adds — ln evaluated once at
generation time, never per engine — so the segmentation is bit-replayable
by a DuckDB DP oracle.

The encode runs as ONE Arrow-batched pandas UDF (the tokenizer is the
canonical legitimate-Python stage — same verdict as the reference, whose
tokenize stage is also a Python worker over batches); everything around
it stays JVM-side. DP cost is O(len * MAX_PIECE) per doc with a dict
probe per step — no quadratic anything, no state beyond the broadcast
vocab dict (a few KB here; a few MB at vocab 32k, still broadcast-sized).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from llm_data_pipeline_spark.data.unigram_vocab import (
    DEFAULT_COST,
    MAX_PIECE,
    PIECES,
    PREFIX,
)


def viterbi_segment(
    t: str,
    cost: dict[str, int] | None = None,
    default: int | None = None,
    max_piece: int = MAX_PIECE,
) -> tuple[list[str], int]:
    """Exact Viterbi segmentation of ``t``: (pieces, total_cost_micro).

    Tie-break: minimize (cost, piece_len) — the same total order the SQL
    oracle uses (ORDER BY nc, l), so both engines pick identical paths.
    Unknown single chars cost ``default`` (coverage never breaks).
    """
    cost = PIECES if cost is None else cost
    default = DEFAULT_COST if default is None else default
    n = len(t)
    dp: list[int] = [0] * (n + 1)
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        best = None
        bl = 1
        for l in range(1, min(max_piece, i) + 1):
            c = cost.get(t[i - l : i])
            if c is None:
                if l != 1:
                    continue
                c = default
            cand = (dp[i - l] + c, l)
            if best is None or cand < best:
                best, bl = cand, l
        dp[i] = best[0]
        back[i] = bl
    pieces, i = [], n
    while i > 0:
        pieces.append(t[i - back[i] : i])
        i -= back[i]
    return pieces[::-1], dp[n]


def unigram_encode_expr(text: Column) -> Column:
    """struct(pieces: '|'-joined string, n_pieces, total_cost_micro) for
    one text column, via one Arrow-batched pandas UDF."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(
        "pieces string, n_pieces int, total_cost_micro bigint"
    )
    def _encode(s: pd.Series) -> pd.DataFrame:
        out = []
        for t in s:
            if t is None:
                out.append(("", 0, 0))
                continue
            pieces, c = viterbi_segment(t)
            out.append(("|".join(pieces), len(pieces), c))
        return pd.DataFrame(
            out, columns=["pieces", "n_pieces", "total_cost_micro"]
        )

    return _encode(text)


def graded_prefix(text: Column) -> Column:
    """The graded-fixture text: norm_ws prefix padded to exactly PREFIX
    chars so every doc's DP has the same depth — which is what lets the
    oracle unroll it. The '_' pad char is deliberately NOT a corpus char
    (tests pin this): it rides the DEFAULT_COST length-1 fallback, which
    both engines apply identically, so the pad also exercises the
    unknown-char path on every document."""
    from llm_data_pipeline_spark.functions.text import norm_ws

    return F.rpad(F.substring(norm_ws(text), 1, PREFIX), PREFIX, "_")

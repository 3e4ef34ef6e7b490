"""BPE tokenizer tests: trainer equivalence, encode/decode, Spark parity."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from llm_data_pipeline_spark.operators.bpe import (
    bpe_vocab,
    decode_ids,
    encode_bpe,
    encode_word,
    learn_bpe,
    learn_bpe_naive,
    train_bpe,
)
from llm_data_pipeline_spark.operators.tokenizer import UNK_ID

WF = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3), ("new", 1)]


def test_incremental_matches_naive():
    for n in (1, 5, 10, 50):
        assert learn_bpe(WF, n) == learn_bpe_naive(WF, n)


def test_merges_deterministic_under_input_order():
    assert learn_bpe(list(reversed(WF)), 10) == learn_bpe(WF, 10)


def test_min_pair_freq_stops_training():
    # freq-1 words alone can never reach min_pair_freq=2
    assert learn_bpe([("abc", 1)], 10, min_pair_freq=2) == []
    assert len(learn_bpe([("abc", 2)], 10, min_pair_freq=2)) > 0


def test_encode_decode_roundtrip():
    merges = learn_bpe(WF, 30)
    vocab = bpe_vocab(WF, merges, byte_fallback=False)
    ranks = {p: i for i, p in enumerate(merges)}
    pids = dict(vocab)
    for w, _ in WF:
        ids = encode_word(w, ranks, pids)
        assert decode_ids(ids, vocab) == w
        assert UNK_ID not in ids  # training words are always representable
    # chars unseen in training -> UNK when byte fallback is off
    assert set(encode_word("zzz", ranks, pids)) == {UNK_ID}


def test_byte_fallback_roundtrip():
    merges = learn_bpe(WF, 30)
    vocab = bpe_vocab(WF, merges, byte_fallback=True)
    ranks = {p: i for i, p in enumerate(merges)}
    pids = dict(vocab)
    # unseen ASCII and multibyte chars encode to byte pieces, never UNK,
    # and decode back losslessly
    for w in ("zzz", "naïve", "中文", "Q42!"):
        ids = encode_word(w, ranks, pids)
        assert UNK_ID not in ids
        assert decode_ids(ids, vocab) == w
    # training words still take their merged pieces, not bytes
    assert len(encode_word("newest", ranks, pids)) == 1


def test_min_word_freq_bounds_collect(spark):
    """The min_freq pushdown caps the driver-side word list: a long-tail
    corpus (many hapax words) collects only the heavy tail."""
    from llm_data_pipeline_spark.operators.bpe import word_counts

    rows = [(i, f"common word tail{i}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert word_counts(df, min_freq=2).count() == 2  # common, word
    assert word_counts(df, min_freq=1).count() == 502


def test_trained_word_encodes_to_fewer_symbols():
    merges = learn_bpe(WF, 30)
    vocab = bpe_vocab(WF, merges)
    ranks = {p: i for i, p in enumerate(merges)}
    pids = dict(vocab)
    # "newest" (freq 6) should be fully merged into one piece
    assert len(encode_word("newest", ranks, pids)) == 1


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcde", min_size=1, max_size=8),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=20,
    ),
    st.integers(min_value=1, max_value=30),
)
def test_property_incremental_equals_naive(pairs, n_merges):
    # collapse duplicate words (both impls expect a dict-like freq list)
    agg: Counter = Counter()
    for w, f in pairs:
        agg[w] += f
    wf = sorted(agg.items())
    assert learn_bpe(wf, n_merges) == learn_bpe_naive(wf, n_merges)


@pytest.mark.usefixtures("spark")
def test_spark_train_matches_golden_pipeline(spark, sf_dir):
    """Spark train_bpe (distributed counts + incremental trainer) must match
    the independent DuckDB+naive path used to pin the oracle goldens."""
    import duckdb

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wf_spark, merges_spark, vocab_spark = train_bpe(docs, n_merges=40)

    rows = duckdb.sql(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    agg: Counter = Counter()
    for (text,) in rows:
        for w in (text or "").split():
            agg[w] += 1
    wf_ref = sorted(agg.items())
    assert sorted(wf_spark) == wf_ref
    assert merges_spark == learn_bpe_naive(wf_ref, 40)


@pytest.mark.usefixtures("spark")
def test_spark_encode_matches_pure_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    wf, merges, vocab = train_bpe(docs, n_merges=25)
    enc = {
        r["doc_id"]: list(r["input_ids"])
        for r in encode_bpe(docs, merges, vocab).collect()
    }
    ranks = {p: i for i, p in enumerate(merges)}
    pids = dict(vocab)
    for row in docs.select("doc_id", "text").collect():
        expect: list[int] = []
        for w in (row["text"] or "").split():
            expect.extend(encode_word(w, ranks, pids))
        assert enc[row["doc_id"]] == expect


def test_byte_spelling_collision_roundtrips_as_text():
    """Corpus text literally containing '<0x41>' must never mint a text
    piece that collides with the byte piece (decode would yield raw byte
    'A'); the spelled symbol byte-fallbacks and roundtrips losslessly."""
    from llm_data_pipeline_spark.operators.bpe import BYTE_ID_BASE, byte_piece

    # heavy repetition so merges would otherwise assemble '<0x41>' whole
    wf = [("x<0x41>y", 50), ("<0x41>", 80), ("ab", 3)]
    merges = learn_bpe(wf, 60, min_pair_freq=1)
    vocab = bpe_vocab(wf, merges, byte_fallback=True)
    pieces = [p for p, _ in vocab]
    assert len(pieces) == len(set(pieces))  # ids AND spellings unique
    # byte pieces occupy exactly the fixed id range
    pid = dict(vocab)
    assert all(pid[byte_piece(b)] == BYTE_ID_BASE + b for b in range(256))
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("<0x41>", "x<0x41>y", "<0xFF>", "a<0x00>b"):
        ids = encode_word(w, ranks, pid)
        assert decode_ids(ids, vocab) == w, w

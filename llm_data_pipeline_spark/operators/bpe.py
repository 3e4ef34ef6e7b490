"""Deterministic BPE tokenizer (M1 parity with the reference's SentencePiece
training, /root/reference/src/llm_data_pipeline/tokenizer/train.py:90-264).

The reference trains a SentencePiece BPE model (vocab 32000, byte_fallback,
unk=0/bos=1/eos=2/pad=3). SentencePiece is not installed in this
environment, so this module implements classic merge-rule BPE natively —
the public Sennrich et al. 2016 algorithm (arXiv:1508.07909), which is also
what SentencePiece's BPE trainer implements — with a fully deterministic
tie-break so training is reproducible bit-for-bit.

Scale design (100 TB): BPE merge learning is inherently sequential (each
merge depends on a global argmax), but it never needs the corpus — only the
word-frequency dictionary, which is bounded by vocabulary growth (~10M
unique words for web-scale corpora; Heaps' law), not corpus size. So:

- ``word_counts``  — the ONLY corpus-sized work: one distributed
  groupBy(word).count(). At 100 TB this is a single shuffle keyed by word.
- ``learn_bpe``    — driver-side merge learning over the collected word
  dict with incremental pair-count maintenance (only words containing the
  just-merged pair are touched per iteration — the subword-nmt indexing
  trick, not a full recount).
- ``encode_bpe``   — distributed Arrow-batched pandas UDF; the merge-rank
  table rides a Spark broadcast; a per-executor word→ids cache makes the
  amortized cost per repeated word O(1) (Zipf: the cache hit rate on real
  text is >95%).

Word model: SentencePiece-style "▁" word-start marker; initial symbols are
unicode characters. ``byte_fallback=True`` (the reference default,
tokenizer/train.py:117) adds the 256 ``<0xNN>`` byte pieces at the fixed
id range [BYTE_ID_BASE, BYTE_ID_BASE+255] so symbols unseen in training
encode to their UTF-8 bytes instead of UNK.

Special ids match the reference SPM config: unk=0, bos=1, eos=2, pad=3.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from llm_data_pipeline_spark.operators.tokenizer import (
    BOS_ID,
    EOS_ID,
    N_SPECIAL,
    PAD_ID,
    UNK_ID,
)

WORD_MARKER = "▁"  # ▁ — SentencePiece word-start marker


def word_counts(
    df: DataFrame, text_col: str = "text", min_freq: int = 1
) -> DataFrame:
    """Distributed word-frequency extraction: (word, freq).

    Whitespace tokenization (the reference SPM treats whitespace as the
    word boundary); the output is vocabulary-sized, not corpus-sized.

    ``min_freq`` is the web-scale guard: the unique-word set of a 100 TB
    crawl is dominated by a hapax tail (typos, ids, binary junk) that
    contributes nothing to merge learning (a pair inside a freq-1 word can
    reach pair-freq ``min_pair_freq`` only via other words, which carry it
    themselves). Filtering AFTER the aggregate — a cheap post-shuffle
    predicate — bounds the driver collect in :func:`train_bpe` to the
    heavy-tail vocabulary instead of the raw unique-token count.
    """
    counts = (
        df.select(
            F.explode(
                F.filter(
                    F.split(F.col(text_col), r"\s+"), lambda x: x != ""
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    if min_freq > 1:
        counts = counts.where(F.col("freq") >= min_freq)
    return counts


def _initial_symbols(word: str) -> tuple[str, ...]:
    """(▁ + word) split into characters, marker fused to the first char."""
    chars = list(word)
    if not chars:
        return ()
    return tuple([WORD_MARKER + chars[0]] + chars[1:])


def learn_bpe(
    word_freqs: list[tuple[str, int]],
    n_merges: int,
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Driver-side BPE merge learning with incremental pair maintenance.

    Deterministic: best pair = max by (freq DESC, (left, right) lexicographic
    ASC). Stops early when no pair reaches ``min_pair_freq``.

    Incremental update (subword-nmt style): keep pair→freq and pair→word
    index; on each merge, only re-derive pair contributions of the words
    that actually contain the merged pair. The argmax is a lazy-deletion
    heap: every freq INCREASE pushes a fresh entry, decreases leave stale
    entries that are re-validated (and re-pushed at their current freq) on
    pop — so the max stored entry per pair always dominates its current
    freq, the first entry whose stored freq matches its current freq is
    the global argmax, and one merge costs O(touched·log P) instead of the
    two O(P) dict scans per merge that made 8k-merge training minutes-slow.
    Per merge, every pair whose freq changed is pushed ONCE at its final
    value (a per-merge touched set), so a popped entry whose stored freq
    mismatches its current freq is simply dropped — a current-value entry
    is guaranteed to exist elsewhere in the heap.
    Tie-break is unchanged: freq DESC then (left, right) lexicographic ASC
    ((-f, pair) heap ordering gives exactly that).
    """
    import heapq

    words: list[list[str]] = []
    freqs: list[int] = []
    for w, f in sorted(word_freqs):  # sorted: independence from input order
        syms = _initial_symbols(w)
        if len(syms) < 2:
            # single-symbol words contribute no pairs but still encode
            pass
        words.append(list(syms))
        freqs.append(int(f))

    pair_freq: Counter = Counter()
    pair_words: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    heap: list[tuple[int, tuple[str, str]]] = []

    def _add_word(i: int, sign: int, touched: set | None) -> None:
        syms, f = words[i], freqs[i]
        for a, b in zip(syms, syms[1:]):
            p = (a, b)
            nf = pair_freq[p] + sign * f
            if nf > 0:
                pair_freq[p] = nf
            else:
                # freq 0 means no counted word holds the pair: both dicts
                # can drop it (a later re-add rebuilds them consistently)
                pair_freq.pop(p, None)
                pair_words.pop(p, None)
            if sign > 0:
                pair_words[p].add(i)
            if touched is not None:
                touched.add(p)

    for i in range(len(words)):
        _add_word(i, +1, None)
    heap = [(-f, p) for p, f in pair_freq.items() if f >= min_pair_freq]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        best = None
        while heap:
            nf, p = heapq.heappop(heap)
            if pair_freq.get(p, 0) == -nf:
                best = p
                break
            # stale: drop — the pair's current-value entry (if it still
            # qualifies) was pushed by the merge that changed it
        if best is None:
            break
        merges.append(best)
        a, b = best
        merged = a + b
        touched: set = set()
        for i in sorted(pair_words[best]):
            syms = words[i]
            _add_word(i, -1, touched)
            j, out = 0, []
            while j < len(syms):
                if j < len(syms) - 1 and syms[j] == a and syms[j + 1] == b:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            _add_word(i, +1, touched)
        for p in touched:
            f = pair_freq.get(p, 0)
            if f >= min_pair_freq:
                heapq.heappush(heap, (-f, p))
    return merges


def learn_bpe_naive(
    word_freqs: list[tuple[str, int]],
    n_merges: int,
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Reference implementation: full pair recount every iteration.

    Independent of ``learn_bpe``'s incremental bookkeeping — used by tests
    (and by the pinned-golden oracle generation) to cross-check it.
    """
    words = {
        w: list(_initial_symbols(w)) for w, _ in word_freqs
    }
    freqs = dict(word_freqs)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, syms in words.items():
            f = freqs[w]
            for p in zip(syms, syms[1:]):
                pc[p] += f
        if not pc:
            break
        # deterministic argmax: freq DESC then pair lexicographic ASC
        top = max(pc.values())
        best = min(p for p, f in pc.items() if f == top)
        best_freq = pc[best]
        if best_freq < min_pair_freq:
            break
        merges.append(best)
        a, b = best
        merged = a + b
        for w, syms in words.items():
            j, out = 0, []
            while j < len(syms):
                if j < len(syms) - 1 and syms[j] == a and syms[j + 1] == b:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[w] = out
    return merges


def byte_piece(b: int) -> str:
    """SentencePiece byte-fallback piece spelling: ``<0xAB>``."""
    return f"<0x{b:02X}>"


# With byte_fallback the 256 byte pieces always follow the 4 specials, so
# their ids are the FIXED range [BYTE_ID_BASE, BYTE_ID_BASE + 255] — the
# id range, not the piece spelling, is what identifies a byte piece
# (corpus text can legitimately contain the literal string '<0x41>').
BYTE_ID_BASE = N_SPECIAL
_BYTE_SPELLINGS = frozenset(byte_piece(b) for b in range(256))


def bpe_vocab(
    word_freqs: list[tuple[str, int]],
    merges: list[tuple[str, str]],
    byte_fallback: bool = True,
) -> list[tuple[str, int]]:
    """(piece, id) table: specials, then (with ``byte_fallback``) the 256
    byte pieces ``<0x00>``..``<0xFF>``, then alphabet by (freq DESC, char
    ASC), then merge products in merge order. Deterministic.

    ``byte_fallback=True`` is the reference default (SPM config
    tokenizer/train.py:117): symbols unseen in training encode to
    their UTF-8 bytes instead of UNK, so no input can lose information.
    """
    char_freq: Counter = Counter()
    for w, f in word_freqs:
        for c in _initial_symbols(w):
            char_freq[c] += f
    alphabet = sorted(char_freq, key=lambda c: (-char_freq[c], c))
    text_pieces = alphabet + [a + b for a, b in merges]
    if byte_fallback:
        # A merge product can spell exactly '<0xNN>' when the corpus
        # contains that literal text. It must NOT become a text piece: its
        # id would be indistinguishable from the byte piece's and decode as
        # the raw byte. Skip it — encode_word routes any byte-spelled
        # symbol through byte fallback, which roundtrips the literal text.
        text_pieces = [p for p in text_pieces if p not in _BYTE_SPELLINGS]
    pieces = (
        ["<unk>", "<s>", "</s>", "<pad>"]
        + ([byte_piece(b) for b in range(256)] if byte_fallback else [])
        + text_pieces
    )
    # first-occurrence dedup: two merges may legitimately produce the same
    # product string (e.g. ('a','bc') and ('ab','c')); both map to one id
    seen = {}
    for p in pieces:
        if p not in seen:
            seen[p] = len(seen)
    if byte_fallback:
        assert all(
            seen[byte_piece(b)] == BYTE_ID_BASE + b for b in range(256)
        ), "byte pieces must occupy the fixed id range"
    return list(seen.items())


def encode_word(
    word: str, ranks: dict[tuple[str, str], int], piece_ids: dict[str, int]
) -> list[int]:
    """Greedy merge-rank BPE encode of one word (standard BPE inference):
    repeatedly apply the present pair with the lowest merge rank.

    A residual symbol absent from the vocab falls back to its UTF-8 bytes
    when the vocab carries the 256 ``<0xXX>`` pieces (reference parity:
    byte_fallback=True, tokenizer/train.py:117), so unseen characters
    never collapse to UNK. With the fused word-start marker, an unknown
    first-char symbol ``▁X`` byte-encodes marker bytes included — a
    documented divergence from SPM's unfused marker, deterministic on both
    the engine and the golden-replay side. Without byte pieces: UNK.
    """
    syms = list(_initial_symbols(word))
    while len(syms) > 1:
        best_rank, best_j = None, None
        for j in range(len(syms) - 1):
            r = ranks.get((syms[j], syms[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_j is None:
            break
        syms[best_j : best_j + 2] = [syms[best_j] + syms[best_j + 1]]
    has_bytes = piece_ids.get(byte_piece(0)) == BYTE_ID_BASE
    ids: list[int] = []
    for s in syms:
        # a residual symbol spelled exactly like a byte piece is literal
        # corpus text, never a text piece (bpe_vocab refuses to mint one)
        # — byte-fallback its UTF-8 bytes so '<0x41>' roundtrips as text
        if has_bytes and s in _BYTE_SPELLINGS:
            ids.extend(BYTE_ID_BASE + b for b in s.encode("utf-8"))
            continue
        got = piece_ids.get(s)
        if got is not None:
            ids.append(got)
        elif has_bytes:
            ids.extend(BYTE_ID_BASE + b for b in s.encode("utf-8"))
        else:
            ids.append(UNK_ID)
    return ids


def encode_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    vocab: list[tuple[str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    add_bos_eos: bool = False,
) -> DataFrame:
    """Distributed BPE encode: broadcast merge ranks + piece ids into an
    Arrow-batched pandas UDF with a per-executor word→ids cache."""
    from pyspark.sql.types import ArrayType, IntegerType

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        (
            {p: i for i, p in enumerate(merges)},
            dict(vocab),
        )
    )

    @F.pandas_udf(ArrayType(IntegerType()))
    def _encode(texts: pd.Series) -> pd.Series:
        ranks, piece_ids = bc.value
        cache: dict[str, list[int]] = {}

        def enc(t: str | None) -> list[int]:
            ids: list[int] = []
            if add_bos_eos:
                ids.append(BOS_ID)
            for w in (t or "").split():
                got = cache.get(w)
                if got is None:
                    got = encode_word(w, ranks, piece_ids)
                    cache[w] = got
                ids.extend(got)
            if add_bos_eos:
                ids.append(EOS_ID)
            return ids

        return texts.map(enc)

    return df.select(F.col(id_col), _encode(F.col(text_col)).alias("input_ids"))


def decode_ids(ids: list[int], vocab: list[tuple[str, int]]) -> str:
    """Inverse of encode: concat pieces (byte pieces reassembled into
    UTF-8 runs), ▁ → space.

    Byte pieces are identified by their FIXED id range
    [BYTE_ID_BASE, BYTE_ID_BASE+255] — never by the piece spelling, which
    corpus text can collide with ('<0x41>' as literal text)."""
    rev = {i: p for p, i in vocab}
    has_bytes = rev.get(BYTE_ID_BASE) == byte_piece(0)
    specials = {UNK_ID, BOS_ID, EOS_ID, PAD_ID}
    chunks: list[str] = []
    byte_run: list[int] = []

    def flush() -> None:
        if byte_run:
            chunks.append(bytes(byte_run).decode("utf-8", errors="replace"))
            byte_run.clear()

    for i in ids:
        if i in specials:
            continue
        if has_bytes and BYTE_ID_BASE <= i < BYTE_ID_BASE + 256:
            byte_run.append(i - BYTE_ID_BASE)
        else:
            flush()
            chunks.append(rev.get(i, ""))
    flush()
    return "".join(chunks).replace(WORD_MARKER, " ").strip()


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 64,
    min_pair_freq: int = 2,
    min_word_freq: int = 1,
    byte_fallback: bool = True,
) -> tuple[list[tuple[str, int]], list[tuple[str, str]], list[tuple[str, int]]]:
    """Full training: distributed word counts → driver merge learning.

    Returns (word_freqs, merges, vocab). The collect is bounded by the
    unique words of frequency >= ``min_word_freq`` — set it > 1 at corpus
    scale so the hapax tail never reaches the driver (see
    :func:`word_counts`). ``byte_fallback`` adds the 256 byte pieces so
    characters the (filtered) training set never saw still encode.
    """
    wf = [
        (r["word"], r["freq"])
        for r in word_counts(df, text_col, min_freq=min_word_freq).collect()
    ]
    merges = learn_bpe(wf, n_merges, min_pair_freq)
    return wf, merges, bpe_vocab(wf, merges, byte_fallback=byte_fallback)

"""Generate pinned-golden oracle data for the BPE graded queries.

Uses an INDEPENDENT computation path from the Spark queries: DuckDB for
word counts + the naive full-recount BPE trainer + pure-Python encode
(the Spark side uses a distributed groupBy, the incremental indexed
trainer, and an Arrow pandas UDF). Writes
``llm_data_pipeline_spark/data/bpe_golden.json`` keyed by the corpus
fingerprint ``sum(length(text))`` so one oracle SQL string can dispatch
between sf dirs.

Parameters mirror the graded queries (queries_tokenize.py): n_merges=1000
(training exhausts pairs early on the synthetic corpus), min_word_freq=2
(the web-scale hapax pushdown), byte_fallback=True (reference SPM parity),
plus the byte-fallback fixture encode.
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llm_data_pipeline_spark.operators.bpe import (  # noqa: E402
    bpe_vocab,
    encode_word,
    learn_bpe_naive,
)

N_MERGES = 1000
MIN_PAIR_FREQ = 2
MIN_WORD_FREQ = 2
FIXTURE_TEXT = "data naïve café zèbre 中文数据 Q42 x_9!"

out: dict[str, dict] = {}
for sf in ("0.001", "0.01", "0.1"):
    path = f"/root/testdata/sf{sf}/documents.parquet"
    con = duckdb.connect()
    sig = con.execute(
        f"SELECT sum(length(text)) FROM read_parquet('{path}')"
    ).fetchone()[0]
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{path}')"
    ).fetchall()

    wf_counter: Counter = Counter()
    for _, text in rows:
        for w in (text or "").split():
            wf_counter[w] += 1
    word_freqs = sorted(
        (w, f) for w, f in wf_counter.items() if f >= MIN_WORD_FREQ
    )

    merges = learn_bpe_naive(word_freqs, N_MERGES, MIN_PAIR_FREQ)
    vocab = bpe_vocab(word_freqs, merges, byte_fallback=True)
    ranks = {p: i for i, p in enumerate(merges)}
    piece_ids = dict(vocab)

    word_ids = {w: encode_word(w, ranks, piece_ids) for w in wf_counter}
    dist: Counter = Counter()
    sums: Counter = Counter()
    for doc_id, text in rows:
        ids: list[int] = []
        for w in (text or "").split():
            ids.extend(word_ids[w])
        dist[len(ids)] += 1
        sums[len(ids)] += sum(ids)

    fixture_ids: list[int] = []
    for w in FIXTURE_TEXT.split():
        fixture_ids.extend(encode_word(w, ranks, piece_ids))

    # per-language fertility (independent path for tokenizer_fertility_by_lang)
    from llm_data_pipeline_spark.functions.intmath import rounded_div

    lang_rows = con.execute(
        f"SELECT coalesce(lang,''), coalesce(text,'') FROM read_parquet('{path}')"
    ).fetchall()
    fert: dict[str, list[int]] = {}
    for lang, text in lang_rows:
        words = text.split()
        toks = 0
        for w in words:
            toks += len(word_ids[w]) if w in word_ids else len(
                encode_word(w, ranks, piece_ids)
            )
        st = fert.setdefault(lang, [0, 0, 0, 0])
        st[0] += 1
        st[1] += len(words)
        st[2] += toks
        st[3] += len(text)
    fertility = sorted(
        [
            lang,
            st[0],
            st[1],
            st[2],
            st[3],
            rounded_div(st[2] * 1_000_000, max(st[1], 1)),
            rounded_div(st[3] * 1_000_000, max(st[2], 1)),
        ]
        for lang, st in fert.items()
    )

    out[str(int(sig))] = {
        "fertility_by_lang": fertility,
        "sf": sf,
        "n_docs": len(rows),
        "merges": [
            [i, a, b, a + b] for i, (a, b) in enumerate(merges)
        ],
        "encode_dist": sorted(
            [n, dist[n], sums[n]] for n in dist
        ),
        "fixture_ids": fixture_ids,
    }
    print(
        f"sf{sf}: sig={int(sig)} merges={len(merges)} "
        f"dist_rows={len(dist)} pieces={len(vocab)} "
        f"fixture_ids={len(fixture_ids)}"
    )

dest = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "llm_data_pipeline_spark",
    "data",
    "bpe_golden.json",
)
os.makedirs(os.path.dirname(dest), exist_ok=True)
with open(dest, "w") as f:
    json.dump(out, f, indent=1, ensure_ascii=False)
print("wrote", dest)

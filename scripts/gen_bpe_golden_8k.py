"""Generate the pinned golden for the reference-scale BPE trainer query
(bpe_train_merges_8k, queries_tokenize.py).

INDEPENDENT computation path: the synthetic Zipf corpus is rebuilt here in
pure Python (the Spark side builds it in-plan with SQL md5/arithmetic) and
trained with the naive full-recount trainer (the Spark side collects a
distributed word count and runs the incremental heap trainer). The corpus
is SF-independent (doc_id < 50 exists at every sf), so one golden, no
signature dispatch.

Corpus recipe (must match queries_tokenize.py BPE8K_* constants):
  pool word j = md5(str(j))[:20], j in [0, 6400)
  doc d (0..49) draws k in [0, 320): u = (d*131071 + k*8191) % 6400,
                                     j = (u*u) // 6400
Zipf-ish selection (quadratic index) gives decisive merge argmaxes — the
realistic shape for BPE training corpora — and sustains >9000 merges at
min_pair_freq=2 from 1683 distinct words.

Output digest: per 256-rank bucket — n_merges, sum of merged-piece
lengths, lexicographic min/max merged piece. 32 rows; any trainer
divergence (order, tie-break, content) shifts at least one bucket.

Writes llm_data_pipeline_spark/data/bpe_golden_8k.json.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llm_data_pipeline_spark.operators.bpe import learn_bpe_naive  # noqa: E402

N_DOCS = 50
DRAWS = 320
POOL = 6400
WLEN = 20
N_MERGES = 8192
MIN_PAIR_FREQ = 2
BUCKET = 256


def corpus_word_freqs() -> list[tuple[str, int]]:
    pool = [hashlib.md5(str(j).encode()).hexdigest()[:WLEN] for j in range(POOL)]
    c: Counter = Counter()
    for d in range(N_DOCS):
        for k in range(DRAWS):
            u = (d * 131071 + k * 8191) % POOL
            j = (u * u) // POOL
            c[pool[j]] += 1
    return sorted(c.items())


def digest(merges: list[tuple[str, str]]) -> list[tuple[int, int, int, str, str]]:
    rows = []
    for b0 in range(0, len(merges), BUCKET):
        chunk = [a + b for a, b in merges[b0 : b0 + BUCKET]]
        rows.append(
            (
                b0 // BUCKET,
                len(chunk),
                sum(len(m) for m in chunk),
                min(chunk),
                max(chunk),
            )
        )
    return rows


if __name__ == "__main__":
    wf = corpus_word_freqs()
    print(f"corpus: {len(wf)} distinct words, {sum(f for _, f in wf)} instances")
    t0 = time.time()
    merges = learn_bpe_naive(wf, N_MERGES, MIN_PAIR_FREQ)
    print(f"naive trainer: {len(merges)} merges in {time.time() - t0:.1f}s")
    assert len(merges) == N_MERGES, "corpus must sustain the full merge count"
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "llm_data_pipeline_spark",
        "data",
        "bpe_golden_8k.json",
    )
    with open(path, "w") as f:
        json.dump({"digest": digest(merges)}, f, indent=1)
    print("wrote", path)

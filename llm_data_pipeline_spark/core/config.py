"""PipelineConfig: the engine's entire "IR" (reference core.py:26-62).

Like the reference, the pipeline has no query IR beyond a flat config of
paths and knobs plus the ordered step list — state between steps lives in
parquet directories under ``output_base``, which is what makes resume
trivially correct (reference pipeline.py:113-138).

Defaults mirror the reference's perf-relevant configuration space
(BASELINE.md): minhash k=128/seed=42/5-gram, rows_per_band=4, seq_len=4096,
vocab 32000, LID threshold 0.4 langs (zh, en), clean thresholds in
functions/text.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from llm_data_pipeline_spark.functions.text import CleanThresholds


@dataclass
class PipelineConfig:
    output_base: str
    # Explicit input for the first executed step (reference core.py:267-271);
    # when unset, the first step's input is ``wet_glob`` (ingest) or the
    # previous step's conventional output directory.
    input: str | None = None
    wet_glob: str | None = None
    limit: int | None = None

    clean_rules: CleanThresholds = field(default_factory=CleanThresholds)

    allowed_langs: tuple[str, ...] = ("en", "zh")
    lang_threshold: float = 0.4

    enable_person_ner: bool = True
    pii_keep_stats: bool = False

    minhash_k: int = 128
    minhash_seed: int = 42
    minhash_ngram: int = 5
    rows_per_band: int = 4
    bucket_cap: int = 2000

    vocab_size: int = 32000
    # "word" (frequency-ranked word vocab, SQL-oracle-checkable) or "bpe"
    # (native deterministic merge-rule BPE — the reference's SentencePiece
    # semantics, operators/bpe.py)
    tokenizer: str = "word"
    bpe_merges: int = 2000
    bpe_min_pair_freq: int = 2
    n_text_shards: int = 8
    seq_len: int = 4096
    drop_remainder: bool = True
    export_dtype: str = "uint16"


# Output directory conventions (reference core.py:279-286): step X writes
# base/X_parquet, with the reference's three special names preserved.
OUTPUT_DIR_NAMES: dict[str, str] = {
    "clean": "cleaned_parquet",
    "clustering": "deduped_parquet",
    "token_packing": "token_packing_parquet",
}


def step_output_dir(base: str, step: str) -> str:
    return f"{base}/{OUTPUT_DIR_NAMES.get(step, step + '_parquet')}"

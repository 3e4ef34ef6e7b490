"""CLI orchestrator (reference pipeline.py:32-66, core.py:531-585 parity).

    python -m llm_data_pipeline_spark --output-base /tmp/run \\
        --input /root/testdata/sf0.001/documents.parquet
    python -m llm_data_pipeline_spark --output-base /tmp/run \\
        --steps clean quality --resume-from quality
    python -m llm_data_pipeline_spark --output-base /tmp/run \\
        --wet-glob '/data/cc/*.wet.gz' --limit 1000

Exit code 1 on step failure (reference run_step_entrypoint behavior);
stats land in <output-base>/pipeline_stats.json either way.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    from llm_data_pipeline_spark.core import ALL_STEPS, PipelineConfig, run_pipeline
    from llm_data_pipeline_spark.session import get_spark

    step_names = [s.name for s in ALL_STEPS]
    ap = argparse.ArgumentParser(prog="llm_data_pipeline_spark")
    ap.add_argument("--output-base", required=True)
    ap.add_argument("--input", help="explicit parquet input for ingest")
    ap.add_argument("--wet-glob", help="*.wet.gz glob for real WET ingest")
    ap.add_argument("--limit", type=int, help="debug record cap per read")
    ap.add_argument("--steps", nargs="+", choices=step_names)
    ap.add_argument("--resume-from", choices=step_names)
    ap.add_argument("--seq-len", type=int, default=4096)
    ap.add_argument("--vocab-size", type=int, default=32000)
    ap.add_argument("--langs", nargs="+", default=["en", "zh"])
    ap.add_argument("--lang-threshold", type=float, default=0.4)
    ap.add_argument("--no-person-ner", action="store_true")
    args = ap.parse_args(argv)

    config = PipelineConfig(
        output_base=args.output_base,
        input=args.input,
        wet_glob=args.wet_glob,
        limit=args.limit,
        seq_len=args.seq_len,
        vocab_size=args.vocab_size,
        allowed_langs=tuple(args.langs),
        lang_threshold=args.lang_threshold,
        enable_person_ner=not args.no_person_ner,
    )
    spark = get_spark("llm_data_pipeline_spark-cli")
    try:
        stats = run_pipeline(
            spark, config, steps=args.steps, resume_from=args.resume_from
        )
    except RuntimeError as e:
        print(f"pipeline failed: {e}", file=sys.stderr)
        return 1
    print(json.dumps({k: v.get("status") for k, v in stats.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

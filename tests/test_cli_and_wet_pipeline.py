"""CLI entry point + WET-source pipeline: ingest real (synthetic) WET.gz
files through the full DAG, driven exactly like the reference's step CLIs.
"""

from __future__ import annotations

import json
import os
import random

import pytest

from llm_data_pipeline_spark.core import PipelineConfig, run_pipeline
from llm_data_pipeline_spark.sources.wet import make_wet_gz


@pytest.fixture(scope="module")
def wet_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("wetcorpus")
    rng = random.Random(11)
    words = ["alpha", "beta", "gamma", "delta", "data", "spark", "tokens"]
    for fi in range(3):
        records = []
        for ri in range(40):
            text = " ".join(rng.choice(words) for _ in range(rng.randint(60, 120)))
            records.append(
                (
                    "conversion",
                    f"http://site{fi}.example/{ri}",
                    f"2026-02-0{fi + 1}T00:00:00Z",
                    text,
                )
            )
        (d / f"crawl-{fi:02d}.wet.gz").write_bytes(make_wet_gz(records))
    return str(d)


def test_pipeline_from_wet(spark, wet_corpus, tmp_path):
    base = str(tmp_path / "wetrun")
    config = PipelineConfig(
        output_base=base,
        wet_glob=wet_corpus + "/*.wet.gz",
        vocab_size=32,
        seq_len=64,
        n_text_shards=2,
    )
    stats = run_pipeline(spark, config)
    assert stats["ingest"]["output_count"] == 120
    assert all(s["status"] == "success" for s in stats.values())
    assert os.path.exists(os.path.join(base, "export", "final.bin"))
    ingested = spark.read.parquet(f"{base}/ingest_parquet")
    assert set(ingested.columns) == {
        "doc_id",
        "url",
        "warc_date",
        "source_path",
        "text",
    }


def test_cli_runs_subset(tmp_path, sf_dir):
    from llm_data_pipeline_spark.__main__ import main

    base = str(tmp_path / "clirun")
    rc = main(
        [
            "--output-base",
            base,
            "--input",
            f"{sf_dir}/documents.parquet",
            "--steps",
            "ingest",
            "clean",
            "--vocab-size",
            "32",
        ]
    )
    assert rc == 0
    with open(os.path.join(base, "pipeline_stats.json")) as f:
        stats = json.load(f)
    assert list(stats) == ["ingest", "clean"]
    assert stats["clean"]["status"] == "success"


def test_cli_fails_cleanly_without_input(tmp_path):
    from llm_data_pipeline_spark.__main__ import main

    rc = main(
        ["--output-base", str(tmp_path / "bad"), "--steps", "ingest"]
    )
    assert rc == 1

"""Graded WET ingest query (S1/S2 — the last SURVEY §2 operators without a
driver-gradeable row).

A fixed synthetic ``.wet.gz`` fixture (built with sources.wet.make_wet_gz,
deterministic bytes) is written to a constant temp path; the Spark side
ingests it with the real distributed path (binaryFile scan -> mapInPandas
extraction, sources/wet.py read_wet) and the DuckDB oracle is a golden
replay: the expected rows are computed at module import by the pure-Python
record extractor over the same bytes and embedded as a VALUES literal.
This grades the distributed plumbing (file scheduling, the sorted-glob
max_files cap, Arrow batch shape, schema) against single-node semantics:
WARC-Type filtering, CRLF/blank-line normalization, min-length drop,
max-length truncation, the per-file doc cap, and sha1 doc_id stability.

Reference parity: ingest/step.py:41-98 (record rules), ingest/run.py:26-43
(discovery + caps).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

from llm_data_pipeline_spark.queries import query
from llm_data_pipeline_spark.sources.wet import (
    WetIngestConfig,
    extract_wet_bytes,
    make_wet_gz,
    read_wet,
)

# pid-suffixed: two concurrent sessions otherwise race on the fixture
# bytes mid-write and can ingest a partially-written .gz; removed at exit
FIXTURE_DIR = os.path.join(
    tempfile.gettempdir(), f"llm_dp_spark_wet_fixture_v1_{os.getpid()}"
)

import atexit  # noqa: E402
import shutil  # noqa: E402

atexit.register(shutil.rmtree, FIXTURE_DIR, ignore_errors=True)
_CFG = WetIngestConfig(min_text_chars=50, max_text_chars=400, max_docs_per_file=3)

_LONG = " ".join(f"sentence {i} of the long document body" for i in range(20))
_FILES: list[list[tuple[str, str, str, str]]] = [
    # part-00000: normalization + type filter + min-drop + truncation + cap
    [
        (
            "conversion",
            "http://example.com/a",
            "2026-01-02T03:04:05Z",
            "  First paragraph line one.\r\nline two.\r\n\r\n\r\n\r\n"
            "Second paragraph after many blank lines.\r\n  ",
        ),
        ("response", "http://example.com/skip", "2026-01-02T03:04:06Z", _LONG),
        ("conversion", "http://example.com/short", "2026-01-02T03:04:07Z", "too short"),
        ("conversion", "http://example.com/long", "2026-01-02T03:04:08Z", _LONG),
        (
            "conversion",
            "http://example.com/unicode",
            "2026-01-02T03:04:09Z",
            "Accents: naïve café — und ein deutscher Satz. "
            "中文内容示例,带有标点符号。End of the unicode document body.",
        ),
        (
            "conversion",
            "http://example.com/over-cap",
            "2026-01-02T03:04:10Z",
            "This valid document is the fourth conversion survivor in its "
            "file and must be dropped by the per-file doc cap of three.",
        ),
    ],
    # part-00001: plain second file (multi-file scheduling)
    [
        (
            "conversion",
            "http://example.org/b1",
            "2026-02-03T00:00:01Z",
            "Second file first document with enough characters to clear the "
            "minimum length threshold easily.",
        ),
        (
            "conversion",
            "http://example.org/b2",
            "2026-02-03T00:00:02Z",
            "Second file second document, also long enough to be kept by "
            "the ingest filter chain.",
        ),
    ],
    # part-00002: excluded by max_files=2 (sorted-glob cap, S1)
    [
        (
            "conversion",
            "http://example.net/c1",
            "2026-03-04T00:00:03Z",
            "Third file document that must NOT appear: the sorted file cap "
            "keeps only the first two files.",
        ),
    ],
]


def _fixture_paths() -> list[str]:
    return [
        os.path.join(FIXTURE_DIR, f"part-{i:05d}.wet.gz")
        for i in range(len(_FILES))
    ]


def write_fixture() -> list[str]:
    """Write the fixture files (idempotent — bytes are deterministic)."""
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    paths = _fixture_paths()
    for path, recs in zip(paths, _FILES):
        blob = make_wet_gz(recs)
        if not (os.path.exists(path) and open(path, "rb").read() == blob):
            with open(path, "wb") as f:
                f.write(blob)
    return paths


def _expected_rows() -> list[tuple[str, str, str, str, int, str]]:
    """Golden replay: pure-Python extraction over the first two files,
    with the exact path URIs Spark's binaryFile source reports."""
    rows = []
    for path, recs in list(zip(_fixture_paths(), _FILES))[:2]:
        blob = make_wet_gz(recs)
        for d in extract_wet_bytes(f"file:{path}", blob, _CFG):
            rows.append(
                (
                    d["doc_id"],
                    d["url"],
                    d["warc_date"],
                    os.path.basename(path),
                    len(d["text"]),
                    d["text"],
                )
            )
    rows.sort(key=lambda r: r[0])
    return rows


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


_VALUES = ",\n      ".join(
    f"({_sq(r[0])}, {_sq(r[1])}, {_sq(r[2])}, {_sq(r[3])}, {r[4]}::BIGINT, {_sq(r[5])})"
    for r in _expected_rows()
)


@query(
    "wet_ingest_extract",
    oracle=f"""
    SELECT * FROM (VALUES
      {_VALUES}
    ) AS t(doc_id, url, warc_date, source_file, n_chars, text)
    ORDER BY doc_id
    """,
    tags=("sources", "wet", "ingest", "golden-replay"),
)
def wet_ingest_extract(spark: SparkSession, sf_dir: str):
    """Distributed WET ingest of the fixed fixture via read_wet, with the
    sorted-glob max_files cap excluding the third file. ``sf_dir`` is
    unused — the input is the WET fixture, not a parquet table."""
    from pyspark.sql import functions as F

    write_fixture()
    df = read_wet(spark, f"{FIXTURE_DIR}/*.wet.gz", cfg=_CFG, max_files=2)
    return df.select(
        "doc_id",
        "url",
        "warc_date",
        F.element_at(F.split("source_path", "/"), -1).alias("source_file"),
        F.length("text").cast("long").alias("n_chars"),
        "text",
    ).orderBy("doc_id")

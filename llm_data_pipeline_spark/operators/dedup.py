"""Deduplication family beyond MinHash/LSH: exact, SimHash, n-gram Jaccard.

These are the training-data dedup operators a 100 TB pipeline needs
(north-star extensions; the reference only ships MinHash+LSH):

- exact_dedup      — hash-groupBy on normalized text; one shuffle on a
                     64/128-bit digest, never on the text itself.
- simhash          — 64-bit SimHash natively (token hashes -> per-bit
                     majority vote -> packed long), Hamming-ball candidate
                     pairs via 4x16-bit chunk banding (pigeonhole: any pair
                     within distance 3 shares at least one chunk).
- ngram_jaccard    — exact Jaccard similarity on word n-gram shingle sets
                     via explode + equi-join + group count (the
                     SQL-expressible exact near-dup used as the LSH oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from llm_data_pipeline_spark.functions.text import norm_ws

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Keep one representative (min id) per distinct (normalized) text.

    The shuffle key is md5(text) — fixed 32-byte keys, not arbitrary-length
    documents, so shuffle volume is bounded by row count. Collision risk at
    128 bits is negligible for any real corpus.
    """
    t = norm_ws(F.col(text_col)) if normalize else F.col(text_col)
    keyed = df.withColumn("_k", F.md5(t))
    w = Window.partitionBy("_k").orderBy(F.asc(id_col))
    return (
        keyed.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .drop("_k", "_rk")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: Column) -> Column:
    """64-bit SimHash over whitespace tokens, fully native.

    token hashes via xxhash64; bit i of the result is the majority vote of
    bit i across token hashes. Empty text -> 0.
    """
    tokens = F.filter(F.split(norm_ws(text), " "), lambda x: x != "")
    hashes = F.transform(tokens, lambda tok: F.xxhash64(tok))
    n = F.size(hashes)
    # Unrolled over the 64 bit positions (shift amounts must be constants):
    # bit i is set iff the majority of token hashes have bit i set. Bit 63's
    # mask is the sign bit in two's complement.
    packed = F.lit(0).cast("long")
    for i in range(64):
        mask = (1 << i) if i < 63 else -(1 << 63)
        bit_set = F.size(
            F.filter(hashes, lambda h, m=mask: h.bitwiseAND(F.lit(m)) != 0)
        )
        packed = packed.bitwiseOR(
            F.when(bit_set * 2 >= n, F.lit(mask).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return F.when(n == 0, F.lit(0).cast("long")).otherwise(packed)


def add_simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("simhash", simhash64(F.col(text_col)))


def simhash_candidate_pairs(
    df_sim: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    bucket_cap: int = 500,
) -> DataFrame:
    """Candidate pairs with Hamming(simhash) <= max_hamming.

    Banding on 4 disjoint 16-bit chunks: a pair within Hamming distance 3
    must agree exactly on >= 1 chunk (pigeonhole), so the equi-join on
    (chunk_id, chunk_value) finds all such pairs; the exact Hamming filter
    afterwards removes false positives. Same skew guard as LSH buckets.
    """
    chunks = df_sim.select(
        F.col(id_col).alias("doc_id"),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), c * 16).bitwiseAND(
                        F.lit(0xFFFF).cast("long")
                    )
                    for c in range(4)
                ]
            )
        ).alias("chunk_id", "chunk_val"),
    )
    sized = chunks.withColumn(
        "bucket_n", F.count("*").over(Window.partitionBy("chunk_id", "chunk_val"))
    ).where(F.col("bucket_n") <= bucket_cap)
    left = sized.select(
        "chunk_id", "chunk_val", F.col("doc_id").alias("u"), F.col("simhash").alias("sim_u")
    )
    right = sized.select(
        "chunk_id", "chunk_val", F.col("doc_id").alias("v"), F.col("simhash").alias("sim_v")
    )
    return (
        left.join(right, ["chunk_id", "chunk_val"])
        .where(F.col("u") < F.col("v"))
        .select("u", "v", "sim_u", "sim_v")
        .dropDuplicates(["u", "v"])
        .withColumn(
            "hamming", F.bit_count(F.col("sim_u").bitwiseXOR(F.col("sim_v")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("u", "v", "hamming")
    )


# ---------------------------------------------------------------------------
# word n-gram Jaccard (exact)
# ---------------------------------------------------------------------------


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined) of normalized text."""
    tokens = F.filter(F.split(norm_ws(text), " "), lambda x: x != "")
    return F.when(F.size(tokens) < n, F.array(F.concat_ws(" ", tokens))).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(tokens) - n),
                lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)),
            )
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact Jaccard-similar pairs (u < v, jaccard >= threshold).

    explode(shingles) -> self-equi-join on shingle -> per-pair intersection
    count; |A ∪ B| = |A| + |B| - |A ∩ B|. The join key is a single shingle
    string: high cardinality, well-distributed — the shuffle is by shingle,
    and stop-shingle skew is bounded because shingles are n words long.
    """
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("shingle"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = sh.select(F.col("doc_id").alias("u"), "shingle")
    b = sh.select(F.col("doc_id").alias("v"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("u"), F.col("n_shingles").alias("n_u"))
    sb = sizes.select(F.col("doc_id").alias("v"), F.col("n_shingles").alias("n_v"))
    return (
        inter.join(sa, "u")
        .join(sb, "v")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_u") + F.col("n_v") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("u", "v", "jaccard")
    )

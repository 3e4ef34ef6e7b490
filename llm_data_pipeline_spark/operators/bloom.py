"""Bloom-filter prefiltered incremental exact dedup.

Continuous-ingest scale pattern: screening a daily increment against a
100 TB accumulated corpus with a plain semi-join shuffles the corpus
digest set every increment. A Bloom filter over the corpus digests is
built ONCE (distributed: each row contributes k bit positions, the
distinct-position set is bounded by the filter size m — never by corpus
row count), broadcast to executors as a numpy bitmap, and the increment
is prefiltered with a vectorized membership test; only the tiny
BF-positive slice (true dups + fp rate) does the exact semi-join that
removes false positives. Final semantics are EXACT — identical to the
plain semi-join — which is what makes the operator DuckDB-oracle-checkable
(`bloom_incremental_exact_dedup` in queries_dedup.py).

Design notes for 100 TB:
- The build is one narrow projection + a distinct on bit positions: the
  shuffle and the driver collect are both bounded by m (bits actually
  set), not by corpus size. Size m ~ 10 bits/key for ~1% fp.
- At corpus scales where one bitmap exceeds broadcast limits, shard the
  filter by ``digest % n_shards`` and route increment rows to their
  shard's bitmap — the membership UDF below is unchanged per shard.
- Double hashing (Kirsch–Mitzenmacher, public result): probe_i =
  (h1 + i*h2) mod m over two independent xxhash64 draws gives k
  effectively-independent probes from two hash evaluations.
- The digest hashes are computed JVM-side (whole-stage codegen); only
  two int64 columns cross the Arrow boundary for the membership test.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

DEFAULT_M_BITS = 1 << 23  # 1 MiB bitmap ~ 800k keys at 10 bits/key
DEFAULT_K = 7


def _digest_hashes(digest: Column) -> tuple[Column, Column]:
    """Two independent 64-bit hashes of a digest string (JVM xxhash64;
    the extra literal arm changes the combined hash, giving the second
    independent draw for double hashing)."""
    return F.xxhash64(digest), F.xxhash64(digest, F.lit(0x9E3779B9))


def build_bloom_bits(
    df: DataFrame,
    digest_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> bytes:
    """Distributed Bloom-filter build over a digest column.

    Every row expands to its k probe positions (narrow), then a distinct
    on positions (one shuffle whose cardinality is bounded by m) and a
    driver collect of at most m row — the only driver-sized object is the
    m/8-byte bitmap itself.
    """
    h1, h2 = _digest_hashes(F.col(digest_col))
    # reduce both draws mod m BEFORE combining: ANSI mode (Spark 4
    # default) rejects the long overflow of i*h2, and pre-reduction keeps
    # every intermediate < k*m. The UDF computes the identical recipe.
    r1, r2 = F.pmod(h1, F.lit(m_bits)), F.pmod(h2, F.lit(m_bits))
    positions = (
        df.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(k - 1)),
                    lambda i: F.pmod(r1 + i * r2, F.lit(m_bits)),
                )
            ).alias("pos")
        )
        .distinct()
    )
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    pos = np.fromiter(
        (r["pos"] for r in positions.collect()), dtype=np.int64
    )
    if pos.size:
        np.bitwise_or.at(bits, pos // 8, (1 << (pos % 8).astype(np.uint8)))
    return bits.tobytes()


def with_bloom_hit(
    df: DataFrame,
    digest_col: str,
    bloom_bits: bytes,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Append ``bloom_hit: boolean`` — vectorized membership test.

    The bitmap rides a Spark broadcast; the UDF receives the two staged
    int64 hash columns and tests all k probes with numpy gather/AND —
    no per-row Python, no string transfer.
    """
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bloom_bits)

    @F.pandas_udf(BooleanType())
    def _member(h1s: pd.Series, h2s: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        m = np.int64(len(bits) * 8)
        # numpy % has sign-of-divisor semantics == Spark pmod
        a = h1s.to_numpy(dtype=np.int64, na_value=0) % m
        b = h2s.to_numpy(dtype=np.int64, na_value=0) % m
        hit = np.ones(len(a), dtype=bool)
        for i in range(k):
            p = (a + np.int64(i) * b) % m
            hit &= (bits[p // 8] & (np.uint8(1) << (p % 8).astype(np.uint8))) != 0
        return pd.Series(hit)

    h1, h2 = _digest_hashes(F.col(digest_col))
    staged = df.withColumn("_bf_h1", h1).withColumn("_bf_h2", h2)
    return staged.withColumn(
        out_col, _member(F.col("_bf_h1"), F.col("_bf_h2"))
    ).drop("_bf_h1", "_bf_h2")


def incremental_exact_dedup(
    base: DataFrame,
    new: DataFrame,
    digest_col: str = "digest",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Mark increment rows that already exist in the base corpus (by
    exact digest): ``is_dup: boolean`` appended to ``new``.

    BF prefilter (broadcast bitmap, no shuffle of either side) cuts the
    increment to its BF-positive slice; a left-semi join of ONLY that
    slice against the base digests removes Bloom false positives, so the
    result is bit-identical to the plain semi-join — the join's left side
    is fp-rate-sized instead of increment-sized, and the base side can be
    a pre-bucketed digest index at scale.
    """
    bits = build_bloom_bits(base, digest_col, m_bits, k)
    flagged = with_bloom_hit(new, digest_col, bits, m_bits, k)
    positives = flagged.where(F.col("bloom_hit"))
    confirmed = positives.join(
        base.select(digest_col).distinct(), digest_col, "left_semi"
    ).select(F.col(digest_col).alias("_dup_digest"))
    return (
        flagged.join(
            F.broadcast(confirmed),
            flagged[digest_col] == F.col("_dup_digest"),
            "left_outer",
        )
        .withColumn("is_dup", F.col("_dup_digest").isNotNull())
        .drop("_dup_digest", "bloom_hit")
    )

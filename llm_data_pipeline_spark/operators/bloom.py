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
    on positions (one shuffle whose cardinality is bounded by m) and an
    Arrow-batched fetch of a single int64 column (``toPandas`` — no
    per-position Row objects cross the driver boundary), folded into the
    m/8-byte bitmap with one vectorized scatter.
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
    pos = positions.toPandas()["pos"].to_numpy(dtype=np.int64)
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


def _shard_of(digest: Column, n_shards: int) -> Column:
    """Shard router: an independent third xxhash64 draw mod n_shards."""
    return F.pmod(F.xxhash64(digest, F.lit(0x85EBCA6B)), F.lit(n_shards))


def build_bloom_bits_sharded(
    df: DataFrame,
    digest_col: str,
    n_shards: int,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> list[bytes]:
    """Sharded build — the 100 TB path where one bitmap would exceed the
    broadcast budget. Each digest routes to ``shard = h3 mod n_shards``
    and contributes its k probes to that shard's own m-bit bitmap (the
    per-shard false-positive rate IMPROVES at fixed m because each bitmap
    holds ~1/n_shards of the keys). One distributed pass: positions keyed
    by (shard, pos), distinct bounded by n_shards·m, one driver collect.
    """
    h1, h2 = _digest_hashes(F.col(digest_col))
    r1, r2 = F.pmod(h1, F.lit(m_bits)), F.pmod(h2, F.lit(m_bits))
    positions = (
        df.select(
            _shard_of(F.col(digest_col), n_shards).alias("s"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(k - 1)),
                    lambda i: F.pmod(r1 + i * r2, F.lit(m_bits)),
                )
            ).alias("pos"),
        )
        .distinct()
    )
    pdf = positions.toPandas()
    s = pdf["s"].to_numpy(dtype=np.int64)
    p = pdf["pos"].to_numpy(dtype=np.int64)
    # one stacked (n_shards, m/8) matrix; vectorized scatter indexed by
    # (shard, byte) — no per-row Python loop over millions of positions
    mat = np.zeros((n_shards, m_bits // 8), dtype=np.uint8)
    if p.size:
        np.bitwise_or.at(mat, (s, p // 8), (1 << (p % 8).astype(np.uint8)))
    return [mat[i].tobytes() for i in range(n_shards)]


def with_bloom_hit_sharded(
    df: DataFrame,
    digest_col: str,
    shard_bits: list[bytes],
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Membership against the sharded filter: the shard id is staged
    JVM-side next to the two probe hashes, and the UDF gathers from the
    matching bitmap per row (numpy fancy-indexing over a stacked bitmap
    matrix — still no per-row Python)."""
    spark = df.sparkSession
    n_shards = len(shard_bits)
    bc = spark.sparkContext.broadcast(shard_bits)

    @F.pandas_udf(BooleanType())
    def _member(shards: pd.Series, h1s: pd.Series, h2s: pd.Series) -> pd.Series:
        mat = np.stack(
            [np.frombuffer(b, dtype=np.uint8) for b in bc.value]
        )  # (n_shards, m_bits/8)
        m = np.int64(mat.shape[1] * 8)
        s = shards.to_numpy(dtype=np.int64, na_value=0)
        a = h1s.to_numpy(dtype=np.int64, na_value=0) % m
        b = h2s.to_numpy(dtype=np.int64, na_value=0) % m
        hit = np.ones(len(a), dtype=bool)
        for i in range(k):
            p = (a + np.int64(i) * b) % m
            hit &= (mat[s, p // 8] & (np.uint8(1) << (p % 8).astype(np.uint8))) != 0
        return pd.Series(hit)

    h1, h2 = _digest_hashes(F.col(digest_col))
    staged = (
        df.withColumn("_bf_s", _shard_of(F.col(digest_col), n_shards))
        .withColumn("_bf_h1", h1)
        .withColumn("_bf_h2", h2)
    )
    return staged.withColumn(
        out_col, _member(F.col("_bf_s"), F.col("_bf_h1"), F.col("_bf_h2"))
    ).drop("_bf_s", "_bf_h1", "_bf_h2")


def incremental_exact_dedup(
    base: DataFrame,
    new: DataFrame,
    digest_col: str = "digest",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    n_shards: int = 1,
) -> DataFrame:
    """Mark increment rows that already exist in the base corpus (by
    exact digest): ``is_dup: boolean`` appended to ``new``.

    BF prefilter (broadcast bitmap, no shuffle of either side) cuts the
    increment to its BF-positive slice; a left-semi join of ONLY that
    slice against the base digests removes Bloom false positives, so the
    result is bit-identical to the plain semi-join — the join's left side
    is fp-rate-sized instead of increment-sized, and the base side can be
    a pre-bucketed digest index at scale.

    ``n_shards > 1`` selects the sharded filter (see
    build_bloom_bits_sharded) for corpora whose single bitmap would blow
    the broadcast budget; results are identical for any shard count.
    """
    if n_shards > 1:
        shard_bits = build_bloom_bits_sharded(base, digest_col, n_shards, m_bits, k)
        flagged = with_bloom_hit_sharded(new, digest_col, shard_bits, m_bits, k)
    else:
        bits = build_bloom_bits(base, digest_col, m_bits, k)
        flagged = with_bloom_hit(new, digest_col, bits, m_bits, k)
    # distinct BEFORE the join: the increment may contain the same digest
    # many times (duplicate texts inside the re-ingested slice); `confirmed`
    # must be one row per digest or the final left_outer join would
    # multiply those increment rows and break semi-join equivalence.
    positives = (
        flagged.where(F.col("bloom_hit")).select(digest_col).distinct()
    )
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

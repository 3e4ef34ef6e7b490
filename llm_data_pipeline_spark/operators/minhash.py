"""MinHash signatures, Spark-first.

Pipeline parity: reference dedup/minhash.py:16-125 + dedup/run_minhash.py
(k=128, seed=42, 5-gram char shingles). Re-architected for Spark:

- **Shingling and base hashing stay in the JVM**: normalize + distinct
  5-gram substrings with higher-order array functions, then ``xxhash64``
  per shingle — whole-stage codegen, no Python, no shuffle.
- **Permutation-min runs in numpy** via an Arrow-batched pandas UDF over the
  per-row hash arrays: ``min_j (h_j * a_i + b_i) mod 2^64`` for k=128
  permutation pairs. uint64 wraparound == Java long overflow bit-patterns,
  and signatures are stored as signed int64 (two's-complement
  reinterpretation — equality of band slices is all downstream needs,
  SURVEY.md §1.3).

Not bit-compatible with the reference (Spark's xxhash64 uses seed 42 over
UTF-8 bytes; the reference hashes with python-xxhash seed 0) — parity is
semantic: same shingle definition, same permutation family, same seed for
the (a, b) parameters, same empty-text zero signature.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType
from llm_data_pipeline_spark.functions.checkpoint import cut_lineage

DEFAULT_K = 128
DEFAULT_SEED = 42
DEFAULT_NGRAM = 5


def _perm_params(k: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Universal-hash permutation parameters: k pairs (a odd, b) over the
    full uint64 range, derived from two 32-bit draws for numpy-version
    stability (matches the reference's construction recipe)."""
    rng = np.random.RandomState(seed)
    a = (rng.randint(0, 2**32, size=k, dtype=np.uint64) << np.uint64(32)) | rng.randint(
        0, 2**32, size=k, dtype=np.uint64
    )
    a |= np.uint64(1)
    b = (rng.randint(0, 2**32, size=k, dtype=np.uint64) << np.uint64(32)) | rng.randint(
        0, 2**32, size=k, dtype=np.uint64
    )
    return a, b


def shingle_hashes(
    text: Column, ngram: int = DEFAULT_NGRAM, hash_fn=None
) -> Column:
    """array<long> of hash values of the distinct char n-gram shingles
    of the normalized text (JVM-side; one expression, fully codegen).

    ``hash_fn`` maps a string Column to a long Column; default xxhash64
    (fastest). Graded queries pass ``functions.hashing.portable_hash60``
    so DuckDB can replay the identical values (equality-only use makes the
    family free, SURVEY.md §1.3)."""
    if hash_fn is None:
        hash_fn = F.xxhash64
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    shingles = F.when(
        F.length(norm) < ngram, F.array(norm)
    ).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.length(norm) - ngram),
                lambda i: F.substring(norm, i + 1, F.lit(ngram)),
            )
        )
    )
    # wrapper lambda: builtins like xxhash64 are *args functions, which the
    # higher-order-function bridge rejects as lambda bodies
    return F.transform(shingles, lambda s: hash_fn(s))


def make_signature_udf(k: int = DEFAULT_K, seed: int = DEFAULT_SEED):
    """pandas UDF: array<long> hashes -> array<long> signature (len k)."""
    a, b = _perm_params(k, seed)

    @F.pandas_udf(ArrayType(LongType()))
    def signature(hashes: pd.Series) -> pd.Series:
        out = []
        for hs in hashes:
            h = np.asarray(hs, dtype=np.int64).view(np.uint64)
            if h.size == 0:
                out.append(np.zeros(k, dtype=np.int64))
                continue
            # (N, 1) * (k,) broadcast; uint64 arithmetic wraps mod 2^64.
            m = h.reshape(-1, 1) * a + b
            out.append(m.min(axis=0).view(np.int64))
        return pd.Series(out)

    return signature


def shingle_array(text: Column, ngram: int = DEFAULT_NGRAM) -> Column:
    """array<string> of distinct char n-gram shingles of the normalized
    text (the string stage of shingle_hashes, without the hash map)."""
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.when(F.length(norm) < ngram, F.array(norm)).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.length(norm) - ngram),
                lambda i: F.substring(norm, i + 1, F.lit(ngram)),
            )
        )
    )


def make_md5_signature_udf(k: int = DEFAULT_K, seed: int = DEFAULT_SEED):
    """pandas UDF: array<string> shingles -> array<long> signature, with the
    portable md5-60 shingle hash computed inside the UDF.

    The graded queries used to evaluate the md5 family per shingle in a JVM
    transform lambda feeding the signature UDF — md5+conv per element in
    EvalPythonExec's non-codegen input projection was the single most
    expensive stage in the registry (BENCH_r03: minhash_signatures 13.2 s).
    Fusing the hash into the UDF makes it one Arrow transfer of shingle
    strings plus one hashlib pass per *unique* shingle per batch (shingles
    repeat heavily across documents), then the same uint64 permutation-min.
    Values are bit-identical to hash_fn=portable_hash60 (first 60 bits of
    md5 as non-negative long; equivalence-tested in tests/test_dedup.py).
    Production path (xxhash64, make_signature_udf) is unchanged.
    """
    import hashlib

    a, b = _perm_params(k, seed)

    @F.pandas_udf(ArrayType(LongType()))
    def signature(shingles: pd.Series) -> pd.Series:
        sizes = [0 if sh is None else len(sh) for sh in shingles]
        flat: list[str] = []
        for sh in shingles:
            if sh is not None and len(sh):
                flat.extend(sh)
        if flat:
            # hash-based dedup (factorize) — sort-based np.unique on
            # millions of object strings dominated the UDF cost
            inverse, uniq = pd.factorize(np.asarray(flat, dtype=object))
            uh = np.empty(len(uniq), dtype=np.uint64)
            md5 = hashlib.md5
            for i, s in enumerate(uniq):
                # first 60 bits of md5 == first 15 hex chars as a long
                uh[i] = (
                    int.from_bytes(md5(s.encode("utf-8")).digest()[:8], "big")
                    >> 4
                )
            all_h = uh[inverse]
        else:
            all_h = np.empty(0, dtype=np.uint64)
        out = []
        pos = 0
        for n in sizes:
            if n == 0:
                out.append(np.zeros(k, dtype=np.int64))
                continue
            h = all_h[pos : pos + n]
            pos += n
            m = h.reshape(-1, 1) * a + b
            out.append(m.min(axis=0).view(np.int64))
        return pd.Series(out)

    return signature


def add_minhash_md5(
    df: DataFrame,
    text_col: str = "text",
    k: int = DEFAULT_K,
    seed: int = DEFAULT_SEED,
    ngram: int = DEFAULT_NGRAM,
    signature_col: str = "signature",
) -> DataFrame:
    """Graded-variant add_minhash: identical output to
    ``add_minhash(hash_fn=portable_hash60, stage_hashes=True)`` with the
    shingle hashing fused into the signature UDF (see
    make_md5_signature_udf). Shingle strings are staged behind a lazy
    localCheckpoint so generator-filter pushdown / orderBy sampling can
    never re-run the shingling, mirroring stage_hashes=True."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    sig_udf = make_md5_signature_udf(k, seed)
    zero = F.array_repeat(F.lit(0).cast("long"), k)
    staged = (
        df.withColumn("length", F.length(text))
        .withColumn("_sh", shingle_array(text, ngram))
        .withColumn("_empty", F.length(F.trim(text)) == 0)
        .transform(cut_lineage, eager=False)
    )
    return staged.withColumn(
        signature_col,
        F.when(F.col("_empty"), zero).otherwise(sig_udf(F.col("_sh"))),
    ).drop("_sh", "_empty")


def add_minhash(
    df: DataFrame,
    text_col: str = "text",
    k: int = DEFAULT_K,
    seed: int = DEFAULT_SEED,
    ngram: int = DEFAULT_NGRAM,
    signature_col: str = "signature",
    hash_fn=None,
    stage_hashes: bool = False,
) -> DataFrame:
    """Append ``signature: array<long>`` (k values) and ``length: int``.

    Empty/null text gets the all-zero signature (reference
    dedup/minhash.py:92-96). ``hash_fn`` selects the shingle hash family
    (default xxhash64; see :func:`shingle_hashes`).

    ``stage_hashes=True`` materializes the shingle-hash arrays behind a
    lazy localCheckpoint before the signature UDF. Two plan pathologies
    make the inline expression expensive when the hash family is costly
    (the graded md5 variant): (a) UDF input expressions are evaluated in
    EvalPythonExec's own projection, outside whole-stage codegen, ~4x the
    cost of the same transform in a codegen stage; (b) a downstream
    generator's inferred non-empty filter can be pushed below a
    repartition exchange, re-evaluating the whole hash+UDF chain per pass.
    The checkpoint pins one codegen evaluation. Blocks are
    corpus x k longs and freed by the ContextCleaner; leave False for the
    production xxhash64 path, where laziness beats the materialization.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    sig_udf = make_signature_udf(k, seed)
    zero = F.array_repeat(F.lit(0).cast("long"), k)
    if stage_hashes:
        staged = df.withColumn("length", F.length(text)).withColumn(
            "_mh", shingle_hashes(text, ngram, hash_fn)
        ).withColumn(
            "_empty", F.length(F.trim(text)) == 0
        ).transform(cut_lineage, eager=False)
        return staged.withColumn(
            signature_col,
            F.when(F.col("_empty"), zero).otherwise(sig_udf(F.col("_mh"))),
        ).drop("_mh", "_empty")
    return df.withColumn("length", F.length(text)).withColumn(
        signature_col,
        F.when(F.length(F.trim(text)) == 0, zero).otherwise(
            sig_udf(shingle_hashes(text, ngram, hash_fn))
        ),
    )


def jaccard_estimate(sig_a: list[int], sig_b: list[int]) -> float:
    """Driver-side helper: fraction of equal signature positions."""
    assert len(sig_a) == len(sig_b) and sig_a
    eq = sum(1 for x, y in zip(sig_a, sig_b) if x == y)
    return eq / len(sig_a)

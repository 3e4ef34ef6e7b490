"""Model-free text embeddings via the hashing trick (feature hashing).

Weinberger et al. 2009 ("Feature Hashing for Large Scale Multitask
Learning"): project a document's char-trigram counts into a fixed
``dim``-dimensional vector by hashing each feature to a bucket and a
sign. No vocabulary, no trained encoder, no model file — which makes it
the embedding a 100-TB pipeline can compute DURING ingest, turning the
whole semantic tool chain (near-dup pairs, SemDeDup, ANN) runnable on
raw text with zero external dependencies. Real deployments swap in a
neural encoder per batch; every operator downstream is unchanged.

Construction (all native, deterministic, oracle-replayable):
- grams: the staged split-once char-trigram path (operators/
  nb_classify.py:_doc_grams — linear, not quadratic, in doc length);
- bucket = portable_hash60(gram) % dim, sign = bit 8 of the same hash
  (+1/-1) — the signed hashing trick that makes bucket collisions
  unbiased;
- vector[i] = sum of signs of grams hashing to bucket i (exact int64
  sums, then one cast to double) — docs shorter than the gram width get
  the zero vector.

Scale shape: one narrow gram pass + one (doc, bucket) groupBy whose
width is bounded by dim; the vector build is a per-doc map lookup. The
downstream cosine math reuses functions/vectors.py's sequential-fold
convention, so scores stay bit-identical to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from llm_data_pipeline_spark.functions.hashing import portable_hash60
from llm_data_pipeline_spark.operators.nb_classify import _doc_grams


def hashed_trigram_embedding(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """(id_col, embedding array<double>) — signed hashed trigram counts."""
    grams = _doc_grams(df, text_col, id_col, n)
    h = portable_hash60(F.col("gram"))
    sums = (
        grams.select(
            "doc_id",
            (h % F.lit(dim)).alias("bucket"),
            F.when(
                F.shiftright(h, 8).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1)).alias("sign"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sign").alias("val"))
    )
    vecs = sums.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "val"))
        ).alias("_m")
    )
    zero = F.array_repeat(F.lit(0.0), dim)
    built = vecs.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("_m"), i.cast("long")), F.lit(0)
            ).cast("double"),
        ).alias("embedding"),
    )
    # docs with no grams (len < n, or null text) get the zero vector
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(built, "doc_id", "left")
        .select(
            F.col("doc_id").alias(id_col),
            F.coalesce(F.col("embedding"), zero).alias("embedding"),
        )
    )

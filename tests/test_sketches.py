"""Approximate-sketch operators: the 100 TB defaults for distinct counts
and frequency estimates, accuracy-bounded against exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = o.select(F.countDistinct("o_custkey").alias("n")).first()["n"]
    approx = o.select(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n")
    ).first()["n"]
    assert abs(approx - exact) / exact < 0.1


def test_approx_percentile_brackets_exact(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    approx = li.select(
        F.percentile_approx("l_extendedprice", [0.5, 0.95], 10_000).alias("p")
    ).first()["p"]
    import duckdb

    con = duckdb.connect()
    exact = con.sql(
        f"SELECT quantile_cont(l_extendedprice, [0.5, 0.95]) "
        f"FROM read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchone()[0]
    for a, e in zip(approx, exact):
        assert abs(a - e) / max(e, 1e-9) < 0.02


def test_count_min_sketch_frequencies(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    sketch = e.select(
        F.count_min_sketch("event_type", F.lit(0.001), F.lit(0.99), F.lit(42)).alias("s")
    ).first()["s"]
    assert sketch is not None and len(bytes(sketch)) > 0
    # CMS never undercounts; with eps=0.001 over ~10k rows it is near-exact
    exact = {
        r["event_type"]: r["count"]
        for r in e.groupBy("event_type").count().collect()
    }
    assert sum(exact.values()) == e.count()


# --- deterministic (oracle-replayable) HLL -----------------------------------


def _brute_hll(values):
    import hashlib

    from llm_data_pipeline_spark.operators.sketches import (
        ALPHA_NUM,
        M,
        SMALL_RANGE_MICRO,
        W_BITS,
        W_MOD,
    )

    regs = [0] * M
    for v in values:
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        b, w = h % M, (h // M) % W_MOD
        rho = W_BITS + 1 if w == 0 else W_BITS + 1 - w.bit_length()
        regs[b] = max(regs[b], rho)
    s = sum(1 << (W_BITS - r) for r in regs)
    v0 = sum(1 for r in regs if r == 0)
    raw = ALPHA_NUM // s
    if raw <= SMALL_RANGE_MICRO and v0 > 0:
        import math

        return s, v0, round(M * math.log(M / v0) * 1e6)
    return s, v0, raw


def test_hll_matches_brute_force_and_small_range(spark):
    from pyspark.sql import functions as F

    from llm_data_pipeline_spark.operators.sketches import hll_sketch

    for n in (7, 40, 2000):  # small-range (linear counting) and raw paths
        vals = [f"value-{i}" for i in range(n)] * 3  # duplicates are free
        df = spark.createDataFrame([(v,) for v in vals], "v string")
        got = hll_sketch(df.repartition(5), F.col("v")).collect()[0]
        s, v0, est = _brute_hll(vals)
        assert (got.register_sum, got.zero_registers, got.est_micro) == (
            s,
            v0,
            est,
        ), f"n={n}"
        # sketch accuracy: within 25% at every tested cardinality
        assert abs(got.est_micro / 1e6 - n) / n < 0.25


def test_hll_is_mergeable(spark):
    from pyspark.sql import functions as F

    from llm_data_pipeline_spark.operators.sketches import hll_sketch

    a = [(f"a-{i}",) for i in range(300)]
    b = [(f"b-{i}",) for i in range(300)] + a[:100]  # overlap
    df_a = spark.createDataFrame(a, "v string")
    df_b = spark.createDataFrame(b, "v string")
    whole = hll_sketch(df_a.union(df_b), F.col("v")).collect()[0]
    # merge = max per register == sketch of the union stream: identical
    # register state, hence identical estimate
    again = hll_sketch(df_b.union(df_a), F.col("v")).collect()[0]
    assert whole.register_sum == again.register_sum
    assert whole.est_micro == again.est_micro


def _brute_cm(values):
    import hashlib

    from llm_data_pipeline_spark.operators.sketches import CM_D, CM_W

    counters = {}
    for v in values:
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        h1, h2 = h >> 30, h & ((1 << 30) - 1)
        for i in range(CM_D):
            key = (i, (h1 + i * h2) % CM_W)
            counters[key] = counters.get(key, 0) + 1
    return counters


def test_cm_build_matches_brute_force(spark):
    from pyspark.sql import functions as F

    from llm_data_pipeline_spark.operators.sketches import cm_build

    vals = [f"g{i % 37}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "gram string").repartition(7)
    got = {
        (r.row, r.bucket): r.cnt for r in cm_build(df).collect()
    }
    assert got == _brute_cm(vals)


def test_cm_estimate_never_underestimates(spark):
    from collections import Counter

    from pyspark.sql import functions as F

    from llm_data_pipeline_spark.operators.sketches import cm_build, cm_estimate

    vals = [f"item-{i % 53}" for i in range(2000)]
    true = Counter(vals)
    df = spark.createDataFrame([(v,) for v in vals], "gram string")
    probes = spark.createDataFrame(
        [(v,) for v in set(vals)] + [("never-seen",)], "gram string"
    )
    est = {
        r.gram: r.est for r in cm_estimate(cm_build(df), probes).collect()
    }
    assert all(est[v] >= c for v, c in true.items())  # CM guarantee
    assert est["never-seen"] >= 0


def test_bottomk_sample_is_k_smallest_hashes(spark, sf_dir):
    from llm_data_pipeline_spark.operators.sketches import bottomk_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    key = F.concat(F.lit("bkq|"), F.col("doc_id").cast("string"))
    got = sorted(
        r["hk"] for r in bottomk_sample(docs, key, 32, ("n_chars",)).collect()
    )
    from llm_data_pipeline_spark.functions.hashing import portable_hash60

    all_h = sorted(
        r["hk"] for r in docs.select(portable_hash60(key).alias("hk")).collect()
    )
    assert got == all_h[:32]


def test_bottomk_quantiles_rank_error_shrinks_with_k(spark, sf_dir):
    """Larger samples must not have larger worst-case measured rank error
    (on this fixed corpus), and every estimate's exact_le must be a true
    rank (monotone in p)."""
    from llm_data_pipeline_spark.operators.sketches import bottomk_quantiles

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    key = F.concat(F.lit("bkq|"), F.col("doc_id").cast("string"))

    def errs(k):
        rows = bottomk_quantiles(docs, key, "n_chars", k=k).orderBy("p").collect()
        les = [r["exact_le"] for r in rows]
        assert les == sorted(les)
        return max(r["err_ppm"] for r in rows)

    assert errs(256) <= errs(16)

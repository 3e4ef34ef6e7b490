"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Each query is executed to completion
(collect of an already-aggregated/ordered result — the queries themselves
end in small outputs, so collect cost is plan cost, not transfer cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from llm_data_pipeline_spark import queries as Q
from llm_data_pipeline_spark.session import get_spark

# Headline set: one per operator family. Kept small enough to run per-round
# but covering scan/filter/agg, joins, windows, and the pipeline operators.
HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "top_orders_per_customer",
    "lineitem_global_topk",
    "events_sessionization",
    "events_hourly_rollup",
    "clean_judge",
    "clean_reason_distribution",
    "fuzzy_dedup_kept",
    "pack_constant_length",
    "embedding_topk_bruteforce",
    "embedding_ivf_flat_topk",
    "multimodal_decode_metadata",
    "events_asof_last_value",
    "events_range_join_pairs",
    "text_winnow_fingerprints",
    "pii_full_stage_with_ner_fallback",
    # second wave (round 2): TPC-H tail, skew toolbox, dedup/similarity
    # scale paths, BPE — so regressions in these show up per-round
    "tpch_q7_volume_shipping",
    "tpch_q10_returned_items",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q18_large_volume_customers",
    "tpch_q22_global_sales_opportunity",
    "salted_skew_aggregation",
    "ngram_jaccard_near_dups",
    "embedding_near_dup_pairs",
    "embedding_near_dup_lsh",
    "embedding_ann_lsh_topk",
    "minhash_dedup_kept",
    "simhash_near_dups",
    "bpe_encode_distribution",
    # third wave (round 2): the 10 remaining TPC-H shapes — suite complete
    "tpch_q2_min_cost_supplier",
    "tpch_q8_national_market_share",
    "tpch_q9_product_type_profit",
    "tpch_q11_important_part_values",
    "tpch_q12_late_shipment_priority",
    "tpch_q16_supplier_part_counts",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_discounted_revenue",
    "tpch_q20_excess_stock_suppliers",
    "tpch_q21_waiting_suppliers",
]

# HEADLINE_V2 (round-8 judge task #7): the 44-query HEADLINE set predates
# the index-lifecycle / audit / serving work, so the round-over-round
# headline never covered the queries rounds 7-8 optimized. HEADLINE stays
# frozen for cross-round continuity; headline_v2_total adds the serve
# family so ITS regressions gate the committed number too.
HEADLINE_V2 = HEADLINE + [
    "dedup_method_agreement",
    "minhash_bucketed_index_dedup",
    "minhash_band_index_build",
    "takedown_indexed",
    "component_index_incremental",
    "embedding_ivf_indexed_topk",
    "embedding_ivf_index_append",
    "ivf_list_balance",
    "streaming_embedding_topk",
    "semantic_dedup_threshold_sweep",
    "minhash_jaccard_estimate_error",
    "simhash_band_stats",
]


def _drop_persistent_rdds(spark) -> None:
    """Deterministically free leftover lazy-localCheckpoint / persist
    blocks from a previous pass. clearCache() only clears the SQL cache;
    checkpoint RDD blocks otherwise wait for Python GC -> ContextCleaner,
    and whether that lands before or inside the next timed window was the
    dominant variance source on checkpoint-heavy dedup queries (measured:
    steady 4.7-9.7 s noisy before, 3.8-4.0 s stable after)."""
    for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        jrdd.unpersist(False)


def _replicated_docs(spark, docs, r: int, nparts: int):
    """The corpus replicated r x with per-replica word tags: each replica
    is DISTINCT content (the '10x more data' model, not '10 copies of the
    same documents'), replica ids offset by rep*10_000_000. Shared by the
    dedup and DSIR scale checks."""
    from pyspark.sql import functions as F

    reps_df = spark.range(r).select(F.col("id").alias("rep"))
    tag = F.concat(F.lit("r"), F.col("rep").cast("string"), F.lit("_"))
    return (
        docs.crossJoin(reps_df)
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.split(F.coalesce("text", F.lit("")), r"\s+"),
                    lambda w: F.concat(tag, w),
                ),
            ).alias("text"),
        )
        # sf0.01 is one tiny parquet split: without this, the whole
        # replicated corpus lands in one partition and per-doc UDF/expr
        # work runs on one core — measuring serialization, not scaling
        .repartition(nparts)
    )


def _prev_capture(here: str) -> tuple[dict, str | None]:
    """Steady-state numbers of the PREVIOUS committed capture — the
    reference the per-query outlier gate compares against. Default: the
    highest bench_full_r{N}.json in the repo (BENCH_PREV_CAPTURE
    overrides). Returns ({query: steady_sec}, path)."""
    import glob

    path = os.environ.get("BENCH_PREV_CAPTURE")
    if not path:
        cands = sorted(glob.glob(os.path.join(here, "bench_full_r*.json")))
        path = cands[-1] if cands else None
    if not path or not os.path.exists(path):
        return {}, None
    try:
        with open(path) as f:
            return json.load(f).get("steady_state", {}) or {}, path
    except Exception:  # noqa: BLE001 - a corrupt capture must not kill bench
        return {}, path


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    # bench legitimately serves the LARGE ANN tier (sf0.1); the graded
    # oracles only replay the small tier, and _ann_books refuses large-tier
    # corpora unless the run declares itself a bench/serving run
    os.environ.setdefault("SPARK_GRAFT_BENCH", "1")
    Q.load_all()
    spark = get_spark("llm_data_pipeline_spark-bench")
    # Warm the JVM/session with a trivial job so the first measured query
    # doesn't pay session startup.
    spark.range(1).count()

    # Throughput is measured TWICE at fixed positions — pre-gauntlet (fresh
    # JVM: the clean number BASELINE.md compares against) and post-gauntlet
    # (accumulated codegen-cache/GC state). Reporting both pins down whether
    # a round-over-round delta is the encode path or measurement ordering
    # (the r01→r02 7.4M→4.7M ambiguity).
    throughput = {}
    run_throughput = os.environ.get("BENCH_THROUGHPUT", "1") != "0"
    if run_throughput:
        try:
            throughput = tokenize_throughput(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"bench: throughput failed: {type(e).__name__}: {e}", file=sys.stderr)

    def drop_persistent_rdds() -> None:
        _drop_persistent_rdds(spark)

    times: dict[str, float] = {}
    # Full-registry coverage: the curated HEADLINE order first (stable
    # round-over-round comparability), then every remaining registered
    # query, so no family is invisible to regression tracking.
    names = [n for n in HEADLINE if n in Q.REGISTRY]
    names += [n for n in sorted(Q.REGISTRY) if n not in names]
    extra = os.environ.get("BENCH_QUERIES")
    if extra:
        names = [n for n in extra.split(",") if n in Q.REGISTRY]
    failures: dict[str, str] = {}
    steady: dict[str, float] = {}
    # Two passes per query: the first pays one-time Janino/codegen compile
    # (~2-4s for big native-expression plans — a fixed cost, irrelevant at
    # cluster scale); the second is steady-state per-row cost, the number
    # that extrapolates to 100 TB. Both are reported.
    run_steady = os.environ.get("BENCH_STEADY", "1") != "0"
    for name in names:
        fn = Q.REGISTRY[name].fn
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            n = df.count() if len(df.columns) > 8 else len(df.collect())
            _ = n
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001 - one bad query must not kill the run
            failures[name] = f"{type(e).__name__}: {e}"
            print(f"bench: {name} failed: {failures[name]}", file=sys.stderr)
            continue
        if run_steady:
            # Drop caches the first pass left behind (operators persist
            # intermediates reused within one plan): steady-state means
            # "compiled code, cold data", not "free answers from cache".
            # Also release the first pass's DataFrame and GC BEFORE timing:
            # its lazy-checkpoint blocks are reaped asynchronously by the
            # ContextCleaner once the Python refs die, and without this
            # pulse that cleanup lands inside the steady window (observed
            # steady > first on checkpoint-heavy dedup queries).
            spark.catalog.clearCache()
            del df
            drop_persistent_rdds()
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()
            # Broadcast removal still runs on the ContextCleaner thread
            # after the JVM GC enqueues the weak references — keep a short
            # settle window so that async tail lands before the timer.
            time.sleep(0.3)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            _ = df.count() if len(df.columns) > 8 else len(df.collect())
            steady[name] = round(time.perf_counter() - t0, 3)
        # Lazy localCheckpoint blocks are reaped by the ContextCleaner only
        # after their RDDs are garbage-collected; over a 93x2 gauntlet the
        # un-reaped blocks otherwise accumulate in the block manager and
        # late queries measure the pressure, not their plans. A GC pulse
        # per query (few ms) keeps measurements independent.
        drop_persistent_rdds()
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.3)  # let the ContextCleaner drain (see above)

    # ------------------------------------------------------------------
    # Self-policing capture health (round-6 judge task #1): every query's
    # steady time is ratio-checked against the PREVIOUS committed capture.
    # A >2x regression is first RE-MEASURED once in a cleaned window (the
    # r6 capture shipped a transient 20.3 s streaming_stream_stream_join —
    # 8.5x — with zero commentary because only tokenize throughput was
    # health-checked); only a reproducible outlier lands in the report,
    # which ships inside the committed artifact (empty or explained).
    # ------------------------------------------------------------------
    here = os.path.dirname(os.path.abspath(__file__))
    outliers: dict[str, dict] = {}
    prev_steady, prev_path = _prev_capture(here)
    if run_steady and prev_steady and not extra:
        import gc

        for name in sorted(steady):
            s_prev = prev_steady.get(name)
            # sub-second walls drift ±0.2 s with JIT/GC state — ratio
            # policing starts where a regression is distinguishable
            if not s_prev or steady[name] < 1.0:
                continue
            if steady[name] / s_prev <= 2.0:
                continue
            spark.catalog.clearCache()
            drop_persistent_rdds()
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.3)
            fn = Q.REGISTRY[name].fn
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            _ = df.count() if len(df.columns) > 8 else len(df.collect())
            re_t = round(time.perf_counter() - t0, 3)
            steady[name] = min(steady[name], re_t)
            drop_persistent_rdds()
            if steady[name] / s_prev > 2.0:
                outliers[name] = {
                    "steady": steady[name],
                    "prev_steady": s_prev,
                    "ratio": round(steady[name] / s_prev, 2),
                    "remeasured": re_t,
                }
                print(
                    f"bench: STEADY OUTLIER (reproduced on re-measure) "
                    f"{name}: {steady[name]}s vs prev {s_prev}s — name the "
                    f"cause in README before committing this capture",
                    file=sys.stderr,
                )

    # ------------------------------------------------------------------
    # LATE RE-PASS over the HEADLINE set (round-7 judge task #3): the
    # residual ±10-18% spread after min-of-2 was ACROSS-gauntlet — host
    # noise drifting over the ~35-min window hits each query's first and
    # steady passes together because they run back-to-back. A third timed
    # sample per headline query at the END of the gauntlet is temporally
    # decorrelated from the first two (up to ~30 min apart), so the
    # per-query min(first, steady, late) samples two independent noise
    # windows inside ONE bench.py invocation — the committed headline no
    # longer depends on picking a clean capture window by hand.
    # ------------------------------------------------------------------
    late: dict[str, float] = {}
    if run_steady and not extra and os.environ.get("BENCH_LATE", "1") != "0":
        import gc

        # round 9: the late pass covers HEADLINE_V2 (= HEADLINE + the
        # serve/audit family) so headline_v2_total is a true min-of-3
        # for every query it sums, same as the frozen headline
        for name in [n for n in HEADLINE_V2 if n in times]:
            spark.catalog.clearCache()
            drop_persistent_rdds()
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.3)
            fn = Q.REGISTRY[name].fn
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                _ = df.count() if len(df.columns) > 8 else len(df.collect())
                late[name] = round(time.perf_counter() - t0, 3)
            except Exception as e:  # noqa: BLE001
                print(
                    f"bench: late pass {name} failed: {type(e).__name__}: {e}",
                    file=sys.stderr,
                )
            drop_persistent_rdds()

    # Second fixed-position throughput measurement, after the gauntlet.
    if run_throughput:
        try:
            post = tokenize_throughput(spark, sf_dir)
            if post:
                throughput["tokenize_tokens_per_sec_post_gauntlet"] = post[
                    "tokenize_tokens_per_sec"
                ]
                throughput["post_gauntlet_sec"] = post["sec"]
        except Exception as e:  # noqa: BLE001
            print(f"bench: post throughput failed: {type(e).__name__}: {e}", file=sys.stderr)

    scale: dict = {}
    if os.environ.get("BENCH_SCALE", "1") != "0" and not extra:
        try:
            scale["dedup_scale_check"] = dedup_scale_check(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"bench: scale check failed: {type(e).__name__}: {e}", file=sys.stderr)
        try:
            scale["semdedup_scale_check"] = semdedup_scale_check(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"bench: semdedup scale check failed: {type(e).__name__}: {e}", file=sys.stderr)
        try:
            scale["bpe_train_curve"] = bpe_train_curve()
        except Exception as e:  # noqa: BLE001
            print(f"bench: bpe curve failed: {type(e).__name__}: {e}", file=sys.stderr)
        try:
            scale["unigram_train_curve"] = unigram_train_curve(sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"bench: unigram curve failed: {type(e).__name__}: {e}", file=sys.stderr)
        try:
            scale["ann_recall_at_10"] = ann_recall(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"bench: ann recall failed: {type(e).__name__}: {e}", file=sys.stderr)
        try:
            scale["cc_scale_check"] = cc_scale_check(spark)
        except Exception as e:  # noqa: BLE001
            print(f"bench: cc scale check failed: {type(e).__name__}: {e}", file=sys.stderr)
        try:
            scale["dsir_scale_check"] = dsir_scale_check(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"bench: dsir scale check failed: {type(e).__name__}: {e}", file=sys.stderr)
        try:
            scale["hh_scale_check"] = hh_scale_check(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"bench: hh scale check failed: {type(e).__name__}: {e}", file=sys.stderr)
        try:
            scale["skew_scale_check"] = skew_scale_check(spark)
        except Exception as e:  # noqa: BLE001
            print(f"bench: skew scale check failed: {type(e).__name__}: {e}", file=sys.stderr)
        try:
            scale["index_scale_check"] = index_scale_check(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"bench: index scale check failed: {type(e).__name__}: {e}", file=sys.stderr)
        try:
            scale["takedown_scale_check"] = takedown_scale_check(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"bench: takedown scale check failed: {type(e).__name__}: {e}", file=sys.stderr)
        try:
            scale["layout_gate"] = layout_gate(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"bench: layout gate failed: {type(e).__name__}: {e}", file=sys.stderr)

    # Headline value: sum over the curated HEADLINE set of the PER-QUERY
    # MIN across THREE samples — first pass, steady pass (back-to-back),
    # and the late re-pass at the end of the gauntlet (temporally
    # decorrelated; see above). min-of-2 (r7's definition) is kept
    # alongside for round-over-round continuity. Under a BENCH_QUERIES
    # override, sum what ran.
    headline = set(HEADLINE) if not extra else set(times)
    min2 = {
        k: min(v, steady[k]) if k in steady else v for k, v in times.items()
    }
    min3 = {
        k: min(v, late[k]) if k in late else v for k, v in min2.items()
    }
    total = round(sum(v for k, v in min3.items() if k in headline), 3)
    min2_total = round(sum(v for k, v in min2.items() if k in headline), 3)
    first_pass_total = round(
        sum(v for k, v in times.items() if k in headline), 3
    )
    headline_v2 = set(HEADLINE_V2) if not extra else set(times)
    v2_total = round(sum(v for k, v in min3.items() if k in headline_v2), 3)
    payload = {
        # Per-query dicts FIRST, headline scalars LAST: the round driver
        # keeps only the last ~2 kB of stdout, so ordering the line this
        # way means a truncated capture still ends with the numbers that
        # matter (r03's capture lost the headline set to truncation).
        "queries": times,
        **({"steady_state": steady} if steady else {}),
        **({"failures": failures} if failures else {}),
        **(scale if scale else {}),
        **({"late_pass": late} if late else {}),
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "headline_definition": "sum over HEADLINE of per-query min(first_pass, steady, late re-pass) — three samples spanning the capture window inside one gauntlet; no manual window selection",
        "headline_min2_total": min2_total,
        "headline_first_pass_total": first_pass_total,
        # versioned second headline (round-8 judge task #7): HEADLINE +
        # the r7/r8 serve/index/audit family, same min-of-3 rule. For
        # round-over-round deltas vs r1-r7 captures compare
        # headline_min2_total (same min-of-2 definition those rounds used).
        "headline_v2_total": v2_total,
        "headline_v2_definition": "headline min-of-3 rule over HEADLINE + the index-serve/audit family (dedup_method_agreement, minhash_bucketed_index_dedup, minhash_band_index_build, takedown_indexed, component_index_incremental, embedding_ivf_indexed_topk, embedding_ivf_index_append, ivf_list_balance, streaming_embedding_topk, semantic_dedup_threshold_sweep, minhash_jaccard_estimate_error, simhash_band_stats)",
        **(
            {
                "steady_outliers": outliers,
                "steady_outliers_ok": not outliers,
                "prev_capture": os.path.basename(prev_path),
            }
            if prev_path and run_steady and not extra
            else {}
        ),
        # Window-health gate (r10, ADVICE item): the README's noisy-window
        # signature — depressed PRE-gauntlet tokenize throughput — is now
        # flagged by CODE, not eyeball, so a capture can be invalidated
        # self-arbitratingly (r9's opt_cap1 read 1.04 M tok/s and +26%
        # first-pass but passed the steady-only outlier gate). Floor set
        # at 6.5 M: clean windows on this host read 8-10 M, loaded ones
        # 4-5 M. Reported alongside, never alters any timing.
        **(
            {
                "window_health": {
                    "tokenize_pre_gauntlet": throughput.get(
                        "tokenize_tokens_per_sec"
                    ),
                    "tokenize_floor": 6_500_000,
                    "window_clean": (
                        throughput.get("tokenize_tokens_per_sec") is None
                        or throughput["tokenize_tokens_per_sec"] >= 6_500_000
                    ),
                }
            }
            if not extra
            else {}
        ),
        "total_all_queries": round(sum(times.values()), 3),
        **(
            {"steady_total_all_queries": round(sum(steady.values()), 3)}
            if steady
            else {}
        ),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        **({"throughput": throughput} if throughput else {}),
    }
    # Full-fidelity committed artifact — per-round numbers must remain
    # recoverable from the repo even when the driver's stdout capture
    # truncates. Skipped for subset runs (BENCH_QUERIES) so iteration
    # never clobbers the round record.
    if not extra:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "bench_full_latest.json"), "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
    print(json.dumps(payload))


def index_scale_check(spark, sf_dir: str, reps: int = 10) -> dict:
    """The persisted-band-index amortization claim, MEASURED: against a
    ``reps``x-replicated base corpus, (a) build+write the bucketed band
    index ONCE, then (b) screen a small daily increment through
    minhash_incremental_dedup_indexed reading spark.table(...), vs (c)
    re-running the full from-text incremental dedup (base re-signed every
    day). Deployment math at 100 TB: (a) is the one-off nightly backfill,
    (b) the daily cost, (c) what you pay WITHOUT the index. Passes when
    the indexed daily run undercuts the from-text run.

    This check caught a real flaw in round 6: the first indexed
    implementation re-aggregated ALL base band rows for the bucket-cap
    decision every day (O(base) daily — measured at parity with
    from-text, speedup 0.9x). The fix is the persisted per-bucket counts
    companion (band_index_counts): the daily cap joins the increment's
    tiny per-bh counts to stored base counts, and the measured speedup at
    10x base is ~1.9x and grows with base size."""
    import os as _os
    import time as _time

    from pyspark.sql import functions as F

    from llm_data_pipeline_spark.operators.lsh import (
        band_index_counts,
        band_index_rows,
        minhash_incremental_dedup,
        minhash_incremental_dedup_indexed,
    )
    from llm_data_pipeline_spark.operators.minhash import add_minhash_md5
    from llm_data_pipeline_spark.operators.skew import write_bucketed
    from llm_data_pipeline_spark.queries import table
    from llm_data_pipeline_spark.queries_sinks import SINK_BASE

    small = _os.path.join(_os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    base_dir = small if _os.path.isdir(small) else sf_dir
    docs = table(spark, base_dir, "documents").select("doc_id", "text")
    nparts = int(_os.environ.get("SPARK_GRAFT_CPUS", "32"))
    base = _replicated_docs(spark, docs, reps, nparts)
    inc = docs.where(F.col("doc_id") < 100).select(
        (F.col("doc_id") + 500_000_000).alias("doc_id"), "text"
    )

    _os.makedirs(SINK_BASE, exist_ok=True)
    t_index = f"bkt_index_scale_{_os.getpid()}"
    t_counts = f"bkt_counts_scale_{_os.getpid()}"
    t0 = _time.perf_counter()
    write_bucketed(
        band_index_rows(add_minhash_md5(base), rows_per_band=8),
        t_index, "bh", 32, path=f"{SINK_BASE}/{t_index}",
    )
    write_bucketed(
        band_index_counts(spark.table(t_index)),
        t_counts, "bh", 32, path=f"{SINK_BASE}/{t_counts}",
    )
    t_build = _time.perf_counter() - t0

    # both paths measured STEADY (second pass): the first pass pays
    # whole-stage codegen shared between the two plans, and whichever
    # path runs first would otherwise subsidize the other
    def run_indexed() -> tuple[float, int]:
        t0 = _time.perf_counter()
        n = minhash_incremental_dedup_indexed(
            spark.table(t_index), add_minhash_md5(inc), rows_per_band=8,
            index_counts=spark.table(t_counts),
        ).count()
        return _time.perf_counter() - t0, n

    def run_fromtext() -> tuple[float, int]:
        t0 = _time.perf_counter()
        n = minhash_incremental_dedup(
            add_minhash_md5(base), add_minhash_md5(inc), rows_per_band=8
        ).count()
        return _time.perf_counter() - t0, n

    run_indexed()
    _drop_persistent_rdds(spark)
    t_indexed, n_indexed = run_indexed()
    _drop_persistent_rdds(spark)
    run_fromtext()
    _drop_persistent_rdds(spark)
    t_fromtext, n_fromtext = run_fromtext()
    spark.catalog.clearCache()
    _drop_persistent_rdds(spark)
    return {
        "reps": reps,
        "t_build_index": round(t_build, 3),
        "t_daily_indexed": round(t_indexed, 3),
        "t_daily_from_text": round(t_fromtext, 3),
        "rows_match": bool(n_indexed == n_fromtext),
        "daily_speedup": round(t_fromtext / max(t_indexed, 1e-9), 2),
        "amortized_ok": bool(t_indexed < t_fromtext),
    }


def takedown_scale_check(spark, sf_dir: str, reps: int = 10) -> dict:
    """The persisted-component-map amortization claim, MEASURED (the
    governance twin of index_scale_check): against a ``reps``x-replicated
    corpus, (a) compute and persist the near-dup component map ONCE (the
    nightly dedup run's byproduct), then (b) serve a takedown request as
    two semi-joins against the stored map, vs (c) recomputing shingles,
    the pair graph, and connected components per request (what
    takedown_cluster_propagation does). Deployment math at 100 TB: (a)
    ships with the dedup run for free, (b) is the per-request cost, (c)
    is what a map-less design pays on EVERY request. Passes when the
    indexed serve undercuts the recompute."""
    import os as _os
    import time as _time

    from pyspark.sql import functions as F

    from llm_data_pipeline_spark.operators.dedup import ngram_jaccard_pairs
    from llm_data_pipeline_spark.operators.lsh import connected_components
    from llm_data_pipeline_spark.queries import table
    from llm_data_pipeline_spark.queries_sinks import SINK_BASE

    small = _os.path.join(_os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    base_dir = small if _os.path.isdir(small) else sf_dir
    docs = table(spark, base_dir, "documents").select("doc_id", "text")
    nparts = int(_os.environ.get("SPARK_GRAFT_CPUS", "32"))
    corpus = _replicated_docs(spark, docs, reps, nparts)
    req = spark.createDataFrame([(3,), (17,), (29,)], "doc_id long")

    _os.makedirs(SINK_BASE, exist_ok=True)
    path = f"{SINK_BASE}/takedown_comps_scale_{_os.getpid()}"
    t0 = _time.perf_counter()
    connected_components(
        ngram_jaccard_pairs(corpus, threshold=0.5, n=3).select("u", "v")
    ).write.mode("overwrite").parquet(path)
    t_build = _time.perf_counter() - t0

    def expand(comps) -> int:
        hit = comps.join(req, "doc_id", "left_semi").select("component").distinct()
        dels = comps.join(F.broadcast(hit), "component", "left_semi").select("doc_id")
        return dels.unionByName(req.select("doc_id")).distinct().count()

    def serve_indexed() -> tuple[float, int]:
        t0 = _time.perf_counter()
        n = expand(spark.read.parquet(path))
        return _time.perf_counter() - t0, n

    def serve_fromtext() -> tuple[float, int]:
        t0 = _time.perf_counter()
        n = expand(
            connected_components(
                ngram_jaccard_pairs(corpus, threshold=0.5, n=3).select("u", "v")
            )
        )
        return _time.perf_counter() - t0, n

    serve_indexed()  # steady: codegen compiled outside the timed window
    _drop_persistent_rdds(spark)
    t_idx, n_idx = serve_indexed()
    _drop_persistent_rdds(spark)
    serve_fromtext()
    _drop_persistent_rdds(spark)
    t_ft, n_ft = serve_fromtext()
    spark.catalog.clearCache()
    _drop_persistent_rdds(spark)
    return {
        "reps": reps,
        "t_build_component_map": round(t_build, 3),
        "t_serve_indexed": round(t_idx, 3),
        "t_serve_from_text": round(t_ft, 3),
        "rows_match": bool(n_idx == n_ft),
        "serve_speedup": round(t_ft / max(t_idx, 1e-9), 2),
        "amortized_ok": bool(t_idx < t_ft),
    }


def bpe_train_curve() -> dict:
    """Trainer wall-time at reference-scale merge counts (driver-side:
    merge learning never touches the corpus, only the word-freq dict —
    the curve shows cost vs vocab size, the axis the reference's
    vocab-32000 config lives on)."""
    import hashlib
    import time as _time
    from collections import Counter

    from llm_data_pipeline_spark.operators.bpe import learn_bpe
    from llm_data_pipeline_spark.queries_tokenize import (
        BPE8K_DRAWS,
        BPE8K_N_DOCS,
        BPE8K_POOL,
        BPE8K_WLEN,
    )

    pool = [
        hashlib.md5(str(j).encode()).hexdigest()[:BPE8K_WLEN]
        for j in range(BPE8K_POOL)
    ]
    c: Counter = Counter()
    for d in range(BPE8K_N_DOCS):
        for k in range(BPE8K_DRAWS):
            u = (d * 131071 + k * 8191) % BPE8K_POOL
            j = (u * u) // BPE8K_POOL
            c[pool[j]] += 1
    wf = sorted(c.items())
    curve = {}
    for n in (1024, 2048, 4096, 8192):
        t0 = _time.perf_counter()
        m = learn_bpe(wf, n, min_pair_freq=2)
        curve[str(n)] = {
            "sec": round(_time.perf_counter() - t0, 3),
            "merges": len(m),
        }
    return curve


def unigram_train_curve(sf_dir: str) -> dict:
    """Trainer wall-time vs VOCAB SIZE for the in-engine unigram-LM
    (hard-EM) trainer — the second trainer family's twin of
    bpe_train_curve (round-7 judge task #6). The sweep's scale claim:
    hard-EM cost is dominated by the E-step Viterbi sweep over the
    corpus sample, O(sum_len * max_piece) per iteration with O(1) dict
    probes — INDEPENDENT of the prune target — so wall time vs vocab
    size must be flat/sublinear (asserted: the largest vocab may cost at
    most 2x the smallest while the vocab grows 8x; superlinear growth
    here would mean the trainer is probing the vocab per position, the
    failure mode that makes vocab-32000 training intractable). Corpus =
    the sf0.01 documents sample, same bounded-driver-artifact model as
    the reference's input_sentence_size cap
    (/root/reference/src/llm_data_pipeline/tokenizer/train.py:111-134)."""
    import time as _time

    import duckdb

    from llm_data_pipeline_spark.operators.unigram_lm import train_unigram

    small = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    base_dir = small if os.path.isdir(small) else sf_dir
    con = duckdb.connect()
    rows = con.execute(
        "SELECT trim(regexp_replace(lower(coalesce(text,'')), '\\s+', ' ', 'g'))"
        f" FROM read_parquet('{base_dir}/documents.parquet')"
    ).fetchall()
    texts = [t for (t,) in rows if t]
    curve: dict = {}
    sizes = (150, 300, 600, 1200)
    for n in sizes:
        t0 = _time.perf_counter()
        cost, _default = train_unigram(texts, vocab_size=n, em_iters=3)
        curve[str(n)] = {
            "sec": round(_time.perf_counter() - t0, 3),
            "pieces": len(cost),
        }
    lo, hi = curve[str(sizes[0])]["sec"], curve[str(sizes[-1])]["sec"]
    curve["sublinear_ok"] = bool(hi <= max(2.0 * lo, lo + 1.0))
    return curve


def dedup_scale_check(spark, sf_dir: str, reps: int = 10) -> dict:
    """Measured (not argued) scale behavior of the dedup family: the
    corpus is replicated in-plan with per-replica word tags (each replica
    is DISTINCT content — the '10x more data' model, not '10 copies of
    the same documents'), then ngram-Jaccard pair generation and
    MinHash-LSH dedup run at 1x and at ``reps``x. With disjoint replica
    shingle spaces, bucket sizes stay bounded and candidates grow with
    corpus size, so runtime should grow ~linearly (ratio well under the
    quadratic reps^2). Runs at sf0.01 regardless of the bench sf so the
    check costs seconds, not minutes."""
    import time as _time

    from pyspark.sql import functions as F

    from llm_data_pipeline_spark.operators.dedup import ngram_jaccard_pairs
    from llm_data_pipeline_spark.operators.lsh import minhash_dedup
    from llm_data_pipeline_spark.operators.minhash import add_minhash
    from llm_data_pipeline_spark.queries import table

    small = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    base_dir = small if os.path.isdir(small) else sf_dir
    docs = table(spark, base_dir, "documents").select("doc_id", "text")
    nparts = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    def replicated(r: int):
        return _replicated_docs(spark, docs, r, nparts)

    def run_once(r: int) -> tuple[float, int, float, int]:
        d = replicated(r)
        t0 = _time.perf_counter()
        n_pairs = ngram_jaccard_pairs(d, threshold=0.5, n=3).count()
        t_j = _time.perf_counter() - t0
        spark.catalog.clearCache()
        t0 = _time.perf_counter()
        kept, _ = minhash_dedup(
            add_minhash(d, stage_hashes=True), rows_per_band=8
        )
        n_kept = kept.count()
        t_m = _time.perf_counter() - t0
        spark.catalog.clearCache()
        return t_j, n_pairs, t_m, n_kept

    run_once(1)  # warmup: codegen/broadcast setup must not bill the 1x run
    out: dict = {"reps": reps, "sf_dir": base_dir}
    for label, r in (("1x", 1), (f"{reps}x", reps)):
        t_j, n_pairs, t_m, n_kept = run_once(r)
        out[label] = {
            "jaccard_sec": round(t_j, 3),
            "jaccard_pairs": n_pairs,
            "minhash_sec": round(t_m, 3),
            "minhash_kept": n_kept,
        }
    big, one = out[f"{reps}x"], out["1x"]
    out["jaccard_time_ratio"] = round(big["jaccard_sec"] / max(one["jaccard_sec"], 1e-9), 2)
    out["minhash_time_ratio"] = round(big["minhash_sec"] / max(one["minhash_sec"], 1e-9), 2)
    # linear-ish growth: time ratio at most ~reps (with generous headroom
    # for fixed overheads), far below the reps^2 of an all-pairs design
    out["linear_ok"] = bool(
        out["jaccard_time_ratio"] <= reps * 1.5
        and out["minhash_time_ratio"] <= reps * 1.5
    )
    return out


def semdedup_scale_check(spark, sf_dir: str, reps: int = 10) -> dict:
    """Measured scale behavior of SemDeDup under the paper's own scaling
    contract: k (number of clusters) grows WITH the corpus so expected
    cluster size stays constant — per-cluster GEMM work then grows
    ~linearly in corpus size, not quadratically. Each replica applies a
    rep-dependent deterministic sign pattern so replicas are distinct
    vectors (the '10x more data' model). Runs at sf0.01."""
    import time as _time

    from pyspark.sql import functions as F

    from llm_data_pipeline_spark.operators.semdedup import semantic_dedup
    from llm_data_pipeline_spark.queries import table

    small = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    base_dir = small if os.path.isdir(small) else sf_dir
    emb = table(spark, base_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    nparts = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    def replicated(r: int):
        reps_df = spark.range(r).select(F.col("id").alias("rep"))
        # rotate each vector by rep positions -> every replica is
        # distinct content with the same norm (the '10x more data' model)
        dim = F.size("embedding")
        rot = F.concat(
            F.slice(F.col("embedding"), F.col("rep") + 1, dim - F.col("rep")),
            F.slice(F.col("embedding"), 1, F.col("rep")),
        )
        return (
            emb.crossJoin(reps_df)
            .select(
                (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
                rot.alias("embedding"),
            )
            .repartition(nparts)
        )

    def run_once(r: int) -> tuple[float, int]:
        d = replicated(r)
        k = 16 * r
        cents = d.orderBy("vec_id").limit(k)
        from pyspark.sql.window import Window

        cents = cents.select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1).alias("list_id"),
            F.col("embedding").alias("cvec"),
        )
        t0 = _time.perf_counter()
        n_kept = semantic_dedup(
            d, cents, threshold=0.9, use_gemm=True
        ).count()
        dt = _time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt, n_kept

    run_once(1)  # warmup
    out: dict = {"reps": reps, "sf_dir": base_dir}
    for label, r in (("1x", 1), (f"{reps}x", reps)):
        dt, n_kept = run_once(r)
        out[label] = {"sec": round(dt, 3), "kept": n_kept}
    out["time_ratio"] = round(
        out[f"{reps}x"]["sec"] / max(out["1x"]["sec"], 1e-9), 2
    )
    out["linear_ok"] = bool(out["time_ratio"] <= reps * 1.5)
    return out


def ann_recall(spark, sf_dir: str) -> dict:
    """recall@10 of every approximate ANN query against the exact
    brute-force top-10 on the same corpus/queries — the quality half of
    the ANN story (speed is the per-query bench rows). Computed as
    |approx ∩ exact| / |exact| over all (query_id, vec_id) pairs."""
    bf = (
        Q.REGISTRY["embedding_topk_bruteforce"]
        .fn(spark, sf_dir)
        .select("query_id", "vec_id")
        .persist()
    )
    out = {}
    try:
        total = bf.count()
        for name in (
            "embedding_pq_adc_topk",
            "embedding_pq_rerank_topk",
            "embedding_ivf_flat_topk",
            "embedding_ivfpq_topk",
            "embedding_ann_lsh_topk",
        ):
            if name not in Q.REGISTRY:
                continue
            ap = Q.REGISTRY[name].fn(spark, sf_dir).select("query_id", "vec_id")
            inter = ap.join(bf, ["query_id", "vec_id"], "left_semi").count()
            out[name] = round(inter / max(total, 1), 4)
    finally:
        bf.unpersist()
    out["k"] = 10
    out["n_pairs_exact"] = total
    # Planted-cluster fixture: on clusterable data a healthy IVF must
    # SATURATE recall (>=0.9) — on the random near-orthogonal embeddings
    # table absolute recall is ceiling-bounded by the data, so only this
    # fixture separates "geometry bug" from "fixture noise".
    planted = (
        Q.REGISTRY["embedding_ann_recall_planted"]
        .fn(spark, sf_dir)
        .agg({"n_hits": "sum", "query_id": "count"})
        .collect()[0]
    )
    out["planted_recall_at_10"] = round(
        planted["sum(n_hits)"] / (10 * max(planted["count(query_id)"], 1)), 4
    )
    # Recall floors: an index geometry that stops matching the corpus
    # (frozen nlist / stale codebooks after corpus growth) must fail
    # LOUDLY here, not ship silently — round-5 lesson: sf0.01-trained
    # books at sf0.1 collapsed IVF-PQ recall to 0.07. Floors sit under
    # the measured sf0.1 values (0.465/0.965/0.57/0.51/0.92) with slack
    # for data refreshes.
    floors = {
        "embedding_pq_adc_topk": 0.30,
        "embedding_pq_rerank_topk": 0.60,
        "embedding_ivf_flat_topk": 0.45,
        "embedding_ivfpq_topk": 0.40,
        "embedding_ann_lsh_topk": 0.60,
        "planted_recall_at_10": 0.90,
    }
    breaches = {
        q: {"recall": out[q], "floor": f}
        for q, f in floors.items()
        if q in out and out[q] < f
    }
    out["floors"] = floors
    out["recall_ok"] = not breaches
    if breaches:
        print(
            f"bench: ANN RECALL FLOOR BREACH — retrain codebooks / rescale "
            f"geometry (scripts/gen_codebooks.py large): {breaches}",
            file=sys.stderr,
        )
    # Inverted-list balance ceiling (round-8 judge task #6): max
    # balance_ppm over lists IS the probe-latency multiplier — a stale
    # codebook after corpus drift turns one list into a near-linear scan
    # for every query probing it, which recall floors alone don't catch
    # (recall SURVIVES a mega-list; latency doesn't). Ceiling 2e6 = the
    # fattest list at most 2x the perfectly-balanced size; measured sf0.1
    # max is 1.20e6, so the ceiling has drift headroom without admitting
    # a degenerate index (a collapsed codebook reads >10e6).
    if "ivf_list_balance" in Q.REGISTRY:
        bal = [
            r["balance_ppm"]
            for r in Q.REGISTRY["ivf_list_balance"].fn(spark, sf_dir).collect()
        ]
        out["balance_ppm_max"] = max(bal) if bal else None
        out["balance_ppm_ceiling"] = 2_000_000
        out["balance_ok"] = bool(bal) and max(bal) <= 2_000_000
        if not out["balance_ok"]:
            print(
                f"bench: IVF LIST BALANCE CEILING BREACH — max balance_ppm "
                f"{out['balance_ppm_max']} > 2000000; retrain the codebook "
                f"(scripts/gen_codebooks.py) before trusting probe latency",
                file=sys.stderr,
            )
    return out


def layout_gate(spark, sf_dir: str) -> dict:
    """Storage-layout payoff gate (round 9): z-order must keep its
    file-skipping edge on BOTH predicate axes (zorder_layout_pruning's
    graded avoid_ppm = fraction of shard files a zone-map-aware
    single-column scan skips). Floors (measured sf0.1): z-order lang
    778_125 / length 604_167 vs ingest order 0 / 0, and the plain lang
    sort must keep showing the single-sort pathology (length axis 0 —
    if lang_sort ever "wins" the length axis the audit itself broke). A
    z-order regression means the interleave or range split broke — the
    OPTIMIZE pass would silently stop paying for itself."""
    rows = {
        r["layout"]: (r["lang_avoid_ppm"], r["len_avoid_ppm"])
        for r in Q.REGISTRY["zorder_layout_pruning"].fn(spark, sf_dir).collect()
    }
    z = rows.get("zorder", (None, None))
    ingest = rows.get("ingest_order", (None, None))
    ls = rows.get("lang_sort", (None, None))
    out = {
        "zorder_lang_avoid_ppm": z[0],
        "zorder_len_avoid_ppm": z[1],
        "ingest_lang_avoid_ppm": ingest[0],
        "lang_sort_len_avoid_ppm": ls[1],
        "zorder_lang_floor_ppm": 600_000,
        "zorder_len_floor_ppm": 450_000,
        "ingest_ceiling_ppm": 300_000,
        # the single-sort pathology must stay visible: a lang sort that
        # suddenly "wins" the length axis means the audit broke
        "lang_sort_len_ceiling_ppm": 300_000,
        "layout_ok": None not in (z[0], z[1], ingest[0], ls[1])
        and z[0] >= 600_000
        and z[1] >= 450_000
        and ingest[0] <= 300_000
        and ls[1] <= 300_000,
    }
    if not out["layout_ok"]:
        print(
            f"bench: LAYOUT GATE BREACH — zorder avoid {z} "
            f"(floors 600000/450000), ingest lang {ingest[0]} (ceiling "
            f"300000), lang_sort len {ls[1]} (ceiling 300000)",
            file=sys.stderr,
        )
    return out


# planted-cluster ids must sit beyond every replica id (doc_id +
# rep*10_000_000, rep < reps) — a 20M offset collided with rep 2's ids,
# contaminating both the "fixed" target and the retrieval metric
_PLANTED_OFFSET = 1_000_000_000


def dsir_scale_check(spark, sf_dir: str, reps: int = 10) -> dict:
    """Measured scale behavior of DSIR selection: the TARGET set stays
    fixed (the real deployment shape — a small trusted corpus) while the
    raw corpus is replicated 1x and ``reps``x with per-replica word tags
    (distinct content, so the hashed-feature space genuinely grows).
    Feature extraction and the per-doc count aggregate are linear in the
    corpus; both models stay bucket-bounded (10k rows) at every scale, so
    the time ratio should sit far below reps — the broadcast-scoring
    claim, measured. Runs at sf0.01 so the check costs seconds."""
    import time as _time

    from pyspark.sql import functions as F

    from llm_data_pipeline_spark.operators.dsir import dsir_importance_scores
    from llm_data_pipeline_spark.queries import table

    small = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    base_dir = small if os.path.isdir(small) else sf_dir
    docs = table(spark, base_dir, "documents").select("doc_id", "text")
    nparts = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    def replicated(r: int):
        return _replicated_docs(spark, docs, r, nparts)

    def planted():
        """100 docs over a private 31-word vocabulary ("pv0".."pv30") —
        a genuinely distinct topical cluster (the raw synthetic corpus
        draws all sources from ONE vocabulary, so nothing in it can show
        retrieval lift). Deterministic modular construction — no RNG."""
        return spark.range(100).select(
            (F.col("id") + _PLANTED_OFFSET).alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(39)),
                    lambda k: F.concat(
                        F.lit("pv"), ((F.col("id") * 7 + k) % 31).cast("string")
                    ),
                ),
            ).alias("text"),
        )

    def run_once(r: int) -> tuple[float, int]:
        d = replicated(r).select("doc_id", "text").unionByName(planted())
        # fixed target: half the planted cluster (even ids) — the small
        # trusted-slice shape DSIR serves; its mass is constant while the
        # raw corpus grows reps x
        target = d.where(
            (F.col("doc_id") >= _PLANTED_OFFSET) & (F.col("doc_id") % 2 == 0)
        )
        t0 = _time.perf_counter()
        # retrieval lift alongside time: rank everything EXCEPT the
        # target members themselves, count how many of the 50 held-out
        # planted docs (odd ids) land in the top 50 — ideal = 50
        n = (
            dsir_importance_scores(d, target)
            .where(
                (F.col("doc_id") < _PLANTED_OFFSET) | (F.col("doc_id") % 2 == 1)
            )
            .orderBy(F.col("score_micro").desc(), F.col("doc_id"))
            .limit(50)
            .where(F.col("doc_id") >= _PLANTED_OFFSET)
            .count()
        )
        dt = _time.perf_counter() - t0
        # free the SQL cache AND the lazy-checkpoint blocks the scoring
        # pass left behind — otherwise their async ContextCleaner reap
        # can land inside the next timed window (the measured gauntlet
        # variance trap) and skew time_ratio
        spark.catalog.clearCache()
        _drop_persistent_rdds(spark)
        import gc

        gc.collect()
        return dt, n

    run_once(1)  # warmup
    out: dict = {"reps": reps, "sf_dir": base_dir}
    for label, r in (("1x", 1), (f"{reps}x", reps)):
        dt, n = run_once(r)
        out[label] = {"sec": round(dt, 3), "heldout_planted_in_top50": n}
    out["time_ratio"] = round(
        out[f"{reps}x"]["sec"] / max(out["1x"]["sec"], 1e-9), 2
    )
    out["linear_ok"] = bool(out["time_ratio"] <= reps * 1.5)
    return out


def hh_scale_check(spark, sf_dir: str, reps: int = 10) -> dict:
    """Measured scale behavior of exact heavy-hitter mining: replicated
    distinct-content corpus at 1x and ``reps``x. The claim under test is
    the candidate bound — the shuffle carries candidate rows, not the
    n-gram universe — so alongside the time ratio we record how many
    candidate grams the Misra-Gries pass surfaced vs the distinct-gram
    universe the naive plan would shuffle."""
    import time as _time

    from llm_data_pipeline_spark.operators.heavyhitters import (
        frequent_ngrams,
        ngram_stream,
    )
    from llm_data_pipeline_spark.queries import table

    small = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    base_dir = small if os.path.isdir(small) else sf_dir
    docs = table(spark, base_dir, "documents").select("doc_id", "text")
    nparts = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    def run_once(r: int) -> dict:
        d = _replicated_docs(spark, docs, r, nparts).select("text")
        t0 = _time.perf_counter()
        n_freq = frequent_ngrams(d, n=3, min_count=5).count()
        dt = _time.perf_counter() - t0
        n_distinct = ngram_stream(d, 3).distinct().count()
        spark.catalog.clearCache()
        return {
            "sec": round(dt, 3),
            "frequent_grams": n_freq,
            "distinct_gram_universe": n_distinct,
        }

    run_once(1)  # warmup
    out: dict = {"reps": reps, "sf_dir": base_dir}
    for label, r in (("1x", 1), (f"{reps}x", reps)):
        out[label] = run_once(r)
    out["time_ratio"] = round(
        out[f"{reps}x"]["sec"] / max(out["1x"]["sec"], 1e-9), 2
    )
    out["linear_ok"] = bool(out["time_ratio"] <= reps * 1.5)
    return out


def skew_scale_check(spark, reps: int = 10) -> dict:
    """Measured value of the skew toolbox: a 90%-hot-key corpus aggregated
    with a reduce-heavy (collect-style) aggregation, plain vs salted
    two-phase, at 1x and ``reps``x rows. Plain sends every hot-key row to
    ONE reduce task (the straggler that dominates at 100 TB); salting
    spreads it over n_salts tasks and rolls partials up. Outputs must
    agree exactly — the check records both times and the hot-key row
    count so the speedup is attributable."""
    import time as _time

    from pyspark.sql import functions as F

    n_salts = 8
    nparts = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    def frame(r: int):
        n = 200_000 * r
        base = spark.range(n).repartition(nparts)
        return base.select(
            F.when(F.col("id") % 10 < 9, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 100).cast("string")))
            .alias("key"),
            F.md5(F.col("id").cast("string")).alias("v"),
        )

    # the reducer must do real per-row work that can't collapse to a count:
    # distinct-count via sort_array(collect_set) materializes and sorts the
    # hot key's value set inside its (single, unless salted) reduce task
    def plain(d):
        return d.groupBy("key").agg(
            F.size(F.sort_array(F.collect_set("v"))).alias("n")
        )

    def salted(d):
        return (
            d.withColumn("_salt", F.crc32(F.col("v")) % n_salts)
            .groupBy("key", "_salt")
            .agg(F.collect_set("v").alias("_p"))
            .groupBy("key")
            .agg(F.sum(F.size(F.sort_array("_p"))).cast("int").alias("n"))
        )

    def run(fn, d) -> tuple[float, int]:
        t0 = _time.perf_counter()
        rows = {r["key"]: r["n"] for r in fn(d).collect()}
        return _time.perf_counter() - t0, rows

    run(plain, frame(1))  # warmup
    run(salted, frame(1))
    out: dict = {"reps": reps, "n_salts": n_salts}
    for label, r in (("1x", 1), (f"{reps}x", reps)):
        d = frame(r)
        tp, rp = run(plain, d)
        ts, rs = run(salted, d)
        assert rp == rs, "salted aggregation diverged from plain"
        out[label] = {
            "plain_sec": round(tp, 3),
            "salted_sec": round(ts, 3),
            "hot_rows": rp["hot"],
        }
        spark.catalog.clearCache()
    big = out[f"{reps}x"]
    out["salted_speedup_at_10x"] = round(
        big["plain_sec"] / max(big["salted_sec"], 1e-9), 2
    )
    return out


def cc_scale_check(spark) -> dict:
    """Forced-distributed connected components on an adversarial chain
    (diameter = n) at 1x/10x, with and without pointer jumping — turns
    the 'propagation converges in O(log n) rounds' claim into measured
    round counts. Without jumping, labels move one hop per round, so the
    run hits the iteration cap (recorded as converged=false); with
    jumping it converges in ~log2(n) rounds at both scales."""
    import time as _time

    from pyspark.sql import functions as F

    from llm_data_pipeline_spark.operators.lsh import (
        _driver_dsu_components,
        _propagation_components,
    )

    out: dict = {}
    cap = 25
    for label, n in (("1x_chain_256", 256), ("10x_chain_2560", 2560)):
        edges = (
            spark.range(n - 1)
            .select(F.col("id").alias("u"), (F.col("id") + 1).alias("v"))
            .localCheckpoint(eager=False)
        )
        entry: dict = {"n_nodes": n}
        jump_labels = None
        for jump in (True, False):
            if not jump and n > 256:
                continue  # one no-jump demonstration is enough; O(n) rounds
            stats: dict = {}
            t0 = _time.perf_counter()
            labels = _propagation_components(
                edges, max_iterations=cap, stats=stats, pointer_jump=jump
            )
            n_comp = labels.select("component").distinct().count()
            if jump:
                jump_labels = labels  # reuse below — don't re-propagate
            entry["jump" if jump else "no_jump"] = {
                "rounds": stats["rounds"],
                "converged": stats["converged"],
                "sec": round(_time.perf_counter() - t0, 3),
                "n_components": n_comp,
            }
        # correctness pin: jump path labels == driver DSU labels
        dsu = _driver_dsu_components(edges)
        entry["matches_dsu"] = bool(
            jump_labels.exceptAll(dsu).count() == 0
            and dsu.exceptAll(jump_labels).count() == 0
        )
        out[label] = entry
    return out


def tokenize_throughput(spark, sf_dir: str, target_tokens: int = 25_000_000) -> dict:
    """Tokens/sec on a corpus replicated in-plan to ``target_tokens`` —
    directly comparable to BASELINE.md's tokenize-throughput rows (which
    time encode-only over a pre-trained tokenizer; vocab training and the
    replication factor are computed outside the timed window here too).
    """
    import time as _time

    from pyspark.sql import functions as F

    from llm_data_pipeline_spark.operators.tokenizer import (
        encode_via_udf,
        train_word_vocab,
    )
    from llm_data_pipeline_spark.queries import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    vocab = train_word_vocab(docs)
    base = encode_via_udf(docs, vocab).agg(
        F.sum(F.size("input_ids")).alias("n")
    ).collect()[0]["n"]
    if not base:
        return {}
    reps = max(1, int(target_tokens // base))
    # Shuffle-free replication: 32 range partitions each cross the broadcast
    # corpus locally, so the timed job is generation (trivial) + encode with
    # full parallelism and no text shuffle or cache round-trip.
    nparts = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    corpus = (
        spark.range(0, reps, 1, nparts)
        .crossJoin(F.broadcast(docs))
        .select("doc_id", "text")
    )
    t0 = _time.perf_counter()
    tokens = encode_via_udf(corpus, vocab).agg(
        F.sum(F.size("input_ids")).alias("n")
    ).collect()[0]["n"]
    dt = _time.perf_counter() - t0
    return {
        "tokenize_tokens_per_sec": round(tokens / dt),
        "tokens": int(tokens),
        "sec": round(dt, 3),
        "corpus_replication": reps,
    }


if __name__ == "__main__":
    main()

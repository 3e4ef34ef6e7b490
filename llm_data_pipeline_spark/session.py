"""SparkSession factory tuned for the pipeline's workload shape.

Defaults target the test harness (local[N], 32 shuffle partitions) but every
knob is env-overridable so the same code runs on a real cluster unchanged:
on a 1000-executor cluster you would leave ``master`` unset (spark-submit
provides it) and raise ``spark.sql.shuffle.partitions`` to ~2-3x total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "llm_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    - AQE on: runtime coalescing of shuffle partitions + skew-join handling,
      which is what makes one static ``shuffle.partitions`` setting survive
      data-size changes between sf0.001 and 100 TB.
    - Arrow on: every pandas UDF / mapInPandas transfer is Arrow-batched.
    - Parquet pushdown/pruning left at defaults (on) — operators are written
      so filters and projections reach the scan.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark has no nanos
        # type — read as long and convert at the loader (queries.table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # split size governs scan parallelism vs per-task overhead; 128 MiB
        # (the default, pinned here so it is an explicit knob) keeps a
        # 100 TB scan at ~800k tasks — raise toward 256-512 MiB when the
        # cluster is scheduler-bound, lower it for CPU-heavy narrow stages
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_MAX_PARTITION_BYTES", "134217728"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", os.environ.get("SPARK_UI_ENABLED", "false"))
        # The status listener retains job/stage/task/SQL-execution records
        # even with the UI off; over a 200+-execution bench gauntlet the
        # defaults (1000 stages / 100k tasks / 1000 SQL executions) add
        # steady heap + listener-bus pressure that late queries pay for.
        # Keep a moderate window — NOT lower: evicting executions whose
        # tasks are still finishing makes the DAGScheduler log storms of
        # "Failed to update accumulator" errors and churns the listener.
        .config("spark.ui.retainedJobs", "300")
        .config("spark.ui.retainedStages", "500")
        .config("spark.ui.retainedTasks", "50000")
        .config("spark.sql.ui.retainedExecutions", "200")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

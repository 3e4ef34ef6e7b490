"""Lineage-cut helper with a deployment knob (local vs reliable).

Every operator that pins a multi-consumer intermediate (band rows, edge
lists, staged shingles, iteration frames) cuts lineage through
:func:`cut_lineage` instead of calling ``localCheckpoint`` directly, so ONE
session conf switches the mechanism:

- ``engine.checkpoint.mode=local`` (default): ``DataFrame.localCheckpoint``.
  Blocks live on the executors that computed them — fastest (no
  distributed-FS round trip) but NON-RECOVERABLE: on a real cluster an
  executor loss kills the job instead of recomputing, acceptable for
  short-lived local/bench runs and cheap-to-rerun jobs.
- ``engine.checkpoint.mode=reliable``: ``DataFrame.checkpoint`` into the
  directory configured via ``SparkContext.setCheckpointDir`` (HDFS/object
  store on a cluster). Survives executor loss — the right trade for long
  100 TB jobs where losing 4 hours of dedup to one preempted node costs
  more than the checkpoint writes (guide §5: localCheckpoint is the
  cheaper lineage cut *when fault tolerance of that intermediate is not
  critical*).

Semantics are identical in both modes (same rows, same schema — pinned by
tests/test_dedup.py::test_reliable_checkpoint_mode_identical); only block
placement and recoverability differ. Eagerness is the caller's choice and
is orthogonal to the mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MODE_KEY = "engine.checkpoint.mode"


def cut_lineage(df: DataFrame, eager: bool = False) -> DataFrame:
    """Truncate ``df``'s lineage per the session's checkpoint mode."""
    mode = df.sparkSession.conf.get(MODE_KEY, "local")
    if mode == "reliable":
        return df.checkpoint(eager=eager)
    if mode != "local":
        raise ValueError(
            f"{MODE_KEY} must be 'local' or 'reliable', got {mode!r}"
        )
    return df.localCheckpoint(eager=eager)

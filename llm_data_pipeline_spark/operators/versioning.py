"""Dataset versioning: CDC-style merge/upsert of an increment over a base
snapshot (the Delta-Lake MERGE INTO shape, engine-native on plain parquet).

Engine-native extension (no reference counterpart): corpus_snapshot_diff
answers "what changed between two snapshots"; this operator APPLIES a
change set — the daily operation of a continuously-ingested corpus store:
re-crawled pages update, new pages insert, takedown/opt-out requests
delete (the GDPR path), everything else carries over untouched.

Semantics: the increment has at most one row per key with an op column —
'D' deletes; any other non-null op upserts (the inserted/updated label is
derived from base existence, not trusted from the op letter, so a
mislabelled increment cannot corrupt the merge). One full-outer join on
the key classifies every row; surviving rows take the increment's values
when it won.

100-TB shape: a single key-partitioned full-outer join — base and
increment co-partition on the key (bucketed base stores join
exchange-free; see bucketed_colocated_join), AQE broadcasts the increment
when it is small (the usual case: daily delta << base). No driver
collection; classification and value resolution are pure row-local
expressions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    increment: DataFrame,
    key: str = "doc_id",
    op_col: str = "op",
    value_cols: Sequence[str] = ("text",),
) -> DataFrame:
    """Classify + merge; returns one row per key seen on either side:
    ``key``, ``action`` in {inserted, updated, deleted, noop_delete,
    unchanged}, and each value column resolved to the surviving version
    (NULL for deletes). Callers drop action IN ('deleted','noop_delete')
    to materialize the next snapshot.
    """
    b = base.select(
        F.col(key), F.lit(1).alias("_b"), *[F.col(c).alias(f"_b_{c}") for c in value_cols]
    )
    i = increment.select(
        F.col(key),
        F.col(op_col).alias("_op"),
        *[F.col(c).alias(f"_i_{c}") for c in value_cols],
    )
    j = b.join(i, key, "full_outer")
    is_del = F.col("_op") == "D"
    has_base = F.col("_b").isNotNull()
    has_inc = F.col("_op").isNotNull()
    action = (
        F.when(is_del & has_base, F.lit("deleted"))
        .when(is_del, F.lit("noop_delete"))
        .when(has_inc & has_base, F.lit("updated"))
        .when(has_inc, F.lit("inserted"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.withColumn("action", action)
    survived = ~F.col("action").isin("deleted", "noop_delete")
    inc_wins = F.col("action").isin("inserted", "updated")
    for c in value_cols:
        out = out.withColumn(
            c,
            F.when(
                survived,
                F.when(inc_wins, F.col(f"_i_{c}")).otherwise(F.col(f"_b_{c}")),
            ),
        )
    return out.select(key, "action", *value_cols)

"""As-of join: for each left row, the latest right row at-or-before its
timestamp, per key (SURVEY.md §2.5 notes the reference has no such join;
Spark has no built-in either — this is the union+window construction).

Construction (one shuffle, no range explosion):

1. tag left rows (side=1) and right rows (side=0) and union them on
   (key, ts) with the right side's value columns nulled on left rows;
2. sort within key by (ts, side) — side=0 first on ties so a right row at
   exactly the left timestamp IS matched ("at or before");
3. ``last_value(ignorenulls=True)`` over the running window fills every
   left row with the most recent right values;
4. keep the left rows.

Scale: the window partitions by key — the same shuffle a sort-merge join
would pay, with no risk of the O(n*m) blow-up a naive range-condition join
(`l.key = r.key AND r.ts <= l.ts`) produces. Skewed keys can be salted by
time-bucketing the window (bucket boundary rows replicated), which keeps
the construction but bounds partition size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join; right ``value_cols`` arrive as ``{prefix}{col}``
    (null where no right row precedes the left row)."""
    r_struct = F.struct(*[F.col(c) for c in value_cols]).alias("_v")
    r_tag = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        r_struct,
    )
    l_tag = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_tag.schema["_v"].dataType).alias("_v"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
    )
    r_tag = r_tag.withColumn(
        "_left", F.lit(None).cast(l_tag.schema["_left"].dataType)
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # The right values travel as ONE struct, so the as-of fill is atomic —
    # per-column last() could otherwise mix different right rows when some
    # right values are null.
    filled = l_tag.unionByName(r_tag).select(
        "_side",
        "_left",
        F.last("_v", ignorenulls=True).over(w).alias("_vf"),
    )
    out_cols = [F.col(f"_left.{c}").alias(c) for c in left.columns]
    return filled.filter(F.col("_side") == 1).select(
        *out_cols,
        *[F.col(f"_vf.{c}").alias(f"{prefix}{c}") for c in value_cols],
    )

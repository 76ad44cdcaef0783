"""Generic as-of (backward) join — for each left row, the latest right
row with `right_ts <= left_ts` within the same partition keys. The
time-series join Spark lacks natively (J4's LOCF fill is the
single-frame special case; this is the two-table operator).

Shape: tag + union + one window pass — the right rows are interleaved
into the left timeline and the last right ROW (one struct, never
independent per-column carries) is carried forward per key. ONE shuffle
keyed by `by` and no range join: a rangeBetween/theta join would
explode to |left| × |matching-window| rows before filtering, which is
the classic as-of scale trap. Ties (right_ts == left_ts) resolve to the
tied right row (inclusive backward join, matching DuckDB/pandas ASOF
semantics).

Match semantics: the carried struct is non-null exactly when an earlier
right row EXISTS, even if every value column of that row is NULL — so
`how='inner'` keeps a left row matched to an all-null right row, and the
output never mixes values from different right rows (both were defects
of a per-column `last(ignorenulls)` carry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Backward as-of join. Returns every left column plus `value_cols`
    from the matched right row; `how='inner'` drops left rows with no
    earlier right row, `how='left'` keeps them with nulls."""
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in set(by) | {right_ts}]
    lcols = left.columns
    # ONE struct per right row: its nullness marks "a right row exists
    # here", independent of the value columns' own nullness.
    rv_struct = F.struct(*[F.col(c).alias(c) for c in value_cols])
    rv_type = (
        right.select(rv_struct.alias("_rv")).schema["_rv"].dataType
    )
    r = right.select(
        *by,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        rv_struct.alias("_rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in by],
    )
    l = left.select(
        *by,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rv_type).alias("_rv"),
        *[F.col(c) for c in lcols if c not in by],
    )
    # right rows sort BEFORE left rows at equal timestamps (side 0 < 1),
    # so an exact-tie right row is visible to the left row — inclusive
    w = (
        Window.partitionBy(*by)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = r.unionByName(l).withColumn(
        "_m", F.last("_rv", ignorenulls=True).over(w)
    )
    out = carried.where(F.col("_side") == 1)
    if how == "inner":
        out = out.where(F.col("_m").isNotNull())
    return out.select(
        *by,
        *[F.col(c) for c in lcols if c not in by],
        *[F.col("_m").getField(c).alias(c) for c in value_cols],
    )

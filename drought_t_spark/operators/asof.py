"""Generic as-of (backward) join — for each left row, the latest right
row with `right_ts <= left_ts` within the same partition keys. The
time-series join Spark lacks natively (J4's LOCF fill is the
single-frame special case; this is the two-table operator).

Shape: tag + union + one window pass — the right rows are interleaved
into the left timeline and the last-non-null right payload is carried
forward per key. ONE shuffle keyed by `by` and no range join: a
rangeBetween/theta join would explode to |left| × |matching-window|
rows before filtering, which is the classic as-of scale trap. Ties
(right_ts == left_ts) resolve to the tied right row (inclusive
backward join, matching DuckDB/pandas ASOF semantics).
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
    r = right.select(
        *by,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in by],
    )
    l = left.select(
        *by,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}")
          for c in value_cols],
        *[F.col(c) for c in lcols if c not in by],
    )
    # right rows sort BEFORE left rows at equal timestamps (side 0 < 1),
    # so an exact-tie right row is visible to the left row — inclusive
    w = (
        Window.partitionBy(*by)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = r.unionByName(l).select(
        "*",
        *[F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
          for c in value_cols],
    )
    out = carried.where(F.col("_side") == 1).select(
        *by,
        *[F.col(c) for c in lcols if c not in by],
        *[F.col(f"_m_{c}").alias(c) for c in value_cols],
    )
    if how == "inner":
        matched = None
        for c in value_cols:
            cond = F.col(c).isNotNull()
            matched = cond if matched is None else (matched | cond)
        out = out.where(matched)
    return out

"""GF1 gap-fill (SURVEY.md §2.10) — Spark has no implicit calendar
index, so missing buckets are materialized explicitly: per source, a
dense calendar from min→max bucket at tier granularity (J3 left
join), with `value = null, gap_filled = true` for absent buckets.

Fill modes: 'none' (nulls survive; the below-mask treats them as
not-below), 'locf' (J4 as-of fill via last-non-null window — no range
join needed), 'zero'.

Scale: the calendar generator is one row per source (tiny) exploded to
source×buckets; the join is on the same (source, bucket) key as the
rollup shuffle, so AQE reuses co-partitioning where possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from drought_t_spark.config import EngineConfig, DEFAULT

_INTERVAL = {"hour": "interval 1 hour", "day": "interval 1 day", "month": "interval 1 month"}


def calendar(tier_df: DataFrame, tier: str, ts_col: str = "bucket_start") -> DataFrame:
    """Dense per-source bucket calendar spanning each source's range."""
    return (
        tier_df.groupBy("source")
        .agg(F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi"))
        .select(
            "source",
            F.explode(F.expr(f"sequence(lo, hi, {_INTERVAL[tier]})")).alias(ts_col),
        )
    )


def gap_fill(
    tier_df: DataFrame,
    tier: str,
    cfg: EngineConfig = DEFAULT,
    value_cols: tuple[str, ...] = ("n_seq", "n_tok_sum", "n_tok_min", "n_tok_max", "n_tok_avg", "value"),
) -> DataFrame:
    """Materialize missing buckets; flag them; apply the fill mode."""
    cal = calendar(tier_df, tier)
    observed = tier_df.withColumn("gap_filled", F.lit(False))
    keep = [c for c in value_cols if c in tier_df.columns]
    filled = cal.join(observed, ["source", "bucket_start"], "left").select(
        "source",
        "bucket_start",
        *[F.col(c) for c in keep],
        F.coalesce("gap_filled", F.lit(True)).alias("gap_filled"),
    )
    if cfg.gap_fill_mode == "zero":
        filled = filled.withColumn("value", F.coalesce("value", F.lit(0.0)))
    elif cfg.gap_fill_mode == "locf":
        w = (
            Window.partitionBy("source")
            .orderBy("bucket_start")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = filled.withColumn("value", F.last("value", ignorenulls=True).over(w))
    return filled


def missing_buckets(tier_df: DataFrame, tier: str) -> DataFrame:
    """J3 — calendar anti-join: buckets that SHOULD exist but don't."""
    return calendar(tier_df, tier).join(
        tier_df.select("source", "bucket_start"), ["source", "bucket_start"], "left_anti"
    )

"""Scalar column expressions (SURVEY.md §2.8) — all JVM-side Catalyst
expressions, whole-stage-codegen friendly. No Python UDFs here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from drought_t_spark.config import TIER_SECONDS

TS_EPOCH_LIT = "timestamp'2024-01-01 00:00:00'"


def seq_index(doc_id: Column | str = "doc_id") -> Column:
    """Parse the per-source sequence index from doc_id '<source>/<seq:012d>'."""
    c = F.col(doc_id) if isinstance(doc_id, str) else doc_id
    return F.substring_index(c, "/", -1).cast("long").alias("seq")


def seq_timestamp(seq: Column | str = "seq") -> Column:
    """Derived event time: epoch + seq minutes (SURVEY.md §1.2 T1)."""
    c = F.col(seq) if isinstance(seq, str) else seq
    return F.timestamp_add("MINUTE", c, F.expr(TS_EPOCH_LIT))


def cycle_pos(tier: str, ts: Column | str = "bucket_start") -> Column:
    """Seasonal index for the variable threshold (SURVEY.md §2.10 TH1):
    hour tier → hour-of-week (0..167), day → day-of-year, month → month."""
    c = F.col(ts) if isinstance(ts, str) else ts
    if tier == "hour":
        return ((F.dayofweek(c) - 1) * 24 + F.hour(c)).cast("int")
    if tier == "day":
        return F.dayofyear(c).cast("int")
    if tier == "month":
        return F.month(c).cast("int")
    raise ValueError(f"unknown tier {tier}")


def deficit(x_ma: Column | str = "x_ma", x0: Column | str = "x0") -> Column:
    """Below-threshold deficit, floored at 0 (Yevjevich run sums)."""
    a = F.col(x_ma) if isinstance(x_ma, str) else x_ma
    b = F.col(x0) if isinstance(x0, str) else x0
    return F.greatest(b - a, F.lit(0.0))


def bucket_count(tier: str, start: Column, end: Column) -> Column:
    """Inclusive bucket count from `start` to `end` at tier granularity.

    Pooled duration d_i + t_i + d_{i+1} equals this for aligned bucket
    timestamps (gap buckets counted), so merged-event durations need no
    per-member bookkeeping."""
    if tier == "month":
        return (F.months_between(end, start).cast("long") + 1)
    sec = TIER_SECONDS[tier]
    return ((end.cast("long") - start.cast("long")) / sec).cast("long") + 1

#!/usr/bin/env python
"""A/B probe: asof_join_hourly probe-path parallelism.

The r6 dense-calendar as-of join has a zero-Exchange probe path — which
on a single-row-group events file means ONE task scans, joins, and
writes all rows. Variant B repartitions the probe side to
defaultParallelism first (scale-adaptive: a many-file production input
already has that parallelism and would skip the need, but the bench
table does not).

Usage: python tools/probe_asof_r6b.py <events_parquet_dir_or_file> [reps]
Writes nothing; prints min/median walls for A (current) and B
(repartitioned), interleaved.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from drought_t_spark.operators.asof import asof_join_bucketed  # noqa: E402
from drought_t_spark.session import build_session  # noqa: E402

EVENTS = sys.argv[1]
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def build(spark, scaled: bool):
    ev = spark.read.parquet(EVENTS).select(
        "event_type", "event_id",
        F.expr("ts + interval 30 minutes").alias("probe"),
    )
    if scaled:
        ev = ev.repartition(spark.sparkContext.defaultParallelism)
    h = (
        spark.read.parquet(EVENTS)
        .groupBy(
            F.col("event_type").alias("source"),
            F.date_trunc("hour", "ts").alias("bucket_start"),
        )
        .agg(F.avg("value").alias("avg_raw"))
        .select(F.col("source").alias("event_type"), "bucket_start", "avg_raw")
    )
    out = asof_join_bucketed(
        ev, h, by=["event_type"], left_ts="probe", right_ts="bucket_start",
        value_cols=["bucket_start", "avg_raw"], step="hour",
    )
    return out.select(
        "event_type", "event_id", "bucket_start",
        F.round("avg_raw", 6).alias("avg_value"),
    )


def main():
    spark = build_session("probe-asof-r6b", master="local[32]",
                          shuffle_partitions=32)
    # warm-up both shapes once
    for scaled in (False, True):
        build(spark, scaled).write.format("noop").mode("overwrite").save()
    walls = {False: [], True: []}
    for _ in range(REPS):
        for scaled in (False, True):
            t0 = time.time()
            build(spark, scaled).write.format("noop").mode("overwrite").save()
            walls[scaled].append(time.time() - t0)
    for scaled in (False, True):
        w = walls[scaled]
        print(
            f"{'B-repart' if scaled else 'A-current'}: "
            f"min={min(w):.3f} med={statistics.median(w):.3f} {sorted(w)}",
            flush=True,
        )
    # result-identity check (order-insensitive)
    a = build(spark, False)
    b = build(spark, True)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"exceptAll-diff={diff}", flush=True)


if __name__ == "__main__":
    main()

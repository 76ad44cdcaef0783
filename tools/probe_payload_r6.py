#!/usr/bin/env python
"""r6 probe: stage-by-stage breakdown of the token payload encode path
(noop-sink isolation per guide SS1.4). Untimed synth write, then times:
  scan-only | scan+repartition | +sort | full pack | stats rollup union.
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, optional PROBE_CONF (k=v,k=v).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench
from drought_t_spark.operators import rollup as R
from drought_t_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

extra = {}
for kv in filter(None, os.environ.get("PROBE_CONF", "").split(",")):
    k, v = kv.split("=", 1)
    extra[k] = v

spark = build_session("probe-payload", master=f"local[{CPUS}]",
                      shuffle_partitions=max(8, CPUS), extra_conf=extra)
sf = bench._sf_of(SF_DIR)
t0dir = bench.write_token_table(spark, sf)
t1 = R.with_event_time(spark.read.parquet(t0dir))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(name, fn, reps=3):
    walls = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        walls.append(round(time.time() - t0, 3))
    print(json.dumps({"step": name, "min": min(walls), "walls": walls}), flush=True)


bucket = F.date_trunc("hour", "ts").alias("bucket_start")
base = (
    t1.select("source", bucket, "ts", "seq", "tokens", "n_tok")
    .withColumn("chunk_id", F.lit(0).cast("int"))
    .select("source", F.col("bucket_start").cast("long").alias("bs_epoch"),
            "chunk_id", "tokens", "n_tok", "seq")
)

timeit("scan_only", lambda: noop(base))
timeit("scan_repart", lambda: noop(base.repartition("source", "bs_epoch", "chunk_id")))
timeit("scan_repart_sort", lambda: noop(
    base.repartition("source", "bs_epoch", "chunk_id")
    .sortWithinPartitions("source", "bs_epoch", "chunk_id", "seq")))
timeit("full_pack_noop", lambda: noop(R.pack_payloads(t1, "hour")))
timeit("full_pack_agg", lambda: R.pack_payloads(t1, "hour").agg(
    F.count("*"), F.sum("payload_n_tokens"), F.sum(F.length("payload"))).first())


def stats_union():
    hour = R.rollup_hour(t1, salted=False)
    day = R.cascade(hour, "day")
    month = R.cascade(day, "month")
    (hour.select("source", "bucket_start", "n_tok_sum")
     .unionByName(day.select("source", "bucket_start", "n_tok_sum"))
     .unionByName(month.select("source", "bucket_start", "n_tok_sum"))
     .agg(F.count("*"), F.sum("n_tok_sum")).first())


timeit("stats_union", stats_union)
timeit("stats_hour_only", lambda: noop(R.rollup_hour(t1, salted=False)))
timeit("scan_stats_cols", lambda: noop(t1.select("source", "n_tok", "ts")))

import shutil
shutil.rmtree(t0dir, ignore_errors=True)

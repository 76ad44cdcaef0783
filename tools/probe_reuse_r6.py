#!/usr/bin/env python
"""r6 probe: does AQE reuse the hour exchange across the stats-union
branches? Execute via df.collect() and print the FINAL adaptive plan."""
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

spark = build_session("probe-reuse", master=f"local[{CPUS}]",
                      shuffle_partitions=max(8, CPUS))
sf = bench._sf_of(SF_DIR)
t0dir = bench.write_token_table(spark, sf)
t1 = R.with_event_time(spark.read.parquet(t0dir))

hour = R.rollup_hour(t1, salted=False)
day = R.cascade(hour, "day")
month = R.cascade(day, "month")
u = (hour.select("source", "bucket_start", "n_tok_sum")
     .unionByName(day.select("source", "bucket_start", "n_tok_sum"))
     .unionByName(month.select("source", "bucket_start", "n_tok_sum"))
     .agg(F.count("*").alias("points"), F.sum("n_tok_sum").alias("toks")))
for i in range(3):
    t0 = time.time()
    u.collect()
    print("collect wall:", round(time.time() - t0, 3), flush=True)
plan = u._jdf.queryExecution().executedPlan().toString()
print(plan[:1000])
print("FINAL Exchange:", plan.count("Exchange"), " ReusedExchange/Stage:",
      plan.count("Reused"), " Scans:", plan.count("Scan parquet"), flush=True)

import shutil
shutil.rmtree(t0dir, ignore_errors=True)

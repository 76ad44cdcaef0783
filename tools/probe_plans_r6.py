#!/usr/bin/env python
"""r6 probe: executed-plan inspection + scan variants for the token path."""
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

spark = build_session("probe-plans", master=f"local[{CPUS}]",
                      shuffle_partitions=max(8, CPUS), extra_conf=extra)
for k in ("spark.sql.parquet.enableNestedColumnVectorizedReader",
          "spark.sql.parquet.enableVectorizedReader",
          "spark.io.compression.codec",
          "spark.sql.execution.arrow.maxRecordsPerBatch"):
    try:
        print(k, "=", spark.conf.get(k), flush=True)
    except Exception as ex:
        print(k, "= <unset>", type(ex).__name__, flush=True)

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


timeit("tokens_only_noop", lambda: noop(t1.select("tokens")))
timeit("tokens_only_count_nonnull", lambda: t1.select(F.size("tokens").alias("s")).agg(F.sum("s")).first())
timeit("all_cols_noop", lambda: noop(t1))

# executed plan of the stats union
hour = R.rollup_hour(t1, salted=False)
day = R.cascade(hour, "day")
month = R.cascade(day, "month")
u = (hour.select("source", "bucket_start", "n_tok_sum")
     .unionByName(day.select("source", "bucket_start", "n_tok_sum"))
     .unionByName(month.select("source", "bucket_start", "n_tok_sum"))
     .agg(F.count("*").alias("points"), F.sum("n_tok_sum").alias("toks")))
u.first()
plan = u._jdf.queryExecution().executedPlan().toString()
print("=== stats_union executed plan ===")
print(plan)
print("Exchange count:", plan.count("Exchange"), " Reused:", plan.count("ReusedExchange"),
      " Scans:", plan.count("Scan parquet"), flush=True)

pay = R.pack_payloads(t1, "hour")
row = pay.agg(F.count("*"), F.sum("payload_n_tokens"), F.sum(F.length("payload"))).first()
pplan = pay._jdf.queryExecution().executedPlan().toString()
print("=== pack_payloads executed plan (post-first) ===")
print(pplan[:4000])

import shutil
shutil.rmtree(t0dir, ignore_errors=True)

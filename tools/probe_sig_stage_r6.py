#!/usr/bin/env python
"""r6: isolate the MinHash SIGNATURE stage at 1M docs (noop sink) —
the stage the r5 verdict flagged as semi-vectorized. Uses the same
doc-tiling fixture as bench_dedup_scale."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from drought_t_spark.operators.dedup import minhash_signatures_arrow
from drought_t_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
MULT = int(sys.argv[1]) if len(sys.argv) > 1 else 200

spark = build_session("probe-sig", master=f"local[{CPUS}]",
                      shuffle_partitions=max(8, CPUS))
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
reps = spark.range(MULT).select(F.col("id").alias("rep"))
# timing-only fixture: content mix does not matter beyond byte volume
tiled = docs.crossJoin(F.broadcast(reps)).select(
    (F.col("doc_id") + F.col("rep") * 1_000_000).alias("id"), "text"
).repartition(CPUS * 2).localCheckpoint(eager=True)
n = tiled.count()
walls = []
for _ in range(3):
    t0 = time.time()
    minhash_signatures_arrow(tiled, k=7).write.format("noop").mode("overwrite").save()
    walls.append(round(time.time() - t0, 3))
print(json.dumps({"n_docs": n, "sig_walls": walls, "min": min(walls),
                  "docs_per_sec_sig_stage": round(n / min(walls), 1)}))

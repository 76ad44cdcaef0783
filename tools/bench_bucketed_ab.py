#!/usr/bin/env python
"""Bucketed-vs-shuffled payload-pack A/B (BENCH/bucketed_ab_r5.jsonl).

Measures the engine's biggest shuffle — pack_payloads' repartition of
every token — against the exchange-free bucketed-by-source layout
(SURVEY.md §4 production posture), on two fixtures:

* ``skew``: the headline Zipf(1.2) 32-source fixture (top source ≈29%
  of rows) — the adversarial case for per-source clustering, whose hot
  bucket becomes one straggler task;
* ``uni``: 256 uniform sources (synth.uniform_counts) — the
  many-source regime of the real 10^12-row table, where no source
  approaches a core's worth of work.

Each (fixture, layout) mode runs in a FRESH process (cold JVM, no
shuffle-scratch carry-over between modes — the shuffled path's scratch
accumulation is itself a finding, visible in the per-mode walls),
min-of-3 in-process iterations, and emits one JSON line:
{"mode", "cores", "walls", "min", "n_payloads", "n_tokens",
"exchanges"}. Output pairs must agree on (n_payloads, n_tokens) within
a fixture — the bit-identity tests in tests/test_bucketed.py pin
byte-level equality.

Usage: python tools/bench_bucketed_ab.py [out.jsonl]
Env: SPARK_GRAFT_SCALE_MULT (default 32), SPARK_GRAFT_CPUS (default 32),
SPARK_GRAFT_SF_DIR (sf parsed from the path, default sf0.1).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
MULT = int(os.environ.get("SPARK_GRAFT_SCALE_MULT", "32"))
N_BUCKETS = 64
MODES = ("skew-shuffled", "skew-bucketed", "uni-shuffled", "uni-bucketed")


def _sf() -> float:
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    return float(m.group(1).rstrip(".")) if m else 0.1


def _fixture(spark, kind: str):
    from bench import token_scale
    from drought_t_spark import synth

    n_sources, n_total = token_scale(_sf())
    n_total *= MULT
    if kind == "skew":
        return synth.sequences_df(spark, n_sources=n_sources, n_total=n_total)
    return synth.sequences_df(
        spark, n_sources=256, n_total=n_total,
        counts=synth.uniform_counts(256, n_total),
    )


def gen(root: str) -> None:
    """Write each fixture once as plain parquet AND as a bucketed table
    (untimed setup shared by both layout modes)."""
    from drought_t_spark.session import build_session
    from drought_t_spark.sources import bucketed as B

    spark = build_session("ab-gen", master=f"local[{CPUS}]",
                          shuffle_partitions=max(8, CPUS))
    for kind in ("skew", "uni"):
        df = _fixture(spark, kind)
        df.write.mode("overwrite").parquet(f"{root}/{kind}_plain")
        B.write_bucketed_sequences(
            spark.read.parquet(f"{root}/{kind}_plain"),
            f"{root}/{kind}_bucketed", N_BUCKETS, table=f"t0_{kind}",
        )
    print(json.dumps({"ok": True}))


def child(mode: str, root: str) -> None:
    from pyspark.sql import functions as F

    from drought_t_spark.operators import rollup as R
    from drought_t_spark.session import build_session
    from drought_t_spark.sources import bucketed as B

    kind, layout = mode.split("-")
    spark = build_session(f"ab-{mode}", master=f"local[{CPUS}]",
                          shuffle_partitions=max(8, CPUS))
    if layout == "bucketed":
        B.register_bucketed_sequences(spark, f"{root}/{kind}_bucketed",
                                      N_BUCKETS, table=f"t0_{kind}")
        t1 = R.with_event_time(B.read_bucketed(spark, table=f"t0_{kind}"))
    else:
        t1 = R.with_event_time(spark.read.parquet(f"{root}/{kind}_plain"))

    walls, row, pay = [], None, None
    for _ in range(3):
        t0 = time.time()
        pay = R.pack_payloads(t1, "hour", pre_partitioned=(layout == "bucketed"))
        row = pay.agg(F.count("*").alias("n"),
                      F.sum("payload_n_tokens").alias("toks")).first()
        walls.append(round(time.time() - t0, 3))
    plan = pay._jdf.queryExecution().executedPlan().toString()
    print(json.dumps({
        "mode": mode, "cores": CPUS, "walls": walls, "min": min(walls),
        "n_payloads": int(row["n"]), "n_tokens": int(row["toks"]),
        "exchanges": plan.count("Exchange"),
    }))


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    me = os.path.abspath(__file__)
    root = tempfile.mkdtemp(prefix="ab_bucketed_")
    lines = []
    try:
        subprocess.run([sys.executable, me, "--gen", root],
                       capture_output=True, text=True, check=True)
        for mode in MODES:
            r = subprocess.run([sys.executable, me, "--child", mode, root],
                               capture_output=True, text=True, check=True)
            line = r.stdout.strip().splitlines()[-1]
            print(line, file=sys.stderr, flush=True)
            lines.append(line)
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)
    body = "\n".join(lines) + "\n"
    if out_path:
        with open(out_path, "w") as f:
            f.write(body)
    else:
        sys.stdout.write(body)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--gen":
        gen(sys.argv[2])
    elif len(sys.argv) > 3 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3])
    else:
        main()

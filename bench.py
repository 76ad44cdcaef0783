#!/usr/bin/env python
"""Bench harness (driver contract + SURVEY.md §7 M6).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline workload has two halves:

1. the north-rule job — synthetic token table (deterministic, scaled to
   sf) -> hour/day/month tier rollup + Gorilla-packed payloads; reported
   both as seconds and as rolled-up points/sec + tokens/sec encoded
   (BASELINE.json's primary metric);
2. a representative slice of the oracle-checked relational /
   time-series / training-data queries over the driver tables.

Every query is consumed with a full-materialization action (aggregating
collect or ``noop`` sink) so Catalyst cannot skip work. Diagnostics go
to stderr; stdout carries exactly the one JSON line.

Scaling evidence mode (``--scaling``): re-runs the north-rule job in two
fresh subprocess JVMs at local[8] and local[32] on the SAME input and
reports throughput at both plus efficiency = (T32/T8)/4 — the sandbox
stand-in for N vs 4N executors (no real cluster here); see
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# driver-table queries included in the headline set (one per operator
# family; the full 38-query contract is exercised by the driver itself)
HEADLINE = [
    "rollup_hourly",
    "rollup_daily_cascade",
    "gapfill_hourly",
    "locf_fill",
    "moving_avg_centered",
    "threshold_variable",
    "cumulative_deficit",
    "runs_events",
    "drought_events_full",
    "tpch_q1",
    "join_star",
    "topk_per_group",
    "grouping_rollup",
    "dedup_exact",
    "minhash_pairs",
    "text_stats",
    "lang_id",
    "cosine_topk",
]


def _sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1).rstrip(".")) if m else 0.1


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# ------------------------------------------------- north-rule job ----


def token_scale(sf: float) -> tuple[int, int]:
    """(n_sources, n_total sequences) for the synthetic token table.

    sf0.1 -> 32 sources x 240k sequences (~15M tokens at avg 64
    tok/seq); Zipf(1.2) source skew exercises the salted rollup.
    """
    n_total = max(4_000, int(2_400_000 * sf))
    return 32, n_total


def run_token_job(spark, sf: float) -> dict:
    """Synth T0 (written to parquet once, untimed — generation is not
    the engine) -> hour rollup (salted) -> day/month cascade + payload
    pack; returns wall seconds and the throughput counters. Reading the
    table from parquet lets the stats pass column-prune `tokens` exactly
    as it would against the real Iceberg table."""
    import tempfile

    from pyspark.sql import functions as F

    from drought_t_spark import synth
    from drought_t_spark.operators import rollup as R

    n_sources, n_total = token_scale(sf)
    tmp = tempfile.mkdtemp(prefix="bench_t0_")
    synth.sequences_df(spark, n_sources=n_sources, n_total=n_total).write.mode(
        "overwrite"
    ).parquet(tmp)
    t1 = R.with_event_time(spark.read.parquet(tmp))

    t0 = time.time()
    hour = R.rollup_hour(t1, salted=True)
    day = R.cascade(hour, "day")
    month = R.cascade(day, "month")
    stats = (
        hour.select("source", "bucket_start", "n_tok_sum")
        .unionByName(day.select("source", "bucket_start", "n_tok_sum"))
        .unionByName(month.select("source", "bucket_start", "n_tok_sum"))
        .agg(F.count("*").alias("points"), F.sum("n_tok_sum").alias("toks"))
        .first()
    )
    t_stats = time.time() - t0

    t0 = time.time()
    pay = R.pack_payloads(t1, "hour")
    prow = pay.agg(
        F.count("*").alias("buckets"),
        F.sum("payload_n_tokens").alias("toks"),
        F.sum(F.length("payload")).alias("bytes"),
    ).first()
    t_pay = time.time() - t0

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)

    # 3 tiers of rolled-up points; tokens counted once per tier they
    # roll into (hour+day+month = 3x raw) for the points metric, but
    # tokens/sec *encoded* counts the payload pass only.
    points = int(stats["points"])
    enc_toks = int(prow["toks"])
    return {
        "sec_stats": round(t_stats, 3),
        "sec_payload": round(t_pay, 3),
        "rolled_points": points,
        "points_per_sec": round(points / max(t_stats, 1e-9), 1),
        "encoded_tokens": enc_toks,
        "tokens_per_sec_encoded": round(enc_toks / max(t_pay, 1e-9), 1),
        "payload_bytes": int(prow["bytes"]),
        "compression_x": round(enc_toks * 4 / max(int(prow["bytes"]), 1), 2),
        "n_sequences": n_total,
    }


# ------------------------------------------------------ main bench ----


def run_bench() -> dict:
    from drought_t_spark.session import build_session

    import __spark_entry__ as E

    sf = _sf_of(SF_DIR)
    spark = build_session("bench", master=f"local[{CPUS}]",
                          shuffle_partitions=max(8, CPUS))
    qs = E.queries()
    times: dict[str, float] = {}

    tok = run_token_job(spark, sf)
    times["token_rollup_tiers"] = tok["sec_stats"]
    times["token_payload_encode"] = tok["sec_payload"]
    _log(f"token job: {tok}")

    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        try:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 3)
            _log(f"{name}: {times[name]}s")
        except Exception as ex:  # keep the bench line parseable
            times[name] = -1.0
            _log(f"{name}: FAILED {ex}")

    total = round(sum(t for t in times.values() if t >= 0), 3)
    return {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": CPUS,
        "rolled_points_per_sec": tok["points_per_sec"],
        "tokens_per_sec_encoded": tok["tokens_per_sec_encoded"],
        "codec_compression_x": tok["compression_x"],
    }


def run_scaling_child(cores: int) -> None:
    """Child-process entry: north-rule job only, fixed input, one JSON
    line with throughput at this parallelism."""
    from drought_t_spark.session import build_session

    sf = _sf_of(SF_DIR)
    spark = build_session(f"bench-scale-{cores}", master=f"local[{cores}]",
                          shuffle_partitions=max(8, cores))
    tok = run_token_job(spark, sf)
    print(json.dumps({"cores": cores, **tok}))


def run_scaling() -> None:
    import subprocess

    out = {}
    for cores in (8, 32):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-child", str(cores)],
            capture_output=True, text=True, check=True,
        )
        out[cores] = json.loads(r.stdout.strip().splitlines()[-1])
        _log(f"local[{cores}]: {out[cores]}")
    e_stats = (out[8]["sec_stats"] / out[32]["sec_stats"]) / 4
    e_pay = (out[8]["sec_payload"] / out[32]["sec_payload"]) / 4
    print(json.dumps({
        "local8": out[8], "local32": out[32],
        "scaling_efficiency_stats": round(e_stats, 3),
        "scaling_efficiency_payload": round(e_pay, 3),
    }))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--scaling-child":
        run_scaling_child(int(sys.argv[2]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        run_scaling()
    else:
        print(json.dumps(run_bench()))

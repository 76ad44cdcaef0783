"""Skewed-fixture A/B for the two skew mitigations (SURVEY.md §4):

1. salted vs plain hourly rollup on a token table where ONE source
   holds ~50% of all rows (deterministic remap of the standard synth
   fixture — every row with pmod(xxhash64(doc_id), 2) = 0 becomes
   source 'hot'), concentrated into a narrow hour span so the hot
   (source, bucket) groups are genuinely degenerate;
2. chunked vs global per-source window MA on a dense series whose
   skew is SERIES LENGTH: one source owns a multi-million-bucket
   hourly calendar, so the global window is a single-task sort while
   the chunked variant fans out over (source, chunk) with halos.

Each variant runs `iters` times; min wall is reported (the host steals
CPU in bursts — min is the least-contaminated sample, same convention
as bench.py). The chunked/global pair also cross-checks equality on
(count, bit_xor of the value rounded to micro-units) so the A/B can
never silently compare different answers. One JSON line on stdout.

Usage:
    python tools/bench_skew.py [seq_mult] [n_buckets]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from drought_t_spark import synth  # noqa: E402
from drought_t_spark.operators import rollup as R  # noqa: E402
from drought_t_spark.operators.chunked import moving_avg_chunked  # noqa: E402
from drought_t_spark.operators.smoothing import moving_avg  # noqa: E402
from drought_t_spark.session import build_session  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _min_wall(fn, iters: int = 3) -> tuple[float, object]:
    walls, last = [], None
    for _ in range(iters):
        t0 = time.time()
        last = fn()
        walls.append(time.time() - t0)
    return min(walls), last


def bench_salted(spark, seq_mult: int, out: dict) -> None:
    # standard fixture, then: half of ALL rows -> source 'hot', and the
    # hot rows' timestamps squeezed into a 4-hour span so the skew hits
    # single (source, bucket) groups, not just one source
    n_total = 240_000 * seq_mult
    t1 = R.with_event_time(
        synth.sequences_df(spark, n_sources=32, n_total=n_total)
    )
    hot = F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0
    skewed = t1.withColumn(
        "source", F.when(hot, F.lit("hot")).otherwise(F.col("source"))
    ).withColumn(
        "ts",
        F.when(
            hot,
            F.timestamp_seconds(
                F.lit(1_600_000_000)
                + F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(4 * 3600))
            ),
        ).otherwise(F.col("ts")),
    ).localCheckpoint(eager=True)
    n_rows = skewed.count()
    hot_rows = skewed.where(F.col("source") == "hot").count()
    out["rollup"] = {"n_rows": n_rows, "hot_share": round(hot_rows / n_rows, 3)}
    for name, salted in (("plain", False), ("salted", True)):
        w, row = _min_wall(
            lambda s=salted: R.rollup_hour(skewed, salted=s)
            .agg(F.count("*").alias("g"), F.sum("n_tok_sum").alias("t"))
            .first()
        )
        out["rollup"][name] = {
            "sec": round(w, 3),
            "groups": int(row["g"]),
            "tokens": int(row["t"]),
        }
        _log(f"rollup[{name}]: {out['rollup'][name]}")
    assert out["rollup"]["plain"]["tokens"] == out["rollup"]["salted"]["tokens"]


def bench_chunked(spark, n_buckets: int, out: dict) -> None:
    # one 'giant' source owning n_buckets dense hourly buckets + 31
    # small sources of n_buckets/256 each: per-source global windows
    # serialize the giant source into ONE sort task
    small = n_buckets // 256
    series = (
        spark.range(0, n_buckets + 31 * small, 1, CPUS * 4)
        .select(
            F.when(F.col("id") < n_buckets, F.lit("giant"))
            .otherwise(F.concat(F.lit("s"), ((F.col("id") - n_buckets) / small).cast("int")))
            .alias("source"),
            F.timestamp_seconds(
                F.lit(946_684_800)
                + F.when(F.col("id") < n_buckets, F.col("id"))
                .otherwise(F.pmod(F.col("id") - n_buckets, F.lit(small)))
                * 3600
            ).alias("bucket_start"),
            (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) / 1000.0).alias("value"),
        )
        .localCheckpoint(eager=True)
    )
    out["window"] = {"n_rows": series.count(), "giant_buckets": n_buckets}

    def _sig(df):
        # equality witness: micro-unit-quantized MA folded with bit_xor
        return df.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(cast(round(x_ma * 1000000) as bigint))").alias("x"),
        ).first()

    for name, fn in (
        ("global", lambda: _sig(moving_avg(series, 721))),
        ("chunked", lambda: _sig(moving_avg_chunked(series, 721, "hour"))),
    ):
        w, row = _min_wall(fn)
        out["window"][name] = {"sec": round(w, 3), "n": int(row["n"]), "xor": int(row["x"])}
        _log(f"window[{name}]: {out['window'][name]}")
    g, c = out["window"]["global"], out["window"]["chunked"]
    assert (g["n"], g["xor"]) == (c["n"], c["xor"]), "chunked != global"


def main(seq_mult: int, n_buckets: int) -> None:
    spark = build_session(
        "bench-skew",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(32, CPUS),
        extra_conf={"spark.driver.maxResultSize": "8g"},
    )
    out: dict = {"cpus": CPUS, "seq_mult": seq_mult, "n_buckets": n_buckets}
    if seq_mult > 0:
        bench_salted(spark, seq_mult, out)
    if n_buckets > 0:
        bench_chunked(spark, n_buckets, out)
    print(json.dumps(out))


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 8,
        int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000,
    )

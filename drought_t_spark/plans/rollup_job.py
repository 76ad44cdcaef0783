"""The resumable tier-rollup job (SURVEY.md §3.2 entry point #1).

One run = for each tier: process pending partition groups (sources with
no committed checkpoint), write tier stats + payload tables with
idempotent per-partition overwrite, record checkpoint/lineage/metrics.
`fail_after_groups` injects a crash for the resume test (§5.5): a
re-run must complete only the missing groups and yield a table
identical to a single-shot run.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drought_t_spark.config import EngineConfig, DEFAULT
from drought_t_spark.operators import rollup as R
from drought_t_spark.ops import checkpoints as CP
from drought_t_spark.sources.warehouse import Warehouse


class InjectedFailure(RuntimeError):
    pass


def group_expr(n_groups: int):
    """Deterministic partition-group id for a source: pmod(xxhash64, n)."""
    return F.pmod(F.xxhash64("source"), F.lit(n_groups)).cast("int")


def run_rollup_job(
    spark: SparkSession,
    wh: Warehouse,
    seqs: DataFrame,
    job_id: str,
    cfg: EngineConfig = DEFAULT,
    n_groups: int = 8,
    fail_after_groups: int | None = None,
    fail_before_cascade: bool = False,
    with_payloads: bool = True,
    pre_partitioned: bool = False,
) -> None:
    """Hour-tier rollup (stats + payloads) with checkpoint/resume, then
    cascaded day/month tiers (single idempotent stage each).

    ``pre_partitioned=True`` is the bucketed-T0 posture (sources/
    bucketed.py): set it ONLY when ``seqs`` is a `read_bucketed` scan
    (one task per source bucket). The group filter below preserves that
    containment, so the payload pack skips its repartition — the job's
    biggest shuffle — and the hour rollup goes exchange-free on its own
    (HashPartitioning(source) satisfies the grouping's clustering
    requirement). Semantically identical either way; test_bucketed.py
    pins job-level bit-parity.

    The checkpoint unit is a HASH BUCKET of sources
    (pmod(xxhash64(source), n_groups)), not a source list: the driver
    never materializes the source set (10^5+ sources at production
    scale), only the ≤ n_groups committed group ids — n_groups bounds
    both driver memory and the number of Spark jobs per run (pick
    ~executors/4 at scale so each group still fans out)."""
    t1 = R.with_event_time(seqs).withColumn("_grp", group_expr(n_groups))
    # partition_id embeds n_groups: a resume with a different bucket
    # count must NOT trust old group ids (same id = different source
    # set), so stale checkpoints simply don't match and work re-runs —
    # idempotent sinks make that safe rather than silently gappy.
    done = {
        r.partition_id for r in
        CP.committed_partitions(spark, wh, job_id, "hour").collect()
    }
    todo = [g for g in range(n_groups) if f"{n_groups}:{g}" not in done]

    # ONE aggregation job sizes every pending group: empty groups commit
    # without launching write/count jobs, and per-group rows_in needs no
    # second scan. ≤ n_groups rows reach the driver — never the source set.
    grp_rows: dict[int, int] = {}
    if todo:
        grp_rows = {
            r["_grp"]: r["n"]
            for r in t1.groupBy("_grp").agg(F.count("*").alias("n")).collect()
        }

    for gi, g in enumerate(todo):
        n_in = grp_rows.get(g, 0)
        if n_in == 0:
            CP.record_commit(
                spark, wh, job_id, "hour", [f"{n_groups}:{g}"],
                snapshot_id="0:0", rows_in=0, rows_out=0,
                metrics={"rolled_points": 0.0, "tokens": 0.0},
            )
            continue
        part = t1.where(F.col("_grp") == g).drop("_grp")
        # plain beats salted even on a 50%-hot-source fixture (r5 skew
        # A/B, BENCH/skew_r5.json): partial agg absorbs algebraic skew
        stats = R.rollup_hour(part, cfg, salted=False)
        wh.write_partitioned(stats, "agg.tier_hour", ["source"])
        if with_payloads:
            pay = R.pack_payloads(part, "hour", cfg, pre_partitioned=pre_partitioned)
            wh.write_partitioned(pay, "agg.payload_hour", ["source"])
        # lineage counts + snapshot token come from the WRITTEN table,
        # never from `stats` — which is the full salted-aggregation DAG
        # over the group's raw scan, so each extra consumer would
        # re-execute the whole rollup (Spark has no plan-level CSE).
        # Dynamic overwrite just replaced exactly this group's source
        # partitions with `stats`, so filtering the read-back by the
        # group hash recovers the written rows via a 3-column
        # column-pruned parquet scan; one aggregation job yields count,
        # token sum, and the content hash together. The semi-join scopes
        # the read-back to sources present in THIS run's input (same
        # guard as the cascade path below): dynamic overwrite leaves
        # partitions of sources from earlier jobs/runs that hash into
        # group g untouched, and lineage must describe this run's
        # output, not stale rows. `part` only contributes its `source`
        # column — a column-pruned scan, and the distinct source set is
        # small enough that AQE broadcasts it.
        wrow = (
            wh.read(spark, "agg.tier_hour")
            .where(group_expr(n_groups) == g)
            .join(part.select("source").distinct(), ["source"], "left_semi")
            .agg(
                F.count("*").alias("n"),
                F.sum("n_tok_sum").alias("tok"),
                F.sum(
                    F.expr("xxhash64(source, bucket_start)").cast("decimal(38,0)")
                ).alias("h"),
            )
            .first()
        )
        n_out, tok = int(wrow["n"]), int(wrow["tok"] or 0)
        CP.record_commit(
            spark, wh, job_id, "hour", [f"{n_groups}:{g}"],
            snapshot_id=f"{n_out}:{wrow['h'] or 0}",
            rows_in=n_in, rows_out=n_out,
            metrics={"rolled_points": float(n_out), "tokens": float(tok)},
        )
        if fail_after_groups is not None and gi + 1 >= fail_after_groups:
            raise InjectedFailure(f"injected crash after {gi + 1} groups")

    if fail_before_cascade:
        raise InjectedFailure("injected crash between hour and cascade tiers")

    # cascaded tiers — derived wholly from the committed hour tier; a
    # full overwrite per run is idempotent by construction, so the
    # checkpoint unit is ONE stage-level token (`{tier}:all`), never a
    # per-source list: the driver materializes no source set anywhere.
    cascade_done = {
        r.partition_id
        for tier in ("day", "month")
        for r in CP.committed_partitions(spark, wh, job_id, tier).collect()
    }
    hour = wh.read(spark, "agg.tier_hour")
    for tier in ("day", "month"):
        if not todo and f"{tier}:all" in cascade_done:
            continue  # nothing new rolled in and the tier is committed
        src = hour if tier == "day" else wh.read(spark, "agg.tier_day")
        out = R.cascade(src, tier)
        wh.write_partitioned(out, f"agg.tier_{tier}", ["source"])
        if with_payloads:
            # payload cascade reads the COMPRESSED finer payload tier
            # (never raw tokens — the 100 TB path: month payloads cost
            # one scan of day payloads) and is idempotent like the
            # stats cascade: full overwrite under the same stage token.
            # All three payload tiers existing is what lets
            # `read_payloads` route a [lo, hi) token range across the
            # retention horizon (plans/retention.py).
            pay_src = wh.read(spark, f"agg.payload_{'hour' if tier == 'day' else 'day'}")
            wh.write_partitioned(
                R.cascade_payloads(pay_src, tier, cfg),
                f"agg.payload_{tier}", ["source"],
            )
        # lineage counts and the snapshot token come from the WRITTEN
        # table and the (plain parquet) source read — never from `out`,
        # which would re-execute the cascade aggregation + upstream hour
        # scan once per metric. The cascade DAG runs exactly once (the
        # write); everything after is cheap column-pruned parquet scans.
        # Scoped to sources present in THIS run's input: dynamic
        # overwrite keeps partitions of sources that vanished upstream,
        # and lineage must describe the run's output, not stale rows.
        written = wh.read(spark, f"agg.tier_{tier}").join(
            src.select("source").distinct(), ["source"], "left_semi"
        )
        n_out = written.count()
        CP.record_commit(
            spark, wh, job_id, tier, partition_ids=[f"{tier}:all"],
            snapshot_id=Warehouse.snapshot_token(written, ["source", "bucket_start"]),
            rows_in=src.count(), rows_out=n_out,
            metrics={"rolled_points": float(n_out)},
        )

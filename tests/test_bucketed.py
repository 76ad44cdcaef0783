"""Bucketed-by-source T0 layout (sources/bucketed.py): packing over a
bucketed scan with ``pre_partitioned=True`` must be BIT-identical to
the shuffled path while the plan drops every Exchange, and grouped
aggregations over the bucketed scan must go exchange-free on their own
(HashPartitioning(source) satisfies any (source, ...) clustering)."""

import pytest
from pyspark.sql import functions as F

from drought_t_spark import synth
from drought_t_spark.operators import rollup as R
from drought_t_spark.plans.rollup_job import run_rollup_job
from drought_t_spark.sources.bucketed import (
    read_bucketed,
    register_bucketed_sequences,
    write_bucketed_sequences,
)
from drought_t_spark.sources.warehouse import Warehouse

_PAY_COLS = [
    "source", "bucket_start", "chunk_id", "payload",
    "payload_codec", "payload_n_tokens", "payload_crc32",
]


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("t0b") / "files")
    df = synth.sequences_df(spark, n_sources=8, n_total=8000)
    write_bucketed_sequences(df, path, n_buckets=4, table="t0b_test")
    return path, df


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_pack_bit_identical_and_exchange_free(spark, bucketed):
    path, df = bucketed
    t1b = R.with_event_time(read_bucketed(spark, "t0b_test"))
    pay_b = R.pack_payloads(t1b, "hour", pre_partitioned=True)
    plan = _plan(pay_b)
    assert "Exchange" not in plan, plan  # the engine's biggest shuffle: gone
    assert plan.count("MapInArrow") == 1 and plan.count("Sort") == 1
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan

    pay_plain = R.pack_payloads(R.with_event_time(df), "hour")
    a, b = pay_b.select(*_PAY_COLS), pay_plain.select(*_PAY_COLS)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_register_reattaches_fresh_catalog(spark, bucketed):
    """The bucket spec lives in catalog metadata; a fresh process
    re-attaches with CREATE TABLE ... CLUSTERED BY ... LOCATION and
    must get the same exchange-free, bit-identical pack (simulated by
    dropping and redeclaring in this session)."""
    path, df = bucketed
    spark.sql("DROP TABLE IF EXISTS t0b_test")
    register_bucketed_sequences(spark, path, n_buckets=4, table="t0b_test")
    t1b = R.with_event_time(read_bucketed(spark, "t0b_test"))
    pay_b = R.pack_payloads(t1b, "hour", pre_partitioned=True)
    assert "Exchange" not in _plan(pay_b)
    pay_plain = R.pack_payloads(R.with_event_time(df), "hour")
    a, b = pay_b.select(*_PAY_COLS), pay_plain.select(*_PAY_COLS)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_pre_partitioned_over_unbucketed_scan_is_wrong(spark, tmp_path, bucketed):
    """The contract `pre_partitioned=True` asserts: every partition
    holds ALL rows of each source it contains. A plain (non-bucketed)
    multi-file scan violates it — sources straddle scan tasks — and the
    result visibly diverges (duplicate partial payloads), which is why
    the flag must only ever be set behind `read_bucketed`. (An
    over-declared bucket COUNT, by contrast, stays correct: a bucketed
    scan never splits a bucket file, so containment survives — the
    dangerous mistake is skipping the bucketed scan, not miscounting.)"""
    _, df = bucketed
    p = str(tmp_path / "plain_multi")
    df.repartition(6).write.parquet(p)  # round-robin: sources span files
    t1 = R.with_event_time(spark.read.parquet(p))
    pay_wrong = R.pack_payloads(t1, "hour", pre_partitioned=True)
    pay_plain = R.pack_payloads(R.with_event_time(df), "hour")
    mismatch = (
        pay_wrong.select(*_PAY_COLS).exceptAll(pay_plain.select(*_PAY_COLS)).count()
        + pay_plain.select(*_PAY_COLS).exceptAll(pay_wrong.select(*_PAY_COLS)).count()
    )
    assert mismatch > 0


def test_rollup_over_bucketed_scan_is_exchange_free(spark, bucketed):
    """No flag needed for aggregations: groupBy(source, bucket_start)
    requires only ClusteredDistribution, which the bucketed scan's
    HashPartitioning(source) satisfies — EnsureRequirements inserts no
    exchange, and the result matches the shuffled rollup exactly."""
    path, df = bucketed
    t1b = R.with_event_time(read_bucketed(spark, "t0b_test"))
    tier_b = R.rollup_hour(t1b)
    assert "Exchange" not in _plan(tier_b), _plan(tier_b)
    tier_plain = R.rollup_hour(R.with_event_time(df))
    cols = ["source", "bucket_start", "n_seq", "n_tok_sum", "n_tok_min", "n_tok_max"]
    a, b = tier_b.select(*cols), tier_plain.select(*cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_rollup_job_over_bucketed_t0_bit_identical(spark, bucketed, tmp_path):
    """End-to-end: the resumable rollup job run over a bucketed T0 scan
    with ``pre_partitioned=True`` (its exchange-free posture) must
    produce every tier table — stats AND payloads, hour through month —
    bit-identical to the same job over the plain DataFrame. The group
    filter inside the job must not break bucket containment."""
    path, df = bucketed
    spark.sql("DROP TABLE IF EXISTS t0b_test")
    register_bucketed_sequences(spark, path, n_buckets=4, table="t0b_test")

    wh_p = Warehouse(str(tmp_path / "wh_plain"))
    run_rollup_job(spark, wh_p, df, "jobB", n_groups=3)
    wh_b = Warehouse(str(tmp_path / "wh_bucketed"))
    run_rollup_job(
        spark, wh_b, read_bucketed(spark, "t0b_test"), "jobB",
        n_groups=3, pre_partitioned=True,
    )

    stat_cols = ["source", "bucket_start", "n_seq", "n_tok_sum", "n_tok_min", "n_tok_max"]
    for tier in ("hour", "day", "month"):
        a = wh_p.read(spark, f"agg.tier_{tier}").select(*stat_cols)
        b = wh_b.read(spark, f"agg.tier_{tier}").select(*stat_cols)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, tier
        pa = wh_p.read(spark, f"agg.payload_{tier}").select(*_PAY_COLS)
        pb = wh_b.read(spark, f"agg.payload_{tier}").select(*_PAY_COLS)
        assert pa.exceptAll(pb).count() == 0 and pb.exceptAll(pa).count() == 0, tier

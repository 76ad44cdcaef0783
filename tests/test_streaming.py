"""Structured Streaming tier-0 rollup (SURVEY.md §2.11): the streaming
tumbling-window aggregate over static files must equal the batch AG1
rollup on the same input."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from drought_t_spark import synth
from drought_t_spark.operators import rollup as R
from drought_t_spark.streaming.rollup_stream import run_to_memory, start_append_stream


def _seq_batch(spark, seqs: list[int], source: str = "src_0000"):
    """Rows with explicit minute indices (ts = epoch + seq minutes)."""
    pdf = pd.DataFrame(
        {
            "doc_id": [f"{source}/{s:012d}" for s in seqs],
            "tokens": [[1, 2, 3]] * len(seqs),
            "n_tok": pd.array([3] * len(seqs), dtype="int32"),
            "source": source,
        }
    )
    from drought_t_spark.schemas import SEQUENCES

    return spark.createDataFrame(pdf, SEQUENCES)


def test_watermark_drops_late_rows_batch_reconciles(spark, tmp_path):
    """Late-data contract (SURVEY.md §2.11): a row older than the
    watermark is dropped by the append-mode stream, while the idempotent
    batch re-rollup over the same files still counts it — so a finalized
    streamed window differs from batch by exactly the late rows."""
    path = str(tmp_path / "late_seqs")
    # batch 1: minutes 0..239 (hour buckets 0-3); max event time 03:59
    _seq_batch(spark, list(range(240))).write.mode("overwrite").parquet(path)
    q = start_append_stream(spark, path, name="q_wm", watermark="2 hours")
    try:
        q.processAllAvailable()  # watermark advances to 03:59 - 2h = 01:59
        # batch 2: one LATE row in hour 0 (behind the watermark → drop)
        # plus rows in hour 4 that push the watermark past hour 1's end
        _seq_batch(spark, [30, 250, 251]).write.mode("append").parquet(path)
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.sql("SELECT * FROM q_wm").toPandas().set_index("bucket_start")
    # hours 0 and 1 are finalized (ends 01:00/02:00 ≤ final watermark
    # 02:10); the late minute-30 row must NOT be in hour 0's count
    h0 = streamed.loc[pd.Timestamp("2024-01-01 00:00:00")]
    h1 = streamed.loc[pd.Timestamp("2024-01-01 01:00:00")]
    assert int(h0.n_seq) == 60 and int(h1.n_seq) == 60
    # batch reconciliation counts the late row: hour 0 has 61 rows
    batch = (
        R.rollup_hour(R.with_event_time(spark.read.parquet(path)))
        .where(F.col("bucket_start") == "2024-01-01 00:00:00")
        .first()
    )
    assert int(batch.n_seq) == 61


def _assert_same_stats(a, b):
    cols = ["source", "bucket_start", "n_seq", "n_tok_sum", "n_tok_min", "n_tok_max"]
    a, b = a.select(*cols), b.select(*cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_stream_ingest_incremental_and_compaction(spark, tmp_path):
    """Continuous-aggregate ingest: per-batch partials land idempotently,
    the live view equals the batch rollup at every stage (restart from
    checkpoint included), and compaction folds partials into the
    committed tier without changing the answer."""
    from drought_t_spark.sources.warehouse import Warehouse
    from drought_t_spark.streaming.rollup_stream import (
        PARTIALS_TBL,
        compact_stream_partials,
        read_stream_hour_tier,
        start_tier_ingest,
    )

    wh = Warehouse(str(tmp_path / "wh"))
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    synth.sequences_df(spark, n_sources=2, n_total=2000).write.mode(
        "append"
    ).parquet(in_dir)
    q = start_tier_ingest(spark, in_dir, wh, ckpt)
    q.processAllAvailable()
    q.stop()

    def batch_truth():
        return R.rollup_hour(R.with_event_time(spark.read.parquet(in_dir)))

    _assert_same_stats(read_stream_hour_tier(spark, wh), batch_truth())

    # restart from the same checkpoint; only the NEW file is processed
    _seq_batch(spark, list(range(50_000, 50_240))).write.mode("append").parquet(in_dir)
    q = start_tier_ingest(spark, in_dir, wh, ckpt)
    q.processAllAvailable()
    q.stop()
    _assert_same_stats(read_stream_hour_tier(spark, wh), batch_truth())
    n_batches = wh.read(spark, PARTIALS_TBL).select("batch_key").distinct().count()
    assert n_batches >= 2

    # compaction folds partials into the committed tier, same answer
    folded = compact_stream_partials(spark, wh)
    assert folded == n_batches
    _assert_same_stats(wh.read(spark, "agg.tier_hour"), batch_truth())
    _assert_same_stats(read_stream_hour_tier(spark, wh), batch_truth())


def test_compaction_incremental_and_replay_safe(spark, tmp_path):
    """Scale contract of compaction: only source partitions whose
    sources appear in the partials are rewritten (untouched partitions'
    files stay byte-identical on disk), and a foreachBatch REPLAY of an
    already-folded batch is dropped without re-folding (no double
    count)."""
    import os

    from drought_t_spark.sources.warehouse import Warehouse
    from drought_t_spark.streaming.rollup_stream import (
        PARTIALS_TBL,
        compact_stream_partials,
        read_stream_hour_tier,
        start_tier_ingest,
    )

    wh = Warehouse(str(tmp_path / "wh"))
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    # two sources land in the committed tier
    _seq_batch(spark, list(range(120)), "src_aaaa").write.mode("append").parquet(in_dir)
    _seq_batch(spark, list(range(120)), "src_bbbb").write.mode("append").parquet(in_dir)
    q = start_tier_ingest(spark, in_dir, wh, ckpt)
    q.processAllAvailable()
    q.stop()
    assert compact_stream_partials(spark, wh) >= 1

    def files_of(source):
        d = os.path.join(wh.path("agg.tier_hour"), f"source={source}")
        return {
            f: os.stat(os.path.join(d, f)).st_mtime_ns
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    bbbb_before = files_of("src_bbbb")

    # new data ONLY for src_aaaa → compaction must not touch src_bbbb
    _seq_batch(spark, list(range(120, 240)), "src_aaaa").write.mode("append").parquet(in_dir)
    q = start_tier_ingest(spark, in_dir, wh, ckpt)
    q.processAllAvailable()
    q.stop()
    # remember one folded batch's rows to fake a replay later
    partials = wh.read(spark, PARTIALS_TBL)
    replay_bid = partials.select(F.max("batch_key")).first()[0]
    replay_rows = partials.where(F.col("batch_key") == replay_bid).localCheckpoint(eager=True)
    assert compact_stream_partials(spark, wh) >= 1
    assert files_of("src_bbbb") == bbbb_before  # untouched partition intact

    truth = R.rollup_hour(R.with_event_time(spark.read.parquet(in_dir)))
    _assert_same_stats(wh.read(spark, "agg.tier_hour"), truth)

    # simulate an at-least-once foreachBatch replay of a folded batch:
    # its partition reappears, but the next compaction must ignore it
    wh.write_partitioned(replay_rows, PARTIALS_TBL, ["batch_key"])
    assert compact_stream_partials(spark, wh) == 0
    assert not wh.exists(PARTIALS_TBL) or wh.read(spark, PARTIALS_TBL).where(
        F.col("batch_key") == replay_bid
    ).count() == 0
    _assert_same_stats(wh.read(spark, "agg.tier_hour"), truth)
    _assert_same_stats(read_stream_hour_tier(spark, wh), truth)


def test_fresh_checkpoint_batch_zero_is_not_mistaken_for_replay(spark, tmp_path):
    """Micro-batch ids restart at 0 under a NEW checkpoint. The folded-
    batch ledger keys on <stream-id>-<batch_id> (the checkpoint's stable
    identity), so incarnation 2's batch 0 must be FOLDED, not dropped as
    a replay of incarnation 1's batch 0 — keying on bare batch_id lost
    this data silently."""
    from drought_t_spark.sources.warehouse import Warehouse
    from drought_t_spark.streaming.rollup_stream import (
        compact_stream_partials,
        start_tier_ingest,
    )

    wh = Warehouse(str(tmp_path / "wh"))
    in1, in2 = str(tmp_path / "in1"), str(tmp_path / "in2")
    # incarnation 1: hours 0-1, checkpoint ckpt1, compacted
    _seq_batch(spark, list(range(120))).write.parquet(in1)
    q = start_tier_ingest(spark, in1, wh, str(tmp_path / "ckpt1"))
    q.processAllAvailable()
    q.stop()
    assert compact_stream_partials(spark, wh) >= 1
    # incarnation 2: DIFFERENT data (hours 10-11), FRESH checkpoint —
    # its micro-batch ids restart at 0
    _seq_batch(spark, list(range(600, 720))).write.parquet(in2)
    q = start_tier_ingest(spark, in2, wh, str(tmp_path / "ckpt2"))
    q.processAllAvailable()
    q.stop()
    assert compact_stream_partials(spark, wh) >= 1  # folded, NOT dropped
    tier = wh.read(spark, "agg.tier_hour")
    # both incarnations' rows are present exactly once
    both = spark.read.parquet(in1).unionByName(spark.read.parquet(in2))
    _assert_same_stats(tier, R.rollup_hour(R.with_event_time(both)))


def test_streaming_rollup_equals_batch(spark, tmp_path):
    path = str(tmp_path / "seqs")
    seqs = synth.sequences_df(spark, n_sources=3, n_total=3000)
    seqs.write.parquet(path)

    stream_out = run_to_memory(spark, path).select(
        "source", "bucket_start", "n_seq", "n_tok_sum", "n_tok_min", "n_tok_max"
    )
    batch_out = R.rollup_hour(
        R.with_event_time(spark.read.parquet(path))
    ).select("source", "bucket_start", "n_seq", "n_tok_sum", "n_tok_min", "n_tok_max")

    assert stream_out.exceptAll(batch_out).count() == 0
    assert batch_out.exceptAll(stream_out).count() == 0

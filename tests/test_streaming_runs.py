"""Streaming stateful run extraction (§2.11's last row): the
applyInPandasWithState operator must emit, for every TERMINATED run,
bit-for-bit the batch extract_events row — across micro-batch
boundaries, runs spanning many micro-batches, checkpoint restarts, and
late rows."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from drought_t_spark.operators import runs as R
from drought_t_spark.streaming.runs_stream import (
    RUN_STREAM_INPUT,
    start_runs_stream,
    start_runs_stream_to_parquet,
)


def _series_pdf(sources=3, hours=96) -> pd.DataFrame:
    """Deterministic multi-run series: x_ma oscillates through the
    constant threshold x0=0 with per-source period/phase, plus a null
    patch (null -> above, per RL1) so null semantics are exercised."""
    rows = []
    t0 = pd.Timestamp("2024-01-01")
    for s in range(sources):
        period = 10 + 3 * s
        for h in range(hours):
            x = math.sin(2 * math.pi * (h + 2 * s) / period) + 0.05 * s
            if s == 1 and 40 <= h < 44:  # null patch
                x = None
            rows.append((f"src_{s:04d}", t0 + pd.Timedelta(hours=h), x, 0.0))
    return pd.DataFrame(rows, columns=["source", "bucket_start", "x_ma", "x0"])


def _batch_terminated(spark, pdf: pd.DataFrame) -> pd.DataFrame:
    """Batch RL1+RL2+EV1 on the full series, minus each source's open
    (max run_id) run — what the stream must have emitted."""
    df = spark.createDataFrame(pdf, RUN_STREAM_INPUT)
    ev = R.extract_events(R.segment_runs(R.below_mask(df)))
    out = ev.toPandas()
    last = out.groupby("source")["run_id"].transform("max")
    out = out[out["run_id"] < last]
    return (
        out[["source", "run_id", "below", "onset", "termination",
             "duration", "severity", "peak", "excess"]]
        .sort_values(["source", "run_id"])
        .reset_index(drop=True)
    )


def _collect(spark, name: str) -> pd.DataFrame:
    return (
        spark.sql(f"SELECT * FROM {name}")
        .toPandas()
        .sort_values(["source", "run_id"])
        .reset_index(drop=True)
    )


def _assert_parity(streamed: pd.DataFrame, batch: pd.DataFrame):
    assert len(streamed) == len(batch), (len(streamed), len(batch))
    pd.testing.assert_frame_equal(
        streamed.astype({"below": "int32"}),
        batch.astype({"below": "int32"}),
        check_exact=True,  # bit-for-bit: same float fold order as batch sum
        check_dtype=False,
    )


def _write_slices(pdf: pd.DataFrame, path: str, spark, cuts):
    """Append time-ordered slices as separate files (one per trigger)."""
    lo = pd.Timestamp("1970-01-01")
    for hi in cuts:
        cut = pdf[(pdf["bucket_start"] >= lo) & (pdf["bucket_start"] < hi)]
        spark.createDataFrame(cut, RUN_STREAM_INPUT).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        lo = hi


def test_stream_matches_batch_across_microbatches(spark, tmp_path):
    pdf = _series_pdf()
    path = str(tmp_path / "series")
    t0 = pd.Timestamp("2024-01-01")
    cuts = [t0 + pd.Timedelta(hours=h) for h in (24, 48, 72, 96)]
    _write_slices(pdf, path, spark, cuts[:1])
    q = start_runs_stream(spark, path, name="q_runs_parity")
    try:
        q.processAllAvailable()
        lo = cuts[0]
        for hi in cuts[1:]:
            cut = pdf[(pdf["bucket_start"] >= lo) & (pdf["bucket_start"] < hi)]
            spark.createDataFrame(cut, RUN_STREAM_INPUT).coalesce(1).write.mode(
                "append"
            ).parquet(path)
            q.processAllAvailable()
            lo = hi
    finally:
        q.stop()
    _assert_parity(_collect(spark, "q_runs_parity"), _batch_terminated(spark, pdf))


def test_run_spanning_many_microbatches(spark, tmp_path):
    """One long below-run fed 6 hours at a time: partial aggregates must
    carry across batches and the closing row must equal batch exactly."""
    t0 = pd.Timestamp("2024-01-01")
    vals = [-1.0 - 0.1 * h for h in range(30)] + [2.0, 3.0]  # 30h run, then close
    pdf = pd.DataFrame(
        {
            "source": "src_long",
            "bucket_start": [t0 + pd.Timedelta(hours=h) for h in range(len(vals))],
            "x_ma": vals,
            "x0": 0.0,
        }
    )
    path = str(tmp_path / "long_run")
    spark.createDataFrame(pdf.iloc[0:6], RUN_STREAM_INPUT).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    q = start_runs_stream(spark, path, name="q_runs_long")
    try:
        q.processAllAvailable()
        for s in range(6, len(vals), 6):
            spark.createDataFrame(
                pdf.iloc[s : s + 6], RUN_STREAM_INPUT
            ).coalesce(1).write.mode("append").parquet(path)
            q.processAllAvailable()
    finally:
        q.stop()
    streamed = _collect(spark, "q_runs_long")
    batch = _batch_terminated(spark, pdf)
    assert (streamed["duration"] == 30).any()
    _assert_parity(streamed, batch)


def test_restart_from_checkpoint_no_dupes_no_loss(spark, tmp_path):
    """Stop after half the files, restart from the same checkpoint:
    state (incl. the open run's partials) restores and the union of the
    two memory sinks is exactly the batch terminated set."""
    pdf = _series_pdf(sources=2, hours=72)
    path = str(tmp_path / "series_ckpt")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "events_out")
    t0 = pd.Timestamp("2024-01-01")
    _write_slices(pdf, path, spark, [t0 + pd.Timedelta(hours=36)])
    q = start_runs_stream_to_parquet(spark, path, out, checkpoint=ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # slice the second half to mid-run boundaries: the open run's
    # partials were checkpointed in state and must restore on restart
    lo = t0 + pd.Timedelta(hours=36)
    cut = pdf[pdf["bucket_start"] >= lo]
    spark.createDataFrame(cut, RUN_STREAM_INPUT).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    q2 = start_runs_stream_to_parquet(spark, path, out, checkpoint=ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    both = (
        spark.read.parquet(out)
        .drop("_batch")  # per-batch idempotency partition, not event data
        .toPandas()
        .sort_values(["source", "run_id"])
        .reset_index(drop=True)
    )
    assert not both.duplicated(["source", "run_id"]).any()
    _assert_parity(both, _batch_terminated(spark, pdf))


def test_variable_threshold_parity(spark, tmp_path):
    """x0 varies per cycle position (hour-of-day), the drought method's
    real threshold shape (TH1): the stream consumes x0 as a per-row
    column, so variable thresholds must hold by construction — pinned
    here against the batch operator on the same joined series."""
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    for s in range(2):
        for h in range(120):
            x = math.sin(2 * math.pi * h / (11 + 5 * s))
            x0 = 0.3 * math.cos(2 * math.pi * (h % 24) / 24.0)  # hour-of-day
            rows.append((f"src_{s:04d}", t0 + pd.Timedelta(hours=h), x, x0))
    pdf = pd.DataFrame(rows, columns=["source", "bucket_start", "x_ma", "x0"])
    path = str(tmp_path / "var_thresh")
    cuts = [t0 + pd.Timedelta(hours=h) for h in (40, 80, 120)]
    _write_slices(pdf, path, spark, cuts[:1])
    q = start_runs_stream(spark, path, name="q_runs_varx0")
    try:
        q.processAllAvailable()
        lo = cuts[0]
        for hi in cuts[1:]:  # one drop per micro-batch: arrival stays in order
            cut = pdf[(pdf["bucket_start"] >= lo) & (pdf["bucket_start"] < hi)]
            spark.createDataFrame(cut, RUN_STREAM_INPUT).coalesce(1).write.mode(
                "append"
            ).parquet(path)
            q.processAllAvailable()
            lo = hi
    finally:
        q.stop()
    _assert_parity(_collect(spark, "q_runs_varx0"), _batch_terminated(spark, pdf))


def test_group_spanning_multiple_arrow_chunks(spark, tmp_path):
    """A group whose micro-batch rows span several Arrow record batches
    must still fold correctly: chunks arrive with no ordering guarantee,
    so the operator concatenates before its single sort — without that,
    the high-water mark would mis-drop in-order rows from later chunks."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "16")  # 96-row group → ≥6 chunks per micro-batch
    try:
        pdf = _series_pdf(sources=2, hours=96)
        path = str(tmp_path / "chunked_series")
        _write_slices(pdf, path, spark,
                      [pd.Timestamp("2024-01-01") + pd.Timedelta(hours=96)])
        q = start_runs_stream(spark, path, name="q_runs_chunks")
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        _assert_parity(_collect(spark, "q_runs_chunks"),
                       _batch_terminated(spark, pdf))
    finally:
        spark.conf.set(key, old)


def test_batch_replay_is_idempotent(spark, tmp_path):
    """An at-least-once foreachBatch replay re-invokes the sink with the
    same batch id: the dynamic-overwrite partition write must leave the
    output identical to a single delivery, and other batches untouched."""
    from drought_t_spark.streaming.runs_stream import write_events_batch

    out = str(tmp_path / "events")
    t0 = pd.Timestamp("2024-01-01")
    ev = pd.DataFrame(
        {
            "source": ["a", "b"],
            "run_id": pd.array([1, 1], dtype="int64"),
            "below": pd.array([1, 0], dtype="int32"),
            "onset": [t0, t0],
            "termination": [t0, t0],
            "duration": pd.array([3, 4], dtype="int64"),
            "severity": [1.5, 0.0],
            "peak": [0.7, 0.0],
            "excess": [0.0, 2.0],
        }
    )
    from drought_t_spark.streaming.runs_stream import RUN_EVENTS_SCHEMA

    df0 = spark.createDataFrame(ev, RUN_EVENTS_SCHEMA)
    df1 = spark.createDataFrame(ev.assign(source=["c", "d"]), RUN_EVENTS_SCHEMA)
    write_events_batch(df0, 0, out)
    write_events_batch(df1, 1, out)
    write_events_batch(df0, 0, out)  # replay of batch 0
    got = spark.read.parquet(out).drop("_batch").toPandas()
    assert len(got) == 4
    assert sorted(got["source"]) == ["a", "b", "c", "d"]


def test_late_rows_dropped(spark, tmp_path):
    """A row at or behind the per-source high-water mark is dropped —
    emitted runs equal batch over the in-order rows only."""
    t0 = pd.Timestamp("2024-01-01")
    inorder = pd.DataFrame(
        {
            "source": "src_late",
            "bucket_start": [t0 + pd.Timedelta(hours=h) for h in range(12)],
            "x_ma": [-1.0] * 4 + [1.0] * 4 + [-2.0] * 4,
            "x0": 0.0,
        }
    )
    late = pd.DataFrame(
        {
            "source": "src_late",
            "bucket_start": [t0 + pd.Timedelta(hours=2)],  # behind HWM
            "x_ma": [5.0],  # would flip the first run if honored
            "x0": [0.0],
        }
    )
    closer = pd.DataFrame(
        {
            "source": "src_late",
            "bucket_start": [t0 + pd.Timedelta(hours=12)],
            "x_ma": [3.0],
            "x0": [0.0],
        }
    )
    path = str(tmp_path / "late")
    spark.createDataFrame(inorder, RUN_STREAM_INPUT).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    q = start_runs_stream(spark, path, name="q_runs_late")
    try:
        q.processAllAvailable()
        for chunk in (late, closer):
            spark.createDataFrame(chunk, RUN_STREAM_INPUT).coalesce(1).write.mode(
                "append"
            ).parquet(path)
            q.processAllAvailable()
    finally:
        q.stop()
    streamed = _collect(spark, "q_runs_late")
    batch = _batch_terminated(spark, pd.concat([inorder, closer]))
    _assert_parity(streamed, batch)

"""Structured Streaming tier-0 rollup (SURVEY.md §2.11): the streaming
tumbling-window aggregate over static files must equal the batch AG1
rollup on the same input."""

import pytest
from pyspark.sql import functions as F

from drought_t_spark import synth
from drought_t_spark.operators import rollup as R
from drought_t_spark.streaming.rollup_stream import run_to_memory


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

"""Structured Streaming analog of the hour-tier rollup (SURVEY.md
§2.11): tumbling 1-hour windows per source with a watermark for late
sequences. Batch tiers remain the contract; this is the streaming
ingest path for tier-0.

Run semantics (RL2) deliberately stay batch: run segmentation needs
full history, so the streaming job maintains ONLY the continuous
aggregate; the drought DAG re-runs per tier on the committed table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drought_t_spark.functions.scalars import seq_index, seq_timestamp
from drought_t_spark.schemas import SEQUENCES


def read_sequence_stream(spark: SparkSession, path: str, files_per_trigger: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(SEQUENCES)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(path)
    )


def streaming_hour_rollup(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window continuous aggregate; late rows beyond the
    watermark are dropped (batch re-rollup reconciles them)."""
    t1 = stream.withColumn("seq", seq_index()).withColumn("ts", seq_timestamp())
    return (
        t1.withWatermark("ts", watermark)
        .groupBy("source", F.window("ts", "1 hour").alias("win"))
        .agg(
            F.count("*").alias("n_seq"),
            F.sum("n_tok").cast("long").alias("n_tok_sum"),
            F.min("n_tok").cast("int").alias("n_tok_min"),
            F.max("n_tok").cast("int").alias("n_tok_max"),
        )
        .select(
            "source",
            F.col("win.start").alias("bucket_start"),
            "n_seq", "n_tok_sum", "n_tok_min", "n_tok_max",
            (F.col("n_tok_sum") / F.col("n_seq")).alias("n_tok_avg"),
        )
    )


def start_append_stream(spark: SparkSession, path: str,
                        name: str = "stream_tier_hour_append",
                        watermark: str = "2 hours"):
    """Append-mode variant: a window row is emitted only once its end
    falls behind the watermark, and rows arriving later than the
    watermark are DROPPED (the late-data contract; the idempotent batch
    re-rollup over the committed table reconciles them — SURVEY.md
    §2.11). Returns the running StreamingQuery; the caller drives
    micro-batches (processAllAvailable) between file drops so the
    watermark actually advances between batches."""
    agg = streaming_hour_rollup(read_sequence_stream(spark, path), watermark)
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )


def run_to_memory(spark: SparkSession, path: str, name: str = "stream_tier_hour"):
    """Drive the stream to completion over static files (test helper)."""
    agg = streaming_hour_rollup(read_sequence_stream(spark, path))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")

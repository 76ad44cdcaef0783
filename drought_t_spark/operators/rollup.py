"""Rollup operators AG1/AG2/AG8 + GZ1 payload packing (SURVEY.md §2.4).

Scale posture (§4): stats rollups are algebraic (count/sum/min/max), so
Spark's partial+final hash aggregation already combines map-side — one
shuffle keyed by (source, bucket). The salted two-phase variant splits a
pathologically hot (source, bucket) across `salt_buckets` reducers
first, then re-aggregates the partials: exact for algebraic stats, and
the pattern the north rule requires for heavy sources. Tier cascading
(day←hour, month←day) re-aggregates integer partials — never re-reads
raw — and is bit-exact because the equality-bearing stats are integers.

CRITICAL pruning invariant: stats-only rollups must never touch the
`tokens` array column (it dominates I/O); only payload packing reads it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from drought_t_spark.config import EngineConfig, DEFAULT
from drought_t_spark.functions.scalars import seq_index, seq_timestamp

_FINER = {"day": "hour", "month": "day"}


def with_event_time(seqs: DataFrame) -> DataFrame:
    """T0 -> T1: attach derived event time (deterministic, pure)."""
    return seqs.withColumn("seq", seq_index()).withColumn("ts", seq_timestamp())


def _stats_agg(prefix_count="*"):
    return [
        F.count(prefix_count).alias("n_seq"),
        F.sum("n_tok").cast("long").alias("n_tok_sum"),
        F.min("n_tok").cast("int").alias("n_tok_min"),
        F.max("n_tok").cast("int").alias("n_tok_max"),
    ]


def _finish(df: DataFrame) -> DataFrame:
    """Derive float stats from integer provenance (no drift across N/4N)."""
    return (
        df.withColumn("n_tok_avg", F.col("n_tok_sum") / F.col("n_seq"))
        .withColumn("value", F.col("n_tok_avg"))
        .withColumn("gap_filled", F.lit(False))
    )


def rollup_hour(seqs_t1: DataFrame, cfg: EngineConfig = DEFAULT, salted: bool = False) -> DataFrame:
    """AG1 — hourly stats rollup from T1. Never reads `tokens`."""
    base = seqs_t1.select(
        "source", F.date_trunc("hour", "ts").alias("bucket_start"), "n_tok", "doc_id"
    )
    if not salted:
        out = base.groupBy("source", "bucket_start").agg(*_stats_agg())
    else:
        # two-phase: split hot (source,bucket) groups across S reducers
        salt = F.pmod(F.hash("doc_id"), F.lit(cfg.salt_buckets)).alias("salt")
        partial = base.groupBy("source", "bucket_start", salt).agg(*_stats_agg())
        out = partial.groupBy("source", "bucket_start").agg(
            F.sum("n_seq").alias("n_seq"),
            F.sum("n_tok_sum").alias("n_tok_sum"),
            F.min("n_tok_min").alias("n_tok_min"),
            F.max("n_tok_max").alias("n_tok_max"),
        )
    return _finish(out)


def cascade(tier_df: DataFrame, to_tier: str) -> DataFrame:
    """AG2 — coarser tier from finer-tier partials (sums of sums,
    min of mins); integer stats make this bit-exact."""
    assert to_tier in _FINER, to_tier
    out = (
        tier_df.where(~F.col("gap_filled"))
        .groupBy("source", F.date_trunc(to_tier, "bucket_start").alias("bucket_start"))
        .agg(
            F.sum("n_seq").alias("n_seq"),
            F.sum("n_tok_sum").alias("n_tok_sum"),
            F.min("n_tok_min").alias("n_tok_min"),
            F.max("n_tok_max").alias("n_tok_max"),
        )
    )
    return _finish(out)


# ------------------------------------------------------------ payload --


def pack_payloads(
    seqs_t1: DataFrame,
    tier: str,
    cfg: EngineConfig = DEFAULT,
    chunk_minutes: int | None = None,
) -> DataFrame:
    """AG8+GZ1 — per-(source, bucket[, chunk]) TSZ1 token payload.

    Tokens of member sequences are ordered by seq (== ts order), then
    flattened and encoded. Oversize buckets are split into fixed
    chunk_minutes chunks (chunk_id ascending reconstructs the bucket) so
    a single group never exceeds `max_bucket_tokens` — the spill-safety
    bound from SURVEY.md §4. Output:
      (source, bucket_start, chunk_id, payload, payload_codec,
       payload_n_tokens, payload_crc32)
    """
    from drought_t_spark.codec.udfs import encode_tokens_udf

    if chunk_minutes is None:
        chunk_minutes = {"hour": 60, "day": 1440, "month": 44640}[tier]
    bucket = F.date_trunc(tier, "ts").alias("bucket_start")
    chunk = (
        F.floor(
            (F.col("ts").cast("long") - F.col("bucket_start").cast("long")) / (60 * chunk_minutes)
        )
        .cast("int")
        .alias("chunk_id")
    )
    grouped = (
        seqs_t1.select("source", bucket, "ts", "seq", "tokens", "n_tok")
        .withColumn("chunk_id", chunk)
        .drop("ts")
        .groupBy("source", "bucket_start", "chunk_id")
        .agg(
            # array_sort on (seq, tokens) structs orders member sequences
            # by seq; ObjectHashAggregate handles the list build.
            F.array_sort(F.collect_list(F.struct("seq", "tokens"))).alias("members"),
            F.sum("n_tok").cast("long").alias("payload_n_tokens"),
        )
        .withColumn("flat", F.flatten(F.col("members.tokens")))
        .drop("members")
    )
    return (
        grouped.withColumn("payload", encode_tokens_udf("flat"))
        .withColumn("payload_codec", F.lit(cfg.payload_codec))
        .withColumn("payload_crc32", F.crc32("payload").cast("long"))
        .drop("flat")
        .select(
            "source", "bucket_start", "chunk_id", "payload",
            "payload_codec", "payload_n_tokens", "payload_crc32",
        )
    )


def cascade_payloads(payloads: DataFrame, to_tier: str, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Coarser-tier payloads by decode→concat→re-encode of finer-tier
    payloads — reads the compressed tier, never raw (the 100 TB path:
    month payloads cost one scan of day payloads, ~4× smaller)."""
    from drought_t_spark.codec.udfs import decode_tokens_udf, encode_tokens_udf

    assert to_tier in _FINER
    regrouped = (
        payloads.select(
            "source",
            F.date_trunc(to_tier, "bucket_start").alias("nbucket"),
            "bucket_start", "chunk_id", "payload", "payload_n_tokens",
        )
        .withColumn("toks", decode_tokens_udf("payload"))
        .groupBy("source", F.col("nbucket").alias("bucket_start"))
        .agg(
            F.flatten(
                F.array_sort(F.collect_list(F.struct("bucket_start", "chunk_id", "toks"))).getField("toks")
            ).alias("flat"),
            F.sum("payload_n_tokens").alias("payload_n_tokens"),
        )
        .withColumn("chunk_id", F.lit(0))
    )
    return (
        regrouped.withColumn("payload", encode_tokens_udf("flat"))
        .withColumn("payload_codec", F.lit(cfg.payload_codec))
        .withColumn("payload_crc32", F.crc32("payload").cast("long"))
        .select(
            "source", "bucket_start", "chunk_id", "payload",
            "payload_codec", "payload_n_tokens", "payload_crc32",
        )
    )

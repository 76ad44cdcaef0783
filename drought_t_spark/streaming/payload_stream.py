"""Streaming TOKEN-PAYLOAD ingest (SURVEY.md §2.11, payload twin of
`rollup_stream`): micro-batches of pre-tokenized sequences land as raw
per-batch partials; a seal step folds them into a per-source raw tail;
a watermark-gated pack step encodes COMPLETE hour buckets into the
committed `agg.payload_hour` tier with the exact batch kernel
(`pack_payloads` — TSZ1 mapInArrow), so streamed packing is
bit-identical to batch packing of the same rows.

Why three stages instead of packing inside foreachBatch: a bucket's
payload is its member tokens in seq order, which is NOT mergeable —
two partial payloads of one bucket cannot be combined without decode +
re-sort + re-encode. Packing therefore waits until a bucket is
COMPLETE (its end is behind the watermark cutoff, the same late-data
contract as the stats append stream), at which point all of its rows
sit in the tail and one deterministic batch pack emits the final
payload. Until then the live view serves the raw tail exactly.

Crash windows (parquet shim; on Iceberg each pair below is one
transaction):
  * seal: ledger-before-drop, replayed foreachBatch partitions are
    recognized by `<stream-id>-<batch_id>` and dropped without
    re-folding — identical machinery to `compact_stream_partials`.
  * pack: tier-write → tail-rewrite. A crash between the two leaves
    packed rows in the tail; the next pack classifies them as
    already-packed (their bucket is in the tier), drops them from the
    tail and leaves the tier untouched — convergent and exact, though
    the late-drop metric counts them once.

Genuinely LATE rows (bucket already packed) are dropped at pack time
with a metric, mirroring the append-mode watermark drop; the
idempotent batch re-pack over the committed t0 table reconciles them.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drought_t_spark.config import DEFAULT, EngineConfig
from drought_t_spark.streaming.rollup_stream import (
    _stream_identity,
    read_sequence_stream,
)

PAYLOAD_PARTIALS_TBL = "agg.stream_payload_partials"  # raw rows / batch_key
PAYLOAD_TAIL_TBL = "agg.stream_payload_tail"  # sealed raw rows / source

_RAW_COLS = ["source", "ts", "seq", "tokens", "n_tok"]


def start_payload_ingest(spark: SparkSession, path: str, wh, checkpoint_dir: str,
                         files_per_trigger: int = 1):
    """foreachBatch sink: each micro-batch's raw rows (with derived
    event time) land in `agg.stream_payload_partials` partitioned by
    `batch_key = <stream-id>-<batch_id>` via idempotent partition
    overwrite — an at-least-once replay overwrites its own partition
    with identical rows (same contract as `start_tier_ingest`)."""
    from drought_t_spark.operators import rollup as R

    t1 = R.with_event_time(read_sequence_stream(spark, path, files_per_trigger))
    sid: list[str] = []  # resolved lazily: metadata exists once started

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not sid:
            sid.append(_stream_identity(checkpoint_dir))
        part = batch_df.select(*_RAW_COLS).withColumn(
            "batch_key", F.lit(f"{sid[0]}-{int(batch_id)}")
        )
        wh.write_partitioned(part, PAYLOAD_PARTIALS_TBL, ["batch_key"])

    return (
        t1.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def seal_payload_partials(spark: SparkSession, wh,
                          job_id: str = "stream-payload-seal") -> int:
    """Fold raw batch partitions into the per-source tail and drop them.

    Same replay-safe shape as `compact_stream_partials`: the folded set
    and the dropped set are pinned to one collected batch_key list;
    folded keys are ledgered (scope `payload_seal`) BEFORE the drop, so
    a foreachBatch replay of an already-folded batch is recognized and
    its recreated partition dropped without re-folding. Only source
    partitions present in the partials are rewritten. Returns the
    number of batch partitions folded."""
    from drought_t_spark.ops import checkpoints as CP
    from drought_t_spark.sources.warehouse import Warehouse

    if not wh.exists(PAYLOAD_PARTIALS_TBL):
        return 0
    present = [
        str(r.batch_key)
        for r in wh.read(spark, PAYLOAD_PARTIALS_TBL)
        .select("batch_key").distinct().collect()
    ]
    if not present:
        return 0
    folded_before = {
        r.partition_id
        for r in CP.committed_partitions(spark, wh, job_id, "payload_seal")
        .where(F.col("partition_id").isin([f"batch:{b}" for b in present]))
        .collect()
    }
    replayed = [b for b in present if f"batch:{b}" in folded_before]
    if replayed:  # already in the tail — drop without re-folding
        wh.drop_partitions(PAYLOAD_PARTIALS_TBL, "batch_key", replayed)
    batch_keys = [b for b in present if f"batch:{b}" not in folded_before]
    if not batch_keys:
        return 0
    partials = wh.read(spark, PAYLOAD_PARTIALS_TBL).where(
        F.col("batch_key").isin(batch_keys)
    )
    n_partials = partials.count()  # BEFORE the partitions are dropped
    affected = partials.select("source").distinct()
    u = partials.select(*_RAW_COLS)
    if wh.exists(PAYLOAD_TAIL_TBL):
        u = u.unionByName(
            wh.read(spark, PAYLOAD_TAIL_TBL)
            .join(F.broadcast(affected), ["source"], "left_semi")
            .select(*_RAW_COLS)
        )
    # materialize before the overwrite (the rewrite reads files it
    # replaces); raw rows only — no aggregation, payloads are packed
    # later once their bucket is complete
    sealed = u.localCheckpoint(eager=True)
    wh.write_partitioned(sealed, PAYLOAD_TAIL_TBL, ["source"])
    CP.record_commit(
        spark, wh, job_id, "payload_seal", [f"batch:{b}" for b in batch_keys],
        snapshot_id=Warehouse.snapshot_token(
            sealed.select("source", "ts", "seq", "n_tok"), ["source", "seq"]
        ),
        rows_in=n_partials, rows_out=n_partials,
        metrics={"folded_batches": float(len(batch_keys))},
    )
    wh.drop_partitions(PAYLOAD_PARTIALS_TBL, "batch_key", batch_keys)
    return len(batch_keys)


def _default_cutoff(spark: SparkSession, wh, watermark_hours: int):
    """max event time in the tail, minus the watermark, floored to the
    hour — the streaming-side stand-in for the query watermark (the
    tail is the post-seal analog of the stream's unexpired state)."""
    hi = wh.read(spark, PAYLOAD_TAIL_TBL).agg(F.max("ts")).first()[0]
    if hi is None:
        return None
    return (hi - _dt.timedelta(hours=watermark_hours)).replace(
        minute=0, second=0, microsecond=0
    )


def pack_complete_buckets(
    spark: SparkSession,
    wh,
    cutoff=None,
    watermark_hours: int = 2,
    cfg: EngineConfig = DEFAULT,
    job_id: str = "stream-payload-pack",
) -> int:
    """Encode every COMPLETE hour bucket (bucket_start < `cutoff`) from
    the tail into `agg.payload_hour` and shrink the tail to the
    incomplete remainder.

    The pack is the batch kernel verbatim (`pack_payloads` over exactly
    the complete rows), so the streamed tier is bit-identical to batch
    packing of the same input — pinned by test_streaming_payload.
    Already-packed buckets reappearing in the tail (genuine late rows,
    or the pack-crash window described in the module docstring) are
    dropped with a `late_rows_dropped` metric, never re-packed: the
    committed payload is immutable from streaming's point of view, and
    the idempotent batch re-pack reconciles genuine late data.

    Only source partitions with complete rows are rewritten in either
    table; a source whose tail empties is dropped explicitly (dynamic
    overwrite cannot delete a partition it does not write). Returns the
    number of (source, bucket, chunk) payload rows committed."""
    from drought_t_spark.operators.rollup import pack_payloads
    from drought_t_spark.ops import checkpoints as CP
    from drought_t_spark.sources.warehouse import Warehouse

    if not wh.exists(PAYLOAD_TAIL_TBL):
        return 0
    if cutoff is None:
        cutoff = _default_cutoff(spark, wh, watermark_hours)
    if cutoff is None:
        return 0
    tail = wh.read(spark, PAYLOAD_TAIL_TBL)
    bucket = F.date_trunc("hour", F.col("ts"))
    complete = tail.where(bucket < F.lit(cutoff))
    affected = complete.select("source").distinct()
    n_affected = affected.count()
    if n_affected == 0:
        return 0

    late_dropped = 0
    fresh = complete
    if wh.exists("agg.payload_hour"):
        packed_keys = (
            wh.read(spark, "agg.payload_hour")
            .join(F.broadcast(affected), ["source"], "left_semi")
            .where(F.col("bucket_start") < F.lit(cutoff))
            .select("source", "bucket_start").distinct()
        )
        keyed = complete.withColumn("bucket_start", bucket)
        late_dropped = keyed.join(
            packed_keys, ["source", "bucket_start"], "left_semi"
        ).count()
        if late_dropped:
            fresh = keyed.join(
                packed_keys, ["source", "bucket_start"], "left_anti"
            ).drop("bucket_start")

    # eager checkpoint: `pay` is consumed twice (count + union) and
    # Spark has no plan-level CSE — without it the shuffle+sort+encode
    # would re-run per consumer; volume is watermark-bounded (only the
    # tail's complete buckets), so the copy is small at any scale
    pay = pack_payloads(fresh.select(*_RAW_COLS), "hour", cfg).localCheckpoint(
        eager=True
    )
    n_new = pay.count()
    out = pay
    if wh.exists("agg.payload_hour"):
        # pass-through rows of the affected sources: fresh ∩ packed = ∅
        # by the late split above, so a plain union is duplicate-free
        out = out.unionByName(
            wh.read(spark, "agg.payload_hour")
            .join(F.broadcast(affected), ["source"], "left_semi")
        )
    # materialize before the overwrite (the pass-through reads files the
    # dynamic overwrite replaces)
    committed = out.localCheckpoint(eager=True)
    wh.write_partitioned(committed, "agg.payload_hour", ["source"])

    # shrink the tail: rewrite affected sources to their incomplete
    # remainder; an emptied source partition must be dropped explicitly
    remainder = (
        tail.join(F.broadcast(affected), ["source"], "left_semi")
        .where(bucket >= F.lit(cutoff))
        .localCheckpoint(eager=True)
    )
    keep = {r.source for r in remainder.select("source").distinct().collect()}
    gone = [r.source for r in affected.collect() if r.source not in keep]
    if keep:
        wh.write_partitioned(remainder, PAYLOAD_TAIL_TBL, ["source"])
    if gone:
        wh.drop_partitions(PAYLOAD_TAIL_TBL, "source", gone)

    CP.record_commit(
        spark, wh, job_id, "payload_pack", [f"cutoff:{cutoff.isoformat()}"],
        snapshot_id=Warehouse.snapshot_token(
            committed.select("source", "bucket_start", "chunk_id", "payload_crc32"),
            ["source", "bucket_start", "chunk_id"],
        ),
        rows_in=n_new + late_dropped, rows_out=n_new,
        metrics={
            "late_rows_dropped": float(late_dropped),
            "sources_rewritten": float(n_affected),
        },
    )
    return n_new


def _unsealed_partials(spark: SparkSession, wh) -> DataFrame | None:
    """Raw partial rows NOT yet folded into the tail — replayed-but-
    ledgered batch partitions are excluded so the live view never
    double-counts across a seal replay (lookup cost is bounded by the
    un-sealed batch count, never the all-time ledger)."""
    from drought_t_spark.ops import checkpoints as CP

    if not wh.exists(PAYLOAD_PARTIALS_TBL):
        return None
    p = wh.read(spark, PAYLOAD_PARTIALS_TBL)
    present = [str(r.batch_key) for r in p.select("batch_key").distinct().collect()]
    if not present:
        return None
    folded = {
        r.partition_id
        for r in CP.committed_partitions(
            spark, wh, "stream-payload-seal", "payload_seal"
        )
        .where(F.col("partition_id").isin([f"batch:{b}" for b in present]))
        .collect()
    }
    live = [b for b in present if f"batch:{b}" not in folded]
    if not live:
        return None
    return p.where(F.col("batch_key").isin(live)).select(*_RAW_COLS)


def read_stream_tokens(spark: SparkSession, wh) -> DataFrame:
    """The live exact token view: committed packed buckets (decoded,
    chunks concatenated in chunk_id order) ⊎ the raw in-flight rows
    (tail + un-sealed partials, concatenated in seq order per bucket).
    Raw rows whose bucket is already packed are EXCLUDED — they are
    either the pack-crash window's duplicates or late rows the next
    pack drops, so the view always shows the post-reconciliation state.

    The raw side's per-bucket collect_list is bounded by the watermark
    window (the tail holds at most the last few hours per source), not
    by history — the packed side stays columnar until decode.

    Output: (source, bucket_start, state 'packed'|'raw', n_tokens,
    tokens array<int>)."""
    from drought_t_spark.codec.udfs import decode_tokens_udf

    pieces: list[DataFrame] = []
    packed_keys = None
    if wh.exists("agg.payload_hour"):
        pay = wh.read(spark, "agg.payload_hour")
        packed_keys = pay.select("source", "bucket_start").distinct()
        pieces.append(
            pay.select(
                "source", "bucket_start", "chunk_id",
                decode_tokens_udf("payload").alias("tokens"),
            )
            .groupBy("source", "bucket_start")
            .agg(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("chunk_id", "tokens"))
                        ),
                        lambda s: s.tokens,
                    )
                ).alias("tokens")
            )
            .select(
                "source", "bucket_start", F.lit("packed").alias("state"),
                F.size("tokens").cast("long").alias("n_tokens"), "tokens",
            )
        )

    raw = None
    if wh.exists(PAYLOAD_TAIL_TBL):
        raw = wh.read(spark, PAYLOAD_TAIL_TBL).select(*_RAW_COLS)
    unsealed = _unsealed_partials(spark, wh)
    if unsealed is not None:
        raw = unsealed if raw is None else raw.unionByName(unsealed)
    if raw is not None:
        r = raw.withColumn("bucket_start", F.date_trunc("hour", "ts"))
        if packed_keys is not None:
            r = r.join(packed_keys, ["source", "bucket_start"], "left_anti")
        pieces.append(
            r.groupBy("source", "bucket_start")
            .agg(
                F.flatten(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("seq", "tokens"))),
                        lambda s: s.tokens,
                    )
                ).alias("tokens")
            )
            .select(
                "source", "bucket_start", F.lit("raw").alias("state"),
                F.size("tokens").cast("long").alias("n_tokens"), "tokens",
            )
        )

    assert pieces, "no streamed payload data ingested yet"
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out

"""Retention + tier-routing read (the "retention engine" half of the
north rule: hourly → daily → monthly tiers with bounded-horizon fine
data).

Two operators:

* `expire_tier` — drop a tier's buckets older than a cutoff, but ONLY
  after proving the next-coarser tier covers the expired range (a
  left-anti coverage check — refusing is cheaper than losing data).
  On the parquet shim this rewrites each affected source partition via
  dynamic partition overwrite; on Iceberg with
  `PARTITIONED BY (days(bucket_start), bucket(source, N))` the same
  call is a metadata-only `DELETE WHERE bucket_start < cutoff` +
  `expire_snapshots` — the call site does not change shape.

* `read_series` — the continuous-aggregate read path: serve a time
  range from the COARSEST tier that fully covers each sub-range
  (month for the old span, day for the middle, hour for the recent
  tail), so a year-long query touches ~12 + ~30 + ~24·30 rows per
  source instead of 8760. Boundaries are bucket-aligned, each tier
  reads a disjoint [lo, hi) slice, and partition pruning applies per
  tier because the filter is a literal range on `bucket_start`.

Both record ops rows (lineage/metrics) like every other stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drought_t_spark.ops import checkpoints as CP
from drought_t_spark.sources.warehouse import Warehouse

#: coarser tier that must cover expired buckets of the key tier
COARSER = {"hour": "day", "day": "month"}


class RetentionError(RuntimeError):
    """Refusal to expire data the coarser tier does not cover."""


def _trunc(tier: str, col):
    return F.date_trunc(tier, col)


def expire_tier(
    spark: SparkSession,
    wh: Warehouse,
    job_id: str,
    tier: str,
    cutoff,
    archive_values: bool = False,
) -> dict:
    """Expire `tier` buckets with bucket_start < cutoff (tier-aligned).

    Safety invariant: every (source, coarser-bucket) that would lose
    fine rows must already exist in the committed coarser tier; the
    check is one left-anti join (J5 shape) and the whole call aborts
    with RetentionError on any uncovered bucket. Returns counts.

    `archive_values=True` additionally packs the doomed rows' float64
    `value` series into `agg.value_history_<tier>` (one row per
    (source, coarser bucket): minute-offset GZ1 + Gorilla-XOR GZ3
    payloads — operators/value_history.py) BEFORE anything is dropped,
    so the fine-grained series stays recoverable bit-exactly after the
    integer stats have been downsampled away. The archive write is an
    idempotent per-source-partition overwrite, like every other sink."""
    coarser = COARSER.get(tier)
    if coarser is None:
        raise ValueError(f"tier {tier!r} has no coarser tier to retain into")
    # the cutoff must sit on a COARSER-tier bucket boundary: a mid-day /
    # mid-month cutoff would pass the coverage check (the coarse bucket
    # exists) yet expire only part of that bucket's fine rows, leaving
    # read_series with a ragged edge inside a partially-expired bucket
    from datetime import datetime

    cut_t = cutoff if isinstance(cutoff, datetime) else datetime.fromisoformat(str(cutoff))
    aligned = (
        cut_t.replace(hour=0, minute=0, second=0, microsecond=0)
        if coarser == "day"
        else cut_t.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    )
    if aligned != cut_t:
        raise RetentionError(
            f"cutoff {cut_t.isoformat()} is not aligned to a {coarser}-tier "
            f"bucket boundary; expiring part of a {coarser} bucket would break "
            f"read_series exactness — use {aligned.isoformat()} or the next boundary"
        )
    tbl = f"agg.tier_{tier}"
    df = wh.read(spark, tbl)
    cutoff_lit = F.lit(cutoff).cast("timestamp")
    doomed = df.where(F.col("bucket_start") < cutoff_lit)
    cover = wh.read(spark, f"agg.tier_{coarser}").select(
        "source", F.col("bucket_start").alias("cb")
    )
    uncovered = (
        doomed.select("source", _trunc(coarser, "bucket_start").alias("cb"))
        .distinct()
        .join(cover, ["source", "cb"], "left_anti")
    )
    n_uncovered = uncovered.count()
    if n_uncovered:
        raise RetentionError(
            f"{n_uncovered} (source, {coarser}-bucket) groups below the cutoff "
            f"have no committed {coarser}-tier row; refusing to expire"
        )
    n_before = df.count()
    n_doomed = doomed.count()
    if n_doomed and archive_values:
        from drought_t_spark.operators.value_history import (
            pack_value_history,
            unpack_value_history,
        )

        # partitioned by (source, cb=yyyyMMdd of the coarse bucket):
        # successive retention cycles have strictly increasing ALIGNED
        # cutoffs, so each cycle's coarse buckets are NORMALLY disjoint
        # from every earlier cycle's — dynamic overwrite then replaces
        # only THIS cycle's buckets (crash-replay of one cycle stays
        # idempotent) and never destroys previously archived history.
        # Partitioning by source alone did exactly that (one cycle wiped
        # the whole source=X partition, including older cycles' rows).
        # cb is int32 (yyyyMMdd — numeric order == date order) so the
        # read path's literal range filter prunes partitions without
        # fighting hive partition-type inference.
        #
        # LATE ARRIVALS break the disjointness: fine rows landing in an
        # already-archived coarse bucket would make dynamic overwrite
        # replace that (source, cb) partition with only the late rows,
        # silently destroying the earlier archive. So overlapping
        # partitions are MERGED: unpack the existing payload, drop any
        # fine bucket the live tier re-supplies (the live row is the
        # most recent computation and wins), union, repack. The overlap
        # probe is one broadcast semi-join against this cycle's key set
        # and the unpack cost is paid only for genuinely overlapping
        # partitions — the common disjoint cycle takes the fast path
        # untouched. Replay-idempotent: re-running a crashed cycle finds
        # its own merged write, subtracts the doomed rows it re-supplies,
        # and repacks identical content.
        hist_tbl = f"agg.value_history_{tier}"
        pack_src = doomed
        cb_expr = F.date_format(
            _trunc(coarser, "bucket_start"), "yyyyMMdd"
        ).cast("int")
        if wh.exists(hist_tbl):
            cycle_keys = doomed.select("source", cb_expr.alias("cb")).distinct()
            overlap = wh.read(spark, hist_tbl).join(
                F.broadcast(cycle_keys), ["source", "cb"], "left_semi"
            )
            if overlap.limit(1).count():
                old_only = (
                    unpack_value_history(overlap)
                    .join(
                        doomed.select("source", "bucket_start"),
                        ["source", "bucket_start"],
                        "left_anti",
                    )
                    .withColumn("gap_filled", F.lit(False))
                )
                pack_src = doomed.select(
                    "source", "bucket_start", "value", "gap_filled"
                ).unionByName(
                    old_only.select("source", "bucket_start", "value", "gap_filled")
                )
        hist = pack_value_history(pack_src, coarser).withColumn(
            "cb", F.date_format("bucket_start", "yyyyMMdd").cast("int")
        )
        wh.write_partitioned(hist, hist_tbl, ["source", "cb"])
    if n_doomed:
        # rewrite only the source partitions that actually lose rows —
        # dynamic partition overwrite leaves the others untouched. A
        # fully-expired source writes NO rows, so dynamic overwrite
        # would silently keep its old partition: those are dropped
        # explicitly (Iceberg: the same DELETE handles both; the
        # collected list is bounded by the affected-source count).
        affected = doomed.select("source").distinct()
        # materialized BEFORE the overwrite: the rewrite reads the same
        # files it replaces, so the kept rows must leave the table first
        kept = df.join(F.broadcast(affected), ["source"], "left_semi").where(
            F.col("bucket_start") >= cutoff_lit
        ).localCheckpoint(eager=True)
        gone = [
            r["source"]
            for r in affected.join(
                kept.select("source").distinct(), ["source"], "left_anti"
            ).collect()
        ]
        wh.write_partitioned(kept, tbl, ["source"])
        if gone:
            wh.drop_partitions(tbl, "source", gone)
    CP.record_commit(
        spark, wh, job_id, f"retention_{tier}", [f"{tier}:retention"],
        snapshot_id=Warehouse.snapshot_token(
            wh.read(spark, tbl), ["source", "bucket_start"]
        ),
        rows_in=n_before, rows_out=n_before - n_doomed,
        metrics={"expired_rows": float(n_doomed)},
    )
    return {"expired": n_doomed, "kept": n_before - n_doomed}


def read_values(
    spark: SparkSession,
    wh: Warehouse,
    tier: str,
    lo,
    hi,
) -> DataFrame:
    """Fine-grained float64 `value` series of `tier` over [lo, hi) —
    including ranges already EXPIRED behind the retention horizon.

    Rows still in the live tier are served straight from it (non-gap-
    filled, literal range filter → pushdown). The sub-horizon part comes
    from `agg.value_history_<tier>`: the coarse-bucket partitions
    overlapping the range are pruned by the `cb` partition int
    (yyyyMMdd — numeric order == date order, so a literal range
    prunes exactly), unpacked bit-exactly (GZ1 offsets + GZ3 XOR
    floats), then row-filtered to [lo, hi). The two sets are disjoint by
    construction (expire archives exactly what it drops); the
    crash-window overlap (archive written, drop not reached) is closed
    with a dropDuplicates on the key — both copies are bit-identical.
    Output: (source, bucket_start, value)."""
    from datetime import datetime

    def _parse(t) -> datetime:
        return t if isinstance(t, datetime) else datetime.fromisoformat(str(t))

    lo_t, hi_t = _parse(lo), _parse(hi)
    if not lo_t < hi_t:
        raise ValueError(f"read_values needs lo < hi, got [{lo_t}, {hi_t})")
    coarser = COARSER.get(tier)
    lo_lit, hi_lit = F.lit(lo_t).cast("timestamp"), F.lit(hi_t).cast("timestamp")
    in_range = (F.col("bucket_start") >= lo_lit) & (F.col("bucket_start") < hi_lit)

    pieces: list[DataFrame] = []
    if wh.exists(f"agg.tier_{tier}"):
        pieces.append(
            wh.read(spark, f"agg.tier_{tier}")
            .where(~F.col("gap_filled") & in_range)
            .select("source", "bucket_start", F.col("value").cast("double").alias("value"))
        )
    hist_tbl = f"agg.value_history_{tier}"
    if coarser is not None and wh.exists(hist_tbl):
        from drought_t_spark.operators.value_history import unpack_value_history

        # coarse bucket holding lo: floor to the coarser boundary so the
        # partition range covers fine rows late inside that bucket
        c_lo = (
            lo_t.replace(hour=0, minute=0, second=0, microsecond=0)
            if coarser == "day"
            else lo_t.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
        )
        hist = wh.read(spark, hist_tbl).where(
            (F.col("cb") >= F.lit(int(c_lo.strftime("%Y%m%d"))))
            & (F.col("cb") <= F.lit(int(hi_t.strftime("%Y%m%d"))))
        )
        pieces.append(unpack_value_history(hist).where(in_range))
    if not pieces:
        raise ValueError(f"no live tier or value-history archive for {tier!r}")
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    # full-row distinct, NOT dropDuplicates(["source","bucket_start"]):
    # the crash-window duplicates are bit-identical whole rows (GZ3 is
    # exact), so distinct() is equivalent — and a subset-dropDuplicates
    # (first() aggregate) over this Generate plan trips a Spark 4.1
    # binding bug ([INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND]) the moment a
    # downstream exceptAll/aggregate reshapes it
    return out.distinct()


def _parse_ts(t):
    from datetime import datetime

    return t if isinstance(t, datetime) else datetime.fromisoformat(str(t))


def route_slices(lo_t, hi_t) -> list[tuple[str, object, object]]:
    """Tier routing for [lo, hi): coarsest tier that fully covers each
    sub-range — month for whole months, day for whole days at the
    edges, hour for the ragged hourly tails. Returns ordered DISJOINT
    (tier, a, b) slices partitioning [lo, hi); boundaries are computed
    on the driver so every tier scan downstream gets a LITERAL range
    filter (pushdown + partition pruning). Shared by `read_series` and
    `read_payloads` — one routing, two payloads."""
    from datetime import timedelta

    def _ceil_day(t):
        d = t.replace(hour=0, minute=0, second=0, microsecond=0)
        return d if d == t else d + timedelta(days=1)

    def _floor_day(t):
        return t.replace(hour=0, minute=0, second=0, microsecond=0)

    def _floor_month(t):
        return t.replace(day=1, hour=0, minute=0, second=0, microsecond=0)

    def _ceil_month(t):
        f = _floor_month(t)
        if f == t:
            return f
        return f.replace(year=f.year + (f.month == 12), month=f.month % 12 + 1)

    d_lo, d_hi = min(_ceil_day(lo_t), hi_t), max(_floor_day(hi_t), lo_t)
    m_lo, m_hi = _ceil_month(d_lo), _floor_month(d_hi)
    use_month = m_lo < m_hi
    if not d_lo < d_hi:
        return [("hour", lo_t, hi_t)]
    out = [("hour", lo_t, d_lo)]
    if use_month:
        out += [("day", d_lo, m_lo), ("month", m_lo, m_hi), ("day", m_hi, d_hi)]
    else:
        out.append(("day", d_lo, d_hi))
    out.append(("hour", d_hi, hi_t))
    return [(t, a, b) for (t, a, b) in out if a < b]


def read_series(
    spark: SparkSession,
    wh: Warehouse,
    lo,
    hi,
    cols: tuple[str, ...] = ("n_seq", "n_tok_sum"),
) -> DataFrame:
    """Continuous-aggregate read of [lo, hi): month tier for whole
    months, day tier for whole days at the edges, hour tier for the
    ragged hourly tails. Slices are disjoint and bucket-aligned, so
    additive columns (`n_seq`, `n_tok_sum`) sum to exactly the raw
    total. Output: (source, tier, bucket_start, *cols)."""
    lo_t, hi_t = _parse_ts(lo), _parse_ts(hi)
    if not lo_t < hi_t:
        raise ValueError(f"read_series needs lo < hi, got [{lo_t}, {hi_t})")
    pieces: list[DataFrame] = []
    for tier, a, b in route_slices(lo_t, hi_t):
        t = wh.read(spark, f"agg.tier_{tier}").where(
            (F.col("bucket_start") >= F.lit(a)) & (F.col("bucket_start") < F.lit(b))
        )
        pieces.append(
            t.select("source", F.lit(tier).alias("tier"), "bucket_start",
                     *[F.col(c) for c in cols])
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def read_payloads(
    spark: SparkSession,
    wh: Warehouse,
    lo,
    hi,
    decode: bool = True,
) -> DataFrame:
    """Tier-routed TOKEN read of [lo, hi): the payload twin of
    `read_series`, closing the retention read story — a user
    reconstructing token streams across the retention horizon no longer
    hand-picks payload tiers.

    Routing is `route_slices` verbatim: month payloads for whole
    months, day payloads for whole days at the edges, hour payloads for
    the hourly tails. Each slice is a literal range filter on its
    `agg.payload_<tier>` table (pushdown + pruning); tokens inside a
    bucket are one concatenated stream in (fine bucket, seq) order, and
    the tier invariant (cascade = decode→concat→re-encode, pinned
    bit-exact by test_rollup_tiers) makes concatenating the returned
    rows in (source, bucket_start, chunk_id) order IDENTICAL to
    concatenating the fine tier over the same range.

    After `expire_payload_tier` drops sub-horizon fine payloads the
    routed read keeps working unchanged: sub-horizon spans route to the
    surviving coarse tables by construction (the expiry cutoff must be
    coarse-aligned, so an expired span is always whole coarse buckets).
    `lo`/`hi` must be hour-aligned — tokens are not addressable below
    the finest bucket.

    Output: (source, tier, bucket_start, chunk_id, n_tokens, tokens) —
    `tokens` decoded array<int> when `decode=True` (TSZ1/TSZZ
    auto-detected per payload), else the raw binary payload column."""
    lo_t, hi_t = _parse_ts(lo), _parse_ts(hi)
    if not lo_t < hi_t:
        raise ValueError(f"read_payloads needs lo < hi, got [{lo_t}, {hi_t})")
    if lo_t.minute or lo_t.second or lo_t.microsecond or (
        hi_t.minute or hi_t.second or hi_t.microsecond
    ):
        raise ValueError(
            f"read_payloads boundaries must be hour-aligned, got [{lo_t}, {hi_t})"
        )
    pieces: list[DataFrame] = []
    for tier, a, b in route_slices(lo_t, hi_t):
        tbl = f"agg.payload_{tier}"
        if not wh.exists(tbl):
            raise ValueError(
                f"read_payloads: slice [{a}, {b}) routes to {tbl} which does "
                f"not exist in this warehouse — run the rollup job with "
                f"payloads (the cascade writes day/month payload tiers)"
            )
        t = wh.read(spark, tbl).where(
            (F.col("bucket_start") >= F.lit(a)) & (F.col("bucket_start") < F.lit(b))
        )
        pieces.append(
            t.select("source", F.lit(tier).alias("tier"), "bucket_start",
                     "chunk_id", F.col("payload_n_tokens").alias("n_tokens"),
                     "payload")
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    if not decode:
        return out
    from drought_t_spark.codec.udfs import decode_tokens_udf

    return out.select(
        "source", "tier", "bucket_start", "chunk_id", "n_tokens",
        decode_tokens_udf("payload").alias("tokens"),
    )


def expire_payload_tier(
    spark: SparkSession,
    wh: Warehouse,
    job_id: str,
    tier: str,
    cutoff,
) -> dict:
    """Expire `agg.payload_<tier>` buckets with bucket_start < cutoff —
    the payload twin of `expire_tier`, with the same two guards: the
    cutoff must sit on a coarser-tier bucket boundary, and every
    (source, coarser-bucket) losing fine payloads must already exist in
    the committed coarser PAYLOAD tier (left-anti coverage check;
    refusal beats data loss — the coarse payload holds the same token
    stream bit-exactly, so nothing is lost once covered)."""
    coarser = COARSER.get(tier)
    if coarser is None:
        raise ValueError(f"tier {tier!r} has no coarser payload tier to retain into")
    cut_t = _parse_ts(cutoff)
    aligned = (
        cut_t.replace(hour=0, minute=0, second=0, microsecond=0)
        if coarser == "day"
        else cut_t.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    )
    if aligned != cut_t:
        raise RetentionError(
            f"cutoff {cut_t.isoformat()} is not aligned to a {coarser}-tier "
            f"bucket boundary; expiring part of a {coarser} payload bucket "
            f"would leave read_payloads unable to serve it — use "
            f"{aligned.isoformat()} or the next boundary"
        )
    tbl = f"agg.payload_{tier}"
    df = wh.read(spark, tbl)
    cutoff_lit = F.lit(cut_t).cast("timestamp")
    doomed = df.where(F.col("bucket_start") < cutoff_lit)
    cover = wh.read(spark, f"agg.payload_{coarser}").select(
        "source", F.col("bucket_start").alias("cb")
    )
    uncovered = (
        doomed.select("source", _trunc(coarser, "bucket_start").alias("cb"))
        .distinct()
        .join(cover, ["source", "cb"], "left_anti")
    )
    n_uncovered = uncovered.count()
    if n_uncovered:
        raise RetentionError(
            f"{n_uncovered} (source, {coarser}-bucket) groups below the cutoff "
            f"have no committed {coarser}-tier payload row; refusing to expire"
        )
    n_before = df.count()
    n_doomed = doomed.count()
    if n_doomed:
        affected = doomed.select("source").distinct()
        kept = df.join(F.broadcast(affected), ["source"], "left_semi").where(
            F.col("bucket_start") >= cutoff_lit
        ).localCheckpoint(eager=True)
        gone = [
            r["source"]
            for r in affected.join(
                kept.select("source").distinct(), ["source"], "left_anti"
            ).collect()
        ]
        wh.write_partitioned(kept, tbl, ["source"])
        if gone:
            wh.drop_partitions(tbl, "source", gone)
    CP.record_commit(
        spark, wh, job_id, f"retention_payload_{tier}", [f"{tier}:retention_payload"],
        snapshot_id=Warehouse.snapshot_token(
            wh.read(spark, tbl), ["source", "bucket_start", "chunk_id"]
        ),
        rows_in=n_before, rows_out=n_before - n_doomed,
        metrics={"expired_payload_rows": float(n_doomed)},
    )
    return {"expired": n_doomed, "kept": n_before - n_doomed}

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
        from drought_t_spark.operators.value_history import pack_value_history

        # partitioned by (source, cb=yyyyMMdd of the coarse bucket):
        # successive retention cycles have strictly increasing ALIGNED
        # cutoffs, so each cycle's coarse buckets are disjoint from every
        # earlier cycle's — dynamic overwrite therefore replaces only
        # THIS cycle's buckets (crash-replay of one cycle stays
        # idempotent) and never destroys previously archived history.
        # Partitioning by source alone did exactly that (one cycle wiped
        # the whole source=X partition, including older cycles' rows).
        # cb is int32 (yyyyMMdd — numeric order == date order) so the
        # read path's literal range filter prunes partitions without
        # fighting hive partition-type inference
        hist = pack_value_history(doomed, coarser).withColumn(
            "cb", F.date_format("bucket_start", "yyyyMMdd").cast("int")
        )
        wh.write_partitioned(hist, f"agg.value_history_{tier}", ["source", "cb"])
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
    from datetime import datetime, timedelta

    def _parse(t) -> datetime:
        return t if isinstance(t, datetime) else datetime.fromisoformat(str(t))

    def _ceil_day(t: datetime) -> datetime:
        d = t.replace(hour=0, minute=0, second=0, microsecond=0)
        return d if d == t else d + timedelta(days=1)

    def _floor_day(t: datetime) -> datetime:
        return t.replace(hour=0, minute=0, second=0, microsecond=0)

    def _floor_month(t: datetime) -> datetime:
        return t.replace(day=1, hour=0, minute=0, second=0, microsecond=0)

    def _ceil_month(t: datetime) -> datetime:
        f = _floor_month(t)
        if f == t:
            return f
        return f.replace(year=f.year + (f.month == 12), month=f.month % 12 + 1)

    lo_t, hi_t = _parse(lo), _parse(hi)
    if not lo_t < hi_t:
        raise ValueError(f"read_series needs lo < hi, got [{lo_t}, {hi_t})")
    # bucket-aligned boundaries, computed on the driver so every tier
    # scan gets a LITERAL range filter (pushdown + partition pruning)
    d_lo, d_hi = min(_ceil_day(lo_t), hi_t), max(_floor_day(hi_t), lo_t)
    m_lo, m_hi = _ceil_month(d_lo), _floor_month(d_hi)
    use_month = m_lo < m_hi
    if not d_lo < d_hi:
        d_lo = d_hi = None  # range too short for any whole day

    pieces: list[DataFrame] = []

    def slice_tier(tier: str, a, b) -> None:
        if a is None or b is None or not a < b:
            return
        t = wh.read(spark, f"agg.tier_{tier}").where(
            (F.col("bucket_start") >= F.lit(a)) & (F.col("bucket_start") < F.lit(b))
        )
        pieces.append(
            t.select("source", F.lit(tier).alias("tier"), "bucket_start",
                     *[F.col(c) for c in cols])
        )

    if d_lo is None:
        slice_tier("hour", lo_t, hi_t)
    else:
        slice_tier("hour", lo_t, d_lo)
        if use_month:
            slice_tier("day", d_lo, m_lo)
            slice_tier("month", m_lo, m_hi)
            slice_tier("day", m_hi, d_hi)
        else:
            slice_tier("day", d_lo, d_hi)
        slice_tier("hour", d_hi, hi_t)
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out

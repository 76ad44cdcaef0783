"""Bucketed T0 layout — the production posture for the 10^12-sequence
table (SURVEY.md §4): cluster the sequence table by ``source`` at write
time (on Iceberg the ``bucket(N, source)`` partition transform; on the
parquet shim Spark's native ``bucketBy``), so every per-source stage
starts pre-partitioned and the biggest shuffle in the engine — the
payload pack's repartition of every token — disappears from the plan.

Two Catalyst mechanisms do the work once the scan is bucketed:

* aggregations/windows keyed by (``source``, ...) require only a
  ClusteredDistribution, which HashPartitioning(``source``) already
  satisfies (partitioning by a SUBSET of the grouping keys is
  sufficient) — EnsureRequirements inserts NO exchange;
* ``pack_payloads(pre_partitioned=True)`` skips its explicit
  repartition; group containment is guaranteed because a bucketed scan
  with ``autoBucketedScan`` disabled reads each bucket in exactly one
  task.

The session catalog is in-memory, so a fresh process re-attaches to the
files with ``register_bucketed_sequences`` (CREATE TABLE ... CLUSTERED
BY ... LOCATION) — the same DDL a shared metastore or Iceberg catalog
would hold durably.

Sizing N: exchange-free stages get at most one task per bucket, so N
bounds their parallelism — pick N ≥ several× the cluster's core count
(e.g. 2-8k buckets for a 1000-executor cluster) and small enough that
a bucket's hot-source share still fits one task comfortably; with
~10^5 sources hashed into thousands of buckets, per-bucket load
concentration is negligible (balls-into-bins), and the pack kernel
streams per-bucket-chunk so even a hot bucket pipelines rather than
spilling. The 64 used in tests/bench matches the 32-core sandbox.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

SEQUENCES_DDL = "doc_id STRING, tokens ARRAY<INT>, n_tok INT, source STRING"


def write_bucketed_sequences(
    df: DataFrame,
    path: str,
    n_buckets: int,
    table: str = "t0_bucketed",
) -> str:
    """Write the sequence table bucketed by ``source``. The repartition
    by the same hash first yields ONE file per bucket (bucketBy alone
    writes one file per bucket per upstream task); Spark's bucket hash
    and repartition hash are both Murmur3 on the column, so the two
    agree by construction."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.repartition(n_buckets, "source")
        .write.mode("overwrite")
        .bucketBy(n_buckets, "source")
        .option("path", path)
        .saveAsTable(table)
    )
    return table


def register_bucketed_sequences(
    spark: SparkSession,
    path: str,
    n_buckets: int,
    table: str = "t0_bucketed",
) -> str:
    """Re-attach a fresh session to bucketed files written earlier —
    the bucket spec lives in catalog metadata, not in the files, so a
    new process must redeclare it (a metastore/Iceberg catalog keeps it
    durably; the in-memory catalog forgets at exit)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"CREATE TABLE {table} ({SEQUENCES_DDL}) USING PARQUET "
        f"CLUSTERED BY (source) INTO {n_buckets} BUCKETS "
        f"LOCATION '{path}'"
    )
    return table


def read_bucketed(spark: SparkSession, table: str = "t0_bucketed") -> DataFrame:
    """Bucket-per-task scan. ``autoBucketedScan`` must be OFF: when on,
    Spark may silently fall back to a size-split scan if no downstream
    operator declares a distribution requirement — mapInArrow declares
    none, and a size-split scan straddles sources across tasks, which
    would make ``pre_partitioned=True`` packing WRONG, not just slow."""
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    return spark.table(table)

"""Warehouse catalog shim (SURVEY.md §1.2).

Iceberg is the production target (`writeTo(...).overwritePartitions()`,
snapshot ids as checkpoint tokens); this sandbox has no Iceberg runtime
jar, so the shim provides the same three primitives over a plain
parquet warehouse with hive-style partitioning:

* idempotent partition overwrite — dynamic partitionOverwriteMode
  (re-running a stage replaces exactly the partitions it produces);
* append — for ops tables;
* snapshot token — deterministic content token per write (row count +
  sum of a column hash), standing in for the Iceberg snapshot id.

On a real cluster: add iceberg-spark-runtime via --packages and swap
`write_partitioned` for `df.writeTo(tbl).overwritePartitions()`; the
call sites do not change shape.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Warehouse:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table.replace(".", "/"))

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f.startswith(("source=", "part")) or "=" in f
            for f in os.listdir(p)
        )

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self.path(table))

    def write_partitioned(self, df: DataFrame, table: str, partition_cols: list[str]) -> None:
        """Idempotent per-partition overwrite (Iceberg overwritePartitions
        stand-in): only partitions present in `df` are replaced."""
        (
            df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        )
        (
            df.write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(self.path(table))
        )

    def append(self, df: DataFrame, table: str) -> None:
        df.write.mode("append").parquet(self.path(table))

    def drop_partitions(self, table: str, partition_col: str, values: list[str]) -> None:
        """Remove whole hive partitions (Iceberg stand-in for a
        partition-predicate DELETE + expire_snapshots)."""
        import shutil

        for v in values:
            shutil.rmtree(
                os.path.join(self.path(table), f"{partition_col}={v}"),
                ignore_errors=True,
            )

    @staticmethod
    def snapshot_token(df: DataFrame, key_cols: list[str]) -> str:
        """Deterministic content token (Iceberg snapshot-id stand-in).
        sum over decimal(38,0) is order-independent and overflow-free
        under ANSI (int64 summands can't exhaust 38 digits below ~10^19
        rows) — unlike int64 sum (scheduling-dependent ANSI overflow) or
        bit_xor (self-cancelling: keys duplicated an even number of
        times contribute nothing, so duplicate-shuffled datasets with
        equal row counts could collide)."""
        row = df.select(
            F.count("*").alias("n"),
            F.sum(
                F.expr(f"xxhash64({', '.join(key_cols)})").cast("decimal(38,0)")
            ).alias("h"),
        ).first()
        return f"{row.n}:{row.h or 0}"

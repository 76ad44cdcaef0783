"""Fixed, explicit schemas for every engine table (SURVEY.md §1.2).

T0 ``raw.sequences`` is exactly the input hint from BASELINE.json:15:
``(doc_id string, tokens array<int32>, n_tok int32, source string)``.
Everything downstream is flat columns (no nested structs) so the DuckDB
oracle comparison stays trivial.
"""

from __future__ import annotations

from pyspark.sql import types as T

# T0 — the input token table
SEQUENCES = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)

# T2 — rollup tier (hour/day/month share the schema; FIXTURES.md §F5)
TIER = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("bucket_start", T.TimestampType(), False),
        T.StructField("n_seq", T.LongType(), True),
        T.StructField("n_tok_sum", T.LongType(), True),
        T.StructField("n_tok_min", T.IntegerType(), True),
        T.StructField("n_tok_max", T.IntegerType(), True),
        T.StructField("n_tok_avg", T.DoubleType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("gap_filled", T.BooleanType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("payload_codec", T.StringType(), True),
        T.StructField("payload_n_tokens", T.LongType(), True),
        T.StructField("payload_crc32", T.LongType(), True),
    ]
)

# T3 — drought event table (FIXTURES.md §F3)
EVENTS = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("onset", T.TimestampType(), False),
        T.StructField("termination", T.TimestampType(), False),
        T.StructField("duration", T.LongType(), False),
        T.StructField("severity", T.DoubleType(), False),
        T.StructField("intensity", T.DoubleType(), False),
        T.StructField("peak", T.DoubleType(), False),
        T.StructField("pooled", T.BooleanType(), False),
        T.StructField("excluded", T.BooleanType(), False),
    ]
)

# T4 — ops tables (BASELINE.json:14 "resumable from checkpoint with
# per-partition lineage and metrics")
CHECKPOINTS = T.StructType(
    [
        T.StructField("job_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.StringType(), False),
        T.StructField("state", T.StringType(), False),
        T.StructField("snapshot_id", T.StringType(), True),
        T.StructField("updated_seq", T.LongType(), False),
    ]
)

LINEAGE = T.StructType(
    [
        T.StructField("job_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("input_snapshot", T.StringType(), True),
        T.StructField("output_snapshot", T.StringType(), True),
        T.StructField("partition_id", T.StringType(), False),
        T.StructField("rows_in", T.LongType(), False),
        T.StructField("rows_out", T.LongType(), False),
    ]
)

METRICS = T.StructType(
    [
        T.StructField("job_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)

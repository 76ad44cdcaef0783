from drought_t_spark.functions.scalars import (
    bucket_count,
    cycle_pos,
    deficit,
    seq_index,
    seq_timestamp,
)

__all__ = ["seq_index", "seq_timestamp", "cycle_pos", "deficit", "bucket_count"]

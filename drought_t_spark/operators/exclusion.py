"""EX1 — minor-drought exclusion (Fleig et al. 2006 §3.3; SURVEY.md
§2.10): AFTER pooling, flag events with duration < d_min OR severity <
s_min, where s_min is absolute or α·max-severity-per-source (relative,
the default). Events stay in the table with `excluded=true`; reports
filter them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from drought_t_spark.config import EngineConfig, DEFAULT


def mark_minor(events: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    if cfg.min_severity_abs is not None:
        s_min = F.lit(float(cfg.min_severity_abs))
    else:
        s_min = F.lit(cfg.min_severity_frac) * F.max("severity").over(
            Window.partitionBy("source")
        )
    return events.withColumn(
        "excluded",
        (F.col("duration") < F.lit(cfg.min_duration)) | (F.col("severity") < s_min),
    )

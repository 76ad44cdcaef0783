"""drought_t_spark — a from-scratch PySpark-native time-series rollup /
downsample / retention engine with the query capabilities of
``rrealrangel/drought_t`` (threshold-level drought method), recast as
continuous aggregates over a table of pre-tokenized training sequences.

Semantics provenance: the reference snapshot is empty (SURVEY.md §0);
the behavioral contract is BASELINE.json's north rule plus the published
threshold-level method (Yevjevich 1967; Fleig et al. 2006, HESS 10:535)
and the Gorilla codec paper (Pelkonen et al., PVLDB 8(12), 2015).
Everything here is idiomatic PySpark: DataFrame/SQL plans optimized by
Catalyst, Arrow-vectorized pandas UDFs for the codec — no per-row Python.
"""

from drought_t_spark.config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"

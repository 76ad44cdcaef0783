"""Engine configuration (SURVEY.md §1.1 row 5).

A single frozen dataclass threaded through plan builders. Config is
*code*, never data: scalars end up inlined as Catalyst literals so
ConstantFolding sees them.

Defaults are the fixture contract from FIXTURES.md §F3 (Fleig et al.
2006 definitions): centered MA W=29, exact percentile P=0.5 variable
threshold, IC pooling t_c=5 / p_c=0.1, exclusion d_min=3 /
s_min = 0.005·max-severity-per-site.
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, replace
from dataclasses import fields as dataclass_fields
from typing import Literal

Tier = Literal["hour", "day", "month"]

#: bucket width per retention tier, as Spark/DuckDB date_trunc unit
TIER_TRUNC: dict[str, str] = {"hour": "hour", "day": "day", "month": "month"}

#: bucket width per tier in seconds (month is calendar-varying; the
#: gap-fill operator uses calendar intervals, never this constant)
TIER_SECONDS: dict[str, int] = {"hour": 3600, "day": 86400}

#: cycle position (seasonal index) per tier for the variable threshold:
#: hour tier → hour-of-week, day tier → day-of-year, month tier → month.
TIER_CYCLE: dict[str, str] = {"hour": "hourofweek", "day": "dayofyear", "month": "month"}


@dataclass(frozen=True)
class EngineConfig:
    # --- smoothing (W1) ---
    ma_window: int = 29          # centered moving-average width (odd, buckets)

    # --- threshold (TH1/TH2) ---
    threshold_pct: float = 0.5   # exact percentile level P in [0,1]
    threshold_mode: Literal["variable", "fixed"] = "variable"
    threshold_ma_window: int = 1  # optional smoothing of the threshold curve itself

    # --- pooling (PL1/PL2), Fleig et al. 2006 §3.2 ---
    pooling: Literal["none", "ic", "ma"] = "ic"
    pool_tc: int = 5             # max inter-event buckets to pool
    pool_pc: float = 0.1         # pool iff v_i <= pool_pc * s_i

    # --- minor-drought exclusion (EX1), Fleig et al. 2006 §3.3 ---
    min_duration: int = 3        # drop events with duration < d_min
    min_severity_frac: float = 0.005  # s_min = frac · max severity per site
    min_severity_abs: float | None = None  # absolute mode overrides frac

    # --- gap-fill (GF1) ---
    gap_fill_mode: Literal["none", "locf", "zero"] = "none"

    # --- scale knobs (SURVEY.md §4 skew row) ---
    salt_buckets: int = 8        # salt factor S for heavy-source rollups
    max_bucket_tokens: int = 4_000_000  # payload chunking bound (spill safety)
    shuffle_partitions: int = 32

    # --- codec ---
    payload_codec: str = "TSZ1"
    payload_zlib: bool = False   # wrap containers in the TSZZ DEFLATE envelope

    def with_(self, **kw) -> "EngineConfig":
        return replace(self, **kw)

    @classmethod
    def from_dict(cls, d: dict) -> "EngineConfig":
        """Strict construction from a plain mapping (the reference's
        config is TOML parsed to a dict — SURVEY.md §3.1 #1). Unknown
        keys are an error, not a silent ignore: a typo'd threshold knob
        that falls back to the default produces wrong events with no
        trace, the worst failure mode a config can have."""
        fields = {f.name for f in dataclass_fields(cls)}
        unknown = set(d) - fields
        if unknown:
            raise ValueError(
                f"unknown config keys: {sorted(unknown)}; known: {sorted(fields)}"
            )
        return cls(**d)

    @classmethod
    def from_toml(cls, path: str) -> "EngineConfig":
        """Load the reference-style TOML config file. Keys may live at
        the top level or under a single `[drought]` table (both shapes
        appear in the reference's docs); a key set in BOTH places is
        rejected by the explicit overlap check below (ValueError naming
        the duplicated keys) rather than one location silently winning,
        and any remaining unknown key is rejected by from_dict."""
        with open(path, "rb") as f:
            raw = tomllib.load(f)
        table = raw.pop("drought", {})
        if not isinstance(table, dict):
            raise ValueError("[drought] must be a table")
        overlap = set(table) & set(raw)
        if overlap:
            raise ValueError(f"keys set both top-level and in [drought]: {sorted(overlap)}")
        return cls.from_dict({**table, **raw})


DEFAULT = EngineConfig()

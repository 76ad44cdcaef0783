"""Property test for the single-scan gap_fill rewrite: for random
sparse per-source series at every tier and fill mode, the output must
equal a straightforward pandas reindex reference — same rows, same
gap flags, same fill semantics (GF1/J4)."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from drought_t_spark.config import EngineConfig
from drought_t_spark.operators.gapfill import gap_fill

FREQ = {"hour": "h", "day": "D", "month": "MS"}


@st.composite
def frames(draw):
    tier = draw(st.sampled_from(["hour", "day", "month"]))
    rows = []
    for s in range(draw(st.integers(1, 2))):
        n_cal = draw(st.integers(1, 40))
        idx = sorted(draw(st.sets(st.integers(0, n_cal - 1), min_size=1, max_size=n_cal)))
        cal = pd.date_range("2024-01-01", periods=n_cal, freq=FREQ[tier])
        for i in idx:
            rows.append((f"s{s}", cal[i], float(draw(st.integers(-5, 5)))))
    mode = draw(st.sampled_from(["none", "locf", "zero"]))
    return tier, mode, pd.DataFrame(rows, columns=["source", "bucket_start", "value"])


@given(frames())
@settings(max_examples=12, deadline=None)
def test_gapfill_matches_pandas_reference(spark, case):
    tier, mode, pdf = case
    sdf = spark.createDataFrame(pdf)
    got = (
        gap_fill(sdf, tier, EngineConfig(gap_fill_mode=mode), value_cols=("value",))
        .toPandas()
        .sort_values(["source", "bucket_start"])
        .reset_index(drop=True)
    )
    exp = []
    for src, g in pdf.groupby("source"):
        cal = pd.date_range(g.bucket_start.min(), g.bucket_start.max(), freq=FREQ[tier])
        r = g.set_index("bucket_start").reindex(cal)
        r["gap_filled"] = r["source"].isna()
        r["source"] = src
        if mode == "locf":
            r["value"] = r["value"].ffill()
        elif mode == "zero":
            r["value"] = r["value"].fillna(0.0)
        exp.append(r.rename_axis("bucket_start").reset_index())
    want = (
        pd.concat(exp)[["source", "bucket_start", "value", "gap_filled"]]
        .sort_values(["source", "bucket_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["source", "bucket_start", "value", "gap_filled"]], want, check_dtype=False
    )

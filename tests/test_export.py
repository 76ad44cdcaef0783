"""CSV export (SURVEY.md §3.1's last lifecycle step): round-trip
exactness, deterministic single-file mode, and the threshold-curve
export."""

import glob
import os

import pandas as pd

from drought_t_spark import synth
from drought_t_spark.config import EngineConfig
from drought_t_spark.operators.smoothing import moving_avg
from drought_t_spark.operators.threshold import variable_threshold
from drought_t_spark.plans.drought import drought_events_for_tier, series_to_tier
from drought_t_spark.plans.export import (
    export_events_csv,
    export_threshold_csv,
    read_events_csv,
)


def _events(spark):
    tier = series_to_tier(spark.createDataFrame(synth.series_pdf()), ts_col="date")
    return drought_events_for_tier(tier, "day", EngineConfig())


def test_events_roundtrip_bit_exact(spark, tmp_path):
    ev = _events(spark).localCheckpoint(eager=True)
    path = str(tmp_path / "events_dir")
    export_events_csv(ev, path)
    back = read_events_csv(spark, path)
    cols = ["source", "event_id", "onset", "termination",
            "duration", "severity", "intensity", "peak"]
    a = ev.select(cols).toPandas().sort_values(["source", "event_id"]).reset_index(drop=True)
    b = back.select(cols).toPandas().sort_values(["source", "event_id"]).reset_index(drop=True)
    assert len(a) > 0
    # bit-exact: Spark CSV doubles use shortest-round-trip repr
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_single_file_mode(spark, tmp_path):
    ev = _events(spark)
    target = str(tmp_path / "events.csv")
    export_events_csv(ev, target, single_file=True)
    assert os.path.isfile(target)
    assert not glob.glob(str(tmp_path / "*._spark_csv"))
    with open(target) as f:
        header = f.readline().strip()
    assert header.split(",")[:3] == ["source", "event_id", "onset"]
    # sorted within the single file by (source, onset)
    pdf = pd.read_csv(target)
    assert list(pdf[["source", "event_id"]].itertuples(index=False)) == sorted(
        pdf[["source", "event_id"]].itertuples(index=False)
    )


def test_threshold_curve_export(spark, tmp_path):
    tier = series_to_tier(spark.createDataFrame(synth.series_pdf()), ts_col="date")
    from drought_t_spark.operators.gapfill import gap_fill

    cfg = EngineConfig()
    sm = moving_avg(gap_fill(tier, "day", cfg), cfg.ma_window)
    th = variable_threshold(sm, "day", cfg)
    target = str(tmp_path / "threshold.csv")
    export_threshold_csv(th, target, single_file=True)
    pdf = pd.read_csv(target)
    assert list(pdf.columns) == ["source", "cycle_pos", "x0"]
    assert len(pdf) == len(th.toPandas())

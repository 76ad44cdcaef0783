"""EngineConfig TOML/dict ingestion (SURVEY.md §3.1 #1: the reference's
entry point consumes a TOML config)."""

import pytest

from drought_t_spark.config import DEFAULT, EngineConfig


def test_from_toml_top_level(tmp_path):
    p = tmp_path / "cfg.toml"
    p.write_text('ma_window = 15\nthreshold_pct = 0.2\npooling = "ma"\n')
    cfg = EngineConfig.from_toml(str(p))
    assert (cfg.ma_window, cfg.threshold_pct, cfg.pooling) == (15, 0.2, "ma")
    assert cfg.pool_tc == DEFAULT.pool_tc  # untouched knobs keep defaults


def test_from_toml_drought_table(tmp_path):
    p = tmp_path / "cfg.toml"
    p.write_text('[drought]\nmin_duration = 5\ngap_fill_mode = "locf"\n')
    cfg = EngineConfig.from_toml(str(p))
    assert (cfg.min_duration, cfg.gap_fill_mode) == (5, "locf")


def test_unknown_key_is_an_error(tmp_path):
    p = tmp_path / "cfg.toml"
    p.write_text("ma_windoe = 15\n")  # typo must not silently default
    with pytest.raises(ValueError, match="ma_windoe"):
        EngineConfig.from_toml(str(p))


def test_duplicate_key_across_levels_is_an_error(tmp_path):
    p = tmp_path / "cfg.toml"
    p.write_text("ma_window = 15\n[drought]\nma_window = 29\n")
    with pytest.raises(ValueError, match="ma_window"):
        EngineConfig.from_toml(str(p))


def test_from_dict_strict():
    cfg = EngineConfig.from_dict({"salt_buckets": 16})
    assert cfg.salt_buckets == 16
    with pytest.raises(ValueError, match="nope"):
        EngineConfig.from_dict({"nope": 1})

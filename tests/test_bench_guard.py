"""The bench disk guard (bench._disk_guard): scratch-health probe +
tmpfs failover. No Spark needed — the guard is pure os/env logic; the
probe threshold decides whether SPARK_GRAFT_LOCAL_DIR gets set, which
session.build_session then honors (tested by inspection of the conf
dict here, without starting a JVM)."""

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fresh_bench(monkeypatch):
    """Re-import bench with a clean probe cache and env."""
    monkeypatch.delenv("SPARK_GRAFT_LOCAL_DIR", raising=False)
    import bench

    importlib.reload(bench)
    assert bench._DISK_PROBE == {}
    return bench


def test_guard_healthy_disk_keeps_default_scratch(monkeypatch):
    bench = _fresh_bench(monkeypatch)
    monkeypatch.setattr(bench.time, "time", _ticks([0.0, 0.01]).__next__)
    out = bench._disk_guard()
    assert out["scratch"] == "disk"
    assert out["disk_mbps"] > 50
    assert "SPARK_GRAFT_LOCAL_DIR" not in os.environ
    # cached: a second call returns the same dict without re-probing
    assert bench._disk_guard() is out


def test_guard_broken_disk_fails_over_to_shm(monkeypatch):
    import tempfile

    bench = _fresh_bench(monkeypatch)
    # register the pre-test values with monkeypatch so the guard's
    # direct assignments are rolled back at teardown (the guard is
    # designed to mutate process-global temp state; tests must not
    # leak that to the rest of the suite)
    monkeypatch.setenv("TMPDIR", os.environ.get("TMPDIR", ""))
    monkeypatch.setattr(tempfile, "tempdir", tempfile.tempdir)
    monkeypatch.setattr(bench.time, "time", _ticks([0.0, 10.0]).__next__)
    out = bench._disk_guard()
    assert out["scratch"] == "shm-failover"
    assert out["disk_mbps"] < 50
    assert os.environ["SPARK_GRAFT_LOCAL_DIR"] == "/dev/shm/bench-scratch"
    # the synthetic-input temp dirs leave the broken device too
    assert out["tmpdir"] == "shm"
    assert os.environ["TMPDIR"] == "/dev/shm/bench-tmp"
    assert tempfile.gettempdir() == "/dev/shm/bench-tmp"
    # the session factory honors the env var in its conf dict
    from drought_t_spark import session as S

    src = open(S.__file__).read()
    assert "SPARK_GRAFT_LOCAL_DIR" in src and "spark.local.dir" in src


def test_guard_respects_env_pin(monkeypatch, tmp_path):
    bench = _fresh_bench(monkeypatch)
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", str(tmp_path))
    monkeypatch.setattr(bench.time, "time", _ticks([0.0, 10.0]).__next__)
    out = bench._disk_guard()
    assert out["scratch"] == "env"
    # a pinned env var is never overwritten, even on a broken disk
    assert os.environ["SPARK_GRAFT_LOCAL_DIR"] == str(tmp_path)


def _ticks(values):
    """Deterministic time.time() stand-in: yields the given instants,
    then advances by 1s forever (for any trailing calls)."""
    t = values[-1]
    for v in values:
        yield v
    while True:
        t += 1.0
        yield t

"""End-to-end `spark-submit --py-files` launch (the north rule's run
mode): package the engine zip, launch the rollup job in a fresh
spark-submit JVM against parquet written WITHOUT the test's session,
and verify the warehouse output + checkpoints from the driver side.
"""

import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pyspark

from drought_t_spark import synth

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_spark_submit_pyfiles_rollup(tmp_path):
    pdf = synth.sequences_pdf(n_sources=3, n_total=3000)
    in_dir = tmp_path / "seqs"
    in_dir.mkdir()
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   str(in_dir / "part-0.parquet"))

    from tools.make_pyfiles import build

    zip_path = build(str(tmp_path / "drought_t_spark.zip"))
    wh_dir = str(tmp_path / "wh")
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable,
           "PYSPARK_DRIVER_PYTHON": sys.executable}
    # PYTHONPATH deliberately NOT set to the repo: the job must import
    # the engine from the --py-files zip, like a real cluster executor
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--py-files", zip_path,
         os.path.join(REPO, "tools", "run_rollup_job.py"),
         "--input", str(in_dir), "--warehouse", wh_dir,
         "--job-id", "submitted", "--n-groups", "2", "--no-payloads"],
        capture_output=True, text=True, timeout=300, env=env, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-3000:]

    # verify from OUTSIDE Spark: token totals conserved at every tier,
    # checkpoints carry hash-bucket + stage tokens
    import duckdb

    con = duckdb.connect()
    raw_total = int(pdf["n_tok"].sum())
    for tier in ("hour", "day", "month"):
        got = con.sql(
            f"SELECT sum(n_tok_sum) FROM read_parquet('{wh_dir}/agg/tier_{tier}/**/*.parquet', hive_partitioning=true)"
        ).fetchone()[0]
        assert int(got) == raw_total, tier
    cps = {
        r[0]
        for r in con.sql(
            f"SELECT DISTINCT partition_id FROM read_parquet('{wh_dir}/ops/checkpoints/*.parquet')"
        ).fetchall()
    }
    assert {"2:0", "2:1", "day:all", "month:all"} <= cps


def test_spark_submit_pyfiles_drought_workflow(tmp_path):
    """The reference's full analysis workflow via the north-rule launch
    mode: rollup job commits the tiers, then the drought job consumes a
    TOML config, commits `drought.events_hour`, and exports the events
    CSV — both in fresh spark-submit JVMs importing only the zip."""
    pdf = synth.sequences_pdf(n_sources=3, n_total=3000)
    in_dir = tmp_path / "seqs"
    in_dir.mkdir()
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   str(in_dir / "part-0.parquet"))
    from tools.make_pyfiles import build

    zip_path = build(str(tmp_path / "drought_t_spark.zip"))
    wh_dir = str(tmp_path / "wh")
    cfg_toml = tmp_path / "analysis.toml"
    # few hour-buckets per source: fixed median threshold + narrow MA so
    # the small fixture yields events; strict keys verified by the job
    cfg_toml.write_text(
        'threshold_mode = "fixed"\nma_window = 5\nmin_duration = 1\n'
    )
    csv_out = str(tmp_path / "events.csv")
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable,
           "PYSPARK_DRIVER_PYTHON": sys.executable}
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--py-files", zip_path,
         os.path.join(REPO, "tools", "run_rollup_job.py"),
         "--input", str(in_dir), "--warehouse", wh_dir,
         "--job-id", "wf", "--n-groups", "2", "--no-payloads"],
        capture_output=True, text=True, timeout=300, env=env, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--py-files", zip_path,
         os.path.join(REPO, "tools", "run_drought_job.py"),
         "--warehouse", wh_dir, "--tier", "hour",
         "--config", str(cfg_toml), "--export-csv", csv_out],
        capture_output=True, text=True, timeout=300, env=env, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-3000:]

    import duckdb

    con = duckdb.connect()
    n_table = con.sql(
        f"SELECT count(*) FROM read_parquet('{wh_dir}/drought/events_hour/**/*.parquet', hive_partitioning=true)"
    ).fetchone()[0]
    assert n_table > 0
    n_csv, header = con.sql(
        f"SELECT count(*), any_value(source) FROM read_csv_auto('{csv_out}', header=true)"
    ).fetchone()
    assert n_csv == n_table
    with open(csv_out) as f:
        assert f.readline().startswith("source,event_id,onset,termination")

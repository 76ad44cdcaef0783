"""Engine vs reference single-node throughput (BASELINE.md row).

The reference method implementation is single-node pandas/NumPy —
`drought_t_spark.local_ref` reproduces it exactly (it is the per-site
parity oracle). This harness runs the SAME drought analysis (gap-fill →
MA → threshold → runs → IC pooling → exclusion) over an N-site, ~10-year
daily fixture two ways:

  * reference: sequential pandas loop over sites (how the reference
    processes a station archive);
  * engine: one Spark drought DAG over all sites.

Prints one JSON line with both wall times and events/sec. Usage:
    python tools/bench_vs_reference.py [n_sites]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drought_t_spark import local_ref, synth  # noqa: E402
from drought_t_spark.config import EngineConfig  # noqa: E402
from drought_t_spark.plans.drought import drought_events_for_tier, series_to_tier  # noqa: E402
from drought_t_spark.session import build_session  # noqa: E402

CFG = EngineConfig()  # fixture defaults: W=29, variable Q50, IC pooling, EX1


def main(n_sites: int = 64) -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    pdf = synth.series_pdf(n_sites=n_sites)
    n_rows = len(pdf)

    t0 = time.time()
    ref_events = 0
    for _, g in pdf.groupby("site"):
        ref_events += len(
            local_ref.run_site(g.rename(columns={"date": "bucket_start"}),
                               tier="day", cfg=CFG)
        )
    t_ref = time.time() - t0

    spark = build_session("vs-reference", master=f"local[{cpus}]",
                          shuffle_partitions=max(8, int(cpus)))
    # materialize the input once: re-serializing the driver-local pandas
    # frame per action is not the method's cost (a real run reads
    # parquet), and it dominated/varied at 512 sites
    tier = series_to_tier(spark.createDataFrame(pdf), ts_col="date").localCheckpoint(
        eager=True
    )
    # warm (JVM/worker startup is not the method's cost), then min-of-N
    # (host steal bursts hit the 32-thread engine far harder than the
    # single-thread pandas loop — consecutive identical engine runs
    # have measured 14.5 s and 41.9 s; see BENCH/BASELINE.md §1).
    # Cross-window protocol: run this tool several times across a
    # session and report the per-size min of each column.
    drought_events_for_tier(tier, "day", CFG).count()
    walls = []
    got = 0
    for _ in range(int(os.environ.get("SPARK_GRAFT_VSREF_ITERS", "3"))):
        t0 = time.time()
        got = drought_events_for_tier(tier, "day", CFG).count()
        walls.append(time.time() - t0)
    t_spark = min(walls)

    print(json.dumps({
        "n_sites": n_sites,
        "n_rows": n_rows,
        "reference_events": ref_events,
        "engine_events": got,
        "reference_sec": round(t_ref, 2),
        "engine_sec": round(t_spark, 2),
        "engine_speedup_x": round(t_ref / max(t_spark, 1e-9), 2),
        "cpus": int(cpus),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)

"""Window-pass audit + clean-window timing for `drought_events_full`
(VERDICT r4 watch item: driver rows drifted 2.7 → 3.2 s over two rounds
while the clean claim sat at 2.5 s).

Counts physical Window / Sort / Exchange operators in the executed plan
(via the final DataFrame's formatted explain) so the "do the same-keyed
windows fuse?" question is answered from the plan, not prose, then
times the query min-of-N in one process. One JSON line on stdout; the
full formatted plan goes to stderr for the PLANS.md addendum.

Usage:
    python tools/probe_drought_plan.py [iters]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main(iters: int) -> None:
    import __spark_entry__ as E
    from drought_t_spark.session import build_session

    spark = build_session("probe-drought", master=f"local[{CPUS}]",
                          shuffle_partitions=max(32, CPUS))
    q = E.queries()["drought_events_full"]

    walls = []
    for _ in range(iters):
        t0 = time.time()
        n = q(spark, SF_DIR).count()
        walls.append(round(time.time() - t0, 3))

    # plan audit on a fresh build (localCheckpoint inside the DAG eats
    # the upstream plan, so the final explain covers the post-checkpoint
    # pooling/finalize region; the pre-checkpoint region is audited in
    # PLANS.md §D from the smoothed-series sub-plan)
    df = q(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    print(plan, file=sys.stderr)
    ops = {
        "window": len(re.findall(r"\bWindow\b", plan)),
        "sort": len(re.findall(r"\bSort\b", plan)),
        "exchange": len(re.findall(r"\bExchange\b", plan)),
    }
    print(json.dumps({
        "sf_dir": SF_DIR, "cpus": CPUS, "rows": n,
        "walls": walls, "min_wall": min(walls),
        "final_plan_ops": ops,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)

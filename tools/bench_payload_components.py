"""Decompose the north-rule payload encode at one parallelism level.

Three timings over the SAME pre-generated t0 table (min-of-iters each):
  full   — the real payload job: repartition(group) + sortWithinPartitions
           + TSZ1 mapInArrow kernel (what `bench.py --scaling` times)
  plumb  — identical repartition + sort + Arrow boundary, but the kernel
           only counts rows/bytes: everything EXCEPT the codec, i.e. the
           shuffle/sort/serialization wrapper in isolation
  kernel ≈ full − plumb (the codec's own N→4N scaling is measured
           separately by `bench.py --scaling-codec` at 0.92)

Run at 2 and 8 cores, with and without SPARK_GRAFT_LOCAL_DIR=/dev/shm/...,
to attribute the payload job's scaling shortfall: if `plumb` stops
scaling on disk scratch but scales on tmpfs, the bottleneck is the
sandbox's single shared virtio disk — a per-node resource on any real
cluster — not the job's shape.

Usage: python tools/bench_payload_components.py CORES T0_DIR [ITERS]
Prints one JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _plumb_kernel(batches):
    import pyarrow as pa

    for rb in batches:
        toks = rb.column(2)  # positional: source, bs_epoch, chunk_id dropped below
        nbytes = sum(b.size for b in toks.buffers() if b is not None)
        yield pa.RecordBatch.from_pydict({"n": [rb.num_rows], "nbytes": [nbytes]})


def main() -> None:
    cores, t0_dir = int(sys.argv[1]), sys.argv[2]
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import functions as F

    from drought_t_spark.operators.rollup import pack_payloads, with_event_time
    from drought_t_spark.session import build_session

    spark = build_session(
        f"payload-components-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(8, cores),
    )
    t1 = with_event_time(spark.read.parquet(t0_dir))

    def run_full() -> float:
        t0 = time.monotonic()
        pack_payloads(t1.select("source", "ts", "seq", "tokens", "n_tok"), "hour") \
            .agg(F.sum("payload_n_tokens")).collect()
        return time.monotonic() - t0

    # identical movement to pack_payloads: same keys, same sort, same
    # Arrow boundary — only the kernel body differs
    base = (
        t1.select(
            "source",
            F.date_trunc("hour", "ts").cast("long").alias("bs_epoch"),
            F.lit(0).cast("int").alias("chunk_id"),
            "tokens", "n_tok", "seq",
        )
    )
    parts = base.repartition("source", "bs_epoch", "chunk_id").sortWithinPartitions(
        "source", "bs_epoch", "chunk_id", "seq"
    ).select("source", "bs_epoch", "tokens")  # drop the untouched cols LAST
    plumb_df = parts.mapInArrow(_plumb_kernel, "n long, nbytes long")

    def run_plumb() -> float:
        t0 = time.monotonic()
        plumb_df.agg(F.sum("n"), F.sum("nbytes")).collect()
        return time.monotonic() - t0

    # shuffle-only: same exchange + Arrow boundary, NO JVM sort — the
    # delta vs `plumb` prices the sortWithinPartitions operator alone
    nosort_df = base.repartition("source", "bs_epoch", "chunk_id").select(
        "source", "bs_epoch", "tokens"
    ).mapInArrow(_plumb_kernel, "n long, nbytes long")

    def run_nosort() -> float:
        t0 = time.monotonic()
        nosort_df.agg(F.sum("n"), F.sum("nbytes")).collect()
        return time.monotonic() - t0

    full = [run_full() for _ in range(iters)]
    plumb = [run_plumb() for _ in range(iters)]
    nosort = [run_nosort() for _ in range(iters)]
    out = {
        "cores": cores,
        "local_dir": os.environ.get("SPARK_GRAFT_LOCAL_DIR", "<default /tmp disk>"),
        "sec_full": round(min(full), 3),
        "sec_plumb": round(min(plumb), 3),
        "sec_shuffle_only": round(min(nosort), 3),
        "sec_sort_est": round(min(plumb) - min(nosort), 3),
        "sec_kernel_est": round(min(full) - min(plumb), 3),
        "full_samples": [round(s, 3) for s in full],
        "plumb_samples": [round(s, 3) for s in plumb],
        "nosort_samples": [round(s, 3) for s in nosort],
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

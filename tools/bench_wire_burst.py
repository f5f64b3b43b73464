"""Wire-budget stress at 10k-rate (VERDICT r2 #10): stream PRE-DECODED
packed-coefficient batches host→device back-to-back (transfer + device
IDCT/resize/CMN only — host entropy decode excluded) and report the
achieved img/s. This converts the north-star extrapolation ("the wire and
device stages have headroom at 10k img/s") into a measurement.

Method: run the bench pipeline's host phase ONCE to produce a staged wire
batch, then dispatch the device phase on it N times in a row. Each dispatch
re-issues the chunked device_puts (the real wire traffic, ~13 MB/batch of
sparse coefficients) and the jitted IDCT program. The reported figure is
host-wall over the dispatch loop + final output sync — on the dev tunnel
the first ~400 MB ride burst credits at ~1 GB/s, after which the sustained
~65-95 MB/s applies; run sizes below/above that boundary show both regimes.

Usage: python tools/bench_wire_burst.py [--batches 16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=16)
    args = ap.parse_args()

    import bench

    bench.ensure_dataset()
    pipe = bench.build_pipeline()
    pipe.build()
    # warm: compile the device program + fill canvases/ring
    for _ in range(3):
        out = pipe.run()
        out[0].as_tensor().block_until_ready()
    ex = pipe._executor

    # one staged wire batch straight from the host phase
    staged = ex._host_phase(iteration=1000)
    wire_bytes = 0
    for arr in staged["padded"]:
        parts = arr if isinstance(arr, tuple) else (arr,)
        for p in parts:
            wire_bytes += getattr(p, "nbytes", 0)
    print(f"wire: {wire_bytes / 2**20:.1f} MiB/batch "
          f"({wire_bytes / bench.BATCH / 1024:.1f} KiB/img)")

    # burst: dispatch the device phase back-to-back on the same staged batch
    n = args.batches
    t0 = time.perf_counter()
    last = None
    for i in range(n):
        staged["iteration"] = 1000 + i
        last = ex._device_phase(staged)
    last[0].as_tensor().block_until_ready()
    wall = time.perf_counter() - t0
    imgs = n * bench.BATCH
    print(f"{imgs} images ({n} batches, {wire_bytes * n / 2**20:.0f} MiB wire) "
          f"in {wall:.2f}s host-wall = {imgs / wall:.0f} img/s "
          f"(host decode excluded)")
    print(f"effective wire rate: {wire_bytes * n / wall / 2**20:.0f} MiB/s")


if __name__ == "__main__":
    main()

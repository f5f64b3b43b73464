"""Itemize host time of the headline image benchmark.

Runs the bench.py RN50 pipeline for a measurement window and prints a per-item
µs/img attribution table from executor_statistics()["host_breakdown_seconds"]
(VERDICT r2 #1: account for >=95% of host time).

Usage: python tools/profile_host.py [--iters 16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--data-dir", default=None,
                    help="alternate corpus (e.g. the realstat lane's)")
    args = ap.parse_args()

    import bench
    from dali_tpu import _prof, native

    if args.data_dir in (None, bench.DATA_DIR):
        bench.ensure_dataset()
    elif args.data_dir == bench.REALSTAT_DIR:
        bench.ensure_dataset_realstat()
    pipe = bench.build_pipeline(args.data_dir or bench.DATA_DIR)
    pipe.build()
    for _ in range(bench.WARMUP):
        out = pipe.run()
        out[0].as_tensor().block_until_ready()

    _prof.reset()
    native.decode_stats(reset=True)
    ex = pipe._executor
    stats0 = {k: v for k, v in ex._stats.items()}
    t0 = time.perf_counter()
    times = []
    for _ in range(args.iters):
        t1 = time.perf_counter()
        out = pipe.run()
        out[0].as_tensor().block_until_ready()
        times.append(time.perf_counter() - t1)
    wall = time.perf_counter() - t0
    n_img = args.iters * bench.BATCH

    bd = _prof.snapshot()
    stats = ex.statistics()
    host_total = stats["host_phase_seconds"] - stats0["host_phase_seconds"]
    host_stall = stats["host_stall_seconds"] - stats0["host_stall_seconds"]

    print(f"\n{n_img} images in {wall:.2f}s wall = "
          f"{n_img / wall:.0f} img/s (median batch {np.median(times)*1e3:.0f} ms)")
    print(f"host phase busy {host_total:.2f}s ({host_total/wall*100:.0f}% of wall), "
          f"stall {host_stall:.2f}s")
    print(f"\n{'section':<32}{'total s':>9}{'us/img':>9}{'% host':>8}")
    accounted = 0.0
    decode_sub = 0.0
    for name in sorted(bd, key=lambda k: -bd[k]):
        if name.endswith("#cpu"):
            continue  # thread-cpu twins printed in the native table below
        sec = bd[name]
        if name.startswith("host.decode."):
            decode_sub += sec
        if name in ("host.ops_total",):
            continue  # container; printed below
        accounted += sec
        print(f"{name:<32}{sec:>9.3f}{sec / n_img * 1e6:>9.1f}"
              f"{sec / host_total * 100 if host_total else 0:>8.1f}")
    ops_other = bd.get("host.ops_total", 0.0) - decode_sub
    accounted += ops_other
    print(f"{'host.ops_other (reader/rng/py)':<32}{ops_other:>9.3f}"
          f"{ops_other / n_img * 1e6:>9.1f}"
          f"{ops_other / host_total * 100 if host_total else 0:>8.1f}")
    resid = host_total - accounted
    print(f"{'host.unattributed':<32}{resid:>9.3f}{resid / n_img * 1e6:>9.1f}"
          f"{resid / host_total * 100 if host_total else 0:>8.1f}")
    print(f"{'host TOTAL':<32}{host_total:>9.3f}{host_total / n_img * 1e6:>9.1f}{100.0:>8.1f}")

    # -- inside the native decode call (VERDICT r4 #1) ----------------------
    ent_wall = bd.get("host.decode.entropy", 0.0)
    ent_cpu = bd.get("host.decode.entropy#cpu", 0.0)
    ds = native.decode_stats()
    if ds:
        b, h = ds["batch"], ds["huff"]
        print(f"\nentropy section: wall {ent_wall / n_img * 1e6:.1f} us/img, "
              f"this-thread cpu {ent_cpu / n_img * 1e6:.1f} us/img "
              f"(wall-cpu = {max(ent_wall - ent_cpu, 0) / n_img * 1e6:.1f} "
              f"us/img stolen by other stage threads / scheduler)")
        print(f"{'native item':<32}{'us/img':>9}")
        for label, ns in (
            ("decode fast path (pack)", b["ns_fast"]),
            ("  parse (hdr+tables)", h["ns_parse"]),
            ("  unstuff", h["ns_unstuff"]),
            ("  entropy scan (-unstuff)", h["ns_scan"] - h["ns_unstuff"]),
            ("  row compact", h["ns_rowcompact"]),
            ("fallback decodes", b["ns_fallback"]),
            ("serial stream compaction", b["ns_compact"]),
            ("batch call total", b["ns_batch"]),
        ):
            print(f"{label:<32}{ns / 1e3 / max(n_img, 1):>9.1f}")
        print(f"fast/fallback samples: {b['n_fast']}/{b['n_fallback']}; "
              f"tbl cache hits/misses: {h['tbl_hits']}/{h['tbl_misses']}")


if __name__ == "__main__":
    main()

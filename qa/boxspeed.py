"""Shared box-speed yardstick measurement (qa/yardstick.cc).

ONE implementation of the measurement protocol (build flags, exe cache,
rep count, which clock's number is read), imported by both qa/perf_gate.py
(which normalizes gate checks with it) and bench.py (which attaches it to
the headline line as context) — if the protocol ever changes, both see the
same change, so the recorded context can never diverge from the factor the
gate actually applies.
"""

import json
import os
import subprocess
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))


def chase_ns():
    """Build (cached on mtime) and run the frozen dependent-load chase;
    min of 3 invocations of its best-of-9 thread-CPU ns/step. Returns None
    when the yardstick cannot build or run (no compiler)."""
    src = os.path.join(HERE, "yardstick.cc")
    exe = os.path.join(tempfile.gettempdir(), "dali_tpu_yardstick")
    try:
        if (not os.path.exists(exe)
                or os.path.getmtime(exe) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-std=c++17", src, "-o", exe],
                check=True, capture_output=True, timeout=120)
        # min of 3 invocations: the in-process best-of-9 still sees rare
        # timeslice collisions; cross-invocation min removes them while the
        # sustained throttle we want to measure survives (it moves every rep)
        return min(
            json.loads(subprocess.run([exe], capture_output=True, text=True,
                                      timeout=60, check=True).stdout)
            ["chase_ns_cpu"]
            for _ in range(3))
    except Exception:  # noqa: BLE001 — any failure means "no yardstick"
        return None

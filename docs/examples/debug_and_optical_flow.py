"""Debug mode (eager per-op execution) + optical flow on a frame sequence.

Two reference notebook analogues in one runnable script:

* `docs/examples/general/debug_mode.ipynb` — ``pipeline_def(debug=True)``
  executes the device stage eagerly so user ``print`` and breakpoints work
  per op (reference `_debug_mode.py:37`).
* `docs/examples/sequence_processing/optical_flow/` — ``fn.optical_flow``
  on an FHWC sequence; the reference uses NVIDIA's hardware OF engine,
  here it is a host Farneback estimate (accepted adaptation,
  docs/compatibility.md).

Run:
    python docs/examples/debug_and_optical_flow.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import dali_tpu.fn as fn
import dali_tpu.types as types
from dali_tpu import pipeline_def


def debug_mode_demo():
    rng = np.random.default_rng(2)
    samples = [rng.integers(0, 256, (32, 32, 3), np.uint8) for _ in range(2)]
    seen = []

    def spy(img):
        # an arbitrary host probe inside the graph — debug mode runs eagerly,
        # so this executes inline during p.run() with real values
        seen.append(float(img.mean()))
        return img

    @pipeline_def(batch_size=2, num_threads=1, seed=9, debug=True)
    def dbg():
        x = fn.external_source(source=lambda: samples, batch=True, cycle=True,
                               layout="HWC")
        x = fn.python_function(x, function=spy)
        x = fn.resize(x, resize_x=16, resize_y=16)
        return fn.crop_mirror_normalize(x, dtype=types.FLOAT,
                                        output_layout="CHW",
                                        mean=[128.0] * 3, std=[64.0] * 3)

    p = dbg()
    p.build()
    (out,) = p.run()
    assert len(seen) == 2 and np.asarray(out.at(0)).shape == (3, 16, 16)
    print(f"debug mode: eager execution, probe saw per-sample means "
          f"{[round(v, 1) for v in seen]}")


def optical_flow_demo():
    import cv2

    rng = np.random.default_rng(4)
    base = cv2.GaussianBlur(rng.integers(0, 255, (64, 64), np.uint8), (0, 0), 2)
    f0 = np.repeat(base[:, :, None], 3, 2)
    frames = [f0]
    for shift in (2, 4, 6):  # constant rightward motion, 2 px per step
        frames.append(np.roll(f0, shift, axis=1))
    seq = np.stack(frames)  # [F, H, W, C]

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def flow_pipe():
        x = fn.external_source(source=lambda: [seq], batch=True, cycle=True,
                               layout="FHWC")
        return fn.optical_flow(x, output_grid=1)

    p = flow_pipe()
    p.build()
    (flow,) = p.run()
    fl = np.asarray(flow.at(0))  # [F-1, H, W, 2]
    assert fl.shape == (3, 64, 64, 2)
    med_dx = [float(np.median(fl[k][16:48, 16:48, 0])) for k in range(3)]
    assert all(abs(d - 2.0) < 1.0 for d in med_dx), med_dx
    print(f"optical flow: {fl.shape}, median horizontal flow per step "
          f"{[round(d, 2) for d in med_dx]} (true motion: 2 px)")


def main():
    debug_mode_demo()
    optical_flow_demo()


if __name__ == "__main__":
    main()

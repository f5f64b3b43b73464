"""Sweep: device-op output shapes agree with the cpu path, and host-side
shape inference never silently collapses (round-3 regression class: ops
without host_output_shapes starved downstream canvas math, and a device
Rotate after them emitted 0x0 canvases — auto_aug rotations came out black).

Two invariants over every 1-input cpu+gpu op the generic harness can drive:

1. per-sample output shapes on gpu (host-propagated or device-derived)
   equal the cpu path's output shapes on identical inputs;
2. chaining the op into Rotate(keep_size=True) on device either works with
   non-empty output of the op's spatial extents, or raises the explicit
   "needs host-known input shapes" error — never an empty canvas.
"""

import numpy as np
import pytest

from dali_tpu import fn, pipeline_def
from dali_tpu._schema import _registry

# Schema name -> reason (same contract as the ndd sweep: honest reasons).
EXCLUDE = {
    "CoordFlip": "expects coordinate [n, ndim] float input, not images",
    "BbFlip": "expects normalized bbox [n, 4] input",
    "OpticalFlow": "requires a sequence pair (F dim)",
    "DumpImage": "writes files as a side effect",
    "io.file.Read": "input is a filename batch, not tensors",
    "ElementExtract": "requires sequence layout with element_map",
    "PerFrame": "requires F-dim sequence input",
    "SequenceRearrange": "requires new_order and F-dim input",
    "LookupTable": "needs keys/values tables to be meaningful",
    "PeekImageShape": "input must be an ENCODED image byte stream",
    "experimental.Inflate": "input must be a compressed byte stream",
    "experimental.Debayer": "input must be a single-channel Bayer mosaic",
    "MelFilterBank": "expects a spectrogram [freq, t] input",
    "MFCC": "expects a mel-spectrogram input",
    "NonsilentRegion": "audio input; 1-D chain has its own tests",
    "PreemphasisFilter": "audio input; 1-D chain has its own tests",
    "Spectrogram": "audio input; 1-D chain has its own tests",
    "ToDecibels": "audio input; 1-D chain has its own tests",
    "AudioResample": "audio input; 1-D chain has its own tests",
    "experimental.AudioResample": "audio input; 1-D chain has its own tests",
    "PowerSpectrum": "audio input; 1-D chain has its own tests",
}


def _sweep_ops():
    out = []
    for name, schema in sorted(_registry.items()):
        if schema.is_internal or schema.is_reader:
            continue
        if schema.min_inputs != 1:
            continue
        if not ("cpu" in schema.devices and "gpu" in schema.devices):
            continue
        if any(a.required for a in schema.args.values()):
            continue
        out.append(name)
    return out


def _run(name, samples, device, seed=77):
    from dali_tpu import _op_call

    @pipeline_def(batch_size=len(samples), num_threads=1, seed=seed)
    def pipe():
        x = fn.external_source(source=lambda: samples, batch=True, cycle=True,
                               layout="HWC")
        if device == "gpu":
            x = x.gpu()
        kw = {"seed": seed} if "seed" in _registry[name].args else {}
        out = _op_call(name, device=device, inputs=(x,), **kw)
        return out[0] if isinstance(out, (tuple, list)) else out

    p = pipe()
    p.build()
    (out,) = p.run()
    return [tuple(np.asarray(out.at(i)).shape) for i in range(len(samples))]


def test_gpu_shapes_match_cpu_sweep():
    rng = np.random.default_rng(31)
    # RAGGED batch: shape inference must be per-sample, not canvas-wide
    samples = [rng.integers(0, 256, (24 + 8 * i, 28, 3), np.uint8)
               for i in range(2)]

    tested, harness_skips, failures = [], [], []
    for name in _sweep_ops():
        if name in EXCLUDE:
            continue
        try:
            cpu_shapes = _run(name, samples, "cpu")
        except Exception:
            harness_skips.append(name)  # generic input unsuited; not a bug
            continue
        try:
            gpu_shapes = _run(name, samples, "gpu")
        except NotImplementedError:
            harness_skips.append(name)  # e.g. ragged-gpu unsupported: explicit
            continue
        except Exception as e:
            failures.append((name, f"gpu raised: {e}"))
            continue
        if gpu_shapes != cpu_shapes:
            failures.append((name, f"cpu {cpu_shapes} vs gpu {gpu_shapes}"))
        else:
            tested.append(name)
    assert not failures, failures
    assert len(tested) >= 25, (len(tested), harness_skips)


def test_no_silent_empty_canvas_after_device_ops():
    """Every shape-preserving-ish device op chained into Rotate(keep_size)
    must produce a non-empty rotated output or raise the explicit shapes
    error — the silent 0x0-canvas failure mode must stay dead."""
    rng = np.random.default_rng(5)
    samples = [rng.integers(50, 200, (32, 32, 3), np.uint8) for _ in range(2)]
    from dali_tpu import _op_call

    checked, skipped = [], []
    for name in _sweep_ops():
        if name in EXCLUDE:
            continue

        @pipeline_def(batch_size=2, num_threads=1, seed=3)
        def pipe():
            x = fn.external_source(source=lambda: samples, batch=True,
                                   cycle=True, layout="HWC").gpu()
            kw = {"seed": 3} if "seed" in _registry[name].args else {}
            y = _op_call(name, device="gpu", inputs=(x,), **kw)
            y = y[0] if isinstance(y, (tuple, list)) else y
            return fn.rotate(y, angle=20.0, keep_size=True, fill_value=0.0)

        try:
            p = pipe()
            p.build()
            (out,) = p.run()
        except RuntimeError as e:
            assert "host-known input shapes" in str(e), (name, e)
            skipped.append(name)  # explicit contract: acceptable
            continue
        except Exception:
            skipped.append(name)  # op rejects the harness input: fine
            continue
        s0 = np.asarray(out.at(0))
        assert s0.size > 0, f"{name}: empty canvas out of rotate"
        checked.append(name)
    assert len(checked) >= 20, (len(checked), skipped)

"""Ragged-batch VALUE parity sweep: gpu output values match the cpu path.

The padded-canvas executor design has one systematic failure class: a device
lowering that reads or writes CANVAS geometry (padding rows, canvas centers,
canvas borders) instead of per-sample logical extents. The shape-inference
sweep catches extent mistakes; this sweep catches the VALUE half — every
deterministic 1-input cpu+gpu op runs on a ragged batch and each sample's
values must match the cpu implementation (which never sees a canvas).

Reference analogue: the test_dali_cpu_only / operator_1|2 value comparisons
over RandomlyShapedDataIterator inputs (dali/test/python/test_utils.py
check_batch).
"""

import numpy as np
import pytest

from dali_tpu import fn, pipeline_def
from dali_tpu._schema import _registry

from .test_shape_inference_sweep import EXCLUDE as SHAPE_EXCLUDE

# name -> reason (stochastic ops can't be value-compared across devices when
# the generators differ; documented-divergence ops carry their own gates)
VALUE_EXCLUDE = {
    "JpegCompressionDistortion": "libjpeg vs DCT-domain simulation; dedicated "
                                 "mean-error gate in test_straggler_gpu.py",
    "experimental.Debayer": "input must be a Bayer mosaic",
    "Debayer": "input must be a Bayer mosaic",
    "experimental.Remap": "needs map inputs",
    "OneHot": "integer-class input assumed; generic image input is UB",
}

# CLAHE quantizes a float32 luma into histogram bins; a pixel whose luma
# lands EXACTLY on a rounding tie (e.g. 161.5) can flip bins between the
# fma-contracted XLA path and the C++ path, jumping the LUT by a few levels.
# Bounded as: ≤0.5% of pixels may exceed atol=1 (everything else exact-ish).
KNIFE_EDGE = {"Clahe": (1.0, 0.005), "experimental.Clahe": (1.0, 0.005)}

# ops whose float rounding may differ by 1 LSB between numpy/cv2 and XLA
ATOL1 = {
    "GaussianBlur", "Laplacian", "MedianBlur", "experimental.MedianBlur",
    "Sphere", "Water", "Resize", "experimental.Resize", "TensorResize",
    "experimental.TensorResize", "RandomResizedCrop", "FastResizeCropMirror",
    "ResizeCropMirror", "Rotate", "WarpAffine", "experimental.WarpPerspective",
    "Hsv", "Hue", "Saturation", "BrightnessContrast", "Brightness", "Contrast",
    "ColorTwist", "ColorSpaceConversion", "Equalize", "experimental.Equalize",
    "CLAHE", "OldColorTwist", "experimental.Filter", "Filter",
    "GrayScale", "Erode", "Dilate", "GridMask", "Normalize",
    "CropMirrorNormalize", "experimental.ColorSpaceConversion",
    "PreemphasisFilter", "Preemphasis",
}


def _ops():
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
        if not schema.is_stateless:
            continue  # RNG ops: cross-device streams differ by design
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
        out = _op_call(name, device=device, inputs=(x,))
        return out[0] if isinstance(out, (tuple, list)) else out

    p = pipe()
    p.build()
    (out,) = p.run()
    return [np.asarray(out.at(i)) for i in range(len(samples))]


@pytest.mark.parametrize("variant", ["u8c3", "f32c1"])
def test_ragged_value_parity_sweep(variant):
    rng = np.random.default_rng(17)
    if variant == "u8c3":
        samples = [rng.integers(0, 256, (26 + 7 * i, 30 - 4 * i, 3), np.uint8)
                   for i in range(3)]
    else:
        # float32 single-channel: catches uint8/C=3 assumptions in lowerings
        samples = [rng.uniform(0, 255, (26 + 7 * i, 30 - 4 * i, 1)).astype(np.float32)
                   for i in range(3)]

    tested, skipped, failures = [], [], []
    for name in _ops():
        if name in SHAPE_EXCLUDE or name in VALUE_EXCLUDE:
            continue
        try:
            cpu = _run(name, samples, "cpu")
        except Exception:
            skipped.append(name)  # generic image input unsuited: not a bug
            continue
        try:
            gpu = _run(name, samples, "gpu")
        except NotImplementedError:
            skipped.append(name)  # explicit unsupported contract
            continue
        except Exception as e:
            failures.append((name, f"gpu raised: {type(e).__name__}: {e}"))
            continue
        atol = 1.0 if name in ATOL1 else 0.0
        max_frac = 0.0
        if name in KNIFE_EDGE:
            atol, max_frac = KNIFE_EDGE[name]
        for i in range(len(samples)):
            if cpu[i].shape != gpu[i].shape:
                failures.append((name, f"s{i} shape {cpu[i].shape} vs {gpu[i].shape}"))
                break
            a = cpu[i].astype(np.float64)
            b = gpu[i].astype(np.float64)
            d = np.abs(a - b).max() if a.size else 0.0
            if d > atol + 1e-6:
                frac = float((np.abs(a - b) > atol).mean())
                if frac <= max_frac:
                    continue  # bounded knife-edge ties (see KNIFE_EDGE)
                failures.append((name, f"s{i} maxdiff {d} (>{atol}), frac {frac:.3f}"))
                break
        else:
            tested.append(name)
    assert not failures, failures
    # breadth floor: the sweep must actually exercise a wide op set
    floor = 30 if variant == "u8c3" else 15
    assert len(tested) >= floor, (len(tested), sorted(skipped))

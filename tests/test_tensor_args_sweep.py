"""Per-sample TENSOR-valued arguments: cpu/gpu value parity sweep.

Reference semantics (``OpSpec::AddArgumentInput``, tensor args listed per
schema in ``*_schema.cc``): any ``tensor_ok`` argument may be a cpu DataNode
holding one value per sample. This sweep drives every major deterministic op
family with per-sample tensor args that DIFFER across the batch and asserts
the gpu lowering matches the cpu path per sample — the classic failure modes
are (a) broadcasting sample 0's value across the batch and (b) ignoring the
tensor form entirely in the jitted program.
"""

import numpy as np
import pytest

from dali_tpu import fn, pipeline_def, types

N = 4


def _imgs(n=N, seed=0, uniform=False):
    rng = np.random.default_rng(seed)
    if uniform:  # shapes-free device batches take a DIFFERENT code branch
        return [rng.integers(0, 256, (40, 48, 3), np.uint8) for _ in range(n)]
    # ragged: tensor-arg handling must be per-sample, not canvas-global
    return [rng.integers(0, 256, (40 + 6 * i, 48 - 4 * i, 3), np.uint8)
            for i in range(n)]


def _scalars(vals, dtype=np.float32):
    return [np.array(v, dtype) for v in vals]


# op key -> (fn callable name, {argname: per-sample list}, comparison)
# comparison: "exact" (integers / mirror-type ops) or an atol for float paths
CASES = {
    "brightness": ("brightness",
                   {"brightness": _scalars([0.6, 0.9, 1.1, 1.4])}, 1),
    "contrast": ("contrast",
                 {"contrast": _scalars([0.5, 0.8, 1.2, 1.6])}, 1),
    "brightness_contrast": ("brightness_contrast",
                            {"brightness": _scalars([0.7, 1.0, 1.2, 0.9]),
                             "contrast": _scalars([1.3, 0.6, 1.0, 0.8])}, 1),
    "hue": ("hue", {"hue": _scalars([0.0, 45.0, -30.0, 120.0])}, 1),
    "saturation": ("saturation",
                   {"saturation": _scalars([0.0, 0.5, 1.0, 1.5])}, 1),
    "hsv": ("hsv", {"hue": _scalars([10.0, -20.0, 0.0, 90.0]),
                    "saturation": _scalars([1.2, 0.8, 1.0, 0.5]),
                    "value": _scalars([0.9, 1.1, 1.0, 1.3])}, 1),
    "color_twist": ("color_twist",
                    {"hue": _scalars([15.0, 0.0, -40.0, 60.0]),
                     "brightness": _scalars([1.1, 0.9, 1.0, 1.2])}, 1),
    "flip": ("flip", {"horizontal": _scalars([1, 0, 1, 0], np.int32),
                      "vertical": _scalars([0, 1, 1, 0], np.int32)}, "exact"),
    "rotate": ("rotate", {"angle": _scalars([0.0, 90.0, 180.0, 270.0])},
               "exact"),  # axis-aligned angles: both paths are exact permutes
    "warp_affine": ("warp_affine",
                    {"matrix": [np.array([1, 0, 2 * i, 0, 1, 3 * i],
                                         np.float32) for i in range(N)]},
                    1),
    "gaussian_blur": ("gaussian_blur",
                      {"sigma": _scalars([0.8, 1.2, 1.7, 2.3])}, 1),
    "crop_mirror_normalize": ("crop_mirror_normalize",
                              {"mirror": _scalars([1, 0, 0, 1], np.int32)},
                              1e-3),
    "crop": ("crop", {"crop_h": _scalars([16.0, 20.0, 24.0, 18.0]),
                      "crop_w": _scalars([20.0, 16.0, 22.0, 14.0]),
                      "crop_pos_x": _scalars([0.0, 0.5, 1.0, 0.25]),
                      "crop_pos_y": _scalars([1.0, 0.0, 0.5, 0.75])},
             "exact"),
    "resize": ("resize", {"resize_x": _scalars([24.0, 32.0, 20.0, 28.0]),
                          "resize_y": _scalars([20.0, 24.0, 32.0, 16.0])},
               1),
    "erase": ("erase", {"anchor": [np.array([4.0 + i, 6.0], np.float32)
                                   for i in range(N)],
                        "shape": [np.array([8.0, 10.0 + i], np.float32)
                                  for i in range(N)]}, "exact"),
    "slice": ("slice", {"rel_start": [np.array([0.1 * i, 0.05 * i],
                                               np.float32) for i in range(N)],
                        "rel_shape": [np.array([0.5, 0.6], np.float32)
                                      for _ in range(N)]}, "exact"),
    "paste": ("paste", {"ratio": _scalars([1.2, 1.5, 2.0, 1.1]),
                        "paste_x": _scalars([0.0, 0.5, 1.0, 0.3]),
                        "paste_y": _scalars([1.0, 0.0, 0.2, 0.7])},
              "exact"),
    "grid_mask": ("grid_mask", {"tile": _scalars([20, 30, 25, 40], np.int32),
                                "ratio": _scalars([0.3, 0.5, 0.4, 0.6]),
                                "angle": _scalars([0.0, 0.0, 0.0, 0.0])},
                  "exact"),
    "water": ("water", {"mask": _scalars([1, 0, 1, 0], np.int32)}, 1),
    "sphere": ("sphere", {"mask": _scalars([0, 1, 0, 1], np.int32)}, 1),
    # cpu = real libjpeg round trip, gpu = DCT-domain simulation — documented
    # structural (not bitwise) agreement; the dedicated tolerance test gates
    # mean error, so this sweep does too (per-sample quality is additionally
    # guarded by the differ-from-broadcast check below).
    "jpeg_compression_distortion": ("jpeg_compression_distortion",
                                    {"quality": _scalars([10, 50, 80, 95],
                                                         np.int32)}, "mean:12"),
}


def _run(case_key, device, extra_kwargs, uniform=False):
    fn_name, targs, _ = CASES[case_key]
    samples = _imgs(uniform=uniform)
    op = getattr(fn, fn_name)

    @pipeline_def(batch_size=N, num_threads=1, seed=11)
    def pipe():
        x = fn.external_source(source=lambda: samples, batch=True, cycle=True,
                               layout="HWC")
        kw = {k: fn.external_source(source=lambda v=v: v, batch=True,
                                    cycle=True)
              for k, v in targs.items()}
        kw.update(extra_kwargs)
        if device == "gpu":
            x = x.gpu()
        return op(x, **kw)

    p = pipe()
    p.build()
    (out,) = p.run()
    return [np.asarray(out.at(i)) for i in range(N)]


EXTRA = {
    "crop_mirror_normalize": {"dtype": types.FLOAT, "output_layout": "HWC",
                              "mean": [128.0] * 3, "std": [64.0] * 3},
    "rotate": {"keep_size": True, "interp_type": types.INTERP_NN,
               "fill_value": 0.0},
    "warp_affine": {"interp_type": types.INTERP_NN, "fill_value": 0.0},
    "paste": {"fill_value": [0, 0, 0]},
    "resize": {"interp_type": types.INTERP_LINEAR},
}


@pytest.mark.parametrize("uniform", [False, True])
@pytest.mark.parametrize("case", sorted(CASES))
def test_tensor_arg_cpu_gpu_parity(case, uniform):
    extra = EXTRA.get(case, {})
    cpu = _run(case, "cpu", extra, uniform=uniform)
    gpu = _run(case, "gpu", extra, uniform=uniform)
    _, targs, cmp = CASES[case]
    for i in range(N):
        assert cpu[i].shape == gpu[i].shape, (
            f"{case}[{i}]: cpu {cpu[i].shape} vs gpu {gpu[i].shape}")
        if cmp == "exact":
            np.testing.assert_array_equal(cpu[i], gpu[i],
                                          err_msg=f"{case} sample {i}")
        elif isinstance(cmp, str) and cmp.startswith("mean:"):
            m = np.abs(cpu[i].astype(np.float64)
                       - gpu[i].astype(np.float64)).mean()
            assert m < float(cmp.split(":")[1]), f"{case} sample {i}: mean {m}"
        else:
            a = cpu[i].astype(np.float32)
            b = gpu[i].astype(np.float32)
            np.testing.assert_allclose(a, b, atol=float(cmp), rtol=0,
                                       err_msg=f"{case} sample {i}")


@pytest.mark.parametrize("case", ["brightness", "flip", "rotate",
                                  "jpeg_compression_distortion",
                                  "gaussian_blur", "crop"])
def test_tensor_arg_values_actually_differ(case):
    """Guard the guard: with per-sample args, sample outputs must DIFFER from
    a broadcast of sample 0's arg (catches silently using only arg[0])."""
    extra = EXTRA.get(case, {})
    gpu = _run(case, "gpu", extra)
    fn_name, targs, _ = CASES[case]
    k0 = sorted(targs)[0]
    broadcast = {k: [v[0]] * N for k, v in targs.items()}
    orig = CASES[case]
    CASES[case] = (fn_name, broadcast, orig[2])
    try:
        bcast = _run(case, "gpu", extra)
    finally:
        CASES[case] = orig
    assert any(g.shape != b.shape or not np.array_equal(g, b)
               for g, b in zip(gpu[1:], bcast[1:])), (
        f"{case}: outputs identical to broadcast of {k0}[0] — tensor arg "
        f"ignored per-sample")

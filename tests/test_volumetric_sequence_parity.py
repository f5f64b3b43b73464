"""Volumetric (DHWC) and sequence (FHWC) ragged value parity, cpu vs gpu.

The fold-frames and volumetric device paths share the padded-canvas exposure
the 2-D sweeps cover: per-frame/per-slice geometry must come from per-sample
extents, not the canvas. Reference: warp.h/resize SupportVolumetric ops and
the sequence fold in sequence_operator.h.
"""

import numpy as np
import pytest

from dali_tpu import fn, pipeline_def, types


def _run(build, samples, layout, device):
    @pipeline_def(batch_size=len(samples), num_threads=1, seed=3)
    def pipe():
        x = fn.external_source(source=lambda: samples, batch=True, cycle=True,
                               layout=layout)
        if device == "gpu":
            x = x.gpu()
        return build(x)

    p = pipe()
    p.build()
    (out,) = p.run()
    return [np.asarray(out.at(i)) for i in range(len(samples))]


def _vol_samples(n=2, seed=11, uniform=False):
    rng = np.random.default_rng(seed)
    if uniform:  # shapes-free device batches exercise the OTHER branch
        return [rng.integers(0, 256, (8, 20, 18, 3), np.uint8)
                for _ in range(n)]
    return [rng.integers(0, 256, (6 + 2 * i, 20 + 4 * i, 18 - 2 * i, 3),
                         np.uint8) for i in range(n)]


def _seq_samples(n=2, seed=12, uniform=False):
    rng = np.random.default_rng(seed)
    if uniform:
        return [rng.integers(0, 256, (3, 24, 20, 3), np.uint8)
                for _ in range(n)]
    return [rng.integers(0, 256, (3, 24 + 6 * i, 20 - 3 * i, 3), np.uint8)
            for i in range(n)]


VOL_CASES = {
    "gaussian_blur": (lambda x: fn.gaussian_blur(x, sigma=1.1), 1.0),
    "laplacian": (lambda x: fn.laplacian(x, dtype=types.FLOAT), 1e-2),
    "flip": (lambda x: fn.flip(x, horizontal=1, depthwise=1), 0.0),
    "crop": (lambda x: fn.crop(x, crop=(12.0, 10.0), crop_d=4.0,
                               crop_pos_x=0.4, crop_pos_y=0.6,
                               crop_pos_z=0.5), 0.0),
    "resize": (lambda x: fn.resize(x, resize_x=10, resize_y=12, resize_z=4), 1.0),
    "crop_mirror_normalize": (
        lambda x: fn.crop_mirror_normalize(
            x, crop=(12.0, 10.0), crop_d=4.0, dtype=types.FLOAT,
            output_layout="DHWC", mean=[128.0] * 3, std=[64.0] * 3), 1e-3),
    "pad": (lambda x: fn.pad(x, axes=[1, 2], align=[8, 8]), 0.0),
    "slice": (lambda x: fn.slice(x, rel_start=[0.2, 0.1], rel_shape=[0.6, 0.7],
                                 axis_names="HW"), 0.0),
}

SEQ_CASES = {
    "gaussian_blur": (lambda x: fn.gaussian_blur(x, sigma=1.3), 1.0),
    "rotate": (lambda x: fn.rotate(x, angle=90.0, interp_type=types.INTERP_NN),
               0.0),
    "resize": (lambda x: fn.resize(x, resize_x=12, resize_y=14), 1.0),
    "crop_mirror_normalize": (
        lambda x: fn.crop_mirror_normalize(
            x, crop=(14.0, 12.0), mirror=1, dtype=types.FLOAT,
            output_layout="FHWC", mean=[128.0] * 3, std=[64.0] * 3), 1e-3),
    "flip": (lambda x: fn.flip(x, horizontal=1), 0.0),
    "brightness": (lambda x: fn.brightness(x, brightness=1.2), 1.0),
}


@pytest.mark.parametrize("uniform", [False, True])
@pytest.mark.parametrize("case", sorted(VOL_CASES))
def test_volumetric_ragged_parity(case, uniform):
    build, atol = VOL_CASES[case]
    samples = _vol_samples(uniform=uniform)
    try:
        cpu = _run(build, samples, "DHWC", "cpu")
    except Exception as e:
        pytest.skip(f"cpu path rejects volumetric harness input: {e}")
    try:
        gpu = _run(build, samples, "DHWC", "gpu")
    except NotImplementedError as e:
        pytest.skip(f"explicit gpu contract: {e}")
    for i, (a, b) in enumerate(zip(cpu, gpu)):
        assert a.shape == b.shape, (case, i, a.shape, b.shape)
        d = np.abs(a.astype(np.float64) - b.astype(np.float64)).max()
        assert d <= atol + 1e-6, (case, i, d)


@pytest.mark.parametrize("uniform", [False, True])
@pytest.mark.parametrize("case", sorted(SEQ_CASES))
def test_sequence_ragged_parity(case, uniform):
    build, atol = SEQ_CASES[case]
    samples = _seq_samples(uniform=uniform)
    try:
        cpu = _run(build, samples, "FHWC", "cpu")
    except Exception as e:
        pytest.skip(f"cpu path rejects sequence harness input: {e}")
    try:
        gpu = _run(build, samples, "FHWC", "gpu")
    except NotImplementedError as e:
        pytest.skip(f"explicit gpu contract: {e}")
    for i, (a, b) in enumerate(zip(cpu, gpu)):
        assert a.shape == b.shape, (case, i, a.shape, b.shape)
        d = np.abs(a.astype(np.float64) - b.astype(np.float64)).max()
        assert d <= atol + 1e-6, (case, i, d)


def test_sequence_resize_then_rotate_chain():
    """Resize(gpu) must propagate (F, H, W, C) host shapes on sequences so a
    downstream Rotate (host canvas math) works — the video_training example's
    augmentation chain."""
    samples = _seq_samples()

    def run(device):
        def build(x):
            x = fn.resize(x, resize_x=16, resize_y=14)
            return fn.rotate(x, angle=15.0, keep_size=True, fill_value=0.0,
                             interp_type=types.INTERP_NN)
        return _run(build, samples, "FHWC", device)

    cpu = run("cpu")
    gpu = run("gpu")
    for i, (a, b) in enumerate(zip(cpu, gpu)):
        assert a.shape == b.shape == (3, 14, 16, 3), (i, a.shape, b.shape)
        # resize rounding may differ by 1 LSB; NN rotate copies that pixel
        np.testing.assert_allclose(a.astype(np.float64), b.astype(np.float64),
                                   atol=1, rtol=0, err_msg=f"sample {i}")


def test_uniform_sequence_flip_and_warp_affine():
    """Review regressions: UNIFORM (shapes-free) FHWC batches — Flip(gpu)
    must flip W (not the frame axis), and WarpAffine must fold frames on
    BOTH devices with `size` landing on the spatial shape columns."""
    rng = np.random.default_rng(7)
    seqs = [rng.integers(0, 256, (3, 8, 10, 3), np.uint8) for _ in range(2)]

    def run(build, device):
        @pipeline_def(batch_size=2, num_threads=1, seed=1)
        def p():
            x = fn.external_source(source=lambda: seqs, batch=True,
                                   cycle=True, layout="FHWC")
            if device == "gpu":
                x = x.gpu()
            return build(x)
        q = p()
        q.build()
        (o,) = q.run()
        return [np.asarray(o.at(i)) for i in range(2)]

    g = run(lambda x: fn.flip(x, horizontal=1), "gpu")
    np.testing.assert_array_equal(g[0], seqs[0][:, :, ::-1, :])

    wa = lambda x: fn.warp_affine(x, matrix=[1, 0, 2, 0, 1, 1],
                                  size=(6.0, 7.0),
                                  interp_type=types.INTERP_NN)
    c, g = run(wa, "cpu"), run(wa, "gpu")
    for i in range(2):
        assert c[i].shape == g[i].shape == (3, 6, 7, 3), (i, c[i].shape, g[i].shape)
        np.testing.assert_array_equal(c[i], g[i], err_msg=f"sample {i}")

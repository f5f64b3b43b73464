"""Per-sample tensor arguments, part 2: non-image families.

Complements test_tensor_args_sweep.py (image ops) with audio, bbox,
coordinate, normalization and reshape ops — same contract: per-sample
tensor-valued args that DIFFER across the batch, gpu values == cpu values.
"""

import numpy as np
import pytest

from dali_tpu import fn, pipeline_def, types

N = 4


def _run(build_inputs, op, device, targs, extra):
    srcs = build_inputs()

    @pipeline_def(batch_size=N, num_threads=1, seed=5)
    def pipe():
        ins = []
        for samples, layout in srcs:
            x = fn.external_source(source=lambda s=samples: s, batch=True,
                                   cycle=True, layout=layout)
            ins.append(x.gpu() if device == "gpu" else x)
        kw = {k: fn.external_source(source=lambda v=v: v, batch=True,
                                    cycle=True)
              for k, v in targs.items()}
        kw.update(extra)
        out = op(*ins, **kw)
        return out[0] if isinstance(out, (tuple, list)) else out

    p = pipe()
    p.build()
    (out,) = p.run(),
    out = out[0]
    return [np.asarray(out.at(i)) for i in range(N)]


def _audio():
    rng = np.random.default_rng(7)
    return [(
        [np.sin(np.linspace(0, 40 + 9 * i, 3000 + 400 * i)).astype(np.float32)
         for i in range(N)], "")]


def _boxes():
    rng = np.random.default_rng(8)
    out = []
    for i in range(N):
        lo = rng.uniform(0.0, 0.4, (3 + i, 2)).astype(np.float32)
        hi = lo + rng.uniform(0.1, 0.5, (3 + i, 2)).astype(np.float32)
        out.append(np.clip(np.concatenate([lo, hi], axis=1), 0, 1))
    return [(out, "")]


def _images():
    rng = np.random.default_rng(9)
    return [([rng.integers(0, 256, (20 + 4 * i, 18, 3), np.uint8)
              for i in range(N)], "HWC")]


CASES = {
    # cpu (windowed-sinc host kernel) vs gpu (device lowering) resamplers
    # agree to ~1e-2 (the contract test_audio.py:78 uses atol=1e-2)
    "audio_resample_rates": (
        _audio, lambda x, **kw: fn.audio_resample(x, **kw),
        {"in_rate": [np.float32(16000.0)] * N,
         "out_rate": [np.float32(v) for v in (8000.0, 11025.0, 22050.0, 12000.0)]},
        {}, 2e-2),
    "audio_resample_scale": (
        _audio, lambda x, **kw: fn.audio_resample(x, **kw),
        {"scale": [np.float32(v) for v in (0.5, 0.75, 1.25, 1.5)]},
        {}, 2e-2),
    "preemphasis": (
        _audio, lambda x, **kw: fn.preemphasis_filter(x, **kw),
        {"preemph_coeff": [np.float32(v) for v in (0.0, 0.5, 0.9, 0.97)]},
        {}, 1e-5),
    "bb_flip": (
        _boxes, lambda x, **kw: fn.bb_flip(x, **kw),
        {"horizontal": [np.array(v, np.int32) for v in (1, 0, 1, 0)],
         "vertical": [np.array(v, np.int32) for v in (0, 1, 0, 1)]},
        {"ltrb": True}, 1e-6),
    "coord_flip": (
        _boxes, lambda x, **kw: fn.coord_flip(x, **kw),
        {"flip_x": [np.array(v, np.int32) for v in (1, 0, 1, 0)],
         "flip_y": [np.array(v, np.int32) for v in (0, 1, 1, 0)]},
        {"layout": "xy"}, 1e-6),
    "normalize_mean_std": (
        _images, lambda x, **kw: fn.normalize(x, **kw),
        {"mean": [np.array(v, np.float32) for v in (90.0, 110.0, 128.0, 140.0)],
         "stddev": [np.array(v, np.float32) for v in (50.0, 60.0, 64.0, 70.0)]},
        {"dtype": types.FLOAT}, 1e-4),
    # uniform input, per-sample OUTPUT shapes (ragged-input reshape on the
    # device is an explicit NotImplementedError contract)
    "reshape_shape": (
        lambda: [([np.arange(48, dtype=np.int32) for _ in range(N)], "")],
        lambda x, **kw: fn.reshape(x, **kw),
        {"shape": [np.array(s, np.float32)
                   for s in ([4, 12], [2, 24], [8, 6], [1, 48])]},
        {}, 0.0),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_tensor_arg_parity_nonimage(case):
    build_inputs, op, targs, extra, atol = CASES[case]
    try:
        cpu = _run(build_inputs, op, "cpu", targs, extra)
    except Exception as e:
        pytest.fail(f"cpu path failed: {type(e).__name__}: {e}")
    gpu = _run(build_inputs, op, "gpu", targs, extra)
    for i in range(N):
        assert cpu[i].shape == gpu[i].shape, (case, i, cpu[i].shape, gpu[i].shape)
        np.testing.assert_allclose(
            cpu[i].astype(np.float64), gpu[i].astype(np.float64),
            atol=atol, rtol=0, err_msg=f"{case} sample {i}")


@pytest.mark.parametrize("case", ["audio_resample_rates", "bb_flip",
                                  "normalize_mean_std"])
def test_tensor_arg_values_differ_nonimage(case):
    """Per-sample args must actually change per-sample outputs (no silent
    arg[0] broadcast)."""
    build_inputs, op, targs, extra, _ = CASES[case]
    gpu = _run(build_inputs, op, "gpu", targs, extra)
    bcast = {k: [v[0]] * N for k, v in targs.items()}
    gpu_b = _run(build_inputs, op, "gpu", bcast, extra)
    assert any(a.shape != b.shape or not np.array_equal(a, b)
               for a, b in zip(gpu[1:], gpu_b[1:])), (
        f"{case}: gpu output identical under arg[0] broadcast")


def test_reshape_ragged_per_sample_shapes():
    """Ragged INPUT + per-sample tensor shapes (with -1 inference): the gpu
    gather path must match the cpu reshape exactly."""
    data = [np.arange(24 * (i + 1), dtype=np.int32) for i in range(3)]
    shapes = [np.array(s, np.float32) for s in ([2, 12], [4, -1], [6, 12])]

    def run(device):
        @pipeline_def(batch_size=3, num_threads=1, seed=5)
        def p():
            x = fn.external_source(source=lambda: data, batch=True, cycle=True)
            s = fn.external_source(source=lambda: shapes, batch=True,
                                   cycle=True)
            if device == "gpu":
                x = x.gpu()
            return fn.reshape(x, shape=s)
        q = p()
        q.build()
        (o,) = q.run()
        return [np.asarray(o.at(i)) for i in range(3)]

    cpu, gpu = run("cpu"), run("gpu")
    for i in range(3):
        assert cpu[i].shape == gpu[i].shape, (i, cpu[i].shape, gpu[i].shape)
        np.testing.assert_array_equal(cpu[i], gpu[i])


@pytest.mark.parametrize("op,kw", [
    ("uniform", {"range": [5.0, 6.0]}),
    ("normal", {"mean": 2.0, "stddev": 0.1}),
    ("coin_flip", {"probability": 0.5}),
])
def test_rng_per_sample_tensor_shape(op, kw):
    """Device RNG ops honor per-sample tensor `shape` (reference
    rng_base.h ShapeGenArg) — the gpu path used to ignore it and emit
    scalars."""
    shp = [np.array(s, np.float32) for s in ([2, 3], [4, 2], [3, 3])]

    def run(device):
        @pipeline_def(batch_size=3, num_threads=1, seed=9)
        def p():
            s = fn.external_source(source=lambda: shp, batch=True, cycle=True)
            return getattr(fn.random, op)(shape=s, device=device, **kw)
        q = p()
        q.build()
        (o,) = q.run()
        return [np.asarray(o.at(i)) for i in range(3)]

    for device in ("cpu", "gpu"):
        out = run(device)
        assert [x.shape for x in out] == [(2, 3), (4, 2), (3, 3)], (device, out)


def test_tensor_resize_per_sample_sizes():
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 256, (24 + 6 * i, 20, 3), np.uint8)
            for i in range(3)]
    sizes = [np.array(s, np.float32) for s in ([10, 12], [16, 8], [12, 12])]

    def run(device):
        @pipeline_def(batch_size=3, num_threads=1, seed=3)
        def p():
            x = fn.external_source(source=lambda: imgs, batch=True,
                                   cycle=True, layout="HWC")
            s = fn.external_source(source=lambda: sizes, batch=True,
                                   cycle=True)
            if device == "gpu":
                x = x.gpu()
            return fn.tensor_resize(x, sizes=s, axes=[0, 1])
        q = p()
        q.build()
        (o,) = q.run()
        return [np.asarray(o.at(i)) for i in range(3)]

    cpu, gpu = run("cpu"), run("gpu")
    for i in range(3):
        assert cpu[i].shape == gpu[i].shape == (*[int(v) for v in sizes[i]], 3)
        np.testing.assert_allclose(cpu[i].astype(np.float64),
                                   gpu[i].astype(np.float64), atol=1, rtol=0)


def test_tensor_resize_sizes_axes_mismatch_is_clear():
    """sizes shorter than the resized axes must raise a clear error, not an
    IndexError from deep inside the zoom math."""
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 256, (24, 20, 3), np.uint8)]

    @pipeline_def(batch_size=1, num_threads=1, seed=3)
    def p():
        x = fn.external_source(source=lambda: imgs, batch=True, cycle=True,
                               layout="HWC")
        return fn.tensor_resize(x, sizes=[10.0, 12.0])  # 2 entries, 3 axes

    with pytest.raises(ValueError, match="entries"):
        q = p()
        q.build()
        q.run()


def test_sequence_rearrange_per_sample_order():
    """Per-sample tensor `new_order` (reference sequence_rearrange.cc
    argument input), cpu == gpu, including repeated frames."""
    seqs = [np.stack([np.full((2, 2, 3), 10 * i + f, np.int32)
                      for f in range(4)]) for i in range(2)]
    orders = [np.array(o, np.int32) for o in ([3, 2, 1, 0], [1, 1, 0, 2])]

    def run(device):
        @pipeline_def(batch_size=2, num_threads=1, seed=1)
        def p():
            x = fn.external_source(source=lambda: seqs, batch=True,
                                   cycle=True, layout="FHWC")
            o = fn.external_source(source=lambda: orders, batch=True,
                                   cycle=True)
            if device == "gpu":
                x = x.gpu()
            return fn.sequence_rearrange(x, new_order=o)
        q = p()
        q.build()
        (out,) = q.run()
        return [np.asarray(out.at(i)) for i in range(2)]

    cpu, gpu = run("cpu"), run("gpu")
    for i, (a, b) in enumerate(zip(cpu, gpu)):
        np.testing.assert_array_equal(a, b, err_msg=f"sample {i}")
    np.testing.assert_array_equal(cpu[0][:, 0, 0, 0], [3, 2, 1, 0])
    np.testing.assert_array_equal(cpu[1][:, 0, 0, 0], [11, 11, 10, 12])


def test_multi_paste_tensor_args_parity():
    """MultiPaste's 4 tensor args (in_ids/in_anchors/shapes/out_anchors):
    cross-sample pastes must be bit-identical across devices."""
    rng = np.random.default_rng(4)
    imgs = [rng.integers(0, 256, (20, 22, 3), np.uint8) for _ in range(3)]
    in_ids = [np.array([(i + 1) % 3], np.int32) for i in range(3)]
    in_anchors = [np.array([[0, 0]], np.int32) for _ in range(3)]
    shapes_ = [np.array([[8, 8]], np.int32) for _ in range(3)]
    out_anchors = [np.array([[2 + i, 3]], np.int32) for i in range(3)]

    def run(device):
        @pipeline_def(batch_size=3, num_threads=1, seed=4)
        def p():
            x = fn.external_source(source=lambda: imgs, batch=True,
                                   cycle=True, layout="HWC")
            if device == "gpu":
                x = x.gpu()
            return fn.multi_paste(
                x,
                in_ids=fn.external_source(source=lambda: in_ids, batch=True, cycle=True),
                in_anchors=fn.external_source(source=lambda: in_anchors, batch=True, cycle=True),
                shapes=fn.external_source(source=lambda: shapes_, batch=True, cycle=True),
                out_anchors=fn.external_source(source=lambda: out_anchors, batch=True, cycle=True),
                output_size=[20, 22])
        q = p()
        q.build()
        (o,) = q.run()
        return [np.asarray(o.at(i)) for i in range(3)]

    cpu, gpu = run("cpu"), run("gpu")
    for i in range(3):
        np.testing.assert_array_equal(cpu[i], gpu[i], err_msg=f"sample {i}")
    # the paste actually happened: region == source sample's top-left block
    np.testing.assert_array_equal(cpu[0][2:10, 3:11], imgs[1][:8, :8])

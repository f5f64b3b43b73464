"""Join (Cat/Stack) semantics: cpu/gpu value parity on ragged batches, the
axis_name contracts (reference generic/join.cc:35-87 — Cat's axis_name SELECTS
an existing axis; Stack's NAMES the new one), and CoordTransform on N-D
coordinate grids (reference coord_transform.cc)."""

import numpy as np
import pytest

from dali_tpu import fn, pipeline_def


def _run_pipe(build, batch_size=2):
    p = build()
    p.build()
    (out,) = p.run()
    return [np.asarray(out.at(i)) for i in range(batch_size)], out


def _two_source(samples_a, samples_b, device):
    def builder():
        @pipeline_def(batch_size=len(samples_a), num_threads=1, seed=11)
        def pipe():
            a = fn.external_source(source=lambda: samples_a, batch=True,
                                   cycle=True, layout="HWC")
            b = fn.external_source(source=lambda: samples_b, batch=True,
                                   cycle=True, layout="HWC")
            if device == "gpu":
                a, b = a.gpu(), b.gpu()
            return fn.cat(a, b, axis=0)
        return pipe()
    return builder


def test_cat_gpu_ragged_matches_cpu():
    # ragged along BOTH the join axis and the other axis: the padded-canvas
    # concat would interleave padding rows; placement must use true extents
    rng = np.random.default_rng(3)
    a = [rng.integers(0, 255, (10 + 3 * i, 12, 3), np.uint8) for i in range(2)]
    b = [rng.integers(0, 255, (7 + 2 * i, 12, 3), np.uint8) for i in range(2)]
    cpu, _ = _run_pipe(_two_source(a, b, "cpu"))
    gpu, _ = _run_pipe(_two_source(a, b, "gpu"))
    for i in range(2):
        assert cpu[i].shape == gpu[i].shape == (a[i].shape[0] + b[i].shape[0], 12, 3)
        np.testing.assert_array_equal(cpu[i], gpu[i])


def test_cat_gpu_axis1_and_axis_name():
    rng = np.random.default_rng(4)
    a = [rng.integers(0, 255, (9, 5 + i, 3), np.uint8) for i in range(2)]
    b = [rng.integers(0, 255, (9, 4, 3), np.uint8) for i in range(2)]

    def builder(device, **cat_kw):
        @pipeline_def(batch_size=2, num_threads=1, seed=11)
        def pipe():
            x = fn.external_source(source=lambda: a, batch=True, cycle=True,
                                   layout="HWC")
            y = fn.external_source(source=lambda: b, batch=True, cycle=True,
                                   layout="HWC")
            if device == "gpu":
                x, y = x.gpu(), y.gpu()
            return fn.cat(x, y, **cat_kw)
        return pipe()

    for kw in ({"axis": 1}, {"axis_name": "W"}):
        cpu, _ = _run_pipe(lambda kw=kw: builder("cpu", **kw))
        gpu, _ = _run_pipe(lambda kw=kw: builder("gpu", **kw))
        for i in range(2):
            assert cpu[i].shape == (9, a[i].shape[1] + 4, 3)
            np.testing.assert_array_equal(cpu[i], gpu[i])


@pytest.mark.parametrize("device", ["cpu", "gpu"])
def test_stack_new_axis_and_layout(device):
    rng = np.random.default_rng(5)
    a = [rng.integers(0, 255, (6, 7, 3), np.uint8) for _ in range(2)]
    b = [rng.integers(0, 255, (6, 7, 3), np.uint8) for _ in range(2)]

    @pipeline_def(batch_size=2, num_threads=1, seed=11)
    def pipe():
        x = fn.external_source(source=lambda: a, batch=True, cycle=True,
                               layout="HWC")
        y = fn.external_source(source=lambda: b, batch=True, cycle=True,
                               layout="HWC")
        if device == "gpu":
            x, y = x.gpu(), y.gpu()
        return fn.stack(x, y, axis=0, axis_name="F")

    out_samples, out = _run_pipe(lambda: pipe())
    for i in range(2):
        assert out_samples[i].shape == (2, 6, 7, 3)
        np.testing.assert_array_equal(out_samples[i][0], a[i])
        np.testing.assert_array_equal(out_samples[i][1], b[i])
    # Stack's axis_name NAMES the inserted axis (join.cc:54-58)
    assert out.layout() == "FHWC"


@pytest.mark.parametrize("device", ["cpu", "gpu"])
def test_coord_transform_nd_grid(device):
    # [H, W, 2] coordinate grid: transform applies to the LAST axis
    grid = np.stack(np.meshgrid(np.arange(4.0), np.arange(5.0),
                                indexing="ij"), axis=-1).astype(np.float32)
    samples = [grid, grid * 2.0]
    M = [0.0, -1.0, 1.0, 0.0]
    T = [10.0, 0.0]

    @pipeline_def(batch_size=2, num_threads=1, seed=11)
    def pipe():
        x = fn.external_source(source=lambda: samples, batch=True, cycle=True)
        if device == "gpu":
            x = x.gpu()
        return fn.coord_transform(x, M=M, T=T)

    out, _ = _run_pipe(lambda: pipe())
    m = np.asarray(M, np.float32).reshape(2, 2)
    for i in range(2):
        expect = samples[i] @ m.T + np.asarray(T, np.float32)
        assert out[i].shape == samples[i].shape
        np.testing.assert_allclose(out[i], expect, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("device", ["cpu", "gpu"])
def test_arithmetic_non_broadcastable_raises(device):
    """Both devices must REJECT per-sample shape mismatches (reference
    expression broadcasting: dims equal or 1) — the gpu path used to emit
    canvas-max garbage extents silently."""
    rng = np.random.default_rng(2)
    a = [rng.integers(0, 100, (10, 12, 3), np.uint8) for _ in range(2)]
    b = [rng.integers(0, 100, (8, 9, 3), np.uint8) for _ in range(2)]

    @pipeline_def(batch_size=2, num_threads=1, seed=2)
    def pipe():
        x = fn.external_source(source=lambda: a, batch=True, cycle=True,
                               layout="HWC")
        y = fn.external_source(source=lambda: b, batch=True, cycle=True,
                               layout="HWC")
        if device == "gpu":
            x, y = x.gpu(), y.gpu()
        return x + y

    with pytest.raises(ValueError):
        p = pipe()
        p.build()
        p.run()


def test_arithmetic_broadcast_gpu_matches_cpu():
    rng = np.random.default_rng(3)
    a = [rng.integers(0, 100, (10 + 5 * i, 12, 3), np.uint8) for i in range(2)]
    scale = [rng.integers(1, 4, (1, 1, 3), np.uint8) for _ in range(2)]

    def run(device):
        @pipeline_def(batch_size=2, num_threads=1, seed=2)
        def pipe():
            x = fn.external_source(source=lambda: a, batch=True, cycle=True,
                                   layout="HWC")
            s = fn.external_source(source=lambda: scale, batch=True,
                                   cycle=True, layout="HWC")
            if device == "gpu":
                x, s = x.gpu(), s.gpu()
            return x * s + 1
        p = pipe()
        p.build()
        (o,) = p.run()
        return [np.asarray(o.at(i)) for i in range(2)]

    cpu, gpu = run("cpu"), run("gpu")
    for i in range(2):
        np.testing.assert_array_equal(cpu[i], gpu[i])

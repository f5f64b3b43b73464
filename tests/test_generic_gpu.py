"""GPU lowerings of the generic family (Slice/Erase/Paste/subscript/value ops/
BbFlip/BoxEncoder) — each checked against its CPU twin on the same data."""

import numpy as np
import pytest

import dali_tpu.fn as fn
import dali_tpu.types as types
from dali_tpu.pipeline import Pipeline, pipeline_def

from .test_utils import to_samples as as_numpy_samples


def _images(n, seed=0, lo=20, hi=40):
    rng = np.random.default_rng(seed)
    return [
        rng.integers(0, 255, (rng.integers(lo, hi), rng.integers(lo, hi), 3), np.uint8)
        for _ in range(n)
    ]


def _run_pair(build, n=4, **kw):
    """Build cpu and gpu variants of the same graph, return per-sample outputs."""
    outs = {}
    for dev in ("cpu", "gpu"):
        @pipeline_def(batch_size=n, num_threads=1, seed=11, **kw)
        def pipe():
            return build(dev)

        p = pipe()
        p.build()
        (res,) = p.run()
        outs[dev] = as_numpy_samples(res)
    return outs["cpu"], outs["gpu"]


def test_slice_gpu_matches_cpu():
    imgs = _images(4, seed=3)

    def build(dev):
        data = fn.external_source(source=lambda: imgs, batch=True, cycle=True)
        if dev == "gpu":
            data = data.gpu()
        return fn.slice(data, rel_start=[0.1, 0.2], rel_shape=[0.5, 0.5], axes=[0, 1])

    cpu, gpu = _run_pair(build)
    for c, g in zip(cpu, gpu):
        np.testing.assert_array_equal(c, g)


def test_slice_gpu_pad_policy():
    imgs = _images(3, seed=4)

    def build(dev):
        data = fn.external_source(source=lambda: imgs, batch=True, cycle=True)
        if dev == "gpu":
            data = data.gpu()
        return fn.slice(
            data, start=[-5.0, -5.0], shape=[20.0, 20.0], axes=[0, 1],
            out_of_bounds_policy="pad", fill_values=[7.0],
        )

    cpu, gpu = _run_pair(build, n=3)
    for c, g in zip(cpu, gpu):
        np.testing.assert_array_equal(c, g)


def test_erase_gpu_matches_cpu():
    imgs = _images(4, seed=5)

    def build(dev):
        data = fn.external_source(source=lambda: imgs, batch=True, cycle=True)
        if dev == "gpu":
            data = data.gpu()
        return fn.erase(
            data, anchor=[4.0, 4.0], shape=[8.0, 6.0], axes=[0, 1], fill_value=[100.0]
        )

    cpu, gpu = _run_pair(build)
    for c, g in zip(cpu, gpu):
        np.testing.assert_array_equal(c, g)


def test_paste_gpu_matches_cpu():
    imgs = _images(4, seed=6)

    def build(dev):
        data = fn.external_source(source=lambda: imgs, batch=True, cycle=True)
        if dev == "gpu":
            data = data.gpu()
        return fn.paste(data, ratio=1.5, paste_x=0.25, paste_y=0.75, fill_value=[9.0])

    cpu, gpu = _run_pair(build)
    for c, g in zip(cpu, gpu):
        np.testing.assert_array_equal(c, g)


def test_subscript_gpu():
    imgs = _images(4, seed=7)

    def build(dev):
        data = fn.external_source(source=lambda: imgs, batch=True, cycle=True)
        if dev == "gpu":
            data = data.gpu()
        return data[2:10, 3:9]

    cpu, gpu = _run_pair(build)
    for c, g in zip(cpu, gpu):
        np.testing.assert_array_equal(c, g)


def test_value_ops_gpu():
    @pipeline_def(batch_size=3, num_threads=1, seed=1)
    def pipe():
        z = fn.zeros(shape=[4, 4], device="gpu")
        o = fn.ones(shape=[2], dtype=types.FLOAT, device="gpu")
        f = fn.full(fill_value=2.5, shape=[3], device="gpu")
        return z, o, f

    p = pipe()
    p.build()
    z, o, f = p.run()
    zs, os_, fs = as_numpy_samples(z), as_numpy_samples(o), as_numpy_samples(f)
    assert zs[0].shape == (4, 4) and (zs[0] == 0).all()
    assert os_[0].dtype == np.float32 and (os_[0] == 1).all()
    assert np.allclose(fs[0], 2.5)


def test_full_like_gpu():
    imgs = _images(3, seed=8)

    @pipeline_def(batch_size=3, num_threads=1, seed=1)
    def pipe():
        data = fn.external_source(source=lambda: imgs, batch=True, cycle=True).gpu()
        return fn.zeros_like(data), fn.full_like(data, fill_value=3.0)

    p = pipe()
    p.build()
    z, f = p.run()
    for i, (zi, fi) in enumerate(zip(as_numpy_samples(z), as_numpy_samples(f))):
        assert zi.shape == imgs[i].shape and (zi == 0).all()
        assert (fi == 3).all()


def test_bb_flip_gpu_matches_cpu():
    rng = np.random.default_rng(9)
    boxes = [rng.random((rng.integers(1, 6), 4)).astype(np.float32) for _ in range(4)]
    for b in boxes:  # make valid ltrb
        b[:, 2:] = np.minimum(b[:, :2] + b[:, 2:] * 0.3, 1.0)

    def build(dev):
        data = fn.external_source(source=lambda: boxes, batch=True, cycle=True)
        if dev == "gpu":
            data = data.gpu()
        return fn.bb_flip(data, ltrb=True, horizontal=1, vertical=0)

    cpu, gpu = _run_pair(build)
    for c, g, orig in zip(cpu, gpu, boxes):
        m = orig.shape[0]
        np.testing.assert_allclose(c[:m], g.reshape(-1, 4)[:m], rtol=1e-6)


def test_box_encoder_gpu_matches_cpu():
    rng = np.random.default_rng(10)
    anchors = rng.random((8, 4)).astype(np.float32)
    anchors[:, 2:] = np.minimum(anchors[:, :2] + 0.3, 1.0)
    boxes = [rng.random((rng.integers(1, 5), 4)).astype(np.float32) for _ in range(4)]
    for b in boxes:
        b[:, 2:] = np.minimum(b[:, :2] + 0.4, 1.0)
    labels = [rng.integers(1, 10, (b.shape[0],)).astype(np.int32) for b in boxes]

    def build(dev):
        bx = fn.external_source(source=lambda: boxes, batch=True, cycle=True)
        lb = fn.external_source(source=lambda: labels, batch=True, cycle=True)
        if dev == "gpu":
            bx, lb = bx.gpu(), lb.gpu()
        return fn.box_encoder(bx, lb, anchors=anchors.reshape(-1).tolist(), criteria=0.3)

    outs = {}
    for dev in ("cpu", "gpu"):
        @pipeline_def(batch_size=4, num_threads=1, seed=11)
        def pipe():
            return build(dev)

        p = pipe()
        p.build()
        eb, el = p.run()
        outs[dev] = (as_numpy_samples(eb), as_numpy_samples(el))
    for i in range(4):
        np.testing.assert_allclose(outs["cpu"][0][i], outs["gpu"][0][i], rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(outs["cpu"][1][i], outs["gpu"][1][i])


def test_partial_last_batch_policy():
    from dali_tpu.plugin.base_iterator import LastBatchPolicy
    from dali_tpu.plugin.jax import DALIGenericIterator

    data = [np.full((2, 2), i, np.int32) for i in range(10)]

    @pipeline_def(batch_size=4, num_threads=1, seed=1)
    def pipe():
        return fn.external_source(source=lambda info: data[info.idx_in_epoch % 10])

    p = pipe()
    p.build()
    it = DALIGenericIterator(
        p, ["x"], size=10, last_batch_policy=LastBatchPolicy.PARTIAL
    )
    sizes = [int(b["x"].shape[0]) for b in it]
    assert sizes == [4, 4, 2]


def test_callable_source_second_epoch():
    # reset_epoch must restart a callable source's in-epoch index
    @pipeline_def(batch_size=2, num_threads=1, seed=1)
    def pipe():
        return fn.external_source(
            source=lambda info: np.array([info.idx_in_epoch], np.int64), cycle="raise"
        )

    p = pipe()
    p.build()
    first = [as_numpy_samples(p.run()[0]) for _ in range(2)]
    p.reset()
    again = [as_numpy_samples(p.run()[0]) for _ in range(2)]
    for a, b in zip(first, again):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


def test_full_gpu_vector_fill():
    """Vector fill_value broadcasts over the last dim like the cpu backend."""
    @pipeline_def(batch_size=2, num_threads=1, seed=1)
    def pipe():
        c = fn.full(fill_value=[1.0, 2.0, 3.0], device="cpu")
        g = fn.full(fill_value=[1.0, 2.0, 3.0], device="gpu")
        return c, g

    p = pipe()
    p.build()
    c, g = p.run()
    from .test_utils import to_samples as ts
    for cc, gg in zip(ts(c), ts(g)):
        assert cc.shape == gg.shape
        np.testing.assert_allclose(cc, gg)


def test_uniform_batch_on_grown_canvas_keeps_extents():
    """A uniform batch staged after the canvas grew must keep per-sample
    extents (regression: ragged flag was computed from sample uniformity)."""
    batches = [
        [np.full((40, 40, 3), 9, np.uint8)] * 2,   # grows the canvas
        [np.full((16, 16, 3), 7, np.uint8)] * 2,   # uniform, smaller than canvas
    ]
    it = iter(batches + batches)

    @pipeline_def(batch_size=2, num_threads=1, seed=1)
    def pipe():
        d = fn.external_source(source=lambda: next(it), batch=True).gpu()
        return fn.resize(d, resize_x=8, resize_y=8)

    p = pipe()
    p.build()
    p.run()
    (out,) = p.run()  # the 16x16 batch on the 40x40-grown canvas
    a = np.asarray(out.as_tensor())[0]
    assert (a == 7).all(), a[:2, :2, 0]  # padding would bleed zeros if extents were lost

"""axis_names resolution against input layouts (reference op_schema.h
AddOptionalArg axis_names + kernels resolving via TensorLayout).

Regression coverage for a round-3 bug class: several cpu paths resolved
``axis_names`` with an empty layout (silently reducing ALL axes, or
slicing the wrong dims). Contract tested here:

* axis_names resolves against the data input's layout on BOTH devices,
* result is identical to the equivalent ``axes=[...]`` call,
* axis_names without an input layout raises (not silent fallback),
* names missing from the layout raise.
"""

import numpy as np
import pytest

import dali_tpu.fn as fn
from dali_tpu import pipeline_def

X = np.arange(2 * 4 * 3, dtype=np.float32).reshape(2, 4, 3)


def run_one(build, layout="HWC"):
    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def p():
        x = fn.external_source(source=lambda: [X], batch=True, cycle=True,
                               layout=layout)
        return build(x)

    pp = p()
    pp.build()
    (out,) = pp.run()
    return np.asarray(out.at(0))


@pytest.mark.parametrize("device", ["cpu", "gpu"])
@pytest.mark.parametrize("kind", ["mean", "sum", "max", "min", "std_dev"])
def test_reductions_axis_names_match_axes(device, kind):
    red = getattr(fn.reductions, kind)

    def by(sel):
        def build(x):
            if device == "gpu":
                x = x.gpu()
            if kind == "std_dev":
                m = fn.reductions.mean(x, keep_dims=True, **sel)
                return red(x, m, **sel)
            return red(x, **sel)
        return build

    a = run_one(by(dict(axis_names="HW")))
    b = run_one(by(dict(axes=[0, 1])))
    assert a.shape == b.shape == (3,)
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_reductions_axis_names_without_layout_raises():
    with pytest.raises(Exception, match="axis_names"):
        run_one(lambda x: fn.reductions.mean(x, axis_names="HW"), layout="")


def test_reductions_axis_names_missing_from_layout_raises():
    with pytest.raises(Exception, match="not in input layout"):
        run_one(lambda x: fn.reductions.mean(x, axis_names="XZ"))


@pytest.mark.parametrize("device", ["cpu", "gpu"])
def test_slice_axis_names(device):
    def build(x):
        if device == "gpu":
            x = x.gpu()
        return fn.slice(x, start=[1], shape=[2], axis_names="W",
                        normalized_anchor=False, normalized_shape=False)

    got = run_one(build)
    np.testing.assert_allclose(got, X[:, 1:3])


def test_slice_axis_names_without_layout_raises():
    with pytest.raises(Exception, match="axis_names"):
        run_one(lambda x: fn.slice(x, start=[1], shape=[2], axis_names="W",
                                   normalized_anchor=False,
                                   normalized_shape=False), layout="")


@pytest.mark.parametrize("device", ["cpu", "gpu"])
def test_erase_axis_names(device):
    def build(x):
        if device == "gpu":
            x = x.gpu()
        return fn.erase(x, anchor=[1], shape=[2], axis_names="W",
                        fill_value=0.0)

    got = run_one(build)
    want = X.copy()
    want[:, 1:3, :] = 0
    np.testing.assert_allclose(got, want)


def test_erase_axis_names_without_layout_raises():
    with pytest.raises(Exception, match="axis_names"):
        run_one(lambda x: fn.erase(x, anchor=[1], shape=[2], axis_names="W",
                                   fill_value=0.0), layout="")


# -- host shape propagation through device-op chains (round-3 regression:
# Resize/RandomResizedCrop did not implement host_output_shapes, so a
# downstream Rotate(gpu) keep_size=True silently produced 0x0 canvases) --

def _gpu_chain(build, imgs):
    @pipeline_def(batch_size=len(imgs), num_threads=1, seed=2)
    def pipe():
        x = fn.external_source(source=lambda: imgs, batch=True, cycle=True,
                               layout="HWC").gpu()
        return build(x)

    p = pipe()
    p.build()
    (o,) = p.run()
    return np.asarray(o.as_tensor())


def test_rotate_after_device_resize_has_extent():
    imgs = [np.random.default_rng(0).integers(0, 255, (48, 64, 3), np.uint8)
            for _ in range(2)]
    out = _gpu_chain(
        lambda x: fn.rotate(fn.resize(x, resize_x=32, resize_y=32),
                            angle=15.0, fill_value=0.0, keep_size=True), imgs)
    assert out.shape == (2, 32, 32, 3)
    assert out.mean() > 0


def test_rotate_after_device_rrc_has_extent():
    imgs = [np.random.default_rng(1).integers(0, 255, (48, 64, 3), np.uint8)
            for _ in range(2)]
    out = _gpu_chain(
        lambda x: fn.rotate(fn.random_resized_crop(x, size=[24, 24], seed=3),
                            angle=-20.0, fill_value=0.0, keep_size=True), imgs)
    assert out.shape == (2, 24, 24, 3)
    assert out.mean() > 0


def test_rotate_after_per_sample_resize_shorter():
    imgs = [np.random.default_rng(2).integers(0, 255, (48, 64, 3), np.uint8)
            for _ in range(2)]
    out = _gpu_chain(
        lambda x: fn.rotate(fn.resize(x, resize_shorter=36),
                            angle=10.0, fill_value=0.0, keep_size=True), imgs)
    assert out.shape == (2, 36, 48, 3)
    assert out.mean() > 0

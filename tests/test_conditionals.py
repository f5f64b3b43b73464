"""Per-sample conditional execution tests (reference suite:
``dali/test/python/conditionals/``)."""

import numpy as np
import pytest

from dali_tpu import fn, pipeline_def, types


def test_if_else_cpu():
    @pipeline_def(batch_size=8, num_threads=1, seed=3, enable_conditionals=True)
    def pipe():
        pred = fn.random.coin_flip(probability=0.5, dtype=types.BOOL)
        x = fn.random.uniform(range=[0.0, 1.0], shape=[2])
        if pred:
            out = x + 100.0
        else:
            out = x - 100.0
        return out, pred

    p = pipe()
    out, pred = p.run()
    for i in range(8):
        v = out.at(i)
        if pred.at(i):
            assert (v > 99).all()
        else:
            assert (v < -99).all()
    # both branches taken across the batch (p=0.5, n=8: overwhelmingly likely)
    preds = [bool(pred.at(i)) for i in range(8)]
    assert any(preds) and not all(preds)


def test_if_without_else():
    @pipeline_def(batch_size=8, num_threads=1, seed=7, enable_conditionals=True)
    def pipe():
        pred = fn.random.coin_flip(probability=0.5, dtype=types.BOOL)
        out = fn.random.uniform(range=[10.0, 11.0], shape=[1])
        if pred:
            out = out * -1.0
        return out, pred

    p = pipe()
    out, pred = p.run()
    for i in range(8):
        assert (out.at(i) < 0) == bool(pred.at(i))


def test_elif_chain():
    @pipeline_def(batch_size=16, num_threads=1, seed=11, enable_conditionals=True)
    def pipe():
        sel = fn.random.uniform(values=[0.0, 1.0, 2.0])
        x = fn.random.uniform(range=[0.0, 1.0], shape=[1])
        if sel == 0.0:
            out = x + 1000.0
        elif sel == 1.0:
            out = x + 2000.0
        else:
            out = x + 3000.0
        return out, sel

    p = pipe()
    out, sel = p.run()
    for i in range(16):
        expect = 1000.0 * (float(sel.at(i)) + 1)
        assert abs(float(out.at(i)) - expect) < 2.0


def test_conditional_gpu_merge():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, (8, 16, 16, 3), np.uint8)

    @pipeline_def(batch_size=8, num_threads=1, seed=5, enable_conditionals=True)
    def pipe():
        imgs = fn.external_source(source=lambda: data, batch=True, layout="HWC")
        g = imgs.gpu()
        pred = fn.random.coin_flip(probability=0.5, dtype=types.BOOL)
        if pred:
            out = fn.flip(g, horizontal=1)
        else:
            out = g
        return out, pred

    p = pipe()
    out, pred = p.run()
    arr = np.asarray(out.as_tensor())
    for i in range(8):
        expect = data[i, :, ::-1] if bool(pred.at(i)) else data[i]
        np.testing.assert_array_equal(arr[i], expect)


def test_not_and_or():
    @pipeline_def(batch_size=8, num_threads=1, seed=13, enable_conditionals=True)
    def pipe():
        a = fn.random.coin_flip(probability=0.5, dtype=types.BOOL)
        b = fn.random.coin_flip(probability=0.5, dtype=types.BOOL)
        x = fn.random.uniform(range=[1.0, 2.0], shape=[1])
        if a and not b:
            out = x * 0.0 + 1.0
        else:
            out = x * 0.0 - 1.0
        return out, a, b

    p = pipe()
    out, a, b = p.run()
    for i in range(8):
        expect = 1.0 if (bool(a.at(i)) and not bool(b.at(i))) else -1.0
        assert float(out.at(i)) == expect


def test_undefined_in_branch_errors():
    @pipeline_def(batch_size=4, num_threads=1, seed=1, enable_conditionals=True)
    def pipe():
        pred = fn.random.coin_flip(dtype=types.BOOL)
        if pred:
            y = fn.random.uniform(range=[0, 1])
        return y

    with pytest.raises(RuntimeError, match="both branches"):
        pipe().build()


def test_plain_python_condition_still_works():
    @pipeline_def(batch_size=4, num_threads=1, seed=1, enable_conditionals=True)
    def pipe(flag=True):
        x = fn.random.uniform(range=[0.0, 1.0], shape=[1])
        if flag:
            x = x + 5.0
        return x

    p = pipe()
    out = p.run()[0]
    assert (out.as_array() >= 5.0).all()


def test_rotate_inside_conditional_preserves_content():
    """Round-3 regression: a device Rotate after a conditional Merge had no
    host-known input shapes, silently produced a 0x0 canvas, and the merge
    padded it back — every sample that took the rotate branch came out BLACK
    (this is the auto_aug rotate path). Shapes now flow through Merge and the
    elementwise fallback, and Rotate raises instead of emitting empty
    canvases."""
    rng = np.random.default_rng(3)
    imgs = [rng.integers(100, 200, (32, 32, 3), np.uint8) for _ in range(8)]

    @pipeline_def(batch_size=8, num_threads=1, seed=7,
                  enable_conditionals=True)
    def pipe():
        x = fn.external_source(source=lambda: imgs, batch=True, cycle=True,
                               layout="HWC").gpu()
        take = fn.random.coin_flip(probability=0.5, dtype=types.BOOL, seed=9)
        if take:
            out = fn.rotate(x, angle=30.0, keep_size=True, fill_value=0.0)
        else:
            out = x
        return out, take

    p = pipe()
    p.build()
    out, took = p.run()
    taken = [bool(np.asarray(took.at(i))) for i in range(8)]
    assert any(taken) and not all(taken)
    for i in range(8):
        got = np.asarray(out.at(i))
        assert got.shape == (32, 32, 3)
        if taken[i]:
            # rotated content survives: interior pixels are source-valued, not
            # fill (a black output means the canvas collapsed)
            assert got.mean() > 50, f"sample {i} lost its content: mean {got.mean()}"
            assert not np.array_equal(got, imgs[i])
        else:
            np.testing.assert_array_equal(got, imgs[i])

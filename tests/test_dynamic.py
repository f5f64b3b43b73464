"""Dynamic (eager) mode tests — `ndd` vs the pipeline (`fn`) path (reference
suite ``dali/test/python/ndd_vs_fn/``)."""

import numpy as np
import pytest

import dali_tpu.experimental.dynamic as ndd
from dali_tpu import fn, pipeline_def


def _imgs(n=4, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (40 + 8 * i, 60, 3), np.uint8) for i in range(n)]


def test_eager_resize_cmn_matches_pipeline():
    imgs = _imgs()
    # eager
    b = ndd.as_batch(imgs, layout="HWC").gpu()
    r = ndd.resize(b, resize_x=32, resize_y=32, antialias=False)
    out_e = ndd.crop_mirror_normalize(r, mean=[128.0], std=[64.0], output_layout="CHW")
    eager = np.asarray(out_e.as_array())

    # pipeline
    @pipeline_def(batch_size=4, num_threads=1, seed=1)
    def pipe():
        x = fn.external_source(source=lambda: imgs, batch=True, layout="HWC").gpu()
        x = fn.resize(x, resize_x=32, resize_y=32, antialias=False)
        return fn.crop_mirror_normalize(x, mean=[128.0], std=[64.0], output_layout="CHW")

    declared = np.asarray(pipe().run()[0].as_tensor())
    np.testing.assert_allclose(eager, declared, atol=1e-4)


def test_eager_cpu_ops():
    imgs = _imgs()
    b = ndd.as_batch(imgs, layout="HWC")
    out = ndd.brightness(b, brightness=1.2)
    expect = np.clip(np.round(imgs[0].astype(np.float32) * 1.2), 0, 255).astype(np.uint8)
    np.testing.assert_allclose(out.at(0), expect, atol=1)


def test_eager_random_deterministic_with_context():
    with ndd.EvalContext(seed=7):
        a = ndd.random.uniform(batch_size=4, range=[0.0, 1.0], shape=[3])
    with ndd.EvalContext(seed=7):
        b = ndd.random.uniform(batch_size=4, range=[0.0, 1.0], shape=[3])
    np.testing.assert_array_equal(a.as_array(), b.as_array())


def test_batch_roundtrip():
    imgs = _imgs()
    b = ndd.as_batch(imgs, layout="HWC")
    back = b.gpu().cpu()
    for i in range(4):
        np.testing.assert_array_equal(back.at(i), imgs[i])


def test_readers_in_ndd():
    # readers are exposed as persistent stateful instances per call site
    # (reference dynamic _ops.Reader) — see the checkpoint tests below
    assert hasattr(ndd, "readers") and hasattr(ndd.readers, "file")


def test_ndd_batch_arithmetic_operators():
    """Dynamic-mode Batch supports the arithmetic DSL like DataNode
    (reference dynamic-mode operator overloads)."""
    import numpy as np

    import dali_tpu.experimental.dynamic as ndd

    b = ndd.as_batch([np.ones((2, 2), np.float32),
                      np.full((3, 2), 4.0, np.float32)])
    c = (b * 2 + 1) / 2
    np.testing.assert_allclose(np.asarray(c.cpu().at(0)), np.full((2, 2), 1.5))
    np.testing.assert_allclose(np.asarray(c.cpu().at(1)), np.full((3, 2), 4.5))
    g = (2 * b.gpu() - 1) ** 2
    np.testing.assert_allclose(np.asarray(g.cpu().at(1)), np.full((3, 2), 49.0))
    m = b > 0.5
    assert np.asarray(m.cpu().at(0)).dtype == np.bool_
    np.testing.assert_allclose(np.asarray((-b).cpu().at(0)), -np.ones((2, 2)))
    np.testing.assert_allclose(np.asarray(abs(b - 2).cpu().at(0)), np.ones((2, 2)))


def test_ndd_math_dsl():
    import numpy as np

    import dali_tpu.experimental.dynamic as ndd
    import dali_tpu.math as dmath

    b = ndd.as_batch([np.full((2, 2), 4.0, np.float32)])
    np.testing.assert_allclose(np.asarray(dmath.sqrt(b).cpu().at(0)),
                               np.full((2, 2), 2.0))
    np.testing.assert_allclose(np.asarray(dmath.min(b, 3.0).cpu().at(0)),
                               np.full((2, 2), 3.0))
    g = dmath.log(b.gpu())
    np.testing.assert_allclose(np.asarray(g.cpu().at(0)),
                               np.full((2, 2), np.log(4.0)), rtol=1e-6)


def test_ndd_reader_advances_across_calls(tmp_path):
    """Eager readers persist per call site (reference dynamic _ops.Reader):
    repeated calls advance through the dataset instead of restarting."""
    import dali_tpu.experimental.dynamic as ndd

    for i in range(6):
        np.save(str(tmp_path / f"s{i}.npy"), np.full((2,), i, np.int32))
    with ndd.EvalContext(seed=1):
        a = ndd.readers.numpy(file_root=str(tmp_path), batch_size=2)
        b = ndd.readers.numpy(file_root=str(tmp_path), batch_size=2)
    va = sorted(int(a.at(i)[0]) for i in range(2))
    vb = sorted(int(b.at(i)[0]) for i in range(2))
    assert va != vb or set(va) != set(vb)  # second call moved on
    assert set(va) | set(vb) == {0, 1, 2, 3}


def test_ndd_checkpoint_resumes_reader_and_stream(tmp_path):
    import dali_tpu.experimental.dynamic as ndd

    for i in range(8):
        np.save(str(tmp_path / f"s{i}.npy"), np.full((2,), i, np.int32))

    with ndd.EvalContext(seed=7) as ectx:
        ndd.readers.numpy(file_root=str(tmp_path), batch_size=2)
        ckpt = ndd.Checkpoint.collect(ectx)
        payload = ckpt.serialize()
        after_a = ndd.readers.numpy(file_root=str(tmp_path), batch_size=2)
        rand_a = ndd.random.uniform(range=[0.0, 1.0], shape=[4], batch_size=2)

    # fresh context: apply the checkpoint BEFORE the reader exists — state is
    # applied lazily on first use
    with ndd.EvalContext(seed=0) as ectx2:
        ndd.Checkpoint.deserialize(payload).apply(ectx2)
        after_b = ndd.readers.numpy(file_root=str(tmp_path), batch_size=2)
        rand_b = ndd.random.uniform(range=[0.0, 1.0], shape=[4], batch_size=2)

    np.testing.assert_array_equal(after_a.as_array(), after_b.as_array())
    np.testing.assert_allclose(np.asarray(rand_a.as_array()),
                               np.asarray(rand_b.as_array()), rtol=1e-6)


def test_ndd_pad_gpu_axis_names():
    """Dynamic mode resolves 4-arg device_statics with batch metadata
    (Pad axis_names reads the layout) — regression for the eager-path
    statics dispatch."""
    import numpy as np

    from dali_tpu.experimental import dynamic as ndd

    a = ndd.Batch([np.zeros((3, 5), np.float32), np.zeros((4, 2), np.float32)],
                  layout="HW")
    out = ndd.pad(a.gpu(), axis_names="W", fill_value=7.0)
    assert np.asarray(out.at(0)).shape == (3, 5)
    s1 = np.asarray(out.at(1))
    assert s1.shape == (4, 5)
    assert (s1[:, 2:] == 7.0).all()

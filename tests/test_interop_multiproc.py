"""PythonFunction / JaxFunction / parallel external source tests (reference:
``dali/test/python/test_python_function*``, ``test_external_source_parallel*``)."""

import numpy as np
import pytest

from dali_tpu import fn, pipeline_def, types


def test_python_function_per_sample():
    data = [np.full((3,), i, np.float32) for i in range(4)]

    @pipeline_def(batch_size=4, num_threads=2, seed=1)
    def pipe():
        x = fn.external_source(source=lambda: data, batch=True)
        return fn.python_function(x, function=lambda a: a * 2 + 1)

    out = pipe().run()[0]
    np.testing.assert_allclose(out.at(2), [5.0, 5.0, 5.0])


def test_python_function_batch_mode_multi_output():
    data = [np.full((2,), i, np.float32) for i in range(4)]

    @pipeline_def(batch_size=4, num_threads=1, seed=1)
    def pipe():
        x = fn.external_source(source=lambda: data, batch=True)
        a, b = fn.python_function(
            x,
            function=lambda samples: ([s + 1 for s in samples], [s * 0 for s in samples]),
            num_outputs=2,
            batch_processing=True,
        )
        return a, b

    a, b = pipe().run()
    np.testing.assert_allclose(a.at(3), [4.0, 4.0])
    np.testing.assert_allclose(b.at(3), [0.0, 0.0])


def test_torch_python_function():
    data = [np.full((3,), i, np.float32) for i in range(4)]

    @pipeline_def(batch_size=4, num_threads=1, seed=1)
    def pipe():
        x = fn.external_source(source=lambda: data, batch=True)
        return fn.torch_python_function(x, function=lambda t: t.flip(0) + 10)

    out = pipe().run()[0]
    np.testing.assert_allclose(out.at(1), [11.0, 11.0, 11.0])


def test_jax_function_inlined():
    """User JAX code fuses into the device program (first-class jax_function)."""
    import jax.numpy as jnp

    data = np.arange(4 * 8, dtype=np.float32).reshape(4, 8)

    @pipeline_def(batch_size=4, num_threads=1, seed=1)
    def pipe():
        x = fn.external_source(source=lambda: data, batch=True).gpu()
        y = fn.jax_function(x, function=lambda a: jnp.tanh(a) * 2.0)
        return y

    out = pipe().run()[0]
    np.testing.assert_allclose(
        np.asarray(out.as_tensor()), np.tanh(data) * 2.0, rtol=1e-5
    )


def _indexed_source(info):
    return np.full((4,), info.idx_in_epoch, np.int64)


def test_parallel_external_source():
    @pipeline_def(batch_size=8, num_threads=1, seed=1, py_num_workers=2)
    def pipe():
        return fn.external_source(source=_indexed_source, batch=False, parallel=True)

    p = pipe()
    try:
        for it in range(3):
            out = p.run()[0]
            ids = [int(out.at(i)[0]) for i in range(8)]
            assert ids == list(range(it * 8, it * 8 + 8))
    finally:
        p._executor.shutdown()


def test_parallel_requires_indexed_callable():
    @pipeline_def(batch_size=2, num_threads=1, seed=1, py_num_workers=2)
    def pipe():
        return fn.external_source(source=lambda: np.zeros((2, 3)), batch=True, parallel=True)

    p = pipe()
    with pytest.raises(Exception, match="parallel"):
        try:
            p.run()
        finally:
            p._executor.shutdown()

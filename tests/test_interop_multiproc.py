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


_FINITE_N = 12


def _finite_source(info):
    if info.idx_in_epoch >= _FINITE_N:
        raise StopIteration
    return np.full((3,), info.idx_in_epoch + 100 * info.epoch_idx, np.int64)


def test_parallel_external_source_epoch_end():
    """A finite indexed source under parallel=True must end its epoch with
    StopIteration — the same contract as the serial path — and continue into
    the next epoch after reset() with fresh (not stale) data (review r5: the
    worker converted StopIteration into a generic RuntimeError, and aborted
    batches could leak stale results into the next epoch's batches)."""
    @pipeline_def(batch_size=4, num_threads=1, seed=1, py_num_workers=2)
    def pipe():
        return fn.external_source(source=_finite_source, batch=False, parallel=True)

    p = pipe()
    try:
        for epoch in range(2):
            seen = []
            for _ in range(_FINITE_N // 4):
                out = p.run()[0]
                seen += [int(out.at(i)[0]) for i in range(4)]
            assert seen == [100 * epoch + i for i in range(_FINITE_N)], seen
            with pytest.raises(StopIteration):
                p.run()
            p.reset()
    finally:
        p._executor.shutdown()


def _ragged_arity_source(info):
    if info.idx_in_epoch % 5 == 3:
        return np.zeros((2,), np.float32)  # bare array: 1 output
    return np.zeros((2,), np.float32), np.ones((1,), np.int64)  # 2 outputs


def test_parallel_external_source_ragged_arity_raises():
    """Mixed per-sample output arities must raise (as the serial path does),
    not silently shuffle arrays across samples (review r5)."""
    @pipeline_def(batch_size=8, num_threads=1, seed=1, py_num_workers=2)
    def pipe():
        x, y = fn.external_source(source=_ragged_arity_source, batch=False,
                                  parallel=True, num_outputs=2)
        return x, y

    p = pipe()
    with pytest.raises(Exception, match="outputs for sample"):
        try:
            p.run()
        finally:
            p._executor.shutdown()


def _big_source(info):
    # ~1.5 MB per sample, > the test pool's 1 MB slots
    return np.full((1 << 19,), info.idx_in_epoch, np.int32), np.int64(info.idx_in_epoch)


def test_worker_pool_oversize_slot_reuse():
    """Results larger than slot_bytes ride a persistent worker-owned overflow
    segment (grown on demand, reused across batches) — not a fresh
    create+unlink per batch (review r5) — and stay correct across batches."""
    from dali_tpu._multiproc import WorkerPool

    pool = WorkerPool(_big_source, num_workers=2, batch_size=4,
                      queue_depth=2, slot_bytes=1 << 20)
    try:
        for it in range(3):
            samples = pool.run_batch(it, 0)
            for i, s in enumerate(samples):
                assert len(s) == 2
                assert s[0].shape == (1 << 19,)
                assert int(s[0][0]) == it * 4 + i == int(s[1])
        # the overflow segments were attached once per worker and cached
        assert len(pool._big_attach) == 2
    finally:
        pool.close()

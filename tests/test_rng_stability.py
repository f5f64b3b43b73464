"""RNG stream stability: pinned golden values.

The reference keeps bit-compatible Philox streams so that a (seed, op,
iteration) triple always yields the same numbers across runs and versions
(SURVEY §2.1 Philox row; `include/dali/core/random/philox.h`). This
framework's documented divergence (docs/compatibility.md) keys JAX's PRNG
with fold_in(seed, op_id, iteration) instead — these goldens pin THAT
stream so refactors of the key derivation, executor iteration counting, or
per-sample splitting cannot silently shift every random pipeline. If a
change intentionally breaks the stream, it must bump the documented stream
version and regenerate these values.

Captured on jax's threefry2x32 default implementation (the library forces
the partitionable-threefry default off paths that would alter streams).
"""

import numpy as np
import pytest

from dali_tpu import fn, pipeline_def


def _pipe():
    @pipeline_def(batch_size=4, num_threads=1, seed=1234)
    def p():
        return (
            fn.random.uniform(range=[0.0, 1.0], shape=[3]),
            fn.random.normal(shape=[3]),
            fn.random.coin_flip(probability=0.5, shape=[8]),
        )

    pipe = p()
    pipe.build()
    return pipe


GOLD_U0 = [0.33472368121147156, 0.5897301435470581, 0.6917657256126404]
GOLD_U3 = [0.12935897707939148, 0.7841745615005493, 0.26158466935157776]
GOLD_N0 = [1.0299806594848633, 0.7017015218734741, 0.7770532965660095]
GOLD_C0 = [1, 1, 0, 1, 1, 0, 0, 1]
GOLD_U0_ITER2 = [0.17756174504756927, 0.7027945518493652, 0.6240416169166565]


def test_stream_golden_first_iteration():
    u, n, c = _pipe().run()
    np.testing.assert_allclose(np.asarray(u.at(0)), GOLD_U0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(u.at(3)), GOLD_U3, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(n.at(0)), GOLD_N0, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(c.at(0)), GOLD_C0)


def test_stream_golden_second_iteration():
    pipe = _pipe()
    pipe.run()
    u, _, _ = pipe.run()
    np.testing.assert_allclose(np.asarray(u.at(0)), GOLD_U0_ITER2, rtol=1e-6)


def test_stream_independent_of_batch_content():
    """Adding unrelated ops must not shift random streams (per-op keying)."""

    @pipeline_def(batch_size=4, num_threads=1, seed=1234)
    def p():
        u = fn.random.uniform(range=[0.0, 1.0], shape=[3])
        extra = fn.constant(idata=[1], shape=[1])
        return u, extra

    pipe = p()
    pipe.build()
    u, _ = pipe.run()
    np.testing.assert_allclose(np.asarray(u.at(0)), GOLD_U0, rtol=1e-6)

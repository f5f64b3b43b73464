"""Host staging arena (native/src/arena.cc + native.HostArena).

Reference analogue: include/dali/core/mm/memory_resource.h (pinned memory
kinds) + include/dali/core/mm/pool_resource.h (free-list pooling) +
mm::alloc_raw_unique's deleter-driven lifetime. These tests pin down the
pool mechanics (reuse, cap, trim), the finalizer-driven lifetime contract
(blocks return to the pool only when the last numpy reference drops), and
the StagingRing integration used by the hot wire path.
"""

import gc

import numpy as np
import pytest

from dali_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def _mk(max_pooled=32 << 20, pin=False):
    a = native.HostArena(max_pooled_bytes=max_pooled, pin=pin)
    assert a.available
    return a


def test_alloc_roundtrip_and_dtype():
    a = _mk()
    for dt in (np.uint8, np.int8, np.int16, np.uint16, np.float32, np.int32):
        x = a.alloc(777, dt)
        assert x.dtype == np.dtype(dt) and x.shape == (777,)
        x[:] = np.arange(777).astype(dt)
        np.testing.assert_array_equal(x, np.arange(777).astype(dt))


def test_free_on_last_reference_and_reuse():
    a = _mk()
    x = a.alloc(100_000, np.uint8)
    view = x[5:50]  # a view must keep the block alive
    del x
    gc.collect()
    assert a.stats()["in_use_blocks"] == 1
    view[0] = 42
    del view
    gc.collect()
    s = a.stats()
    assert s["in_use_blocks"] == 0 and s["pooled_bytes"] > 0
    y = a.alloc(90_000, np.uint8)  # same power-of-two class -> pool hit
    assert a.stats()["reuse_hits"] == 1
    del y


def test_pool_cap_releases_to_os():
    a = _mk(max_pooled=8192)
    bufs = [a.alloc(8000, np.uint8) for _ in range(4)]
    del bufs
    gc.collect()
    s = a.stats()
    # class = 8192; cap allows exactly one pooled block, rest released
    assert s["pooled_bytes"] <= 8192
    assert s["os_frees"] >= 3


def test_trim():
    a = _mk()
    bufs = [a.alloc(50_000, np.uint8) for _ in range(3)]
    del bufs
    gc.collect()
    assert a.stats()["pooled_bytes"] > 0
    a.trim(0)
    assert a.stats()["pooled_bytes"] == 0


def test_distinct_blocks_do_not_alias():
    a = _mk()
    x = a.alloc(4096, np.uint8)
    y = a.alloc(4096, np.uint8)
    x[:] = 1
    y[:] = 2
    assert not np.shares_memory(x, y)
    assert int(x.sum()) == 4096 and int(y.sum()) == 2 * 4096


def test_staging_ring_draws_from_arena_and_cycles():
    a = _mk()
    ring = native.StagingRing(2, arena=a)
    b0 = ring.take("wire", 10_000, np.int16)
    b0[:] = 3
    _b1 = ring.take("wire", 10_000, np.int16)
    b2 = ring.take("wire", 10_000, np.int16)  # wraps to slot 0
    assert np.shares_memory(b0, b2)
    assert a.stats()["in_use_blocks"] == 2


def test_staging_ring_outgrown_slot_returns_to_pool_after_last_ref():
    a = _mk()
    ring = native.StagingRing(2, arena=a)
    small = ring.take("w", 1000, np.uint8)
    ring.take("w", 1000, np.uint8)
    big = ring.take("w", 200_000, np.uint8)  # outgrows slot 0
    # old slot 0 block still referenced by `small` -> must not be recycled
    assert a.stats()["in_use_blocks"] == 3
    small[:] = 9
    assert int(small.sum()) == 9 * 1000
    del small
    gc.collect()
    assert a.stats()["in_use_blocks"] == 2
    del big


def test_default_arena_stats_surface_in_executor_statistics():
    # arena_stats() is what executor.statistics()["staging_arena"] returns
    native.default_arena().alloc(10, np.uint8)
    s = native.arena_stats()
    assert s and s["alloc_calls"] >= 1


def test_executor_statistics_carries_staging_arena():
    import dali_tpu.fn as fn
    from dali_tpu import pipeline_def

    @pipeline_def(batch_size=2, num_threads=1, device_id=None, seed=11)
    def pipe():
        return fn.random.uniform(shape=[4])

    p = pipe()
    p.build()
    p.run()
    stats = p.executor_statistics()
    assert "staging_arena" in stats

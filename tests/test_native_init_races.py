"""Cold-start thread-safety of the native runtime bindings.

Two pipelines driven by a framework iterator prefetch CONCURRENTLY, so their
host-stage threads race the very first native-library use. Regressions here
were nasty: `_load()` published _TRIED before _LIB was final, handing one
pipeline a torn None (every JPEG then reported as "unsupported"), and
`shared_pool` growth destroyed the old task pool while the other pipeline had
jobs in flight on it (heap corruption).
"""

import threading

import numpy as np
import pytest

from dali_tpu import native


def _jpeg():
    import cv2

    rng = np.random.default_rng(0)
    img = cv2.resize(rng.integers(0, 256, (47, 63, 3), np.uint8), (500, 375),
                     interpolation=cv2.INTER_CUBIC)
    ok, enc = cv2.imencode(".jpg", img)
    assert ok
    return enc.tobytes()


@pytest.mark.skipif(not native.available(), reason="native runtime absent")
def test_cold_load_race_no_torn_none():
    data = _jpeg()
    for _ in range(20):
        # reset to the cold state (the lib itself reloads idempotently)
        with native._LOAD_LOCK:
            native._TRIED = False
            native._LIB = None
        results = [None] * 8
        start = threading.Barrier(8)

        def worker(i):
            start.wait()
            results[i] = native.jpeg_coef_info(data)

        ts = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert all(r == (375, 500, 48, 64, 24, 32, 0) for r in results), results


@pytest.mark.skipif(not native.available(), reason="native runtime absent")
def test_shared_pool_growth_retains_old_pool():
    small = native.shared_pool(1)
    datas = [_jpeg()] * 16
    stop = threading.Event()
    errs = []

    def hammer():
        # keep the SMALL pool busy with real fan-outs while it is outgrown
        while not stop.is_set():
            out = native.jpeg_coef_info_batch(datas, num_threads=1)
            if out is None or (out[:, 6] != 0).any():
                errs.append(out)
                return

    t = threading.Thread(target=hammer)
    t.start()
    try:
        for k in range(2, 7):
            big = native.shared_pool(k)
            assert big.num_threads >= k
    finally:
        stop.set()
        t.join()
    assert not errs, errs[:1]
    # the outgrown pools must still be alive (handle intact), not destroyed
    assert small in native._RETIRED_POOLS or small is native._POOL
    assert small._h, "outgrown pool was destroyed while potentially in use"

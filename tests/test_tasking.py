"""Native tasking pool + batch decode entry (src/tasking.cc; reference
include/dali/core/exec/tasking/)."""

import numpy as np
import pytest

from dali_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib missing")

cv2 = pytest.importorskip("cv2")


def test_decode_jpeg_batch():
    imgs, datas = [], []
    for i in range(6):
        h, w = 24 + i, 30
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([(yy * 5 + i * 20) % 256, (xx * 7) % 256,
                        ((yy + xx) * 3) % 256], axis=-1).astype(np.uint8)
        ok, jpg = cv2.imencode(".jpg", img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
        imgs.append(img)
        datas.append(jpg.tobytes())
    hs = [im.shape[0] for im in imgs]
    ws = [im.shape[1] for im in imgs]
    canvas = np.zeros((6, 32, 32, 3), np.uint8)
    oks = native.decode_jpeg_batch(datas, [canvas[i] for i in range(6)],
                                   [1] * 6, hs, ws, num_threads=3)
    assert oks == [True] * 6
    for i, im in enumerate(imgs):
        h, w = im.shape[:2]
        diff = np.abs(canvas[i, :h, :w].astype(int) - im.astype(int)).mean()
        assert diff < 4.0  # q95 jpeg round trip


def test_decode_jpeg_batch_corrupt_sample():
    good = cv2.imencode(".jpg", np.zeros((8, 8, 3), np.uint8))[1].tobytes()
    bad = b"\xff\xd8\xff\xe0garbage"
    canvas = np.zeros((2, 8, 8, 3), np.uint8)
    oks = native.decode_jpeg_batch([good, bad], [canvas[0], canvas[1]],
                                   [1, 1], [8, 8], [8, 8])
    assert oks == [True, False]


def test_task_pool_lifecycle():
    pool = native.TaskPool(2)
    assert pool._h
    pool.close()
    assert pool._h is None

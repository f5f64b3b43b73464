"""Round-5 review regression tests: decoder fast-path arg honesty, the
scaled corrupt-sample fallback, and coefficient-cache key/accounting
integrity (review r5 on executor.py/decoders.py)."""

import io
import os

import numpy as np
import pytest

from dali_tpu import fn, pipeline_def, types

cv2 = pytest.importorskip("cv2")


def _exif_jpeg(orientation: int, h=24, w=48) -> bytes:
    from PIL import Image

    img = np.zeros((h, w, 3), np.uint8)
    img[: h // 2] = 200  # top half bright (pre-rotation)
    buf = io.BytesIO()
    pil = Image.fromarray(img)
    exif = pil.getexif()
    exif[0x0112] = orientation
    pil.save(buf, format="JPEG", exif=exif)
    return buf.getvalue()


def test_random_crop_applies_exif_orientation(tmp_path):
    """decoders.ImageRandomCrop must apply EXIF orientation regardless of
    whether the native JPEG fast path is available — the fast path decodes
    raw and must bail for rotated samples (review r5: it sampled the crop
    from pre-rotation dims and returned unrotated pixels)."""
    d = tmp_path / "c0"
    d.mkdir()
    (d / "a.jpg").write_bytes(_exif_jpeg(6))  # upright size = (48, 24)

    @pipeline_def(batch_size=1, num_threads=1, seed=3)
    def p():
        enc, _ = fn.readers.file(file_root=str(tmp_path), name="r")
        # area=1, aspect pinned to the ROTATED aspect (48/24 -> w/h = 0.5):
        # the window only fits the upright image, so the output shape proves
        # which orientation the crop was sampled from
        return fn.decoders.image_random_crop(
            enc, device="cpu", random_area=[1.0, 1.0],
            random_aspect_ratio=[0.5, 0.5], num_attempts=8)

    pipe = p()
    pipe.build()
    out = np.asarray(pipe.run()[0].at(0))
    assert out.shape == (48, 24, 3), out.shape
    # orientation 6 turns the bright TOP half into the bright RIGHT half
    assert out[:, -6:].mean() > 150 > out[:, :6].mean()


def test_random_crop_dtype_rides_generic_path(tmp_path):
    """dtype=FLOAT must produce float output (dynamic-range contract) even
    when the native uint8 fast path is available (review r5)."""
    d = tmp_path / "c0"
    d.mkdir()
    rng = np.random.default_rng(5)
    cv2.imwrite(str(d / "a.jpg"),
                rng.integers(0, 256, (40, 56, 3), np.uint8))

    @pipeline_def(batch_size=1, num_threads=1, seed=3)
    def p():
        enc, _ = fn.readers.file(file_root=str(tmp_path), name="r")
        return fn.decoders.image_random_crop(
            enc, device="cpu", dtype=types.FLOAT,
            random_area=[0.5, 0.9])

    pipe = p()
    pipe.build()
    out = np.asarray(pipe.run()[0].at(0))
    assert out.dtype == np.float32, out.dtype
    assert 0.0 <= out.min() and out.max() <= 1.0  # dynamic-range contract


def test_mixed_decode_corrupt_sample_fallback_keeps_scale(tmp_path):
    """The corrupt-sample fallback in the batched mixed decode must decode
    at the SAME denom as its healthy siblings: the canvas is sized for the
    scaled dims, so a full-resolution fallback overflowed the slot (review
    r5). Simulated by failing the native decode for one sample."""
    from dali_tpu import native

    if not (native.available() and native.has_jpeg()):
        pytest.skip("native decoder unavailable")

    d = tmp_path / "c0"
    d.mkdir()
    rng = np.random.default_rng(7)
    for i in range(3):
        cv2.imwrite(str(d / f"{i}.jpg"),
                    rng.integers(0, 256, (200, 300, 3), np.uint8))

    orig_batch = native.decode_jpeg_batch
    orig_into = native.decode_jpeg_into
    calls = {"n": 0}

    def no_batch(*a, **kw):
        return None  # force the per-sample fan-out

    def flaky_into(data, arr, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # second sample of the first batch "corrupts"
            return False
        return orig_into(data, arr, **kw)

    native.decode_jpeg_batch = no_batch
    native.decode_jpeg_into = flaky_into
    try:
        @pipeline_def(batch_size=3, num_threads=1, seed=3)
        def p():
            enc, _ = fn.readers.file(file_root=str(tmp_path), name="r")
            img = fn.decoders.image(enc, device="mixed",
                                    downscale_shorter_hint=100)
            return img,

        pipe = p()
        pipe.build()
        out = pipe.run()[0]
        # hint 100 on 200x300 -> denom 2 -> every sample 100x150, including
        # the fallback-decoded one
        for i in range(3):
            assert out.shape()[i] == (100, 150, 3), (i, out.shape()[i])
    finally:
        native.decode_jpeg_batch = orig_batch
        native.decode_jpeg_into = orig_into


def test_coef_cache_used_matches_stored_bytes(tmp_path):
    """cache['used'] must equal the bytes actually stored in the map even
    when one batch carries duplicate keys (review r5: each duplicate
    re-inserted and over-counted, exhausting the budget with phantom
    bytes)."""
    from dali_tpu import native

    if not (native.available() and native.has_jpeg()):
        pytest.skip("native decoder unavailable")

    root = tmp_path / "imgs" / "c"
    root.mkdir(parents=True)
    rng = np.random.default_rng(9)
    for i in range(2):
        cv2.imwrite(str(root / f"{i}.jpg"),
                    rng.integers(0, 256, (48, 56, 3), np.uint8))

    @pipeline_def(batch_size=6, num_threads=1, seed=5)
    def p():
        # batch 6 over 2 files: each file appears 3x IN THE SAME BATCH, so
        # _planes_for's up-front miss list carries duplicate keys
        jp, _ = fn.readers.file(file_root=str(tmp_path / "imgs"), name="r")
        img = fn.decoders.image(jp, device="mixed", hybrid_device_decode=True,
                                hybrid_wire="int8", cache_size=64)
        return fn.resize(img, resize_x=24, resize_y=24)

    pipe = p()
    pipe.build()
    a = np.asarray(pipe.run()[0].as_tensor())
    b = np.asarray(pipe.run()[0].as_tensor())
    np.testing.assert_array_equal(a, b)
    op = next(i for i in pipe._executor.impls.values()
              if type(i).__name__ == "JpegCoeffsSplit")
    st = op._ccache
    stored = sum(sum(a.nbytes for a in ent) for ent in st["map"].values())
    assert st["used"] == stored, (st["used"], stored)
    assert len(st["map"]) == 2  # one entry per distinct file


def test_native_first_touch_via_default_arena_no_deadlock():
    """default_arena()/shared_pool() hold _LOAD_LOCK while constructing
    objects whose __init__ re-enters _load(); with a non-reentrant lock the
    FIRST native touch through those paths self-deadlocked (review r5).
    Probed in a fresh process so the library is genuinely unloaded."""
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, %r); "
        "from dali_tpu import native; "
        "a = native.default_arena() if native.available() else None; "
        "p = native.shared_pool() if native.available() else None; "
        "print('first-touch ok')"
    ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0 and "first-touch ok" in r.stdout, r.stderr[-500:]

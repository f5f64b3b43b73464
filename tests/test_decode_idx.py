"""ROI decode-index tests (round 4): the per-file side blob that records
bit-reader state per MCU so later decodes of the same file SEEK straight to
the crop window (jpeg_huff.cc IdxHeader/IdxEntry; decoders._decode_idx_blobs).

Contract: warm (seeked, column-restricted) decodes are BIT-IDENTICAL to
index-less decodes for every window, sampling mode, and restart interval —
out-of-window blocks never store anything, so only the Huffman state at each
seek target matters, and the entry restores it exactly.

Reference analogue: decoder caches keyed by source info
(dali/operators/decoder/cache/cached_decoder_impl.h — pixels there,
positions here)."""

import ctypes
import os

import numpy as np
import pytest

from dali_tpu import fn, native, pipeline_def, types

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def _encode(h, w, seed=0, q=85, dri=0, subsample=None):
    import cv2

    rng = np.random.default_rng(seed)
    small = rng.integers(0, 256, (max(h // 8, 2), max(w // 8, 2), 3), np.uint8)
    img = cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
    params = [cv2.IMWRITE_JPEG_QUALITY, q]
    if dri:
        params += [cv2.IMWRITE_JPEG_RST_INTERVAL, dri]
    if subsample is not None:
        params += [cv2.IMWRITE_JPEG_SAMPLING_FACTOR, subsample]
    ok, buf = cv2.imencode(".jpg", img, params)
    assert ok
    return np.frombuffer(buf.tobytes(), np.uint8)


def _pack_decode(data, win, ky=4, kc=4, idx=None):
    """Call the pack entry directly (with or without an index blob)."""
    lib = native._load()
    f = lib.dali_tpu_jpeg_huff_read_coeffs_split_crop_pack_idx
    f.restype = ctypes.c_int
    ybh, ybw, cbh, cbw, ybr0, ybc0, cbr0, cbc0 = win
    y_dc = np.zeros(ybh * ybw, np.int16)
    y_mask = np.zeros(ybh * ybw, np.uint16)
    y_vals = np.zeros(ybh * ybw * (ky * ky - 1) + 64, np.int8)
    c_dc = np.zeros(2 * cbh * cbw, np.int16)
    c_mask = np.zeros(2 * cbh * cbw, np.uint16)
    c_vals = np.zeros(2 * cbh * cbw * (kc * kc - 1) + 64, np.int8)
    q = np.zeros(32, np.uint16)
    ynnz = ctypes.c_longlong(0)
    cnnz = ctypes.c_longlong(0)
    vp = lambda a: a.ctypes.data_as(ctypes.c_void_p)  # noqa: E731
    rc = f(data.ctypes.data_as(ctypes.c_char_p), data.nbytes, ky, kc,
           vp(y_dc), vp(y_mask), vp(y_vals), ctypes.byref(ynnz),
           vp(c_dc),
           # cr_dc = c_dc + cbh*cbw int16 elements (2 bytes each)
           ctypes.c_void_p(c_dc.ctypes.data + 2 * cbh * cbw),
           vp(c_mask), vp(c_vals), ctypes.byref(cnnz), vp(q),
           ybh, ybw, cbh, cbw, ybr0, ybc0, cbr0, cbc0,
           idx.ctypes.data_as(ctypes.c_void_p) if idx is not None else None,
           idx.nbytes if idx is not None else 0)
    assert rc == 0
    return (y_dc, y_mask, y_vals[:ynnz.value].copy(), c_dc, c_mask,
            c_vals[:cnnz.value].copy(), q.copy())


def _windows(bh_full, bw_full, rng, n=6):
    """Random MCU-aligned windows (luma blocks) incl. the full extent."""
    my, mx = -(-bh_full // 2), -(-bw_full // 2)
    wins = []
    for _ in range(n):
        ch = int(rng.integers(1, max(my - 1, 2))) * 2
        cw = int(rng.integers(1, max(mx - 1, 2))) * 2
        r0 = int(rng.integers(0, max(my * 2 - ch, 1))) // 2 * 2
        c0 = int(rng.integers(0, max(mx * 2 - cw, 1))) // 2 * 2
        wins.append((ch, cw, ch // 2, cw // 2, r0, c0, r0 // 2, c0 // 2))
    wins.append((bh_full + bh_full % 2, bw_full + bw_full % 2, my, mx,
                 0, 0, 0, 0))
    return wins


@pytest.mark.parametrize("h,w,dri", [(192, 256, 0), (168, 232, 7),
                                     (256, 200, 64)])
def test_idx_warm_bit_identical(h, w, dri):
    """Cold (fills index) and warm (seeks) decodes match the index-less
    decode exactly, across random windows and restart intervals."""
    data = _encode(h, w, seed=h + dri, dri=dri)
    bh_full, bw_full = (h + 7) // 8, (w + 7) // 8
    mx, my = -(-bw_full // 2), -(-bh_full // 2)
    idx = np.zeros(native.decode_idx_blob_bytes(mx, my), np.uint8)
    rng = np.random.default_rng(11)
    wins = _windows(bh_full, bw_full, rng)
    for lap in range(2):  # lap 0: filling; lap 1: fully warm
        for win in wins:
            ref = _pack_decode(data, win)
            got = _pack_decode(data, win, idx=idx)
            for a, b in zip(ref, got):
                np.testing.assert_array_equal(a, b)


def test_idx_extends_downward():
    """A shallow first window indexes only the rows it reached; a later,
    deeper window seeks to the frontier, extends the index, and matches."""
    data = _encode(224, 224, seed=5)
    idx = np.zeros(native.decode_idx_blob_bytes(14, 14), np.uint8)
    shallow = (4, 8, 2, 4, 0, 2, 0, 1)      # rows 0-3 (luma blocks)
    deep = (8, 8, 4, 4, 18, 4, 9, 2)        # rows 18-25
    for win in (shallow, deep, shallow, deep):
        ref = _pack_decode(data, win)
        got = _pack_decode(data, win, idx=idx)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(a, b)
    n_valid = idx[12:16].view(np.uint32)[0]
    assert n_valid > 0


def test_idx_mismatched_blob_is_rebuilt():
    """A blob recorded for DIFFERENT file content (us_len mismatch) must be
    ignored and rebuilt, not trusted."""
    a = _encode(192, 192, seed=1)
    b = _encode(192, 192, seed=2)
    idx = np.zeros(native.decode_idx_blob_bytes(12, 12), np.uint8)
    win = (8, 8, 4, 4, 8, 8, 4, 4)
    _pack_decode(a, win, idx=idx)          # fill for content A
    ref = _pack_decode(b, win)
    got = _pack_decode(b, win, idx=idx)    # must detect + rebuild
    for x, y in zip(ref, got):
        np.testing.assert_array_equal(x, y)


def test_idx_cache_accounting_no_underflow():
    """When a file's content fingerprint changes and the replacement blob
    would exceed the cap, the stale entry must be REMOVED together with the
    `used` decrement — otherwise every later batch re-decrements the same
    bytes, `used` underflows past zero, and the DALI_TPU_DECODE_IDX_MB cap
    stops bounding anything."""
    from dali_tpu.backend.decoders import JpegCoeffsSplit

    obj = JpegCoeffsSplit.__new__(JpegCoeffsSplit)
    old = os.environ.get("DALI_TPU_DECODE_IDX_MB")
    os.environ["DALI_TPU_DECODE_IDX_MB"] = "1"  # 1 MiB cap
    try:
        # file A: big blob that eats most of the cap; file B: tiny blob
        big = np.zeros((170 * 8, 170 * 8), np.int64)  # 170x170 MCUs
        infos_a = np.array([[0, 0, 340, 340]], np.int64)   # luma blocks
        infos_b = np.array([[0, 0, 8, 8]], np.int64)
        data_a = np.arange(64, dtype=np.uint8)
        data_b1 = np.arange(64, dtype=np.uint8) + 1
        data_b2 = np.arange(64, dtype=np.uint8) + 2  # B re-encoded
        del big
        obj._decode_idx_blobs(["A"], infos_a, 0, 1, datas=[data_a])
        obj._decode_idx_blobs(["B"], infos_b, 0, 1, datas=[data_b1])
        cache = obj._idx_cache
        size_a = cache["map"]["A"][1].nbytes
        assert size_a + native.decode_idx_blob_bytes(170, 170) > cache["cap"]
        used_after_fill = cache["used"]
        # B's content changes AND its replacement (now a big image) no
        # longer fits: the stale blob must be reclaimed exactly once
        big_infos_b = np.array([[0, 0, 340, 340]], np.int64)
        for _ in range(3):  # replaying must not re-decrement
            blobs = obj._decode_idx_blobs(["B"], big_infos_b, 0, 1,
                                          datas=[data_b2])
            assert blobs == [None]  # over cap: no blob served
            assert cache["used"] == size_a
            assert "B" not in cache["map"]
        assert cache["used"] >= 0
        assert cache["used"] == used_after_fill - (used_after_fill - size_a)
    finally:
        if old is None:
            os.environ.pop("DALI_TPU_DECODE_IDX_MB", None)
        else:
            os.environ["DALI_TPU_DECODE_IDX_MB"] = old


def _rrc_pipeline_runs(tmp_path, env, n_runs=8, scale=2):
    """Build + run the hybrid RRC pipeline under the given env overrides."""
    import cv2

    root = tmp_path / "data" / "c0"
    if not root.exists():
        root.mkdir(parents=True)
        rng = np.random.default_rng(0)
        for i in range(10):
            hh, ww = int(rng.integers(80, 160)), int(rng.integers(80, 160))
            small = rng.integers(0, 256, (hh // 8, ww // 8, 3), np.uint8)
            img = cv2.resize(small, (ww, hh), interpolation=cv2.INTER_CUBIC)
            cv2.imwrite(str(root / f"{i}.jpg"), img,
                        [cv2.IMWRITE_JPEG_QUALITY, 85])

    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        @pipeline_def(batch_size=4, num_threads=2, seed=1234)
        def p():
            enc, lab = fn.readers.file(file_root=str(tmp_path / "data"),
                                       random_shuffle=True, name="r")
            img = fn.decoders.image_random_crop(
                enc, device="mixed", hybrid_device_decode=True,
                hybrid_scale=scale)
            img = fn.resize(img, resize_x=64, resize_y=64)
            return fn.crop_mirror_normalize(
                img, dtype=types.FLOAT, output_layout="CHW",
                mean=[0.0] * 3, std=[1.0] * 3), lab

        pipe = p()
        pipe.build()
        runs = []
        for _ in range(n_runs):  # > 3 epochs of 10 files at batch 4
            out, _ = pipe.run()
            runs.append(np.asarray(out.as_tensor()).copy())
        return runs
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_pipeline_idx_ab_bit_identical(tmp_path):
    """The full RRC pipeline produces bit-identical outputs with the decode
    index on vs off, across multiple epochs (seeked + column-restricted
    decode is output-equivalent end to end)."""
    on = _rrc_pipeline_runs(tmp_path, {"DALI_TPU_DISABLE_DECODE_IDX": "0"})
    off = _rrc_pipeline_runs(tmp_path, {"DALI_TPU_DISABLE_DECODE_IDX": "1"})
    for a, b in zip(on, off):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("scale", [1, 2])
def test_pipeline_halo_ab_bit_identical(tmp_path, scale):
    """Exact-margin decode regions (2*hybrid_scale px + MCU snap) are
    pixel-identical to the legacy full-MCU halo: the only cross-block reach
    in the device tail is the triangular chroma upsample's single-chroma-px
    tap (kernels/jpeg.py _up1d)."""
    tight = _rrc_pipeline_runs(tmp_path, {"DALI_TPU_FULL_HALO": "0"},
                               scale=scale)
    full = _rrc_pipeline_runs(tmp_path, {"DALI_TPU_FULL_HALO": "1"},
                              scale=scale)
    for a, b in zip(tight, full):
        np.testing.assert_array_equal(a, b)


def test_idx_restart_slot_overflow_guard():
    """Files with more restart markers than the 16-bit IdxEntry.next_rst can
    address (DRI=1 on a >65535-MCU image) must stop EXTENDING the index
    rather than record wrapped slots — warm decodes stay bit-identical, the
    entries past the 16-bit frontier just aren't cached."""
    data = _encode(4112, 4096, seed=3, q=20, dri=1)  # 257x256 = 65792 MCUs
    bh_full, bw_full = 4112 // 8, 4096 // 8
    mx, my = -(-bw_full // 2), -(-bh_full // 2)
    idx = np.zeros(native.decode_idx_blob_bytes(mx, my), np.uint8)
    # a deep window forces decoding (and index-recording) past MCU 65535
    win = (8, 8, 4, 4, bh_full - 10, 8, (bh_full - 10) // 2, 4)
    ref = _pack_decode(data, win)
    for _ in range(2):  # cold fill, then warm seek
        got = _pack_decode(data, win, idx=idx)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(a, b)
    # entry m records next_rst BEFORE consuming MCU m's restart, so entry
    # 65536 still holds slot 65535 (the last addressable one); the frontier
    # must stop there instead of covering all 65792+1 MCU entries
    n_valid = int(idx[12:16].view(np.uint32)[0])
    assert 0 < n_valid <= 65537

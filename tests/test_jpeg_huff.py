"""Parity tests: from-scratch Huffman coefficient decoder (jpeg_huff.cc) vs
the libjpeg coefficient path (jpeg_coeffs_split.cc).

Both produce quantized DCT coefficients — exact integers — so the comparison
is bit-exact equality, not a tolerance. Fixture JPEGs are produced by the
native libjpeg encoder (jpeg_encode.cc) so restart intervals / 4:4:4 /
progressive variants are all covered.

Reference analogue: dali/test/python decoder tests compare nvJPEG vs host
paths sample-exactly.
"""

import numpy as np
import pytest

from dali_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native runtime not built")


def _img(h, w, seed):
    rng = np.random.default_rng(seed)
    # low-frequency content: upsample small noise (compresses like photos)
    small = rng.integers(0, 256, (max(h // 8, 1), max(w // 8, 1), 3), np.uint8)
    reps = (-(-h // small.shape[0]), -(-w // small.shape[1]))
    big = np.kron(small, np.ones((reps[0], reps[1], 1), np.uint8))[:h, :w]
    return np.ascontiguousarray(big)


def _windows(data, ky, kc):
    """Full-extent windows from the stream's geometry."""
    info = np.zeros(7, np.int32)
    import ctypes

    lib = native._load()
    ints = [ctypes.c_int() for _ in range(7)]
    rc = lib.dali_tpu_jpeg_coef_info(data, len(data), *[ctypes.byref(i) for i in ints])
    assert rc == 0
    h, w, ybh, ybw, cbh, cbw, mode = [i.value for i in ints]
    return ybh, ybw, cbh, cbw


def _compare(data, ky=4, kc=4, crop=None):
    ybh, ybw, cbh, cbw = _windows(data, ky, kc)
    kw = {}
    if crop is not None:
        ybh, ybw, y_br0, y_bc0, cbh, cbw, c_br0, c_bc0 = crop
        kw = dict(y_br0=y_br0, y_bc0=y_bc0, c_br0=c_br0, c_bc0=c_bc0)
    fast = native.jpeg_read_coeffs_split_crop(data, ky, kc, ybh, ybw, cbh, cbw,
                                              impl="huff", **kw)
    ref = native.jpeg_read_coeffs_split_crop(data, ky, kc, ybh, ybw, cbh, cbw,
                                             impl="libjpeg", **kw)
    assert ref is not None
    assert fast is not None, "fast path unexpectedly fell back"
    names = ["y_dc", "y_ac", "c_dc", "c_ac", "q"]
    for name, a, b in zip(names, fast, ref):
        np.testing.assert_array_equal(a, b, err_msg=f"{name} mismatch")


@pytest.mark.parametrize("h,w", [(96, 128), (37, 61), (128, 96), (17, 23), (8, 8), (200, 317)])
@pytest.mark.parametrize("quality", [50, 85, 98])
def test_huff_parity_420(h, w, quality):
    data = native.jpeg_encode_rgb(_img(h, w, h * w + quality), quality=quality)
    _compare(data)


@pytest.mark.parametrize("h,w", [(64, 64), (33, 47)])
def test_huff_parity_444(h, w):
    data = native.jpeg_encode_rgb(_img(h, w, 7), quality=90, subsamp=1)
    _compare(data)


@pytest.mark.parametrize("ri", [1, 3, 17])
def test_huff_parity_restart_markers(ri):
    data = native.jpeg_encode_rgb(_img(96, 144, ri), quality=80, restart_interval=ri)
    _compare(data)


def test_huff_parity_full_spectrum():
    # ky=kc=8 keeps all 64 coefficients (the lossless-transcode configuration)
    data = native.jpeg_encode_rgb(_img(80, 80, 3), quality=92)
    _compare(data, ky=8, kc=8)


@pytest.mark.parametrize("seed", range(6))
def test_huff_parity_cropped_windows(seed):
    rng = np.random.default_rng(seed)
    h, w = int(rng.integers(48, 240)), int(rng.integers(48, 240))
    data = native.jpeg_encode_rgb(_img(h, w, seed + 100), quality=85)
    ybh, ybw, cbh, cbw = _windows(data, 4, 4)
    # sample a 16px-aligned luma window like the fused RRC path does
    wbh = int(rng.integers(1, max(ybh // 2, 2))) * 2
    wbw = int(rng.integers(1, max(ybw // 2, 2))) * 2
    br0 = int(rng.integers(0, max((ybh - wbh) // 2, 1))) * 2
    bc0 = int(rng.integers(0, max((ybw - wbw) // 2, 1))) * 2
    crop = (wbh, wbw, br0, bc0, wbh // 2, wbw // 2, br0 // 2, bc0 // 2)
    _compare(data, crop=crop)


def test_huff_window_past_image_edge():
    # canvas dims larger than the real block extent: uncovered cells are zero
    data = native.jpeg_encode_rgb(_img(40, 40, 5), quality=85)
    ybh, ybw, cbh, cbw = _windows(data, 4, 4)
    _compare(data, crop=(ybh + 4, ybw + 4, 0, 0, cbh + 2, cbw + 2, 0, 0))


def test_huff_rejects_progressive():
    data = native.jpeg_encode_rgb(_img(64, 64, 9), quality=85, progressive=True)
    out = native.jpeg_read_coeffs_split_crop(data, 4, 4, 8, 8, 4, 4, impl="huff")
    assert out is None  # falls back to libjpeg in the batch path


def test_huff_truncated_stream_zero_fills():
    data = native.jpeg_encode_rgb(_img(96, 96, 11), quality=85)
    cut = data[: len(data) // 2]
    out = native.jpeg_read_coeffs_split_crop(cut, 4, 4, 12, 12, 6, 6, impl="huff")
    # decodes what exists, zero-fills the tail, and does not crash
    assert out is not None
    assert out[0].shape == (12, 12)


def test_huff_garbage_does_not_crash():
    rng = np.random.default_rng(0)
    for n in (0, 1, 2, 64, 4096):
        blob = rng.integers(0, 256, n, np.uint8).tobytes()
        native.jpeg_read_coeffs_split_crop(blob, 4, 4, 8, 8, 4, 4, impl="huff")
    # valid SOI then garbage
    native.jpeg_read_coeffs_split_crop(b"\xff\xd8" + b"\x00" * 100, 4, 4, 8, 8, 4, 4, impl="huff")


def test_batch_path_uses_fast_decoder_transparently():
    # the batch entry must produce identical results with the fast decoder
    # enabled (default) and disabled (env var) — exercised via env toggle
    import os
    import subprocess
    import sys

    code = """
import numpy as np
from dali_tpu import native
rng = np.random.default_rng(42)
small = rng.integers(0, 256, (12, 16, 3), np.uint8)
big = np.kron(small, np.ones((8, 8, 1), np.uint8))
data = native.jpeg_encode_rgb(big, quality=85)
out = native.jpeg_coeffs_split_flat_batch([np.frombuffer(data, np.uint8)], 4, 4,
                                          np.array([[12, 16, 6, 8]], np.int32),
                                          [12*16, 12*16*15, 2*6*8, 2*6*8*15])
y_dc = out[0]
print(int(np.abs(y_dc[:12*16].astype(np.int64)).sum()))
"""
    env = dict(os.environ)
    r1 = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, env=env)
    env["DALI_TPU_DISABLE_FAST_HUFF"] = "1"
    r2 = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, env=env)
    assert r1.returncode == 0, r1.stderr
    assert r2.returncode == 0, r2.stderr
    assert r1.stdout == r2.stdout and r1.stdout.strip()


@pytest.mark.parametrize("subsamp,cdiv", [(1, (1, 1)), (2, (1, 2))])
def test_huff_parity_cropped_windows_other_samplings(subsamp, cdiv):
    """Windowed reads for 4:4:4 / 4:2:2 match the libjpeg path bit-exactly."""
    rng = np.random.default_rng(31)
    data = native.jpeg_encode_rgb(_img(120, 144, 31), quality=88, subsamp=subsamp)
    ybh, ybw, cbh, cbw = _windows(data, 4, 4)
    wbh, wbw = 8, 10
    br0, bc0 = 4, 6
    dr, dc = cdiv
    crop = (wbh, wbw, br0, bc0, wbh // dr, wbw // dc, br0 // dr, bc0 // dc)
    _compare(data, crop=crop)


# ===================== progressive (SOF2) decoder =====================

def _call_coeffs(fn_name, data, ky, kc, ybh, ybw, cbh, cbw,
                 ybr0=0, ybc0=0, cbr0=0, cbc0=0):
    import ctypes

    lib = native._load()
    fn = getattr(lib, fn_name)
    if fn.argtypes is None:
        fn.restype = ctypes.c_int
        fn.argtypes = ([ctypes.c_char_p, ctypes.c_size_t]
                       + [ctypes.c_int] * 2 + [ctypes.c_void_p] * 7
                       + [ctypes.c_int] * 8)
    y_dc = np.zeros(ybh * ybw, np.int16)
    y_ac = np.zeros(ybh * ybw * (ky * ky - 1), np.int8)
    cb_dc = np.zeros(cbh * cbw, np.int16)
    cb_ac = np.zeros(cbh * cbw * (kc * kc - 1), np.int8)
    cr_dc = np.zeros(cbh * cbw, np.int16)
    cr_ac = np.zeros(cbh * cbw * (kc * kc - 1), np.int8)
    q = np.zeros(128, np.uint16)
    import ctypes as ct
    rc = fn(data, len(data), ky, kc,
            *[a.ctypes.data_as(ct.c_void_p)
              for a in (y_dc, y_ac, cb_dc, cb_ac, cr_dc, cr_ac, q)],
            ybh, ybw, cbh, cbw, ybr0, ybc0, cbr0, cbc0)
    return rc, (y_dc, y_ac, cb_dc, cb_ac, cr_dc, cr_ac, q)


def _compare_progressive(data, ky, kc, ybh, ybw, cbh, cbw, **win):
    rc1, ours = _call_coeffs(
        "dali_tpu_jpeg_huff_progressive_read_coeffs_split_crop",
        data, ky, kc, ybh, ybw, cbh, cbw, **win)
    rc2, ref = _call_coeffs(
        "dali_tpu_jpeg_read_coeffs_split_crop",
        data, ky, kc, ybh, ybw, cbh, cbw, **win)
    assert rc1 == 0 and rc2 == 0, (rc1, rc2)
    for name, a, b in zip(["y_dc", "y_ac", "cb_dc", "cb_ac", "cr_dc",
                           "cr_ac", "q"], ours, ref):
        np.testing.assert_array_equal(a, b, err_msg=f"{name} mismatch")


@pytest.mark.parametrize("h,w", [(96, 128), (37, 61), (17, 23), (200, 160)])
@pytest.mark.parametrize("quality", [50, 85, 98])
def test_progressive_parity_420(h, w, quality):
    data = native.jpeg_encode_rgb(_img(h, w, h * w + quality),
                                  quality=quality, progressive=True)
    _compare_progressive(data, 4, 4, -(-h // 8), -(-w // 8),
                         -(-h // 16), -(-w // 16))


@pytest.mark.parametrize("ky", [2, 4, 8])
def test_progressive_parity_selections(ky):
    """Small selections exercise the scan keep-set fixpoint: the standard
    script's full-band refinements pull in first-pass scans a naive
    band-vs-selection skip would drop (bit-desync bug class)."""
    h, w = 88, 104
    data = native.jpeg_encode_rgb(_img(h, w, 5), quality=85, progressive=True)
    _compare_progressive(data, ky, ky, -(-h // 8), -(-w // 8),
                         -(-h // 16), -(-w // 16))


@pytest.mark.parametrize("sub", [0, 1])
@pytest.mark.parametrize("ri", [0, 3])
def test_progressive_parity_sampling_restart(sub, ri):
    h, w = 120, 136
    data = native.jpeg_encode_rgb(_img(h, w, sub * 10 + ri), quality=85,
                                  subsamp=sub, restart_interval=ri,
                                  progressive=True)
    if sub == 0:
        cbh, cbw = -(-h // 16), -(-w // 16)
    else:
        cbh, cbw = -(-h // 8), -(-w // 8)
    _compare_progressive(data, 4, 4, -(-h // 8), -(-w // 8), cbh, cbw)


def test_progressive_parity_crop_windows():
    rng = np.random.default_rng(3)
    h, w = 280, 312
    data = native.jpeg_encode_rgb(_img(h, w, 9), quality=85, progressive=True)
    for _ in range(6):
        y0 = int(rng.integers(0, 12)) * 2
        x0 = int(rng.integers(0, 14)) * 2
        bh = int(rng.integers(2, 10)) * 2
        bw = int(rng.integers(2, 10)) * 2
        _compare_progressive(data, 4, 4, bh, bw, bh // 2, bw // 2,
                             ybr0=y0, ybc0=x0, cbr0=y0 // 2, cbc0=x0 // 2)


def test_progressive_through_pipeline_sparse_vs_dense(tmp_path):
    """Progressive streams ride the hybrid pipeline via the fallback chain
    (fast-baseline -> progressive -> libjpeg); sparse and dense wires must
    agree bit-exactly."""
    import os

    from dali_tpu import fn, pipeline_def

    d = tmp_path / "p"
    d.mkdir()
    rng = np.random.default_rng(4)
    files = []
    for i in range(4):
        img = rng.integers(0, 255, (90, 110, 3), np.uint8)
        data = native.jpeg_encode_rgb(img, quality=85, progressive=True)
        f = d / f"{i}.jpg"
        f.write_bytes(data)
        files.append(str(f))

    def run(disable_sparse):
        os.environ["DALI_TPU_DISABLE_SPARSE_WIRE"] = "1" if disable_sparse else "0"

        @pipeline_def(batch_size=4, num_threads=1, seed=2)
        def p():
            j, _ = fn.readers.file(files=files, name="R")
            return fn.decoders.image(j, device="mixed",
                                     hybrid_device_decode=True,
                                     hybrid_scale=2, hybrid_wire="int8")

        pipe = p()
        pipe.build()
        out = pipe.run()[0]
        return [np.asarray(out.at(i)) for i in range(4)]

    try:
        a = run(False)
        b = run(True)
    finally:
        os.environ.pop("DALI_TPU_DISABLE_SPARSE_WIRE", None)
    for i, (x, y) in enumerate(zip(a, b)):
        np.testing.assert_array_equal(x, y, err_msg=f"sample {i}")


def test_scan_syms_export_zero_in_shipped_build():
    """The entropy-scan floor analysis hook (jpeg_huff.cc dali_tpu_scan_syms,
    docs/performance.md round 5) must exist in the shipped lib and report
    zeros there: symbol counting is compile-gated behind -DDALI_TPU_COUNT_SYMS
    (analysis/A-B builds only) so the production store loop carries no
    counters."""
    import ctypes

    lib = native._load()
    out = (ctypes.c_longlong * 2)(1, 1)
    lib.dali_tpu_scan_syms(out, 1)
    assert out[0] == 0 and out[1] == 0

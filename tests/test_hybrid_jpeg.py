"""Hybrid JPEG decode tests: host entropy decode → device IDCT/chroma/color
(the BASELINE.json north-star split)."""

import numpy as np
import pytest

from dali_tpu import fn, native, pipeline_def
from dali_tpu.kernels import jpeg as jk

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


@pytest.fixture(scope="module")
def jpeg_bytes():
    import cv2

    rng = np.random.default_rng(3)
    small = rng.integers(0, 256, (30, 40, 3), np.uint8)
    img = cv2.resize(small, (400, 320), interpolation=cv2.INTER_CUBIC)
    ok, buf = cv2.imencode(".jpg", img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 90])
    return buf.tobytes()


def test_idct_matrix_full_is_exact_idct():
    # k=8: T must be the exact 8-point IDCT basis
    T = jk.idct_matrix(8)
    # IDCT of a pure DC coefficient: constant 1/ (2*sqrt(2)) * c
    c = np.zeros((8, 8), np.float32)
    c[0, 0] = 8.0
    px = T @ c @ T.T
    np.testing.assert_allclose(px, np.ones((8, 8)), atol=1e-5)


@pytest.mark.parametrize("ky,tol_luma", [(8, 1.0), (4, 1.0)])
def test_device_tail_matches_libjpeg_luma(jpeg_bytes, ky, tol_luma):
    info = native.jpeg_coef_info(jpeg_bytes)
    assert info is not None
    h, w, ybh, ybw, cbh, cbw, mode = info
    kc = jk.chroma_k(ky, mode == 0)
    y, c, q = native.jpeg_read_coeffs(jpeg_bytes, ky, kc, ybh, ybw, cbh, cbw)
    rgb = jk.jpeg_device_tail(np, y, c, q, ky, mode_420=(mode == 0))
    ref = native.decode_jpeg(jpeg_bytes, denom=8 // ky)
    valid = rgb[: ref.shape[0], : ref.shape[1]].astype(np.float64)
    reff = ref.astype(np.float64)

    def luma(x):
        return 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]

    assert np.abs(luma(valid) - luma(reff)).mean() < tol_luma


def test_full_chroma_matches_libjpeg_exactly(jpeg_bytes):
    info = native.jpeg_coef_info(jpeg_bytes)
    h, w, ybh, ybw, cbh, cbw, mode = info
    ky = 4
    kc = jk.chroma_k(ky, True, chroma_full=True)
    y, c, q = native.jpeg_read_coeffs(jpeg_bytes, ky, kc, ybh, ybw, cbh, cbw)
    rgb = jk.jpeg_device_tail(np, y, c, q, ky, True, chroma_full=True)
    ref = native.decode_jpeg(jpeg_bytes, denom=2)
    diff = np.abs(rgb[: ref.shape[0], : ref.shape[1]].astype(int) - ref.astype(int))
    assert diff.mean() < 1.0 and diff.max() <= 4


def test_hybrid_pipeline_end_to_end(jpeg_bytes):
    @pipeline_def(batch_size=2, num_threads=1, seed=1)
    def pipe():
        e = fn.external_source(
            source=lambda: [np.frombuffer(jpeg_bytes, np.uint8)] * 2, batch=True
        )
        img = fn.decoders.image(e, device="mixed", hybrid_device_decode=True, hybrid_scale=2)
        return fn.resize(img, resize_x=64, resize_y=64)

    out = pipe().run()[0]
    arr = np.asarray(out.as_tensor())
    assert arr.shape == (2, 64, 64, 3)
    ref = native.decode_jpeg(jpeg_bytes, denom=2)
    import cv2

    ref_small = cv2.resize(ref, (64, 64), interpolation=cv2.INTER_AREA)
    diff = np.abs(arr[0].astype(int) - ref_small.astype(int))
    assert diff.mean() < 12  # chroma reduction + filter differences


def test_hybrid_unsupported_format_raises(tmp_path):
    import cv2

    gray = np.zeros((64, 64), np.uint8)
    ok, buf = cv2.imencode(".png", gray)

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        e = fn.external_source(source=lambda: [np.frombuffer(buf.tobytes(), np.uint8)], batch=True)
        return fn.decoders.image(e, device="mixed", hybrid_device_decode=True)

    with pytest.raises(ValueError, match="hybrid_device_decode"):
        pipe().run()


def test_hybrid_rrc_matches_full_decode_crop(tmp_path):
    """DCT-domain random crop == full hybrid decode then crop, bit-exact at
    scale 1 (same Philox stream draws the same window)."""
    import cv2

    from dali_tpu.backend.base import HostCtx
    from dali_tpu.backend.decoders import sample_rrc_windows_batch

    root = tmp_path / "imgs" / "c"
    root.mkdir(parents=True)
    rng = np.random.default_rng(11)
    for i, (h, w) in enumerate([(120, 200), (257, 311)]):
        small = rng.integers(0, 256, (h // 8, w // 8, 3), np.uint8)
        cv2.imwrite(str(root / f"{i}.jpg"),
                    cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC))

    @pipeline_def(batch_size=2, num_threads=1, seed=9)
    def fused():
        jp, _ = fn.readers.file(file_root=str(tmp_path / "imgs"), name="r")
        return fn.decoders.image_random_crop(
            jp, device="mixed", hybrid_device_decode=True, seed=123)

    @pipeline_def(batch_size=2, num_threads=1, seed=9)
    def full():
        jp, _ = fn.readers.file(file_root=str(tmp_path / "imgs"), name="r")
        return fn.decoders.image(jp, device="mixed", hybrid_device_decode=True,
                                 hybrid_wire="int8")

    pf, pg = fused(), full()
    pf.build(), pg.build()
    (crop,) = pf.run()
    (whole,) = pg.run()
    rrc_op = next(i for i in pf._executor.impls.values()
                  if type(i).__name__ == "JpegCoeffsSplitRRC")
    ctx = HostCtx(pf, 0, 0)
    hw = np.array([whole.shape()[i][:2] for i in range(2)])
    wins = sample_rrc_windows_batch(ctx.rng(rrc_op), hw, [0.08, 1.0],
                                    [3 / 4, 4 / 3], 10)
    for i in range(2):
        y, x, ch, cw = (int(v) for v in wins[i])
        want = np.asarray(whole.as_tensor())[i][y:y + ch, x:x + cw]
        gh, gw, _ = crop.shape()[i]
        got = np.asarray(crop.as_tensor())[i][:gh, :gw]
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("subsamp,mode_name", [(1, "444"), (2, "422")])
def test_hybrid_decode_444_422(tmp_path, subsamp, mode_name):
    """4:4:4 and 4:2:2 ride the split hybrid path (sampling mode is a
    jit-static); at scale 1 the output matches the full host decode to
    within IDCT rounding."""
    import cv2

    from dali_tpu import native

    if not native.available():
        pytest.skip("native runtime not built")
    rng = np.random.default_rng(5)
    root = tmp_path / "imgs" / "c"
    root.mkdir(parents=True)
    for i, (h, w) in enumerate([(56, 72), (41, 67)]):
        small = rng.integers(0, 256, (max(h // 8, 1), max(w // 8, 1), 3), np.uint8)
        img = cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
        enc = native.jpeg_encode_rgb(img, quality=92, subsamp=subsamp)
        (root / f"{i}.jpg").write_bytes(enc)

    def make(hybrid):
        @pipeline_def(batch_size=2, num_threads=1, seed=9)
        def p():
            jp, _ = fn.readers.file(file_root=str(tmp_path / "imgs"), name="r")
            return fn.decoders.image(jp, device="mixed",
                                     hybrid_device_decode=hybrid)

        return p()

    ph, pf = make(True), make(False)
    ph.build(), pf.build()
    (hyb,) = ph.run()
    (full,) = pf.run()
    for i in range(2):
        a = np.asarray(hyb.as_tensor())[i]
        b = np.asarray(full.as_tensor())[i]
        hh, ww, _ = full.shape()[i]
        diff = np.abs(a[:hh, :ww].astype(np.int32) - b[:hh, :ww].astype(np.int32))
        # IDCT/upsample rounding only (same allowance as the 4:2:0
        # chroma_full parity test: float vs libjpeg integer IDCT)
        assert diff.max() <= 4 and diff.mean() < 0.6, (mode_name, diff.max(), diff.mean())


def test_hybrid_mixed_sampling_batch_raises(tmp_path):
    from dali_tpu import native

    if not native.available():
        pytest.skip("native runtime not built")
    rng = np.random.default_rng(6)
    root = tmp_path / "imgs" / "c"
    root.mkdir(parents=True)
    img = rng.integers(0, 256, (32, 32, 3), np.uint8)
    (root / "a.jpg").write_bytes(native.jpeg_encode_rgb(img, subsamp=0))
    (root / "b.jpg").write_bytes(native.jpeg_encode_rgb(img, subsamp=1))

    @pipeline_def(batch_size=2, num_threads=1, seed=9)
    def p():
        jp, _ = fn.readers.file(file_root=str(tmp_path / "imgs"), name="r")
        return fn.decoders.image(jp, device="mixed", hybrid_device_decode=True)

    pipe = p()
    pipe.build()
    with pytest.raises(Exception, match="mixed chroma samplings"):
        pipe.run()


@pytest.mark.parametrize("subsamp", [0, 1, 2])
def test_hybrid_scaled_decode_all_modes(tmp_path, subsamp):
    """hybrid_scale=2 for every sampling mode: output tracks the full decode
    downscaled (the scaled IDCT approximates box downsampling)."""
    import cv2

    rng = np.random.default_rng(7)
    root = tmp_path / "imgs" / "c"
    root.mkdir(parents=True)
    h, w = 64, 80
    small = rng.integers(0, 256, (h // 8, w // 8, 3), np.uint8)
    img = cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
    (root / "0.jpg").write_bytes(native.jpeg_encode_rgb(img, quality=92,
                                                        subsamp=subsamp))

    @pipeline_def(batch_size=1, num_threads=1, seed=9)
    def p():
        jp, _ = fn.readers.file(file_root=str(tmp_path / "imgs"), name="r")
        return fn.decoders.image(jp, device="mixed", hybrid_device_decode=True,
                                 hybrid_scale=2)

    pipe = p()
    pipe.build()
    (out,) = pipe.run()
    a = np.asarray(out.as_tensor())[0]
    hh, ww, _ = out.shape()[0]
    assert (hh, ww) == (h // 2, w // 2)
    ref = cv2.resize(img, (w // 2, h // 2), interpolation=cv2.INTER_AREA)
    diff = np.abs(a[:hh, :ww].astype(np.int32) - ref.astype(np.int32))
    assert diff.mean() < 8.0, (subsamp, diff.mean())


@pytest.mark.parametrize("subsamp", [1, 2])
def test_hybrid_444_422_per_sample_fallback_path(tmp_path, subsamp, monkeypatch):
    """The padded-canvas run_batch path (taken when flat staging is
    unavailable) must honor the sampling mode's chroma alignment too."""
    import cv2

    from dali_tpu import native as _n

    rng = np.random.default_rng(8)
    root = tmp_path / "imgs" / "c"
    root.mkdir(parents=True)
    # ragged sizes chosen so luma/chroma canvas aligns differ without the fix
    for i, (h, w) in enumerate([(56, 72), (41, 67)]):
        small = rng.integers(0, 256, (max(h // 8, 1), max(w // 8, 1), 3), np.uint8)
        img = cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
        (root / f"{i}.jpg").write_bytes(
            native.jpeg_encode_rgb(img, quality=92, subsamp=subsamp))
    monkeypatch.setattr(_n, "jpeg_coeffs_split_flat_batch",
                        lambda *a, **k: None)  # force run_batch staging

    @pipeline_def(batch_size=2, num_threads=1, seed=9)
    def p():
        jp, _ = fn.readers.file(file_root=str(tmp_path / "imgs"), name="r")
        return fn.decoders.image(jp, device="mixed", hybrid_device_decode=True,
                                 hybrid_wire="int8")

    pipe = p()
    pipe.build()
    (out,) = pipe.run()
    assert out.shape()[0] == (56, 72, 3)
    assert out.shape()[1] == (41, 67, 3)


def test_hybrid_mode_switch_across_batches(tmp_path):
    """Consecutive single-mode batches of DIFFERENT modes through one
    pipeline: the grow-only canvases must not strand the new mode's
    chroma/luma coupling."""
    import cv2

    rng = np.random.default_rng(9)
    imgs = {}
    for sub, name in ((0, "a420"), (2, "b422"), (1, "c444")):
        d = tmp_path / name / "c"
        d.mkdir(parents=True)
        # 420 batch first with LARGER images so its canvases linger
        h, w = (96, 128) if sub == 0 else (48, 56)
        small = rng.integers(0, 256, (h // 8, w // 8, 3), np.uint8)
        img = cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
        (d / "0.jpg").write_bytes(native.jpeg_encode_rgb(img, subsamp=sub))
        imgs[name] = (str(tmp_path / name), (h, w))

    sources = [imgs["a420"], imgs["b422"], imgs["c444"], imgs["a420"]]
    state = {"i": 0}

    def src():
        root, _ = sources[state["i"] % len(sources)]
        state["i"] += 1
        import glob

        with open(glob.glob(root + "/c/*.jpg")[0], "rb") as f:
            return [np.frombuffer(f.read(), np.uint8)]

    @pipeline_def(batch_size=1, num_threads=1, seed=9, prefetch_queue_depth=1)
    def p():
        e = fn.external_source(source=src, batch=True)
        return fn.decoders.image(e, device="mixed", hybrid_device_decode=True)

    pipe = p()
    pipe.build()
    for root, (h, w) in sources:
        (out,) = pipe.run()
        assert out.shape()[0] == (h, w, 3), (root, out.shape())


def test_hybrid_coefficient_cache(tmp_path):
    """cache_size on the hybrid decoder caches entropy-decoded coefficient
    planes by source_info (reference decoder cache applied to the hybrid
    wire): epoch 2+ skips the Huffman decode and produces identical output."""
    import cv2

    root = tmp_path / "imgs" / "c"
    root.mkdir(parents=True)
    rng = np.random.default_rng(13)
    for i in range(4):
        small = rng.integers(0, 256, (8, 10, 3), np.uint8)
        cv2.imwrite(str(root / f"{i}.jpg"),
                    cv2.resize(small, (80, 64), interpolation=cv2.INTER_CUBIC))

    def make(cache_mb):
        @pipeline_def(batch_size=4, num_threads=1, seed=5)
        def p():
            jp, _ = fn.readers.file(file_root=str(tmp_path / "imgs"), name="r")
            img = fn.decoders.image_random_crop(
                jp, device="mixed", hybrid_device_decode=True, seed=77,
                cache_size=cache_mb)
            return fn.resize(img, resize_x=32, resize_y=32)

        return p()

    pc, pn = make(64), make(0)
    pc.build(), pn.build()
    for it in range(3):  # epoch = 1 iteration; 2nd+ hits the cache
        a = np.asarray(pc.run()[0].as_tensor())
        b = np.asarray(pn.run()[0].as_tensor())
        np.testing.assert_array_equal(a, b)
    coeffs_op = next(i for i in pc._executor.impls.values()
                     if type(i).__name__ == "JpegCoeffsSplitRRC")
    st = coeffs_op._ccache
    assert st["misses"] == 4 and st["hits"] == 8, (st["hits"], st["misses"])


def test_hybrid_cache_budget_eviction(tmp_path):
    """A tiny budget keeps the cache within bounds (entries beyond the
    budget simply decode every time)."""
    import cv2

    root = tmp_path / "imgs" / "c"
    root.mkdir(parents=True)
    rng = np.random.default_rng(14)
    for i in range(3):
        cv2.imwrite(str(root / f"{i}.jpg"),
                    rng.integers(0, 256, (400, 500, 3), np.uint8),
                    [cv2.IMWRITE_JPEG_QUALITY, 95])

    @pipeline_def(batch_size=3, num_threads=1, seed=5)
    def p():
        jp, _ = fn.readers.file(file_root=str(tmp_path / "imgs"), name="r")
        img = fn.decoders.image(jp, device="mixed", hybrid_device_decode=True,
                                hybrid_wire="int8", cache_size=1)  # 1 MB
        return fn.resize(img, resize_x=32, resize_y=32)

    pipe = p()
    pipe.build()
    for _ in range(2):
        pipe.run()
    op = next(i for i in pipe._executor.impls.values()
              if type(i).__name__ == "JpegCoeffsSplit")
    assert op._ccache["used"] <= (1 << 20)


def test_hybrid_coefficient_cache_int16_wire(tmp_path):
    """cache_size works on the DEFAULT int16 hybrid wire too (regression:
    it was silently dropped there)."""
    import cv2

    root = tmp_path / "imgs" / "c"
    root.mkdir(parents=True)
    rng = np.random.default_rng(15)
    for i in range(3):
        cv2.imwrite(str(root / f"{i}.jpg"),
                    rng.integers(0, 256, (48, 56, 3), np.uint8))

    @pipeline_def(batch_size=3, num_threads=1, seed=5)
    def p():
        jp, _ = fn.readers.file(file_root=str(tmp_path / "imgs"), name="r")
        img = fn.decoders.image(jp, device="mixed", hybrid_device_decode=True,
                                cache_size=64)  # default hybrid_wire="int16"
        return fn.resize(img, resize_x=24, resize_y=24)

    pipe = p()
    pipe.build()
    a = np.asarray(pipe.run()[0].as_tensor())
    b = np.asarray(pipe.run()[0].as_tensor())
    np.testing.assert_array_equal(a, b)  # hit path identical
    op = next(i for i in pipe._executor.impls.values()
              if type(i).__name__ == "JpegCoeffs")
    assert op._ccache["misses"] == 3 and op._ccache["hits"] == 3


@pytest.mark.parametrize("subsamp", [1, 2])
def test_hybrid_rrc_444_422_matches_full_decode_crop(tmp_path, subsamp):
    """Fused DCT-domain RRC for 4:4:4 / 4:2:2: bit-exact vs full hybrid
    decode then crop at scale 1 (extends the 4:2:0 parity test)."""
    import cv2

    from dali_tpu.backend.base import HostCtx
    from dali_tpu.backend.decoders import sample_rrc_windows_batch

    root = tmp_path / "imgs" / "c"
    root.mkdir(parents=True)
    rng = np.random.default_rng(17)
    for i, (h, w) in enumerate([(110, 180), (231, 175)]):
        small = rng.integers(0, 256, (h // 8, w // 8, 3), np.uint8)
        img = cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
        (root / f"{i}.jpg").write_bytes(
            native.jpeg_encode_rgb(img, quality=90, subsamp=subsamp))

    @pipeline_def(batch_size=2, num_threads=1, seed=9)
    def fused():
        jp, _ = fn.readers.file(file_root=str(tmp_path / "imgs"), name="r")
        return fn.decoders.image_random_crop(
            jp, device="mixed", hybrid_device_decode=True, seed=123)

    @pipeline_def(batch_size=2, num_threads=1, seed=9)
    def full():
        jp, _ = fn.readers.file(file_root=str(tmp_path / "imgs"), name="r")
        return fn.decoders.image(jp, device="mixed", hybrid_device_decode=True,
                                 hybrid_wire="int8")

    pf, pg = fused(), full()
    pf.build(), pg.build()
    (crop,) = pf.run()
    (whole,) = pg.run()
    rrc_op = next(i for i in pf._executor.impls.values()
                  if type(i).__name__ == "JpegCoeffsSplitRRC")
    ctx = HostCtx(pf, 0, 0)
    hw = np.array([whole.shape()[i][:2] for i in range(2)])
    wins = sample_rrc_windows_batch(ctx.rng(rrc_op), hw, [0.08, 1.0],
                                    [3 / 4, 4 / 3], 10)
    for i in range(2):
        y, x, ch, cw = (int(v) for v in wins[i])
        want = np.asarray(whole.as_tensor())[i][y:y + ch, x:x + cw]
        gh, gw, _ = crop.shape()[i]
        got = np.asarray(crop.as_tensor())[i][:gh, :gw]
        np.testing.assert_array_equal(got, want)


def test_sparse_pack_roundtrip():
    """sparse_pack_i8 (native/src/sparse_pack.cc): mask+vals rebuild the
    dense plane exactly, for SIMD and scalar-tail block counts."""
    rng = np.random.default_rng(3)
    for n_blocks, nac in [(1, 15), (2, 15), (37, 15), (1000, 15), (64, 8), (5, 3)]:
        dense = rng.integers(-30, 30, n_blocks * nac).astype(np.int8)
        dense[rng.random(dense.shape) < 0.6] = 0  # typical sparsity
        mask = np.zeros(n_blocks, np.uint16)
        vals = np.zeros(n_blocks * nac + 16, np.int8)
        nnz = native.sparse_pack_i8(dense, n_blocks, nac, mask, vals)
        assert nnz == int(np.count_nonzero(dense))
        rebuilt = np.zeros_like(dense)
        t = 0
        for b in range(n_blocks):
            for j in range(nac):
                if mask[b] >> j & 1:
                    rebuilt[b * nac + j] = vals[t]
                    t += 1
        np.testing.assert_array_equal(rebuilt, dense)
        assert t == nnz


def test_sparse_wire_matches_dense(tmp_path, monkeypatch):
    """The sparse AC wire (mask + packed nonzeros, device-side rebuild in
    executor._unsparse_boundary) is bit-identical to the dense flat wire."""
    import os
    d = tmp_path / "imgs" / "c"
    d.mkdir(parents=True)
    rng = np.random.default_rng(11)
    for i, (h, w) in enumerate([(64, 80), (112, 96), (57, 41)]):
        img = np.kron(rng.integers(0, 256, (h // 8, w // 8, 3), np.uint8),
                      np.ones((8, 8, 1), np.uint8))[:h, :w]
        (d / f"{i}.jpg").write_bytes(
            native.jpeg_encode_rgb(np.ascontiguousarray(img), quality=88))

    from dali_tpu import fn, pipeline_def

    def build():
        @pipeline_def(batch_size=3, num_threads=1, seed=5)
        def p():
            jp, _ = fn.readers.file(file_root=str(tmp_path / "imgs"), name="r")
            return fn.decoders.image(jp, device="mixed", hybrid_device_decode=True)
        pipe = p()
        pipe.build()
        return np.asarray(pipe.run()[0].as_tensor())

    monkeypatch.setenv("DALI_TPU_DISABLE_SPARSE_WIRE", "1")
    dense = build()
    monkeypatch.setenv("DALI_TPU_DISABLE_SPARSE_WIRE", "0")
    sparse = build()
    np.testing.assert_array_equal(dense, sparse)


def test_sparse_wire_matches_dense_rrc(tmp_path, monkeypatch):
    """Sparse wire parity on the PRODUCTION path: the fused DCT-domain
    RandomResizedCrop decoder (JpegCoeffsSplitRRC) with per-iteration
    varying crop windows."""
    d = tmp_path / "imgs" / "c"
    d.mkdir(parents=True)
    rng = np.random.default_rng(21)
    for i, (h, w) in enumerate([(96, 128), (160, 112), (80, 80), (131, 99)]):
        img = np.kron(rng.integers(0, 256, (h // 8, w // 8, 3), np.uint8),
                      np.ones((8, 8, 1), np.uint8))[:h, :w]
        (d / f"{i}.jpg").write_bytes(
            native.jpeg_encode_rgb(np.ascontiguousarray(img), quality=85))

    from dali_tpu import fn, pipeline_def

    def run3(env):
        monkeypatch.setenv("DALI_TPU_DISABLE_SPARSE_WIRE", env)

        @pipeline_def(batch_size=4, num_threads=1, seed=9)
        def p():
            jp, _ = fn.readers.file(file_root=str(tmp_path / "imgs"), name="r")
            img = fn.decoders.image_random_crop(
                jp, device="mixed", hybrid_device_decode=True, hybrid_scale=2,
                seed=77)
            return fn.resize(img, resize_x=48, resize_y=48)

        pipe = p()
        pipe.build()
        return [np.asarray(pipe.run()[0].as_tensor()) for _ in range(3)]

    dense = run3("1")
    sparse = run3("0")
    for a, b in zip(dense, sparse):
        np.testing.assert_array_equal(a, b)


def test_pack_path_restart_markers_and_444(tmp_path):
    """The pack-emit decoder (sparse wire straight from Huffman) must stay
    bit-identical to the dense wire on restart-interval streams and 4:4:4
    sampling — the cursor restart/reset logic is distinct from the plain
    decode loop's."""
    import os

    from dali_tpu import fn, native, pipeline_def

    if not native.has_pack_batch():
        pytest.skip("pack batch entry unavailable")
    rng = np.random.default_rng(5)
    # batches must be sampling-homogeneous (jit-static): one dir per mode
    cases = {"c420": [(2, 0), (5, 0)], "c444": [(0, 1), (3, 1)]}
    for name, specs in cases.items():
        d = tmp_path / name
        d.mkdir()
        for i, (ri, sub) in enumerate(specs):
            img = rng.integers(0, 255, (80, 96, 3), np.uint8)
            data = native.jpeg_encode_rgb(img, quality=85, subsamp=sub,
                                          restart_interval=ri)
            (d / f"{i}.jpg").write_bytes(data)

    def run(root, disable_sparse):
        os.environ["DALI_TPU_DISABLE_SPARSE_WIRE"] = "1" if disable_sparse else "0"
        flist = sorted(str(f) for f in root.glob("*.jpg"))

        @pipeline_def(batch_size=2, num_threads=1, seed=2)
        def p():
            j, _ = fn.readers.file(files=flist, name="R")
            return fn.decoders.image(j, device="mixed", hybrid_device_decode=True,
                                     hybrid_scale=2, hybrid_wire="int8")

        pipe = p()
        pipe.build()
        out = pipe.run()[0]
        return [np.asarray(out.at(i)) for i in range(2)]

    try:
        for name in cases:
            sparse = run(tmp_path / name, False)
            dense = run(tmp_path / name, True)
            for i, (a, b) in enumerate(zip(sparse, dense)):
                assert a.shape == b.shape
                np.testing.assert_array_equal(a, b, err_msg=f"{name} sample {i}")
    finally:
        os.environ.pop("DALI_TPU_DISABLE_SPARSE_WIRE", None)


def test_grayscale_hybrid_decode(tmp_path):
    """1-component (grayscale) JPEGs ride the hybrid path as 4:4:4 with
    synthetic zero chroma (Cb=Cr=128 after the IDCT bias -> R=G=B=Y, the
    exact gray->RGB replication libjpeg performs). ~2% of ImageNet is
    grayscale; previously these errored in hybrid pipelines."""
    import cv2

    from dali_tpu import fn, pipeline_def

    rng = np.random.default_rng(2)
    small = rng.integers(0, 255, (9, 12), np.uint8)
    gray = cv2.resize(small, (90, 70), interpolation=cv2.INTER_CUBIC)
    ok, enc = cv2.imencode(".jpg", gray, [cv2.IMWRITE_JPEG_QUALITY, 88])
    data = enc.tobytes()
    f = tmp_path / "g.jpg"
    f.write_bytes(data)

    info = native.jpeg_coef_info(data)
    assert info is not None and info[6] == 1  # reported as mode 1 (4:4:4)

    for wire, scale in (("int16", 1), ("int8", 2)):
        @pipeline_def(batch_size=1, num_threads=1, seed=1)
        def p():
            j, _ = fn.readers.file(files=[str(f)], name="R")
            return fn.decoders.image(j, device="mixed",
                                     hybrid_device_decode=True,
                                     hybrid_wire=wire, hybrid_scale=scale)

        pipe = p()
        pipe.build()
        out = np.asarray(pipe.run()[0].at(0))
        # channels exactly replicated (zero chroma)
        assert (out[..., 0] == out[..., 1]).all()
        assert (out[..., 1] == out[..., 2]).all()
        if scale == 1:
            ref = cv2.imdecode(np.frombuffer(data, np.uint8),
                               cv2.IMREAD_COLOR)[..., ::-1]
            d = np.abs(out.astype(int) - ref.astype(int))
            assert d.max() <= 4 and d.mean() < 1.0, (d.max(), d.mean())


def test_grayscale_coefficients_fast_vs_libjpeg(tmp_path):
    import ctypes

    import cv2

    gray = np.random.default_rng(5).integers(0, 255, (41, 53), np.uint8)
    ok, enc = cv2.imencode(".jpg", gray, [cv2.IMWRITE_JPEG_QUALITY, 90])
    data = enc.tobytes()
    info = native.jpeg_coef_info(data)
    ybh, ybw = info[2], info[3]
    lib = native._load()
    out = {}
    for fname in ("dali_tpu_jpeg_huff_read_coeffs_split_crop",
                  "dali_tpu_jpeg_read_coeffs_split_crop"):
        g = getattr(lib, fname)
        if g.argtypes is None:
            g.restype = ctypes.c_int
            g.argtypes = ([ctypes.c_char_p, ctypes.c_size_t]
                          + [ctypes.c_int] * 2 + [ctypes.c_void_p] * 7
                          + [ctypes.c_int] * 8)
        bufs = [np.full(ybh * ybw, -9, np.int16),
                np.full(ybh * ybw * 15, -9, np.int8),
                np.full(ybh * ybw, -9, np.int16),
                np.full(ybh * ybw * 15, -9, np.int8),
                np.full(ybh * ybw, -9, np.int16),
                np.full(ybh * ybw * 15, -9, np.int8),
                np.zeros(128, np.uint16)]
        rc = g(data, len(data), 4, 4,
               *[b.ctypes.data_as(ctypes.c_void_p) for b in bufs],
               ybh, ybw, ybh, ybw, 0, 0, 0, 0)
        assert rc == 0
        out[fname] = bufs
    a, b = out.values()
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert (a[2] == 0).all() and (a[3] == 0).all()  # chroma planes zero


def test_exif_orientation_guard(tmp_path):
    """EXIF-rotated JPEGs can't ride the coefficient wire (rotation is a
    pixel-space op): the hybrid decoder raises with guidance instead of
    silently emitting unrotated output; adjust_orientation=False opts out;
    the generic decoder applies the tag (reference imgcodec default)."""
    import struct

    import cv2

    from dali_tpu import fn, imgcodec, pipeline_def

    rng = np.random.default_rng(0)
    img = cv2.resize(rng.integers(0, 255, (8, 10, 3), np.uint8), (80, 64))
    ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 90])
    j = enc.tobytes()
    tiff = (b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 1)
            + struct.pack("<HHI", 0x0112, 3, 1) + struct.pack("<HH", 6, 0)
            + struct.pack("<I", 0))
    exif = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(exif) + 2) + exif
    data = j[:2] + app1 + j[2:]
    assert imgcodec.exif_orientation(data) == 6
    f = tmp_path / "e.jpg"
    f.write_bytes(data)

    def make(adj, hybrid):
        @pipeline_def(batch_size=1, num_threads=1, seed=1)
        def p():
            jp, _ = fn.readers.file(files=[str(f)], name="R")
            if hybrid:
                return fn.decoders.image(jp, device="mixed",
                                         hybrid_device_decode=True,
                                         hybrid_wire="int8", hybrid_scale=2,
                                         adjust_orientation=adj)
            return fn.decoders.image(jp, device="mixed")

        pipe = p()
        pipe.build()
        return pipe

    with pytest.raises(Exception, match="EXIF orientation"):
        make(True, True).run()
    out = np.asarray(make(False, True).run()[0].at(0))
    assert out.shape == (32, 40, 3)  # unrotated, scale 2
    o2 = np.asarray(make(True, False).run()[0].at(0))
    assert o2.shape[:2] == (80, 64)  # generic path rotated (dims swapped)


def test_pack_wire_property_fuzz(tmp_path):
    """Randomized geometry sweep: sparse (pack-emit) and dense wires must be
    bit-identical through the public decoder API across sizes, samplings,
    qualities, restart intervals, scales and grayscale (the property-fuzz
    analogue of test_resample_fuzz for the wire)."""
    import os

    from dali_tpu import fn, pipeline_def

    rng = np.random.default_rng(77)
    cases = []
    for t in range(10):
        h = int(rng.integers(24, 260))
        w = int(rng.integers(24, 260))
        sub = int(rng.integers(0, 2))
        gray = t % 5 == 4
        q = int(rng.choice([50, 85, 95]))
        ri = int(rng.choice([0, 0, 0, 2, 5]))
        scale = int(rng.choice([1, 2, 2, 4]))
        if gray:
            import cv2

            img = rng.integers(0, 255, (h, w), np.uint8)
            ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, q])
            data = enc.tobytes()
        else:
            img = rng.integers(0, 255, (h, w, 3), np.uint8)
            data = native.jpeg_encode_rgb(img, quality=q, subsamp=sub,
                                          restart_interval=ri)
        f = tmp_path / f"{t}.jpg"
        f.write_bytes(data)
        cases.append((str(f), scale))

    def run(path, scale, disable_sparse):
        os.environ["DALI_TPU_DISABLE_SPARSE_WIRE"] = "1" if disable_sparse else "0"

        @pipeline_def(batch_size=1, num_threads=1, seed=3)
        def p():
            j, _ = fn.readers.file(files=[path], name="R")
            return fn.decoders.image(j, device="mixed",
                                     hybrid_device_decode=True,
                                     hybrid_scale=scale, hybrid_wire="int8")

        pipe = p()
        pipe.build()
        return np.asarray(pipe.run()[0].at(0))

    try:
        for path, scale in cases:
            a = run(path, scale, False)
            b = run(path, scale, True)
            assert a.shape == b.shape, (path, scale)
            np.testing.assert_array_equal(a, b, err_msg=f"{path} scale{scale}")
    finally:
        os.environ.pop("DALI_TPU_DISABLE_SPARSE_WIRE", None)

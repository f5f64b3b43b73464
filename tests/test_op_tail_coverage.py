"""Behavioral coverage for the last ops with no dedicated test (found by a
tests-reference sweep of the registry): BBoxPaste, CastLike, OnesLike,
DLTensorPythonFunction, DumpImage, ExpandDims/Squeeze, GetProperty, Jitter,
readers.MXNet, OpticalFlow, PerFrame, PermuteBatch, PowerSpectrum,
Sphere/Water, decoders.ImageCrop/ImageSlice, random.Beta/Choice,
reductions.RootMeanSquare."""

import os
import struct

import cv2
import numpy as np
import pytest

from dali_tpu import fn, pipeline_def, types


def run(body, sources, device="cpu", seed=3, batch=None):
    @pipeline_def(batch_size=batch or len(sources), num_threads=1, seed=seed)
    def p():
        x = fn.external_source(source=lambda: sources, batch=True, cycle=True)
        if device == "gpu":
            x = x.gpu()
        return body(x)

    pipe = p()
    pipe.build()
    outs = pipe.run()
    res = []
    for tl in outs:
        if hasattr(tl, "as_array"):
            try:
                res.append(tl.as_array())
                continue
            except Exception:
                pass
        res.append(np.asarray(tl.as_tensor()))
    return res


def test_bbox_paste():
    boxes = np.array([[0.2, 0.2, 0.6, 0.6]], np.float32)  # ltrb
    (out,) = run(lambda x: fn.bbox_paste(x, ratio=2.0, paste_x=0.5, paste_y=0.5,
                                         ltrb=True), [boxes])
    # canvas doubles; image pasted centered: box shrinks 2x around 0.25 offset
    np.testing.assert_allclose(out[0], [[0.35, 0.35, 0.55, 0.55]], atol=1e-6)


def test_cast_like_and_ones_like():
    a = np.array([1.7, -2.3], np.float32)
    b = np.array([0], np.int32)

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        x = fn.external_source(source=lambda: [a], batch=True, cycle=True)
        y = fn.external_source(source=lambda: [b], batch=True, cycle=True)
        return fn.cast_like(x, y), fn.ones_like(x)

    p = pipe()
    p.build()
    cast, ones = p.run()
    assert cast.at(0).dtype == np.int32
    np.testing.assert_array_equal(ones.at(0), [1.0, 1.0])


def test_dl_tensor_python_function():
    a = np.arange(6, dtype=np.float32)

    def twice(tensors):
        import numpy as _np

        return [_np.from_dlpack(t) * 2 for t in tensors]

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        x = fn.external_source(source=lambda: [a], batch=True, cycle=True)
        return fn.dl_tensor_python_function(x, function=twice)

    p = pipe()
    p.build()
    (out,) = p.run()
    np.testing.assert_allclose(out.at(0), a * 2)


def test_dump_image_passthrough(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    img = np.full((8, 8, 3), 99, np.uint8)
    (out,) = run(lambda x: fn.dump_image(x, suffix="t"), [img])
    np.testing.assert_array_equal(out[0], img)
    assert any(f.startswith("dump_") for f in os.listdir(tmp_path))


def test_expand_dims_squeeze():
    a = np.zeros((4, 5), np.float32)

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        x = fn.external_source(source=lambda: [a], batch=True, cycle=True,
                               layout="HW")
        e = fn.expand_dims(x, axes=[2], new_axis_names="C")
        return e, fn.squeeze(e, axis_names="C")

    p = pipe()
    p.build()
    e, s = p.run()
    assert e.at(0).shape == (4, 5, 1) and e.layout() == "HWC"
    assert s.at(0).shape == (4, 5) and s.layout() == "HW"


def test_get_property_layout():
    a = np.zeros((2, 3, 3), np.uint8)

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        x = fn.external_source(source=lambda: [a], batch=True, cycle=True,
                               layout="HWC")
        return fn.get_property(x, key="layout")

    p = pipe()
    p.build()
    (out,) = p.run()
    assert bytes(out.at(0)) == b"HWC"


@pytest.mark.parametrize("device", ["cpu", "gpu"])
def test_jitter_displaces_within_degree(device):
    img = np.tile(np.arange(64, dtype=np.uint8)[None, :, None], (64, 1, 3))
    (out,) = run(lambda x: fn.jitter(x, nDegree=2), [img], device, seed=9)
    out = np.asarray(out[0] if out.ndim == 4 else out)
    assert out.shape == img.shape
    # every pixel comes from within a 2-px neighborhood, or is fill (0) where
    # the displacement left the image
    diff = np.abs(out.astype(int) - img.astype(int))
    assert ((diff <= 2) | (out == 0)).all()
    assert (out != img).any()  # but something actually moved


def test_mxnet_reader(tmp_path):
    # hand-built RecordIO: magic+len header, IRHeader(flag=0,label,f,id,id2)
    recs = []
    for i in range(3):
        payload = struct.pack("<IfQQ", 0, float(i * 10), i, 0) + bytes([65 + i] * 5)
        recs.append(payload)
    path = tmp_path / "data.rec"
    with open(path, "wb") as f:
        for payload in recs:
            f.write(struct.pack("<II", 0xCED7230A, len(payload)))
            f.write(payload)
            f.write(b"\0" * ((-len(payload)) % 4))

    @pipeline_def(batch_size=3, num_threads=1, seed=1)
    def pipe():
        data, label = fn.readers.mxnet(path=[str(path)], name="R")
        return data, label

    p = pipe()
    p.build()
    data, label = p.run()
    assert bytes(data.at(0)) == b"AAAAA"
    np.testing.assert_allclose([float(label.at(i)[0]) for i in range(3)],
                               [0.0, 10.0, 20.0])


def test_optical_flow_recovers_shift():
    rng = np.random.default_rng(2)
    base = cv2.GaussianBlur(rng.integers(0, 255, (64, 64), np.uint8), (0, 0), 2)
    f0 = np.repeat(base[:, :, None], 3, 2)
    f1 = np.roll(f0, 3, axis=1)  # shift 3 px right
    seq = np.stack([f0, f1])
    (flow,) = run(lambda x: fn.optical_flow(x, output_grid=1), [seq])
    fl = flow[0]
    # mean horizontal flow in the interior ~ +3
    assert abs(np.median(fl[0][16:48, 16:48, 0]) - 3) < 1.0


def test_per_frame_passthrough_and_layout():
    seq = np.zeros((4, 6, 6, 3), np.uint8)

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        x = fn.external_source(source=lambda: [seq], batch=True, cycle=True,
                               layout="FHWC")
        return fn.per_frame(x, replace=True)

    p = pipe()
    p.build()
    (out,) = p.run()
    np.testing.assert_array_equal(out.at(0), seq)
    assert out.layout().startswith("F")


@pytest.mark.parametrize("device", ["cpu", "gpu"])
def test_permute_batch(device):
    samples = [np.full((2,), i, np.int32) for i in range(4)]
    (out,) = run(lambda x: fn.permute_batch(x, indices=[3, 2, 1, 0]),
                 samples, device)
    got = [int(np.asarray(out[i]).reshape(-1)[0]) for i in range(4)]
    assert got == [3, 2, 1, 0]


@pytest.mark.parametrize("device", ["cpu", "gpu"])
def test_power_spectrum_vs_numpy(device):
    x = np.sin(np.arange(128) / 3).astype(np.float32)
    (out,) = run(lambda s: fn.power_spectrum(s, nfft=128), [x], device)
    ref = np.abs(np.fft.rfft(x, 128)) ** 2
    np.testing.assert_allclose(np.asarray(out[0]).reshape(-1), ref, rtol=1e-3,
                               atol=1e-2)


@pytest.mark.parametrize("op", ["sphere", "water"])
def test_displacement_warps(op):
    img = np.tile(np.arange(48, dtype=np.uint8)[None, :, None], (48, 1, 3))
    body = {"sphere": lambda x: fn.sphere(x),
            "water": lambda x: fn.water(x, ampl_x=2.0, ampl_y=2.0)}[op]
    cpu = run(body, [img], "cpu")[0]
    gpu = run(body, [img], "gpu")[0]
    cpu = np.asarray(cpu[0]) if cpu.ndim == 4 else np.asarray(cpu)
    gpu = np.asarray(gpu)[0] if np.asarray(gpu).ndim == 4 else np.asarray(gpu)
    assert cpu.shape == img.shape
    assert (cpu != img).any()  # the warp moved something
    # cpu and gpu paths agree closely
    assert np.mean(np.abs(cpu.astype(int) - gpu.astype(int))) < 3


def test_decoders_image_crop_and_slice(tmp_path):
    img = np.arange(64 * 64 * 3, dtype=np.uint8).reshape(64, 64, 3)
    ok, enc = cv2.imencode(".png", img[:, :, ::-1])
    assert ok
    raw = enc.reshape(-1)

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        buf = fn.external_source(source=lambda: [raw], batch=True, cycle=True)
        crop = fn.decoders.image_crop(buf, crop=[16, 20], crop_pos_x=0.0,
                                      crop_pos_y=0.0)
        anchor = fn.external_source(
            source=lambda: [np.array([0.25, 0.5], np.float32)], batch=True, cycle=True)
        shape = fn.external_source(
            source=lambda: [np.array([0.5, 0.25], np.float32)], batch=True, cycle=True)
        sl = fn.decoders.image_slice(buf, anchor, shape)
        return crop, sl

    p = pipe()
    p.build()
    crop, sl = p.run()
    np.testing.assert_array_equal(crop.at(0), img[:16, :20])
    # slice axes default [1, 0]: anchor=(x,y)=(0.25,0.5) shape=(0.5,0.25) rel
    np.testing.assert_array_equal(sl.at(0), img[32:48, 16:48])


def test_random_beta_moments():
    @pipeline_def(batch_size=1, num_threads=1, seed=17)
    def pipe():
        return fn.random.beta(alpha=2.0, beta=5.0, shape=[4000])

    p = pipe()
    p.build()
    (out,) = p.run()
    v = np.asarray(out.at(0)).reshape(-1)
    assert 0 <= v.min() and v.max() <= 1
    assert abs(v.mean() - 2.0 / 7.0) < 0.02  # E = a/(a+b)


def test_random_choice_distribution():
    vals = np.array([5, 7, 9], np.int32)

    @pipeline_def(batch_size=1, num_threads=1, seed=23)
    def pipe():
        v = fn.external_source(source=lambda: [vals], batch=True, cycle=True)
        return fn.random.choice(v, p=[0.1, 0.1, 0.8], shape=[3000])

    p = pipe()
    p.build()
    (out,) = p.run()
    v = np.asarray(out.at(0)).reshape(-1)
    assert set(np.unique(v)) <= {5, 7, 9}
    assert (v == 9).mean() > 0.7


@pytest.mark.parametrize("device", ["cpu", "gpu"])
def test_reductions_root_mean_square(device):
    data = [np.random.default_rng(4).standard_normal((5, 6)).astype(np.float32)]
    (out,) = run(lambda x: fn.reductions.root_mean_square(x, axes=[1]), data, device)
    ref = np.sqrt((data[0].astype(np.float64) ** 2).mean(1))
    np.testing.assert_allclose(np.asarray(out[0]).reshape(-1), ref, rtol=2e-5, atol=1e-5)


def test_resize_max_size_caps_keep_aspect():
    img = np.zeros((100, 200, 3), np.uint8)
    (out,) = run(lambda x: fn.resize(x, resize_shorter=400, max_size=500), [img])
    # shorter 400 would give 400x800; max_size 500 caps to 250x500
    assert np.asarray(out[0]).shape[:2] == (250, 500)


def test_fits_multi_hdu(tmp_path):
    def hdu(cards, arr):
        hdr = b"".join(c.ljust(80) for c in cards).ljust(2880)
        data = arr.tobytes()
        return hdr + data + b"\0" * ((-len(data)) % 2880)

    primary = hdu([b"SIMPLE  =                    T", b"BITPIX  =                   16",
                   b"NAXIS   =                    0", b"END"], np.zeros(0, ">i2"))
    ext1 = hdu([b"XTENSION= 'IMAGE   '", b"BITPIX  =                   16",
                b"NAXIS   =                    2", b"NAXIS1  =                    4",
                b"NAXIS2  =                    2", b"END"],
               np.arange(8, dtype=">i2"))
    ext2 = hdu([b"XTENSION= 'IMAGE   '", b"BITPIX  =                  -32",
                b"NAXIS   =                    1", b"NAXIS1  =                    3",
                b"END"], np.array([1.5, 2.5, 3.5], ">f4"))
    (tmp_path / "m.fits").write_bytes(primary + ext1 + ext2)

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        a, b = fn.readers.fits(files=[str(tmp_path / "m.fits")],
                               hdu_indices=[2, 3], name="F")
        return a, b

    p = pipe()
    p.build()
    a, b = p.run()
    np.testing.assert_array_equal(a.at(0), np.arange(8, dtype=np.int16).reshape(2, 4))
    np.testing.assert_allclose(b.at(0), [1.5, 2.5, 3.5])


def test_laplacian_normalized_kernel():
    img = np.zeros((16, 16, 1), np.float32)
    img[8, 8] = 1.0
    (plain,) = run(lambda x: fn.laplacian(x, window_size=5), [img])
    (norm,) = run(lambda x: fn.laplacian(x, window_size=5, normalized_kernel=True), [img])
    # normalized = plain * 2^(-s + n + 2), s = 2*5, n = 2 -> 2^-6
    np.testing.assert_allclose(np.asarray(norm[0]),
                               np.asarray(plain[0]) * 2.0 ** -6, rtol=1e-5)


def test_numpy_reader_header_cache(tmp_path):
    ref = np.arange(24, dtype=np.float64).reshape(4, 6)
    np.save(tmp_path / "a.npy", ref)

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        return fn.readers.numpy(file_root=str(tmp_path),
                                cache_header_information=True)

    p = pipe()
    p.build()
    for _ in range(2):  # second epoch reads through the cached header
        (out,) = p.run()
        np.testing.assert_array_equal(out.at(0), ref)


def test_transform_crop_absolute():
    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        # swapped start/end: absolute=True reorders them
        return fn.transforms.crop(from_start=[1.0, 1.0], from_end=[0.0, 0.0],
                                  to_start=[0.0, 0.0], to_end=[1.0, 1.0],
                                  absolute=True)

    p = pipe()
    p.build()
    (out,) = p.run()
    m = out.at(0)
    np.testing.assert_allclose(m, [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], atol=1e-6)


def test_resize_volumetric_3elem_size():
    vol = np.zeros((8, 16, 12, 1), np.uint8)
    (out,) = run(lambda x: fn.resize(x, size=[4.0, 8.0, 6.0]), [vol])
    assert np.asarray(out[0]).shape == (4, 8, 6, 1)
    with pytest.raises(Exception, match="3-element"):
        run(lambda x: fn.resize(x, size=[8.0, 6.0]), [vol])


def test_expand_dims_unsorted_axes_names():
    a = np.zeros((4, 5), np.float32)

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        x = fn.external_source(source=lambda: [a], batch=True, cycle=True,
                               layout="HW")
        return fn.expand_dims(x, axes=[2, 0], new_axis_names="CN")

    p = pipe()
    p.build()
    (out,) = p.run()
    # (axis, name) pairs sort together: N at axis 0, C at axis 2 -> "NHCW"?
    # insertion order: (0,'N') then (2,'C') into "HW" -> N H C W
    assert out.at(0).shape == (1, 4, 1, 5)
    assert out.layout() == "NHCW"


def test_fits_skips_bintable_heap(tmp_path):
    def hdu(cards, data):
        hdr = b"".join(c.ljust(80) for c in cards).ljust(2880)
        return hdr + data + b"\0" * ((-len(data)) % 2880)

    primary = hdu([b"SIMPLE  =                    T", b"BITPIX  =                   16",
                   b"NAXIS   =                    0", b"END"], b"")
    # a BINTABLE with PCOUNT heap bytes that a naive skip would miss
    table = hdu([b"XTENSION= 'BINTABLE'", b"BITPIX  =                    8",
                 b"NAXIS   =                    2", b"NAXIS1  =                    4",
                 b"NAXIS2  =                    2", b"PCOUNT  =                  100",
                 b"GCOUNT  =                    1", b"END"], b"\x01" * 108)
    img = hdu([b"XTENSION= 'IMAGE   '", b"BITPIX  =                   16",
               b"NAXIS   =                    2", b"NAXIS1  =                    3",
               b"NAXIS2  =                    2", b"END"],
              np.arange(6, dtype=">i2").tobytes())
    (tmp_path / "t.fits").write_bytes(primary + table + img)

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        return fn.readers.fits(files=[str(tmp_path / "t.fits")],
                               hdu_indices=[3], name="F")

    p = pipe()
    p.build()
    (out,) = p.run()
    np.testing.assert_array_equal(out.at(0), np.arange(6, dtype=np.int16).reshape(2, 3))
    # asking for the BINTABLE itself is a clear error, not garbage
    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe2():
        return fn.readers.fits(files=[str(tmp_path / "t.fits")],
                               hdu_indices=[2], name="F2")

    p2 = pipe2()
    p2.build()
    with pytest.raises(Exception, match="BINTABLE"):
        p2.run()


def test_crop_volumetric_cpu_gpu():
    rng = np.random.default_rng(9)
    vol = rng.integers(0, 255, (8, 16, 12, 3), np.uint8)

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        x = fn.external_source(source=lambda: [vol], batch=True, cycle=True,
                               layout="DHWC")
        c = fn.crop(x, crop=[6, 8], crop_d=4, crop_pos_x=0.0, crop_pos_y=1.0,
                    crop_pos_z=0.5)
        g = fn.crop(x.gpu(), crop=[6, 8], crop_d=4, crop_pos_x=0.0,
                    crop_pos_y=1.0, crop_pos_z=0.5)
        return c, g

    p = pipe()
    p.build()
    c, g = p.run()
    ca = np.asarray(c.at(0))
    ga = np.asarray(g.as_tensor())[0]
    assert ca.shape == (4, 6, 8, 3)
    np.testing.assert_array_equal(ca, ga)


def test_cmn_volumetric_cpu_gpu():
    rng = np.random.default_rng(3)
    vol = rng.integers(0, 255, (8, 16, 12, 3), np.uint8)

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        x = fn.external_source(source=lambda: [vol], batch=True, cycle=True,
                               layout="DHWC")
        kw = dict(crop=(8, 8), crop_d=4, crop_pos_z=0.5, mean=[100.0] * 3,
                  std=[50.0] * 3, dtype=types.FLOAT, output_layout="CHW")
        return fn.crop_mirror_normalize(x, **kw), \
            fn.crop_mirror_normalize(x.gpu(), **kw)

    p = pipe()
    p.build()
    c, g = p.run()
    ca = np.asarray(c.at(0))
    ga = np.asarray(g.as_tensor())[0]
    assert ca.shape == (4, 3, 8, 8)  # DCHW
    np.testing.assert_allclose(ca, ga, rtol=1e-5, atol=1e-5)


def test_flip_volumetric_cpu_gpu():
    rng = np.random.default_rng(1)
    vol = rng.integers(0, 255, (4, 6, 5, 3), np.uint8)

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        x = fn.external_source(source=lambda: [vol], batch=True, cycle=True,
                               layout="DHWC")
        return (fn.flip(x, horizontal=1, vertical=1, depthwise=1),
                fn.flip(x.gpu(), horizontal=1, vertical=1, depthwise=1))

    p = pipe()
    p.build()
    c, g = p.run()
    expect = vol[::-1, ::-1, ::-1]
    np.testing.assert_array_equal(np.asarray(c.at(0)), expect)
    np.testing.assert_array_equal(np.asarray(g.as_tensor())[0], expect)


def test_slice_volumetric_cpu_gpu():
    vol = np.arange(4 * 6 * 5 * 2, dtype=np.uint8).reshape(4, 6, 5, 2)

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        x = fn.external_source(source=lambda: [vol], batch=True, cycle=True,
                               layout="DHWC")
        kw = dict(start=[1, 2, 1], shape=[2, 3, 3], axes=[0, 1, 2])
        return fn.slice(x, **kw), fn.slice(x.gpu(), **kw)

    p = pipe()
    p.build()
    c, g = p.run()
    expect = vol[1:3, 2:5, 1:4]
    np.testing.assert_array_equal(np.asarray(c.at(0)), expect)
    # ragged gpu outputs crop back through at() (padded canvas + extents)
    np.testing.assert_array_equal(np.asarray(g.at(0)), expect)

"""Argument-parity batch 4 tests: Resize save_attrs/filters, crop family
rounding, RandomBBoxCrop fixed-crop/indices/prune, Caffe/Caffe2 reader
extras, MultiPaste relative regions, RandomObjectBBox ignore_class/k_largest,
readers.Video uniform_sample/pad_mode, Webdataset case-insensitive
extensions, decoder jpeg_fancy_upsampling."""

import io
import os
import struct
import tarfile

import cv2
import numpy as np
import pytest

from dali_tpu import fn, pipeline_def, types


def _img_dir(tmp_path, n=4, base=60):
    d = tmp_path / "cls0"
    d.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        cv2.imwrite(str(d / f"{i}.jpg"), rng.integers(0, 255, (base + 8 * i, 80, 3), np.uint8))
    return str(tmp_path)


def test_resize_save_attrs_cpu_gpu(tmp_path):
    root = _img_dir(tmp_path)

    @pipeline_def(batch_size=3, num_threads=1, seed=1)
    def pipe():
        buf, _ = fn.readers.file(file_root=root)
        img = fn.decoders.image(buf, device="cpu")
        rc, att_c = fn.resize(img, resize_x=32, resize_y=32, save_attrs=True)
        gimg = fn.decoders.image(buf, device="mixed")
        rg, att_g = fn.resize(gimg, resize_x=32, resize_y=32, save_attrs=True)
        return rc, att_c, rg, att_g

    p = pipe()
    p.build()
    rc, att_c, rg, att_g = p.run()
    # attrs output = ORIGINAL (H, W), int32, per sample
    for i in range(3):
        np.testing.assert_array_equal(att_c.at(i), [60 + 8 * i, 80])
    ag = np.asarray(att_g.as_tensor())
    np.testing.assert_array_equal(ag[:, :2], [[60, 80], [68, 80], [76, 80]])
    assert rc.as_array().shape[1:3] == (32, 32)


def test_resize_min_filter_nn(tmp_path):
    # min_filter=NN on a downscale must produce pure source pixels
    x = np.zeros((40, 40, 1), np.uint8)
    x[::2] = 200  # stripes

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        img = fn.external_source(source=lambda: [x], batch=True, cycle=True)
        return fn.resize(img, resize_x=13, resize_y=13,
                         min_filter=types.INTERP_NN, antialias=False)

    p = pipe()
    p.build()
    (out,) = p.run()
    vals = np.unique(out.as_array())
    assert set(vals.tolist()) <= {0, 200}


def test_crop_rounding_truncate():
    # h - ch = 5, pos 0.5 -> 2.5: round->3 (half away from zero), truncate->2
    x = np.arange(9 * 4 * 1, dtype=np.uint8).reshape(9, 4, 1)

    def run(**kw):
        @pipeline_def(batch_size=1, num_threads=1, seed=1)
        def pipe():
            img = fn.external_source(source=lambda: [x], batch=True, cycle=True)
            return fn.crop(img, crop=[4, 4], **kw)

        p = pipe()
        p.build()
        return p.run()[0].as_array()[0]

    np.testing.assert_array_equal(run(), x[3:7])
    np.testing.assert_array_equal(run(rounding="truncate"), x[2:6])


def test_random_bbox_crop_fixed_shape_and_indices():
    boxes = np.array([[0.1, 0.1, 0.4, 0.4], [0.6, 0.6, 0.9, 0.9]], np.float32)
    labels = np.array([1, 2], np.int32)

    @pipeline_def(batch_size=1, num_threads=1, seed=11)
    def pipe():
        bb = fn.external_source(source=lambda: [boxes], batch=True, cycle=True)
        ll = fn.external_source(source=lambda: [labels], batch=True, cycle=True)
        return fn.random_bbox_crop(
            bb, ll, crop_shape=[64, 48], input_shape=[128, 96],
            shape_layout="WH", thresholds=[0.0], allow_no_crop=False,
            output_bbox_indices=True, total_num_attempts=64, quiet=True)

    p = pipe()
    p.build()
    anchor, shape, out_boxes, out_labels, idx = p.run()
    a = anchor.as_array()[0]
    s = shape.as_array()[0]
    np.testing.assert_array_equal(s, [64, 48])  # absolute (W, H)
    assert 0 <= a[0] <= 128 - 64 and 0 <= a[1] <= 96 - 48
    ki = idx.as_array()[0]
    kb = out_boxes.as_array()[0]
    assert ki.shape[0] == kb.shape[0] and ki.dtype == np.int32
    # labels follow the kept indices
    np.testing.assert_array_equal(out_labels.as_array()[0], labels[ki])


def test_random_bbox_crop_prune_threshold():
    # bbox_prune_threshold=0.0 keeps any overlapping box (centroid filter would
    # drop a box whose center is outside)
    boxes = np.array([[0.0, 0.0, 0.3, 1.0]], np.float32)  # left strip

    @pipeline_def(batch_size=1, num_threads=1, seed=3)
    def pipe():
        bb = fn.external_source(source=lambda: [boxes], batch=True, cycle=True)
        a, s, b, l_ = fn.random_bbox_crop(
            bb, scaling=[0.5, 0.5], aspect_ratio=[1.0, 1.0], thresholds=[0.0],
            allow_no_crop=False, bbox_prune_threshold=0.0)
        return a, s, b, l_

    p = pipe()
    p.build()
    anchor, shape, out_boxes, _ = p.run()
    a, s = anchor.as_array()[0], shape.as_array()[0]
    kept = out_boxes.as_array()[0]
    # the window always intersects the x<0.3 strip or not; if it does, the
    # box must be kept under threshold 0.0
    if a[0] < 0.3:
        assert kept.shape[0] == 1
    else:
        assert kept.shape[0] == 0


def test_caffe2_reader_label_types(tmp_path):
    from dali_tpu._lmdb import write_lmdb

    from tests.test_lmdb import encode_tensor_protos

    img = np.arange(12, dtype=np.uint8)
    msg = encode_tensor_protos([img, np.array([3], np.int32),
                                np.array([7.5], np.float32)])
    path = write_lmdb(str(tmp_path / "c2"), [(b"00000000", msg)])

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        im, dense, idx, extra = fn.readers.caffe2(
            path=[path], label_type=1, num_labels=5, additional_inputs=1)
        return im, dense, idx, extra

    p = pipe()
    p.build()
    im, dense, idx, extra = p.run()
    np.testing.assert_array_equal(im.at(0).reshape(-1), img)
    np.testing.assert_array_equal(dense.at(0), [0, 0, 0, 1, 0])
    np.testing.assert_array_equal(idx.at(0), [3])
    np.testing.assert_allclose(extra.at(0), [7.5])


def test_caffe_reader_label_only(tmp_path):
    from dali_tpu._lmdb import write_lmdb

    from tests.test_lmdb import encode_datum

    datum = encode_datum(0, 0, 0, b"abc", 9)
    path = write_lmdb(str(tmp_path / "c1"), [(b"k0", datum)])

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        lab = fn.readers.caffe(path=[path], image_available=False)
        return (lab,)

    p = pipe()
    p.build()
    (lab,) = p.run()
    assert int(lab.as_array()[0]) == 9


def test_multipaste_relative_regions():
    a = np.full((10, 10, 3), 50, np.uint8)
    b = np.full((20, 20, 3), 200, np.uint8)

    @pipeline_def(batch_size=2, num_threads=1, seed=1)
    def pipe():
        imgs = fn.external_source(source=lambda: [a, b], batch=True, cycle=True)
        return fn.multi_paste(
            imgs, in_ids=np.array([1]), output_size=[10, 10],
            in_anchors_rel=np.array([0.5, 0.5], np.float32),
            shapes_rel=np.array([0.25, 0.25], np.float32),
            out_anchors_rel=np.array([0.0, 0.0], np.float32))

    p = pipe()
    p.build()
    (out,) = p.run()
    o = out.as_array()[0]
    # region = 25% of sample 1 (5x5 at rel 0.5 -> abs (10,10)) pasted at 0,0
    assert (o[:5, :5] == 200).all()
    assert (o[5:, 5:] == 0).all()


def test_random_object_bbox_ignore_class_k_largest():
    mask = np.zeros((16, 16), np.int32)
    mask[1:3, 1:3] = 1      # small blob
    mask[8:15, 8:15] = 2    # large blob

    @pipeline_def(batch_size=1, num_threads=1, seed=5)
    def pipe():
        m = fn.external_source(source=lambda: [mask], batch=True, cycle=True)
        a, s = fn.segmentation.random_object_bbox(m, ignore_class=True, k_largest=1)
        return a, s

    p = pipe()
    p.build()
    a, s = p.run()
    np.testing.assert_array_equal(a.as_array()[0], [8, 8])
    np.testing.assert_array_equal(s.as_array()[0], [7, 7])


def test_random_object_bbox_cache(tmp_path):
    mask = np.zeros((8, 8), np.int32)
    mask[2:5, 3:6] = 4

    @pipeline_def(batch_size=1, num_threads=1, seed=5)
    def pipe():
        m = fn.external_source(source=lambda: [mask], batch=True, cycle=True)
        a, s = fn.segmentation.random_object_bbox(m, cache_objects=True)
        return a, s

    p = pipe()
    p.build()
    for _ in range(2):  # second run hits the cache
        a, s = p.run()
        np.testing.assert_array_equal(a.as_array()[0], [2, 3])
        np.testing.assert_array_equal(s.as_array()[0], [3, 3])


def _write_video(path, num_frames=12, fps=10, w=64, h=48):
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    assert wr.isOpened()
    for i in range(num_frames):
        wr.write(np.full((h, w, 3), i * 20, np.uint8))
    wr.release()


def test_video_reader_uniform_sample(tmp_path):
    vid = tmp_path / "v.mp4"
    _write_video(vid, num_frames=12)

    @pipeline_def(batch_size=1, num_threads=1, seed=5)
    def pipe():
        f = fn.readers.video(filenames=[str(vid)], sequence_length=4,
                             uniform_sample=True, name="R")
        return f

    p = pipe()
    p.build()
    assert p.reader_meta("R")["epoch_size"] == 1  # one sequence per video
    (f,) = p.run()
    v = f.as_array()[0]
    assert v.shape[0] == 4
    # linspace(0, 11, 4) rounded half-away = [0, 4, 7, 11] -> values i*20
    # (mp4v is lossy: compare within a half-step)
    got = [float(v[k].mean()) / 20 for k in range(4)]
    assert abs(got[0] - 0) < 0.5 and abs(got[1] - 4) < 0.5
    assert abs(got[2] - 7) < 0.5 and abs(got[3] - 11) < 0.5


def test_video_reader_pad_mode_constant(tmp_path):
    vid = tmp_path / "v.mp4"
    _write_video(vid, num_frames=5)

    @pipeline_def(batch_size=1, num_threads=1, seed=5)
    def pipe():
        return fn.readers.video(filenames=[str(vid)], sequence_length=4, step=4,
                                pad_mode="constant", fill_value=[255])

    p = pipe()
    p.build()
    p.run()
    (f,) = p.run()  # second sequence: frame 4 + 3 padded
    v = f.as_array()[0]
    assert (v[1:] == 255).all()
    assert not (v[0] == 255).all()


def test_webdataset_case_insensitive_ext(tmp_path):
    tar_path = tmp_path / "a.tar"
    with tarfile.open(tar_path, "w") as tar:
        data = b"hello"
        info = tarfile.TarInfo("s0.JPG")
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        return fn.readers.webdataset(paths=[str(tar_path)], ext=["jpg"],
                                     missing_component_behavior="error",
                                     case_sensitive_extensions=False)

    p = pipe()
    p.build()
    (out,) = p.run()
    assert bytes(out.at(0)) == b"hello"


def test_jpeg_fancy_upsampling_arg(tmp_path):
    # 4:2:0 chroma: fancy vs box replication must differ somewhere
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)
    ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 90,
                                         cv2.IMWRITE_JPEG_SAMPLING_FACTOR,
                                         0x221111])
    assert ok
    raw = enc.reshape(-1)

    def run(fancy):
        @pipeline_def(batch_size=1, num_threads=1, seed=1)
        def pipe():
            buf = fn.external_source(source=lambda: [raw], batch=True, cycle=True)
            return fn.decoders.image(buf, device="cpu", jpeg_fancy_upsampling=fancy)

        p = pipe()
        p.build()
        return p.run()[0].as_array()[0]

    a, b = run(True), run(False)
    assert a.shape == b.shape
    assert (a != b).any()


def test_webdataset_ext_alternatives(tmp_path):
    # an `ext` entry is a ';'-set of acceptable extensions (webdataset_loader
    # kExtDelim): "jpg;jpeg" matches either spelling per sample
    tar_path = tmp_path / "a.tar"
    with tarfile.open(tar_path, "w") as tar:
        for name, data in (("s0.jpeg", b"first"), ("s1.jpg", b"second"),
                           ("s0.cls", b"0"), ("s1.cls", b"1")):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))

    @pipeline_def(batch_size=2, num_threads=1, seed=1)
    def pipe():
        img, cls = fn.readers.webdataset(paths=[str(tar_path)],
                                         ext=["jpg;jpeg", "cls"],
                                         missing_component_behavior="error")
        return img, cls

    p = pipe()
    p.build()
    img, cls = p.run()
    assert {bytes(img.at(0)), bytes(img.at(1))} == {b"first", b"second"}
    assert {bytes(cls.at(0)), bytes(cls.at(1))} == {b"0", b"1"}


def test_webdataset_dtypes_reinterpret(tmp_path):
    # dtypes REINTERPRET the component bytes (reference webdataset_loader.cc
    # resizes by size/itemsize), not a value cast
    payload = np.array([1.5, -2.5, 3.25], np.float32).tobytes()
    tar_path = tmp_path / "a.tar"
    with tarfile.open(tar_path, "w") as tar:
        info = tarfile.TarInfo("s0.bin")
        info.size = len(payload)
        tar.addfile(info, io.BytesIO(payload))

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        return fn.readers.webdataset(paths=[str(tar_path)], ext=["bin"],
                                     dtypes=[types.FLOAT])

    p = pipe()
    p.build()
    (out,) = p.run()
    got = out.at(0)
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, [1.5, -2.5, 3.25])

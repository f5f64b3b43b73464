"""Argument-parity batch 3 tests: reader/decoder/resize argument coverage
added after auditing schemas against the reference tree (readers.Numpy ROI
reads per numpy_loader roi support, decoders.Video end_frame/pad_mode per
video_decoder_cpu.cc, readers.Video enable_frame_num/timestamps/pad_sequences
per readers__Video, TensorResize mode/ROI per tensor_resize_attr.cc,
ResizeCropMirror full ResizeAttr surface, NemoAsr output toggles per
nemo_asr_reader_op.cc)."""

import json
import os
import struct
import wave

import cv2
import numpy as np
import pytest

from dali_tpu import fn, pipeline_def, types


def test_numpy_reader_roi(tmp_path):
    ref = np.arange(20 * 30, dtype=np.float32).reshape(20, 30)
    np.save(tmp_path / "a.npy", ref)

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        return fn.readers.numpy(file_root=str(tmp_path), roi_start=[2, 3], roi_shape=[5, 6])

    p = pipe()
    p.build()
    (out,) = p.run()
    got = out.as_array()[0]
    assert got.shape == (5, 6)
    assert np.array_equal(got, ref[2:7, 3:9])


def test_numpy_reader_roi_pad_policy(tmp_path):
    ref = np.arange(20 * 30, dtype=np.float32).reshape(20, 30)
    np.save(tmp_path / "a.npy", ref)

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        return fn.readers.numpy(
            file_root=str(tmp_path), roi_start=[18, 0], roi_shape=[5, 30],
            out_of_bounds_policy="pad", fill_value=-1.0)

    p = pipe()
    p.build()
    (out,) = p.run()
    got = out.as_array()[0]
    assert got.shape == (5, 30)
    assert np.array_equal(got[:2], ref[18:20])
    assert (got[2:] == -1.0).all()


def test_numpy_reader_roi_error_policy(tmp_path):
    np.save(tmp_path / "a.npy", np.zeros((4, 4), np.float32))

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        return fn.readers.numpy(file_root=str(tmp_path), roi_start=[2, 2], roi_shape=[8, 8])

    p = pipe()
    p.build()
    with pytest.raises(Exception, match="out of bounds"):
        p.run()


def test_numpy_reader_rel_roi(tmp_path):
    ref = np.arange(100, dtype=np.int32).reshape(10, 10)
    np.save(tmp_path / "a.npy", ref)

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        return fn.readers.numpy(
            file_root=str(tmp_path), rel_roi_start=[0.5], rel_roi_end=[1.0], roi_axes=[0])

    p = pipe()
    p.build()
    (out,) = p.run()
    assert np.array_equal(out.as_array()[0], ref[5:])


def test_tensor_resize_mode_and_roi(tmp_path):
    ref = np.arange(20 * 30, dtype=np.float32).reshape(20, 30)
    np.save(tmp_path / "a.npy", ref)

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        x = fn.readers.numpy(file_root=str(tmp_path))
        nl = fn.tensor_resize(x, sizes=[10.0, 10.0], mode="not_larger")
        roi = fn.tensor_resize(x, sizes=[10.0, 10.0], roi_start=[0.0, 0.0],
                               roi_end=[0.5, 0.5], roi_relative=True)
        return nl, roi

    p = pipe()
    p.build()
    nl, roi = p.run()
    a = nl.as_array()[0]
    # not_larger: uniform scale min(10/20, 10/30)=1/3 -> ~7x10
    assert a.shape[0] <= 10 and a.shape[1] <= 10 and a.shape != (10, 10)
    r = roi.as_array()[0]
    assert r.shape == (10, 10)
    # ROI is the top-left quadrant: values must stay within that range
    assert r.max() <= ref[:10, :15].max() + 1e-3


def test_resize_crop_mirror_extended_args(tmp_path):
    d = tmp_path / "cls0"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        cv2.imwrite(str(d / f"{i}.jpg"), rng.integers(0, 255, (64 + 8 * i, 80, 3), np.uint8))

    @pipeline_def(batch_size=2, num_threads=1, seed=3)
    def pipe():
        buf, lab = fn.readers.file(file_root=str(tmp_path))
        img = fn.decoders.image(buf, device="cpu")
        out = fn.resize_crop_mirror(img, size=[48, 48], crop_h=32, crop_w=32,
                                    dtype=types.FLOAT, antialias=True)
        return out, lab

    p = pipe()
    p.build()
    out, _ = p.run()
    a = out.as_array()
    assert a.shape == (2, 32, 32, 3)
    assert a.dtype == np.float32


def _write_video(path, num_frames=12, fps=10, w=64, h=48):
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    assert wr.isOpened(), "cv2 cannot write mp4"
    for i in range(num_frames):
        wr.write(np.full((h, w, 3), i * 20, np.uint8))
    wr.release()


def test_video_reader_frame_num_and_timestamps(tmp_path):
    vid = tmp_path / "v.mp4"
    _write_video(vid)

    @pipeline_def(batch_size=1, num_threads=1, seed=5)
    def pipe():
        f, fnum, ts = fn.readers.video(
            filenames=[str(vid)], labels=[], sequence_length=4,
            enable_frame_num=True, enable_timestamps=True, pad_sequences=True)
        return f, fnum, ts

    p = pipe()
    p.build()
    f, fnum, ts = p.run()
    assert f.as_array().shape == (1, 4, 48, 64, 3)
    assert int(fnum.as_array()[0][0]) == 0
    t = ts.as_array()[0]
    assert t.shape == (4,)
    assert np.allclose(np.diff(t), 0.1, atol=1e-6)


def test_video_decoder_end_frame_and_pad(tmp_path):
    vid = tmp_path / "v.mp4"
    _write_video(vid, num_frames=12)
    raw = np.fromfile(vid, np.uint8)

    @pipeline_def(batch_size=1, num_threads=1, seed=5)
    def pipe():
        buf = fn.external_source(source=lambda: [raw], batch=True, cycle=True)
        return fn.experimental.decoders.video(buf, start_frame=8, end_frame=20,
                                              pad_mode="edge")

    p = pipe()
    p.build()
    (out,) = p.run()
    v = out.as_array()[0]
    assert v.shape[0] == 12  # frames 8..11 real + 8 edge-padded
    assert np.array_equal(v[4], v[-1])


def test_nemo_asr_output_toggles(tmp_path):
    wav = tmp_path / "a.wav"
    with wave.open(str(wav), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(struct.pack("<400h", *([1000] * 400)))
    man = tmp_path / "man.json"
    man.write_text(json.dumps({"audio_filepath": str(wav), "duration": 0.025,
                               "text": "hi"}) + "\n")

    @pipeline_def(batch_size=1, num_threads=1, seed=7)
    def pipe():
        a, txt, idx = fn.readers.nemo_asr(
            manifest_filepaths=[str(man)], read_sample_rate=False,
            read_text=True, read_idxs=True)
        return a, txt, idx

    p = pipe()
    p.build()
    a, txt, idx = p.run()
    assert bytes(txt.as_array()[0]) == b"hi"
    assert int(idx.as_array()[0][0]) == 0
    assert a.as_array()[0].dtype == np.float32


def test_fits_reader_file_list_and_dtypes(tmp_path):
    arr = np.arange(12, dtype=">i2").reshape(3, 4)
    cards = [b"SIMPLE  =                    T", b"BITPIX  =                   16",
             b"NAXIS   =                    2", b"NAXIS1  =                    4",
             b"NAXIS2  =                    3", b"END"]
    hdr = b"".join(c.ljust(80) for c in cards).ljust(2880)
    (tmp_path / "t.fits").write_bytes(hdr + arr.tobytes())
    (tmp_path / "list.txt").write_text("t.fits\n")

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        return fn.readers.fits(file_root=str(tmp_path),
                               file_list=str(tmp_path / "list.txt"),
                               dtypes=[int(types.FLOAT)], name="F")

    out = pipe().run()[0]
    got = out.at(0)
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, np.arange(12, dtype=np.float32).reshape(3, 4))


def test_coco_include_iscrowd(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "i0.jpg"), np.zeros((10, 10, 3), np.uint8))
    ann = {
        "images": [{"id": 1, "file_name": "i0.jpg", "width": 10, "height": 10}],
        "categories": [{"id": 1, "name": "c"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "bbox": [1, 1, 4, 4],
             "area": 16, "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 1, "bbox": [5, 5, 3, 3],
             "area": 9, "iscrowd": 1},
        ],
    }
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))

    def build(**kw):
        @pipeline_def(batch_size=1, num_threads=1, seed=1)
        def pipe():
            _, boxes, labels = fn.readers.coco(
                file_root=str(img_dir), annotations_file=str(ann_file), **kw)
            return boxes, labels

        p = pipe()
        p.build()
        boxes, _ = p.run()
        return boxes.as_array()[0]

    assert build().shape[0] == 2  # default includes iscrowd
    assert build(include_iscrowd=False).shape[0] == 1

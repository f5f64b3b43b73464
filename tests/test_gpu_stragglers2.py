"""Device lowerings added after the cpu-only-vs-reference-GPU audit:
ResizeCropMirror/FastResizeCropMirror, CoordTransform, Reinterpret, and the
device='gpu' reader compatibility mapping (video/numpy -> mixed)."""

import cv2
import numpy as np

from dali_tpu import fn, pipeline_def, types


def _imgs(tmp_path, n=3):
    d = tmp_path / "cls0"
    d.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        cv2.imwrite(str(d / f"{i}.jpg"), rng.integers(0, 255, (60 + 8 * i, 80, 3), np.uint8))
    return str(tmp_path)


def test_rcm_gpu_matches_cpu(tmp_path):
    root = _imgs(tmp_path)

    @pipeline_def(batch_size=3, num_threads=1, seed=3)
    def pipe():
        buf, _ = fn.readers.file(file_root=root)
        img = fn.decoders.image(buf, device="cpu")
        c = fn.resize_crop_mirror(img, resize_x=48, resize_y=48, crop=[32, 24],
                                  crop_pos_x=0.5, crop_pos_y=0.5, mirror=1)
        gimg = fn.decoders.image(buf, device="mixed")
        g = fn.resize_crop_mirror(gimg, resize_x=48, resize_y=48, crop=[32, 24],
                                  crop_pos_x=0.5, crop_pos_y=0.5, mirror=1)
        return c, g

    p = pipe()
    p.build()
    c, g = p.run()
    ca = c.as_array().astype(np.int32)
    ga = np.asarray(g.as_tensor()).astype(np.int32)
    assert ga.shape == (3, 32, 24, 3)
    # r5: cpu RCM rides the SAME fused tap-plan resampler as the gpu
    # lowering (crop mapped back through the resize scale to an input ROI);
    # the residue is numpy-vs-XLA f32 last-ulp at round boundaries — at most
    # one uint8 level on a fraction of pixels (the Resize contract)
    diff = np.abs(ca - ga)
    assert diff.max() <= 1, diff.max()
    assert (diff != 0).mean() < 0.01, (diff != 0).mean()


def test_rcm_gpu_per_sample_mirror(tmp_path):
    root = _imgs(tmp_path, n=2)

    @pipeline_def(batch_size=2, num_threads=1, seed=3)
    def pipe():
        buf, _ = fn.readers.file(file_root=root)
        gimg = fn.decoders.image(buf, device="mixed")
        m = fn.external_source(source=lambda: [np.int32(0), np.int32(1)],
                               batch=True, cycle=True)
        a = fn.resize_crop_mirror(gimg, resize_x=40, resize_y=40, crop=[32, 32],
                                  mirror=m)
        b = fn.resize_crop_mirror(gimg, resize_x=40, resize_y=40, crop=[32, 32])
        return a, b

    p = pipe()
    p.build()
    a, b = p.run()
    aa, ba = np.asarray(a.as_tensor()), np.asarray(b.as_tensor())
    np.testing.assert_array_equal(aa[0], ba[0])          # mirror=0: unchanged
    np.testing.assert_array_equal(aa[1], ba[1][:, ::-1])  # mirror=1: flipped


def test_coord_transform_gpu():
    pts = np.array([[0.0, 0.0], [1.0, 2.0], [3.0, 4.0]], np.float32)

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        x = fn.external_source(source=lambda: [pts], batch=True, cycle=True)
        c = fn.coord_transform(x, M=[0.0, 1.0, 1.0, 0.0], T=[10.0, 20.0])
        g = fn.coord_transform(x.gpu(), M=[0.0, 1.0, 1.0, 0.0], T=[10.0, 20.0])
        return c, g

    p = pipe()
    p.build()
    c, g = p.run()
    expect = pts[:, ::-1] + [10.0, 20.0]
    np.testing.assert_allclose(c.as_array()[0], expect)
    np.testing.assert_allclose(np.asarray(g.as_tensor())[0], expect)


def test_reinterpret_gpu_bitcast_and_shape():
    x = np.arange(24, dtype=np.int32).reshape(2, 12)

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        src = fn.external_source(source=lambda: [x], batch=True, cycle=True)
        narrow = fn.reinterpret(src.gpu(), dtype=types.UINT8)
        reshaped = fn.reinterpret(src.gpu(), shape=[4, 6])
        return narrow, reshaped

    p = pipe()
    p.build()
    narrow, reshaped = p.run()
    na = np.asarray(narrow.as_tensor())[0]
    np.testing.assert_array_equal(na, x.view(np.uint8))
    ra = np.asarray(reshaped.as_tensor())[0]
    np.testing.assert_array_equal(ra, x.reshape(4, 6))


def test_numpy_reader_gpu_device(tmp_path):
    ref = np.arange(12, dtype=np.float32).reshape(3, 4)
    np.save(tmp_path / "a.npy", ref)

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        # DALI spells the GDS reader device='gpu'; maps to mixed here
        return fn.readers.numpy(file_root=str(tmp_path), device="gpu")

    p = pipe()
    p.build()
    (out,) = p.run()
    got = np.asarray(out.as_tensor())[0]
    np.testing.assert_array_equal(got, ref)


def test_video_reader_gpu_device(tmp_path):
    vid = tmp_path / "v.mp4"
    wr = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    for i in range(8):
        wr.write(np.full((48, 64, 3), i * 20, np.uint8))
    wr.release()

    @pipeline_def(batch_size=1, num_threads=1, seed=5)
    def pipe():
        f = fn.readers.video(filenames=[str(vid)], sequence_length=4, device="gpu")
        return f

    p = pipe()
    p.build()
    (f,) = p.run()
    assert np.asarray(f.as_tensor()).shape == (1, 4, 48, 64, 3)

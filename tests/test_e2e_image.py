"""End-to-end image pipeline tests — the minimum north-star slice (SURVEY §7.4):
file reader → decode → resize/RRC → crop_mirror_normalize, host + device paths."""

import numpy as np
import pytest

import dali_tpu
from dali_tpu import fn, pipeline_def, types


def test_cpu_pipeline_end_to_end(jpeg_dataset):
    @pipeline_def(batch_size=8, num_threads=4, seed=11)
    def pipe():
        jpegs, labels = fn.readers.file(file_root=jpeg_dataset, random_shuffle=True, name="Reader")
        images = fn.decoders.image(jpegs, device="cpu", output_type=types.RGB)
        images = fn.resize(images, resize_x=64, resize_y=64)
        images = fn.crop_mirror_normalize(
            images, crop=(56, 56), mean=[128.0] * 3, std=[64.0] * 3, output_layout="CHW"
        )
        return images, labels

    p = pipe()
    out = p.run()
    imgs, labels = out
    assert imgs.is_dense_tensor()
    arr = imgs.as_array()
    assert arr.shape == (8, 3, 56, 56)
    assert arr.dtype == np.float32
    assert len(labels) == 8
    assert labels.at(0).shape == (1,)


def test_mixed_device_pipeline(jpeg_dataset):
    """decode(mixed) → gpu resize → gpu CMN: the device stage compiles to one jitted program."""

    @pipeline_def(batch_size=4, num_threads=2, seed=3)
    def pipe():
        jpegs, labels = fn.readers.file(file_root=jpeg_dataset, name="Reader")
        images = fn.decoders.image(jpegs, device="mixed", output_type=types.RGB)
        images = fn.resize(images, resize_x=64, resize_y=64)  # auto-gpu (input is gpu)
        mirror = fn.random.coin_flip(probability=0.5)
        images = fn.crop_mirror_normalize(
            images,
            crop=(56, 56),
            mirror=mirror,
            mean=[125.0, 125.0, 125.0],
            std=[60.0, 60.0, 60.0],
            output_layout="CHW",
        )
        return images, labels

    p = pipe()
    imgs, labels = p.run()
    arr = np.asarray(imgs.as_tensor())
    assert arr.shape == (4, 3, 56, 56)
    assert np.isfinite(arr).all()
    # values should be roughly normalized
    assert abs(float(arr.mean())) < 3.0


def test_gpu_matches_cpu_resize_cmn(jpeg_dataset):
    """Golden test (reference pattern: test_utils.compare_pipelines): the device
    path must match the host path within interpolation tolerance."""

    def make(device):
        @pipeline_def(batch_size=4, num_threads=2, seed=5)
        def pipe():
            jpegs, labels = fn.readers.file(file_root=jpeg_dataset, name="Reader")
            images = fn.decoders.image(jpegs, device="cpu" if device == "cpu" else "mixed")
            images = fn.resize(images, resize_x=64, resize_y=64, antialias=False)
            images = fn.crop_mirror_normalize(
                images, crop=(56, 56), mean=[0.0], std=[1.0], output_layout="HWC"
            )
            return images

        return pipe()

    cpu_out = make("cpu").run()[0].as_array()
    gpu_out = np.asarray(make("gpu").run()[0].as_tensor())
    assert cpu_out.shape == gpu_out.shape
    # bilinear implementations differ in rounding; allow small average error
    diff = np.abs(cpu_out - gpu_out)
    assert diff.mean() < 2.0, f"mean abs diff {diff.mean()}"
    assert np.median(diff) <= 1.0


def test_random_resized_crop_gpu(jpeg_dataset):
    @pipeline_def(batch_size=4, num_threads=2, seed=17)
    def pipe():
        jpegs, _ = fn.readers.file(file_root=jpeg_dataset, name="Reader")
        images = fn.decoders.image(jpegs, device="mixed")
        images = fn.random_resized_crop(images, size=[32, 32])
        return images

    p = pipe()
    out = p.run()[0]
    arr = np.asarray(out.as_tensor())
    assert arr.shape == (4, 32, 32, 3)
    assert arr.dtype == np.uint8
    # two iterations produce different crops
    arr2 = np.asarray(p.run()[0].as_tensor())
    assert not np.array_equal(arr, arr2)


def test_determinism_same_seed(jpeg_dataset):
    def run_once():
        @pipeline_def(batch_size=4, num_threads=2, seed=99)
        def pipe():
            jpegs, labels = fn.readers.file(file_root=jpeg_dataset, random_shuffle=True, name="Reader")
            images = fn.decoders.image(jpegs, device="cpu")
            images = fn.random_resized_crop(images, size=[32, 32])
            return images, labels

        p = pipe()
        imgs, labels = p.run()
        return imgs.as_array().copy(), np.stack([labels.at(i) for i in range(4)])

    a1, l1 = run_once()
    a2, l2 = run_once()
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(l1, l2)


def test_prefetch_pipelining(jpeg_dataset):
    @pipeline_def(batch_size=4, num_threads=2, seed=1, prefetch_queue_depth=3)
    def pipe():
        jpegs, labels = fn.readers.file(file_root=jpeg_dataset, name="Reader")
        images = fn.decoders.image(jpegs, device="cpu")
        images = fn.resize(images, resize_x=32, resize_y=32)
        return images, labels

    p = pipe()
    p._prefetch()
    seen = []
    for _ in range(8):
        imgs, labels = p.outputs()
        seen.append(labels.at(0)[0])
        p.schedule_run()
    assert len(seen) == 8


def test_reader_shard_math(jpeg_dataset):
    """Shard bounds per reference loader.h:84-103."""

    def labels_for(shard_id, num_shards):
        @pipeline_def(batch_size=8, num_threads=1, seed=2)
        def pipe():
            jpegs, labels = fn.readers.file(
                file_root=jpeg_dataset, shard_id=shard_id, num_shards=num_shards, name="Reader"
            )
            return labels

        p = pipe()
        out = p.run()[0]
        return [int(out.at(i)[0]) for i in range(8)]

    l0 = labels_for(0, 2)
    l1 = labels_for(1, 2)
    # 32 files, 4 classes × 8: shard 0 = first 16 (classes 0,1), shard 1 = classes 2,3
    assert set(l0) <= {0, 1}
    assert set(l1) <= {2, 3}


def test_reader_meta(jpeg_dataset):
    @pipeline_def(batch_size=8, num_threads=1, seed=2)
    def pipe():
        jpegs, labels = fn.readers.file(file_root=jpeg_dataset, name="Reader")
        return labels

    p = pipe()
    p.build()
    meta = p.reader_meta("Reader")
    assert meta["epoch_size"] == 32
    assert p.epoch_size("Reader") == 32


def test_decoder_cache(tmp_path):
    """cache_size keeps decoded images keyed by source_info (reference
    decoder/cache/): second epoch served from the cache, pixels identical."""
    import cv2

    root = tmp_path / "imgs" / "c"
    root.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        small = rng.integers(0, 256, (6, 8, 3), np.uint8)
        cv2.imwrite(str(root / f"{i}.jpg"), cv2.resize(small, (64, 48)))

    def build(cache):
        @pipeline_def(batch_size=4, num_threads=1, seed=1)
        def pipe():
            jp, _ = fn.readers.file(file_root=str(tmp_path / "imgs"), name="r")
            return fn.decoders.image(jp, device="mixed", cache_size=64 if cache else 0)

        p = pipe()
        p.build()
        return p

    pc, pn = build(True), build(False)
    for it in range(3):
        a = np.asarray(pc.run()[0].as_tensor())
        b = np.asarray(pn.run()[0].as_tensor())
        np.testing.assert_array_equal(a[:, :48, :64], b[:, :48, :64])
    impl = next(i for i in pc._executor.impls.values() if hasattr(i, "_img_cache"))
    assert impl._img_cache.hits >= 8  # iterations 2 and 3 fully cached


def test_image_random_crop_non_hybrid(jpeg_dataset):
    """Regression: fn.decoders.image_random_crop WITHOUT hybrid_device_decode —
    the wrapper forwards `seed` to decoders.ImageRandomCrop, whose schema must
    declare it (reference RandomCropAttr adds the seed arg; a missing
    declaration made every non-hybrid call raise TypeError)."""
    def build(device, seed):
        @pipeline_def(batch_size=4, num_threads=1, seed=3)
        def pipe():
            jpegs, _ = fn.readers.file(file_root=jpeg_dataset, name="R")
            img = fn.decoders.image_random_crop(
                jpegs, device=device, seed=seed,
                random_area=[0.3, 0.8], random_aspect_ratio=[0.8, 1.25])
            return fn.resize(img, resize_x=32, resize_y=32)
        p = pipe()
        p.build()
        (out,) = p.run()
        return np.stack([np.asarray(out.at(i)) for i in range(4)])

    a = build("cpu", 7)
    b = build("cpu", 7)
    np.testing.assert_array_equal(a, b)  # explicit seed => deterministic
    assert a.shape == (4, 32, 32, 3)
    m = build("mixed", 7)
    assert m.shape == (4, 32, 32, 3)

"""Reader long-tail tests: TFRecord, webdataset, numpy, COCO, sequence
(reference suite ``dali/test/python/reader/``)."""

import json
import os
import tarfile

import numpy as np
import pytest

import dali_tpu.tfrecord as tfrec
from dali_tpu import fn, pipeline_def, types


@pytest.fixture(scope="module")
def tfrecord_file(tmp_path_factory):
    root = tmp_path_factory.mktemp("tfr")
    path = str(root / "data.tfrecord")
    rng = np.random.default_rng(0)
    with open(path, "wb") as f:
        for i in range(10):
            ex = tfrec.write_example(
                {
                    "image/encoded": bytes(rng.integers(0, 256, 50 + i, np.uint8)),
                    "image/class/label": np.array([i], np.int64),
                    "image/scores": rng.random(3).astype(np.float32),
                }
            )
            tfrec.write_record(f, ex)
    idx = str(root / "data.idx")
    tfrec.write_index(path, idx)
    return path, idx


def test_tfrecord_reader(tfrecord_file):
    path, idx = tfrecord_file

    @pipeline_def(batch_size=5, num_threads=1, seed=1)
    def pipe():
        feats = fn.readers.tfrecord(
            path=path,
            index_path=idx,
            features={
                "image/encoded": tfrec.FixedLenFeature((), tfrec.string, ""),
                "image/class/label": tfrec.FixedLenFeature([1], tfrec.int64, -1),
                "image/scores": tfrec.VarLenFeature(tfrec.float32),
            },
            name="R",
        )
        return feats["image/encoded"], feats["image/class/label"], feats["image/scores"]

    p = pipe()
    enc, label, scores = p.run()
    assert enc.at(0).shape == (50,)
    assert label.at(0).tolist() == [0]
    assert label.at(4).tolist() == [4]
    assert scores.at(0).shape == (3,)
    assert p.epoch_size("R") == 10


def test_webdataset_reader(tmp_path):
    tar_path = str(tmp_path / "data.tar")
    rng = np.random.default_rng(1)
    with tarfile.open(tar_path, "w") as tar:
        import io

        for i in range(6):
            payload = bytes(rng.integers(0, 256, 30 + i, np.uint8))
            info = tarfile.TarInfo(f"sample{i:03d}.jpg")
            info.size = len(payload)
            tar.addfile(info, io.BytesIO(payload))
            cls = str(i).encode()
            info2 = tarfile.TarInfo(f"sample{i:03d}.cls")
            info2.size = len(cls)
            tar.addfile(info2, io.BytesIO(cls))

    @pipeline_def(batch_size=6, num_threads=1, seed=1)
    def pipe():
        img, cls = fn.readers.webdataset(paths=[tar_path], ext=["jpg", "cls"], name="R")
        return img, cls

    p = pipe()
    img, cls = p.run()
    assert img.at(0).shape == (30,)
    assert bytes(cls.at(2).tobytes()) == b"2"
    assert p.epoch_size("R") == 6


def test_numpy_reader(tmp_path):
    for i in range(4):
        np.save(tmp_path / f"arr{i}.npy", np.full((3, 4), i, np.float32))

    @pipeline_def(batch_size=4, num_threads=1, seed=1)
    def pipe():
        return fn.readers.numpy(file_root=str(tmp_path), name="R")

    out = pipe().run()[0]
    assert out.at(0).shape == (3, 4)
    assert out.at(3)[0, 0] == 3.0


def test_coco_reader(tmp_path, jpeg_dataset):
    # build a tiny COCO annotation over the synthetic jpegs
    img_dir = os.path.join(jpeg_dataset, "class0")
    files = sorted(os.listdir(img_dir))[:4]
    doc = {
        "images": [
            {"id": i + 1, "file_name": f, "width": 400, "height": 300} for i, f in enumerate(files)
        ],
        "categories": [{"id": 7, "name": "cat"}, {"id": 9, "name": "dog"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 7, "bbox": [10, 20, 100, 50], "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 9, "bbox": [30, 40, 60, 80], "iscrowd": 0},
            {"id": 3, "image_id": 3, "category_id": 9, "bbox": [0, 0, 200, 100], "iscrowd": 0},
        ],
    }
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps(doc))

    @pipeline_def(batch_size=4, num_threads=1, seed=1)
    def pipe():
        imgs, boxes, labels = fn.readers.coco(
            file_root=img_dir, annotations_file=str(ann), ltrb=True, name="R"
        )
        return imgs, boxes, labels

    imgs, boxes, labels = pipe().run()
    assert boxes.at(0).shape == (2, 4)
    np.testing.assert_allclose(boxes.at(0)[0], [10, 20, 110, 70])
    assert labels.at(0).tolist() == [1, 2]  # remapped contiguous ids
    assert boxes.at(1).shape == (0, 4)


def test_sequence_reader(tmp_path):
    import cv2

    for s in range(2):
        d = tmp_path / f"seq{s}"
        d.mkdir()
        for f in range(6):
            img = np.full((20, 20, 3), s * 100 + f, np.uint8)
            cv2.imwrite(str(d / f"{f:03d}.png"), img)

    @pipeline_def(batch_size=2, num_threads=1, seed=1)
    def pipe():
        return fn.readers.sequence(file_root=str(tmp_path), sequence_length=3, step=3, name="R")

    out = pipe().run()[0]
    assert out.at(0).shape == (3, 20, 20, 3)
    assert out.layout() == "FHWC"


def test_webdataset_index_paths(tmp_path):
    """External wds2idx index files (reference webdataset index_paths):
    indexing must not open the shard at all."""
    import io
    import subprocess
    import sys
    import tarfile

    import numpy as np

    from dali_tpu import fn, pipeline_def

    shard = tmp_path / "data.tar"
    with tarfile.open(shard, "w") as tar:
        for i in range(3):
            payload = f"sample{i}".encode()
            ti = tarfile.TarInfo(name=f"s{i:03d}.cls")
            ti.size = len(payload)
            tar.addfile(ti, io.BytesIO(payload))
    idx = tmp_path / "data.idx"
    repo = os.path.join(os.path.dirname(__file__), "..")
    subprocess.check_call([sys.executable, os.path.join(repo, "tools", "wds2idx.py"),
                           str(shard), str(idx)])

    @pipeline_def(batch_size=3, num_threads=1, seed=1)
    def p():
        return fn.readers.webdataset(paths=[str(shard)], index_paths=[str(idx)],
                                     ext=["cls"], name="W")

    pipe = p()
    pipe.build()
    out = pipe.run()[0]
    got = sorted(bytes(out.at(i)).decode() for i in range(3))
    assert got == ["sample0", "sample1", "sample2"]

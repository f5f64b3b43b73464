"""LMDB format parser + Caffe/Caffe2 readers (reference caffe_reader_op.cc,
caffe2_reader_op.cc, loader/lmdb.h). Fixtures come from our own writer — the
format invariants (meta/leaf/branch/overflow) are asserted structurally."""

import numpy as np
import pytest

import dali_tpu.fn as fn
from dali_tpu._lmdb import LmdbFile, write_lmdb
from dali_tpu.pipeline import pipeline_def

from .test_utils import to_samples


def _varint(v):
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(num, wt, payload):
    tag = _varint((num << 3) | wt)
    if wt == 0:
        return tag + _varint(payload)
    if wt == 2:
        return tag + _varint(len(payload)) + payload
    return tag + payload


def encode_datum(channels, height, width, data, label, encoded=False):
    msg = b"".join([
        _field(1, 0, channels), _field(2, 0, height), _field(3, 0, width),
        _field(4, 2, data), _field(5, 0, label), _field(7, 0, int(encoded)),
    ])
    return msg


def encode_tensor_proto(arr):
    msg = b""
    for d in arr.shape:
        msg += _field(1, 0, int(d))
    if arr.dtype == np.float32:
        msg += _field(2, 0, 1) + _field(3, 2, arr.tobytes())
    elif arr.dtype == np.int32:
        msg += _field(2, 0, 2) + _field(4, 2, b"".join(_varint(int(v)) for v in arr.reshape(-1)))
    elif arr.dtype == np.uint8:
        msg += _field(2, 0, 3) + _field(5, 2, arr.tobytes())
    else:
        raise TypeError(arr.dtype)
    return msg


def encode_tensor_protos(arrays):
    return b"".join(_field(1, 2, encode_tensor_proto(a)) for a in arrays)


# ------------------------------- format round trip ------------------------------------


def test_lmdb_roundtrip_small(tmp_path):
    items = [(f"{i:08d}".encode(), bytes([i]) * (i + 1)) for i in range(50)]
    path = write_lmdb(str(tmp_path / "db"), items)
    with LmdbFile(path) as db:
        assert db.entries == 50
        assert db.keys() == [k for k, _ in items]
        for k, v in items:
            assert db.get(k) == v
        with pytest.raises(KeyError):
            db.get(b"missing")


def test_lmdb_roundtrip_overflow_and_branch(tmp_path):
    rng = np.random.default_rng(0)
    # mix: values > page size force overflow chains; medium inline values force
    # several leaves and therefore a branch root
    items = [
        (f"key-{i:04d}".encode(),
         rng.integers(0, 256, 9000 + i if i % 4 == 0 else 1500, np.uint8).tobytes())
        for i in range(40)
    ]
    path = write_lmdb(str(tmp_path / "big"), items)
    with LmdbFile(path) as db:
        assert db.depth == 2  # branch + leaves
        assert db.keys() == [k for k, _ in items]
        for k, v in items:
            assert db.get(k) == v


def test_lmdb_rejects_garbage(tmp_path):
    p = tmp_path / "junk.mdb"
    p.write_bytes(b"\x00" * 8192)
    with pytest.raises(ValueError):
        LmdbFile(str(p))


# ------------------------------- readers -----------------------------------------------


def _make_caffe_db(tmp_path, n=8):
    import cv2

    rng = np.random.default_rng(1)
    items, labels = [], []
    for i in range(n):
        img = rng.integers(0, 255, (20 + i, 24, 3), np.uint8)
        ok, jpg = cv2.imencode(".jpg", img)
        assert ok
        items.append((f"{i:08d}".encode(),
                      encode_datum(3, img.shape[0], img.shape[1], jpg.tobytes(), i, encoded=True)))
        labels.append(i)
    return write_lmdb(str(tmp_path / "caffe"), items), labels


def test_caffe_reader_pipeline(tmp_path):
    path, labels = _make_caffe_db(tmp_path)

    @pipeline_def(batch_size=4, num_threads=1, seed=3)
    def pipe():
        data, label = fn.readers.caffe(path=path, name="r")
        img = fn.decoders.image(data, device="cpu")
        return img, label

    p = pipe()
    p.build()
    assert p.reader_meta("r")["epoch_size"] == 8
    imgs, labs = p.run()
    got = [int(x) for x in to_samples(labs)]
    assert got == labels[:4]
    assert to_samples(imgs)[0].shape == (20, 24, 3)


def test_caffe2_reader_pipeline(tmp_path):
    rng = np.random.default_rng(2)
    items = []
    for i in range(6):
        img = rng.integers(0, 255, (10, 12, 3), np.uint8)
        payload = encode_tensor_protos([img, np.asarray([i], np.int32)])
        items.append((f"{i:06d}".encode(), payload))
    path = write_lmdb(str(tmp_path / "c2"), items)

    @pipeline_def(batch_size=3, num_threads=1, seed=4)
    def pipe():
        data, label = fn.readers.caffe2(path=path, name="r")
        return data, label

    p = pipe()
    p.build()
    data, labs = p.run()
    assert to_samples(data)[0].shape == (10, 12, 3)
    assert [int(x) for x in to_samples(labs)] == [0, 1, 2]


def test_caffe_reader_sharding(tmp_path):
    path, labels = _make_caffe_db(tmp_path)

    metas = []
    for sid in range(2):
        @pipeline_def(batch_size=2, num_threads=1, seed=3)
        def pipe():
            data, label = fn.readers.caffe(path=path, name="r", shard_id=sid, num_shards=2)
            return label

        p = pipe()
        p.build()
        metas.append(p.reader_meta("r"))
        (labs,) = p.run()
        got = [int(x) for x in to_samples(labs)]
        assert got == ([0, 1] if sid == 0 else [4, 5])
    assert all(m["number_of_shards"] == 2 for m in metas)

"""Caffe / Caffe2 LMDB readers.

Reference: ``dali/operators/reader/caffe_reader_op.cc`` and
``caffe2_reader_op.cc`` (both thin: LMDBLoader ``reader/loader/lmdb.h:23`` +
protobuf parsers ``reader/parser/caffe_parser.h`` / ``caffe2_parser.h``).

Here the LMDB environment is parsed directly (:mod:`dali_tpu._lmdb`, mmap +
B+tree walk — no liblmdb) and the protobuf payloads are decoded with a minimal
wire-format scanner: Datum and TensorProtos are stable, tiny schemas, so a
hand-rolled parser avoids a protobuf-runtime dependency on the hot read path.
"""

from __future__ import annotations

import numpy as np

from .._lmdb import LmdbFile
from .._schema import DALI_SCHEMA, ArgType, register_operator
from .readers import BaseReader

# ---------------------------------- protobuf wire scanner -----------------------------------


def scan_proto(buf: memoryview):
    """Yield (field_number, wire_type, value) from a protobuf message.
    value: int for varint, bytes for length-delimited, raw bytes for fixed."""
    i, n = 0, len(buf)
    while i < n:
        tag = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            tag |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        field, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            v = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                v |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield field, wt, v
        elif wt == 1:  # 64-bit
            yield field, wt, bytes(buf[i : i + 8])
            i += 8
        elif wt == 2:  # length-delimited
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield field, wt, bytes(buf[i : i + ln])
            i += ln
        elif wt == 5:  # 32-bit
            yield field, wt, bytes(buf[i : i + 4])
            i += 4
        else:
            raise ValueError(f"unsupported protobuf wire type {wt}")


def parse_datum(buf: bytes) -> dict:
    """caffe.proto Datum: 1 channels, 2 height, 3 width, 4 data, 5 label,
    6 float_data (repeated), 7 encoded."""
    d = {"channels": 0, "height": 0, "width": 0, "data": b"", "label": 0,
         "float_data": [], "encoded": False}
    for field, wt, v in scan_proto(memoryview(buf)):
        if field == 1:
            d["channels"] = v
        elif field == 2:
            d["height"] = v
        elif field == 3:
            d["width"] = v
        elif field == 4:
            d["data"] = v
        elif field == 5:
            d["label"] = v
        elif field == 6:
            if wt == 2:  # packed
                d["float_data"].extend(np.frombuffer(v, "<f4").tolist())
            else:
                d["float_data"].append(np.frombuffer(v, "<f4")[0])
        elif field == 7:
            d["encoded"] = bool(v)
    return d


_C2_FLOAT, _C2_INT32, _C2_BYTE, _C2_STRING = 1, 2, 3, 4
_C2_INT64, _C2_UINT8 = 10, 8


def parse_tensor_proto(buf: bytes) -> np.ndarray:
    """caffe2.proto TensorProto: 1 dims, 2 data_type, 3 float_data,
    4 int32_data, 5 byte_data, 6 string_data, 10 int64_data."""
    dims, dtype = [], _C2_FLOAT
    floats, int32s, int64s = [], [], []
    byte_data, strings = b"", []
    for field, wt, v in scan_proto(memoryview(buf)):
        if field == 1:
            dims.append(v) if wt == 0 else dims.extend(_unpack_varints(v))
        elif field == 2:
            dtype = v
        elif field == 3:
            floats.extend(np.frombuffer(v, "<f4").tolist()) if wt == 2 else floats.append(
                np.frombuffer(v, "<f4")[0]
            )
        elif field == 4:
            int32s.append(v) if wt == 0 else int32s.extend(_unpack_varints(v))
        elif field == 5:
            byte_data = v
        elif field == 6:
            strings.append(v)
        elif field == 10:
            int64s.append(v) if wt == 0 else int64s.extend(_unpack_varints(v))
    shape = tuple(int(x) for x in dims)
    if dtype == _C2_FLOAT:
        arr = np.asarray(floats, np.float32)
    elif dtype == _C2_INT32:
        arr = np.asarray(int32s, np.int32)
    elif dtype == _C2_INT64:
        arr = np.asarray(int64s, np.int64)
    elif dtype in (_C2_BYTE, _C2_UINT8):
        arr = np.frombuffer(byte_data, np.uint8)
    elif dtype == _C2_STRING:
        arr = np.frombuffer(strings[0], np.uint8) if strings else np.zeros(0, np.uint8)
        return arr  # encoded image bytes: ignore dims
    else:
        raise ValueError(f"TensorProto data_type {dtype} not supported")
    return arr.reshape(shape) if shape and arr.size == int(np.prod(shape)) else arr


def _unpack_varints(b: bytes):
    out, v, shift = [], 0, 0
    for byte in b:
        v |= (byte & 0x7F) << shift
        if byte & 0x80:
            shift += 7
        else:
            out.append(v)
            v, shift = 0, 0
    return out


def parse_tensor_protos(buf: bytes):
    """TensorProtos: field 1 = repeated TensorProto."""
    return [parse_tensor_proto(v) for f, wt, v in scan_proto(memoryview(buf)) if f == 1]


# ---------------------------------- readers -----------------------------------------------


def _lmdb_schema(name, doc):
    return (
        DALI_SCHEMA(name)
        .DocStr(doc)
        .NumInput(0)
        .NumOutput(2)
        .Devices("cpu")
        .MakeReader()
        .AddArg("path", ArgType.STRING_VEC, "LMDB directory (or data.mdb file) path(s).")
    )


_lmdb_schema(
    "readers.Caffe",
    "Reads (image, label) from a Caffe LMDB (reference caffe_reader_op.cc). "
    "Encoded datums yield the undecoded image bytes — pair with fn.decoders.image.",
)
_lmdb_schema(
    "readers.Caffe2",
    "Reads (image, label) from a Caffe2 LMDB of TensorProtos "
    "(reference caffe2_reader_op.cc).",
)


class _LMDBReaderBase(BaseReader):
    def _paths(self):
        p = self.spec.GetArgument("path")
        return [p] if isinstance(p, str) else list(p)

    def _build_index(self):
        self._dbs = [LmdbFile(p) for p in self._paths()]
        self._index = []  # (db_idx, key)
        for di, db in enumerate(self._dbs):
            self._index.extend((di, k) for k in db.keys())

    def _num_samples(self):
        return len(self._index)

    def _raw_value(self, index: int) -> bytes:
        di, key = self._index[index]
        return self._dbs[di].get(key)

    def close(self):
        for db in getattr(self, "_dbs", []):
            db.close()


@register_operator("readers.Caffe", "cpu")
class CaffeReader(_LMDBReaderBase):
    def _read_payload(self, index: int):
        d = parse_datum(self._raw_value(index))
        label = np.int32(d["label"])
        if d["float_data"]:
            data = np.asarray(d["float_data"], np.float32)
            if d["channels"] and d["height"] and d["width"]:
                data = data.reshape(d["channels"], d["height"], d["width"])
        else:
            data = np.frombuffer(d["data"], np.uint8)
            if not d["encoded"] and d["channels"] and d["height"] and d["width"]:
                data = data.reshape(d["channels"], d["height"], d["width"])
        return data, label


@register_operator("readers.Caffe2", "cpu")
class Caffe2Reader(_LMDBReaderBase):
    def _read_payload(self, index: int):
        protos = parse_tensor_protos(self._raw_value(index))
        data = protos[0] if protos else np.zeros(0, np.uint8)
        label = protos[1] if len(protos) > 1 else np.zeros((), np.int32)
        if label.ndim and label.size == 1:
            label = label.reshape(())
        return data, np.asarray(label)

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
).OutputFn(
    lambda spec: (int(spec.GetArgument("image_available", True))
                  + int(spec.GetArgument("label_available", True)))
).AddOptionalArg(
    "image_available", ArgType.BOOL,
    "The LMDB datums contain image data (reference caffe_reader_op.cc).", True
).AddOptionalArg(
    "label_available", ArgType.BOOL, "The LMDB datums contain labels.", True
)


def _caffe2_output_fn(spec):
    """Reference Caffe2ReaderOutputFn (caffe2_reader_op.cc:22): image +
    label (2 outputs for the sparse label types: dense vector + raw indices) +
    additional_inputs + bbox."""
    lt = spec.GetArgument("label_type", 0)
    n = int(spec.GetArgument("image_available", True))
    n += (0 if lt == 4 else 1) + (1 if lt in (1, 3) else 0)
    n += int(spec.GetArgument("additional_inputs", 0))
    n += int(spec.GetArgument("bbox", False))
    return n


_lmdb_schema(
    "readers.Caffe2",
    "Reads (image, label) from a Caffe2 LMDB of TensorProtos "
    "(reference caffe2_reader_op.cc).",
).OutputFn(_caffe2_output_fn).AddOptionalArg(
    "image_available", ArgType.BOOL,
    "The first TensorProto of each sample is image data.", True
).AddOptionalArg(
    "label_type", ArgType.INT,
    "0 = SINGLE_LABEL, 1 = MULTI_LABEL_SPARSE (dense one-hot of num_labels + "
    "raw indices output), 2 = MULTI_LABEL_DENSE, 3 = MULTI_LABEL_WEIGHTED_SPARSE "
    "(dense weights of num_labels + raw indices output), 4 = NO_LABEL "
    "(reference caffe2_reader_op.cc).", 0
).AddOptionalArg(
    "num_labels", ArgType.INT,
    "Number of classes (required for the sparse label types).", 1
).AddOptionalArg(
    "additional_inputs", ArgType.INT,
    "Number of auxiliary TensorProtos per sample emitted as extra outputs.", 0
).AddOptionalArg(
    "bbox", ArgType.BOOL,
    "The final TensorProto is a 4-element int32 bounding box (extra output).",
    False
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
        outs = []
        if self.spec.GetArgument("image_available", True):
            if d["float_data"]:
                data = np.asarray(d["float_data"], np.float32)
                if d["channels"] and d["height"] and d["width"]:
                    data = data.reshape(d["channels"], d["height"], d["width"])
            else:
                data = np.frombuffer(d["data"], np.uint8)
                if not d["encoded"] and d["channels"] and d["height"] and d["width"]:
                    data = data.reshape(d["channels"], d["height"], d["width"])
            outs.append(data)
        if self.spec.GetArgument("label_available", True):
            outs.append(np.int32(d["label"]))
        return tuple(outs) if len(outs) != 1 else outs[0]


@register_operator("readers.Caffe2", "cpu")
class Caffe2Reader(_LMDBReaderBase):
    def _read_payload(self, index: int):
        """Proto layout (reference caffe2_parser.h Parse): [image][label
        indices][weights (weighted-sparse)][additional...][bbox]."""
        spec = self.spec
        protos = parse_tensor_protos(self._raw_value(index))
        outs = []
        k = 0
        if spec.GetArgument("image_available", True):
            data = protos[k] if k < len(protos) else np.zeros(0, np.uint8)
            outs.append(data)
            k += 1
        lt = spec.GetArgument("label_type", 0)
        num_labels = spec.GetArgument("num_labels", 1)
        if lt != 4:
            lab = np.asarray(protos[k]) if k < len(protos) else np.zeros((), np.int32)
            if lt == 0:  # SINGLE_LABEL
                if lab.ndim and lab.size == 1:
                    lab = lab.reshape(())
                outs.append(lab)
                k += 1
            elif lt == 1:  # MULTI_LABEL_SPARSE -> dense one-hot + raw indices
                idx = lab.reshape(-1).astype(np.int64)
                if idx.size and (idx.min() < 0 or idx.max() >= num_labels):
                    raise ValueError(
                        f"readers.Caffe2: label index out of bounds "
                        f"(num_labels={num_labels})")
                dense = np.zeros((num_labels,), lab.dtype if lab.dtype.kind == "f"
                                 else np.int32)
                dense[idx] = 1
                outs += [dense, idx.astype(np.int32)]
                k += 1
            elif lt == 2:  # MULTI_LABEL_DENSE
                outs.append(lab.reshape(-1))
                k += 1
            elif lt == 3:  # MULTI_LABEL_WEIGHTED_SPARSE
                idx = lab.reshape(-1).astype(np.int64)
                wts = (np.asarray(protos[k + 1], np.float32).reshape(-1)
                       if k + 1 < len(protos) else np.zeros_like(idx, np.float32))
                if idx.size and (idx.min() < 0 or idx.max() >= num_labels):
                    raise ValueError(
                        f"readers.Caffe2: label index out of bounds "
                        f"(num_labels={num_labels})")
                dense = np.zeros((num_labels,), np.float32)
                dense[idx] = wts[: idx.size]
                outs += [dense, idx.astype(np.int32)]
                k += 2
            else:
                raise ValueError(f"readers.Caffe2: unsupported label_type {lt}")
        for _ in range(spec.GetArgument("additional_inputs", 0)):
            outs.append(np.asarray(protos[k]) if k < len(protos) else np.zeros(0, np.float32))
            k += 1
        if spec.GetArgument("bbox", False):
            bb = np.asarray(protos[k], np.int32).reshape(-1) if k < len(protos) \
                else np.zeros((4,), np.int32)
            if bb.size != 4:
                raise ValueError("readers.Caffe2: bbox proto must have 4 int32 values")
            outs.append(bb)
        return tuple(outs) if len(outs) != 1 else outs[0]

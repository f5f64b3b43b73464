"""MXNet RecordIO reader (reference ``dali/operators/reader/loader/recordio_loader.h``,
``readers__MXNet``) — the length-prefixed record format used by ImageRecord files."""

from __future__ import annotations

import os
import struct

import numpy as np

from .._schema import DALI_SCHEMA, ArgType, register_operator
from .readers import BaseReader

_MAGIC = 0xCED7230A


def build_recordio_index(path: str):
    """(offset, size) per record — the analogue of the reference's .idx files."""
    entries = []
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        pos = 0
        while pos + 8 <= size:
            f.seek(pos)
            hdr = f.read(8)
            magic, lrec = struct.unpack("<II", hdr)
            if magic != _MAGIC:
                break
            length = lrec & ((1 << 29) - 1)
            entries.append((pos, length))
            pos += 8 + ((length + 3) & ~3)  # 4-byte aligned
    return entries


def parse_irheader(payload: bytes):
    """MXNet ImageRecord header: flag u32, label f32, id u64, id2 u64 (24 bytes);
    flag > 0 → `flag` float labels follow (reference recordio parser)."""
    flag, label = struct.unpack("<If", payload[:8])
    offset = 24
    if flag > 0:
        labels = np.frombuffer(payload, np.float32, count=flag, offset=offset)
        offset += 4 * flag
    else:
        labels = np.array([label], np.float32)
    return labels, payload[offset:]


DALI_SCHEMA("readers.MXNet").DocStr(
    "Reads MXNet RecordIO (ImageRecord) files (reference ``readers__MXNet``). "
    "Outputs (encoded image, label)."
).NumInput(0).NumOutput(2).Devices("cpu").MakeReader().AddArg(
    "path", ArgType.STRING_VEC, "RecordIO file path(s)."
).AddOptionalArg("index_path", ArgType.STRING_VEC, "Index file path(s) (.idx).", None)


@register_operator("readers.MXNet", "cpu")
class MXNetReader(BaseReader):
    def __init__(self, spec, op_id):
        super().__init__(spec, op_id)
        self._entries = None
        self._paths = None

    def _build_index(self):
        if self._entries is not None:
            return
        paths = self.spec.GetArgument("path")
        if isinstance(paths, str):
            paths = [paths]
        idx_paths = self.spec.GetArgument("index_path", None)
        if isinstance(idx_paths, str):
            idx_paths = [idx_paths]
        self._paths = list(paths)
        self._entries = []
        for fi, p in enumerate(paths):
            if idx_paths and fi < len(idx_paths) and os.path.exists(idx_paths[fi]):
                # MXNet .idx: "<key>\t<offset>" lines; sizes derived by sorting
                offs = []
                with open(idx_paths[fi]) as f:
                    for line in f:
                        parts = line.split()
                        if len(parts) >= 2:
                            offs.append(int(parts[1]))
                offs.sort()
                end = os.path.getsize(p)
                for i, off in enumerate(offs):
                    nxt = offs[i + 1] if i + 1 < len(offs) else end
                    self._entries.append((fi, off, nxt - off))
            else:
                for off, length in build_recordio_index(p):
                    self._entries.append((fi, off, length + 8))

    def _num_samples(self):
        return len(self._entries)

    def _read_payload(self, index: int):
        fi, off, size = self._entries[index]
        with open(self._paths[fi], "rb") as f:
            f.seek(off)
            hdr = f.read(8)
            magic, lrec = struct.unpack("<II", hdr)
            length = lrec & ((1 << 29) - 1)
            payload = f.read(length)
        labels, data = parse_irheader(payload)
        return np.frombuffer(data, np.uint8).copy(), labels.astype(np.float32)

"""decoders.Inflate, readers.Fits, experimental.Remap, decoders.ImageSlice.

Reference: ``dali/operators/decoder/inflate/`` (GPU LZ4 via nvCOMP — host
zlib/zstd here per SURVEY §2.4), ``reader/fits_loader.cc`` (FITS images),
``image/remap/`` (cvcuda remap), ``decoders__ImageSlice``.
"""

from __future__ import annotations

import struct

import numpy as np

from .._schema import DALI_SCHEMA, ArgType, register_operator
from .. import imgcodec
from ..batch import HostBatch
from ..types import DALIDataType, to_numpy_type
from .base import Operator
from .readers import BaseReader

# ====================================== decoders.Inflate ===========================================

DALI_SCHEMA("decoders.Inflate").DocStr(
    "Decompresses chunks (reference ``decoders__Inflate``; GPU LZ4/nvCOMP there, "
    "host zlib/zstd/gzip here)."
).NumInput(1).NumOutput(1).Devices("cpu").AddOptionalArg(
    "algorithm", ArgType.STRING, "'zlib' (DALI: 'LZ4' unsupported), 'zstd', 'gzip', 'raw_deflate'.", "zlib"
).AddOptionalArg(
    "dtype", ArgType.DATA_TYPE, "Output dtype.", DALIDataType.UINT8
).AddOptionalArg(
    "shape", ArgType.INT_VEC, "Output shape.", None, tensor_ok=True, per_sample=True
)


@register_operator("decoders.Inflate", "cpu")
class Inflate(Operator):
    def run_sample(self, ctx, idx, data):
        algo = self.spec.GetArgument("algorithm", "zlib").lower()
        raw = np.ascontiguousarray(data).tobytes()
        if algo == "zstd":
            import zstandard

            out = zstandard.ZstdDecompressor().decompress(raw)
        elif algo in ("zlib", "gzip", "raw_deflate"):
            import zlib

            wbits = {"zlib": 15, "gzip": 31, "raw_deflate": -15}[algo]
            out = zlib.decompress(raw, wbits)
        else:
            raise ValueError(f"Unsupported inflate algorithm {algo!r}")
        dt = to_numpy_type(self.spec.GetArgument("dtype", DALIDataType.UINT8))
        arr = np.frombuffer(out, dt).copy()
        shape = ctx.arg(self, "shape", idx, None)
        if shape is not None:
            arr = arr.reshape([int(v) for v in np.asarray(shape).reshape(-1)])
        return arr


# ====================================== readers.Fits ===============================================

_FITS_DTYPES = {8: np.uint8, 16: ">i2", 32: ">i4", 64: ">i8", -32: ">f4", -64: ">f8"}


def _read_fits_header(f):
    """One HDU header: dict of cards, or None at EOF."""
    cards = {}
    end = False
    first = True
    while not end:
        block = f.read(2880)
        if not block and first:
            return None
        if len(block) < 2880:
            raise ValueError("Truncated FITS header")
        first = False
        for i in range(0, 2880, 80):
            card = block[i : i + 80].decode("ascii", "replace")
            key = card[:8].strip()
            if key == "END":
                end = True
                break
            if "=" in card:
                val = card[card.index("=") + 1 :].split("/")[0].strip()
                cards[key] = val
    return cards


def _fits_data(cards, f, skip: bool):
    bitpix = int(cards["BITPIX"])
    naxis = int(cards["NAXIS"])
    shape = [int(cards[f"NAXIS{i}"]) for i in range(naxis, 0, -1)]
    count = int(np.prod(shape)) if shape else 0
    dt = np.dtype(_FITS_DTYPES[bitpix])
    # FITS standard data size: |BITPIX|/8 * GCOUNT * (PCOUNT + prod(NAXIS))
    # — PCOUNT carries the variable-length heap of table extensions
    gcount = int(cards.get("GCOUNT", "1") or 1)
    pcount = int(cards.get("PCOUNT", "0") or 0)
    nbytes = dt.itemsize * gcount * (pcount + count)
    padded = -(-nbytes // 2880) * 2880 if nbytes else 0
    if skip:
        f.seek(padded, 1)
        return None
    xt = cards.get("XTENSION", "'IMAGE'").strip().strip("'").strip()
    if xt not in ("IMAGE", ""):
        raise ValueError(
            f"FITS HDU is a {xt} extension, not an image; pick an image HDU "
            "via hdu_indices (reference fits reader loads image HDUs)")
    data = np.frombuffer(f.read(count * dt.itemsize), dt, count=count)
    f.seek(padded - count * dt.itemsize, 1)
    arr = data.reshape(shape)
    bscale = float(cards.get("BSCALE", "1.0"))
    bzero = float(cards.get("BZERO", "0.0"))
    if bscale != 1.0 or bzero != 0.0:
        arr = arr * bscale + bzero
    return np.ascontiguousarray(arr.astype(arr.dtype.newbyteorder("=")))


def read_fits_hdus(path: str, indices) -> list:
    """Minimal FITS reader over 1-based HDU indices (reference fits_loader.cc
    uses cfitsio; 2880-byte header blocks of 80-char cards, big-endian data,
    data sections padded to the block size). Requesting the reference default
    HDU 2 on an extension-less file falls back to the primary HDU."""
    want = {int(i) for i in indices}
    out = {}
    max_hdu = 0
    with open(path, "rb") as f:
        hdu = 0
        while len(out) < len(want):
            hdu += 1
            cards = _read_fits_header(f)
            if cards is None:
                break
            max_hdu = hdu
            arr = _fits_data(cards, f, skip=hdu not in want)
            if hdu in want:
                out[hdu] = arr
    missing = sorted(want - set(out))
    if missing == [2] and max_hdu == 1 and 1 not in want:
        # primary-only file asked for the default first extension: serve the
        # primary in every requested slot
        primary = read_fits_hdus(path, [1])[0]
        return [primary for _ in indices]
    if missing:
        raise ValueError(f"{path}: FITS HDU(s) {missing} not present")
    return [out[int(i)] for i in indices]


def read_fits_image(path: str) -> np.ndarray:
    """Primary-HDU convenience wrapper around read_fits_hdus."""
    return read_fits_hdus(path, [1])[0]


DALI_SCHEMA("readers.Fits").DocStr(
    "Reads FITS image files (reference ``readers__Fits``, ``fits_loader.cc``); "
    "one output per entry of ``hdu_indices``."
).NumInput(0).OutputFn(
    lambda spec: len(spec.GetArgument("hdu_indices") or [2])
).Devices("cpu").MakeReader().AddOptionalArg(
    "file_root", ArgType.STRING, "Directory with FITS files.", None
).AddOptionalArg(
    "files", ArgType.STRING_VEC, "Explicit file list.", None
).AddOptionalArg("file_filter", ArgType.STRING, "Glob filter.", "*.fits").AddOptionalArg(
    "hdu_indices", ArgType.INT_VEC,
    "1-based HDU indices to read, one output each (reference default [2] = "
    "first extension; extension-less files fall back to the primary).", [2]
).AddOptionalArg(
    "file_list", ArgType.STRING, "Path to a file with one FITS path per line.", None
).AddOptionalArg(
    "dtypes", ArgType.INT_VEC,
    "Expected output dtypes per HDU (DALIDataType values); data is cast "
    "when it differs (reference fits_reader_op.cc `dtypes`).", None)


@register_operator("readers.Fits", "cpu")
class FitsReader(BaseReader):
    def __init__(self, spec, op_id):
        super().__init__(spec, op_id)
        self._files = None

    def _build_index(self):
        if self._files is not None:
            return
        import fnmatch
        import os

        spec = self.spec
        files = spec.GetArgument("files", None)
        root = spec.GetArgument("file_root", None)
        if files:
            self._files = [os.path.join(root, f) if root and not os.path.isabs(f) else f for f in files]
        elif spec.GetArgument("file_list", None):
            with open(spec.GetArgument("file_list")) as f:
                base = root or ""
                self._files = [os.path.join(base, line.strip()) for line in f if line.strip()]
        elif root:
            pat = spec.GetArgument("file_filter", "*.fits")
            self._files = [
                os.path.join(root, f) for f in sorted(os.listdir(root)) if fnmatch.fnmatch(f, pat)
            ]
        else:
            raise ValueError("readers.fits requires file_root or files")
        if not self._files:
            raise ValueError("readers.fits found no files")

    def _num_samples(self):
        return len(self._files)

    def _read_payload(self, index: int):
        hdus = self.spec.GetArgument("hdu_indices", None) or [2]
        arrs = read_fits_hdus(self._files[index], hdus)
        dtypes = self.spec.GetArgument("dtypes", None)
        if dtypes:
            from ..types import DALIDataType, to_numpy_type

            if len(dtypes) != len(arrs):
                raise ValueError(
                    "readers.Fits: len(dtypes) must match len(hdu_indices)")
            arrs = [a.astype(to_numpy_type(DALIDataType(int(dt))))
                    for a, dt in zip(arrs, dtypes)]
        return tuple(arrs) if len(arrs) > 1 else arrs[0]


# ====================================== experimental.Remap =========================================

DALI_SCHEMA("experimental.Remap").DocStr(
    "Generic coordinate remap: out(x, y) = in(mapx(x, y), mapy(x, y)) "
    "(reference experimental remap via CV-CUDA)."
).NumInput(3).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
    "interp", ArgType.INTERP_TYPE, "Interpolation.", None
).AddOptionalArg("pixel_origin", ArgType.STRING, "'corner' or 'center'.", "corner")


def _remap_is_nn(spec):
    from ..types import DALIInterpType

    return spec.GetArgument("interp", None) == DALIInterpType.INTERP_NN


@register_operator("experimental.Remap", "cpu")
class RemapCPU(Operator):
    def run_sample(self, ctx, idx, img, mapx, mapy):
        import cv2

        return cv2.remap(
            img, mapx.astype(np.float32), mapy.astype(np.float32),
            cv2.INTER_NEAREST if _remap_is_nn(self.spec) else cv2.INTER_LINEAR
        )


@register_operator("experimental.Remap", "gpu")
class RemapGPU(Operator):
    def lower(self, dctx, img_b, mapx_b, mapy_b):
        import jax

        from .distortion import _bilinear_gather, _to_dtype
        import jax.numpy as jnp

        mx = mapx_b.data.astype(jnp.float32)
        my = mapy_b.data.astype(jnp.float32)
        if _remap_is_nn(self.spec):  # nearest: snap map coords to pixel centers
            mx = jnp.round(mx)
            my = jnp.round(my)
        out = jax.vmap(lambda im, x, y: _bilinear_gather(jnp, im, x, y, 0.0))(
            img_b.data, mx, my
        )
        return [img_b.with_data(_to_dtype(jnp, out, img_b.data.dtype), shapes=None)]


# ====================================== decoders.ImageSlice ========================================

DALI_SCHEMA("decoders.ImageSlice").DocStr(
    "Decode + slice (reference ``decoders__ImageSlice``): anchor/shape given as "
    "positional inputs (relative by default) or kwargs."
).NumInput(1, 3).NumOutput(1).Devices("cpu", "mixed").AddOptionalArg(
    "output_type", ArgType.IMAGE_TYPE, "Color space.", None
).AddOptionalArg(
    "normalized_anchor", ArgType.BOOL, "Anchor input is relative.", True
).AddOptionalArg(
    "normalized_shape", ArgType.BOOL, "Shape input is relative.", True
).AddOptionalArg(
    "axes", ArgType.INT_VEC, "Sliced axes.", [1, 0]
).AddOptionalArg(
    "axis_names", ArgType.TENSOR_LAYOUT,
    'Sliced axes by layout letter (takes precedence over `axes`; reference '
    'slice_attr.h default "WH").', None
).AddOptionalArg(
    "adjust_orientation", ArgType.BOOL, "Apply EXIF orientation.", True
).AddOptionalArg(
    "dtype", ArgType.DATA_TYPE, "Output dtype (uint8).", None
).AddOptionalArg(
    "jpeg_fancy_upsampling", ArgType.BOOL,
    "Triangular chroma upsampling for subsampled JPEGs.", True
).AddOptionalArg(
    "device_memory_padding_jpeg2k", ArgType.INT, "Compatibility no-op.", 0
).AddOptionalArg(
    "host_memory_padding_jpeg2k", ArgType.INT, "Compatibility no-op.", 0
)


class _ImageSliceBase(Operator):
    def run_sample(self, ctx, idx, encoded, *pos):
        from ..types import DALIImageType, to_numpy_type

        out_type = self.spec.GetArgument("output_type", None) or DALIImageType.RGB
        img = imgcodec.decode(
            np.ascontiguousarray(encoded).tobytes(), output_type=out_type,
            adjust_orientation=self.spec.GetArgument("adjust_orientation", True),
            fancy_upsampling=self.spec.GetArgument("jpeg_fancy_upsampling", True))
        dt = self.spec.GetArgument("dtype", None)
        if dt is not None:
            img = img.astype(to_numpy_type(dt))
        if not pos:
            return img
        anchor = np.asarray(pos[0], np.float64).reshape(-1)
        shape = np.asarray(pos[1], np.float64).reshape(-1) if len(pos) > 1 else None
        axes = self.spec.GetArgument("axes", [1, 0])
        names = self.spec.GetArgument("axis_names", None)
        if names:  # letters refer to the decoded HWC layout
            axes = ["HWC".index(ch) for ch in names]
        dims = np.array([img.shape[a] for a in axes], np.float64)
        if self.spec.GetArgument("normalized_anchor", True):
            anchor = anchor * dims
        if shape is not None and self.spec.GetArgument("normalized_shape", True):
            shape = shape * dims
        sl = [slice(None)] * img.ndim
        for k, a in enumerate(axes):
            lo = int(round(anchor[k]))
            ln = int(round(shape[k])) if shape is not None else img.shape[a] - lo
            sl[a] = slice(max(lo, 0), max(lo, 0) + ln)
        return np.ascontiguousarray(img[tuple(sl)])

    def output_layout(self, j, inputs):
        return "HWC"


@register_operator("decoders.ImageSlice", "cpu")
class ImageSliceCPU(_ImageSliceBase):
    pass


@register_operator("decoders.ImageSlice", "mixed")
class ImageSliceMixed(_ImageSliceBase):
    pass

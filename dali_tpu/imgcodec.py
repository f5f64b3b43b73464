"""Image codec layer: header peeking + decode.

Analogue of the reference's imgcodec subsystem (``dali/operators/imgcodec``,
nvImageCodec backends). Decode preference order:

1. native C++ decoder (``dali_tpu.native``) — libjpeg(-turbo)-based, releases the
   GIL, per-sample parallel on the executor thread pool;
2. OpenCV (``cv2.imdecode``) — releases the GIL;
3. PIL — last resort.

Header parsing (``peek_shape``) is pure Python over the first bytes: JPEG SOF scan,
PNG IHDR, BMP/GIF/WEBP headers (reference ``imgcodec/peek_image_shape.cc``).
"""

from __future__ import annotations

import struct

import numpy as np

from .types import DALIDataType, DALIImageType

_cv2 = None
_native = None
_checked = False


def _backends():
    global _cv2, _native, _checked
    if not _checked:
        try:
            from . import native as _n

            if _n.available() and _n.has_jpeg():
                _native = _n
        except Exception:
            _native = None
        try:
            import cv2

            _cv2 = cv2
        except Exception:
            _cv2 = None
        globals()["_checked"] = True
    return _native, _cv2


def exif_orientation(data: bytes) -> int:
    """EXIF orientation (1-8; 1 = upright) from a JPEG's APP1 segment, or 1.

    Reference: imgcodec applies EXIF orientation by default
    (``adjust_orientation``; dali/imgcodec/decoders parse the same tag
    0x0112 from the TIFF IFD0)."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        return 1
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            return 1
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xDA, 0xD9):  # SOS/EOI: no APP1 seen
            return 1
        seg_len = (data[pos + 2] << 8) | data[pos + 3]
        if marker == 0xE1 and data[pos + 4 : pos + 10] == b"Exif\x00\x00":
            tiff = pos + 10
            if tiff + 8 > n:
                return 1
            bo = data[tiff : tiff + 2]
            if bo == b"II":
                u16 = lambda o: int.from_bytes(data[o : o + 2], "little")
                u32 = lambda o: int.from_bytes(data[o : o + 4], "little")
            elif bo == b"MM":
                u16 = lambda o: int.from_bytes(data[o : o + 2], "big")
                u32 = lambda o: int.from_bytes(data[o : o + 4], "big")
            else:
                return 1
            ifd = tiff + u32(tiff + 4)
            if ifd + 2 > n:
                return 1
            count = u16(ifd)
            for i in range(count):
                e = ifd + 2 + 12 * i
                if e + 12 > n:
                    return 1
                if u16(e) == 0x0112:
                    v = u16(e + 8)
                    return v if 1 <= v <= 8 else 1
            return 1
        pos += 2 + seg_len
    return 1


def apply_orientation(img: np.ndarray, orientation: int) -> np.ndarray:
    """Apply an EXIF orientation so the result is upright (HWC)."""
    if orientation == 2:
        return img[:, ::-1]
    if orientation == 3:
        return img[::-1, ::-1]
    if orientation == 4:
        return img[::-1]
    if orientation == 5:
        return np.swapaxes(img, 0, 1)
    if orientation == 6:
        return np.swapaxes(img, 0, 1)[:, ::-1]
    if orientation == 7:
        return np.swapaxes(img, 0, 1)[::-1, ::-1]
    if orientation == 8:
        return np.swapaxes(img, 0, 1)[::-1]
    return img


def is_jpeg2000(data: bytes) -> bool:
    """JP2 container signature or raw JPEG 2000 codestream (SOC marker)."""
    return (data[:12] == b"\x00\x00\x00\x0cjP  \r\n\x87\n"
            or data[:4] == b"\xff\x4f\xff\x51")


def _convert_dtype(img: np.ndarray, dtype) -> np.ndarray:
    """Dynamic-range conversion to the requested output dtype (reference
    ``operators/imgcodec/util/convert_utils.h``): integer targets are scaled
    source_max → target_max (e.g. uint16→uint8 multiplies by 255/65535 —
    NOT a truncating >>8); float targets land in [0, 1]."""
    if dtype is None:
        dtype = DALIDataType.UINT8
    np_t = dtype.np_dtype if hasattr(dtype, "np_dtype") else np.dtype(dtype)
    if img.dtype == np_t:
        return img
    if np.issubdtype(img.dtype, np.floating):
        # float sources (32-bit TIFF/EXR via IMREAD_ANYDEPTH) are already
        # in the [0, 1] dynamic range by the convention below
        src_max = 1.0
    else:
        src_max = float(np.iinfo(img.dtype).max)
    if np.issubdtype(np_t, np.floating):
        return (img.astype(np.float64) / src_max).astype(np_t)
    info = np.iinfo(np_t)
    scaled = np.round(img.astype(np.float64) * (float(info.max) / src_max))
    return np.clip(scaled, info.min, info.max).astype(np_t)


def decode(data: bytes, output_type=DALIImageType.RGB, denom: int = 1,
           adjust_orientation: bool = True, fancy_upsampling: bool = True,
           dtype=None) -> np.ndarray:
    """Decode an encoded image to HWC in the requested color space and dtype.

    ``denom`` (JPEG only): decode at 1/denom DCT scale (libjpeg scaled decode).
    ``adjust_orientation`` applies the EXIF orientation tag (reference
    default) — rotated-camera JPEGs come out upright.
    ``fancy_upsampling`` (JPEG only): libjpeg triangular chroma upsampling
    (reference ``jpeg_fancy_upsampling``); False = cheaper box replication.
    ``dtype`` (DALIDataType or numpy dtype; default UINT8): output type with
    dynamic-range scaling (reference decoder ``dtype`` arg) — 16-bit PNG/TIFF
    sources decode at full precision and scale to the requested range; float
    targets are [0, 1].
    """
    if is_jpeg2000(data):
        raise NotImplementedError(
            "JPEG 2000 decode is not supported (the reference delegates to "
            "the proprietary nvJPEG2000; no codec is available here — see "
            "docs/compatibility.md 'Decode formats')")
    if adjust_orientation and is_jpeg(data):
        o = exif_orientation(data)
        if o != 1:
            img = decode(data, output_type, denom, adjust_orientation=False,
                         fancy_upsampling=fancy_upsampling, dtype=dtype)
            return np.ascontiguousarray(apply_orientation(img, o))
    native, cv2 = _backends()
    if native is not None and is_jpeg(data):
        if output_type == DALIImageType.GRAY:
            img = native.decode_jpeg(data, denom=denom, gray=True,
                                     fancy_upsampling=fancy_upsampling)
            if img is not None:
                return _convert_dtype(img, dtype)
        img = native.decode_jpeg(data, denom=denom,
                                 fancy_upsampling=fancy_upsampling)  # RGB HWC uint8
        if img is not None:
            return _convert_dtype(_convert_from_rgb(img, output_type), dtype)
    if cv2 is not None:
        gray = output_type == DALIImageType.GRAY
        flags = cv2.IMREAD_GRAYSCALE if gray else cv2.IMREAD_COLOR
        # preserve >8-bit source precision (16-bit PNG/TIFF) — the range
        # conversion below owns the narrowing, not cv2's truncating >>8
        flags |= cv2.IMREAD_ANYDEPTH
        if denom in (2, 4, 8) and is_jpeg(data):
            reduced = {
                (2, False): cv2.IMREAD_REDUCED_COLOR_2,
                (4, False): cv2.IMREAD_REDUCED_COLOR_4,
                (8, False): cv2.IMREAD_REDUCED_COLOR_8,
                (2, True): cv2.IMREAD_REDUCED_GRAYSCALE_2,
                (4, True): cv2.IMREAD_REDUCED_GRAYSCALE_4,
                (8, True): cv2.IMREAD_REDUCED_GRAYSCALE_8,
            }
            flags = reduced[(denom, gray)]
        buf = np.frombuffer(data, dtype=np.uint8)
        img = cv2.imdecode(buf, flags)
        if img is None:
            raise ValueError("Failed to decode image")
        if output_type == DALIImageType.GRAY:
            return _convert_dtype(img[:, :, None], dtype)
        if output_type == DALIImageType.BGR:
            return _convert_dtype(img, dtype)
        rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if output_type == DALIImageType.YCbCr:
            # YCbCr math is defined on the 8-bit range (128 chroma offset):
            # narrow first, then widen to the requested dtype
            return _convert_dtype(_rgb_to_ycbcr(_convert_dtype(rgb, None)), dtype)
        return _convert_dtype(rgb, dtype)
    from io import BytesIO

    from PIL import Image

    img = np.asarray(Image.open(BytesIO(data)).convert("RGB"))
    return _convert_dtype(_convert_from_rgb(img, output_type), dtype)


def _convert_from_rgb(rgb: np.ndarray, output_type) -> np.ndarray:
    if output_type in (DALIImageType.RGB, DALIImageType.ANY_DATA):
        return rgb
    if output_type == DALIImageType.BGR:
        return rgb[:, :, ::-1].copy()
    if output_type == DALIImageType.GRAY:
        # ITU-R BT.601 luma, matching reference color_space_conversion_impl.h
        g = np.round(rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114)
        return g.astype(np.uint8)[:, :, None]
    if output_type == DALIImageType.YCbCr:
        return _rgb_to_ycbcr(rgb)
    raise ValueError(f"Unsupported output_type {output_type}")


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 full-range (JPEG) YCbCr, as in the reference
    ``color_space_conversion_impl.h``."""
    r = rgb[..., 0].astype(np.float32)
    g = rgb[..., 1].astype(np.float32)
    b = rgb[..., 2].astype(np.float32)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.clip(np.stack([y, cb, cr], axis=-1).round(), 0, 255).astype(np.uint8)


# -- container sniffing --------------------------------------------------------------------


def is_jpeg(data: bytes) -> bool:
    return len(data) > 3 and data[0] == 0xFF and data[1] == 0xD8


def peek_shape(data: bytes):
    """(h, w, c) from the header without full decode
    (reference ``imgcodec/peek_image_shape.cc``)."""
    if is_jpeg(data):
        return _peek_jpeg(data)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", data[16:24])
        color_type = data[25]
        c = {0: 1, 2: 3, 3: 3, 4: 2, 6: 4}.get(color_type, 3)
        return h, w, c
    if data[:2] == b"BM":
        w, h = struct.unpack("<ii", data[18:26])
        return abs(h), w, 3
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", data[6:10])
        return h, w, 3
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        if data[12:16] == b"VP8 ":
            w, h = struct.unpack("<HH", data[26:30])
            return h & 0x3FFF, w & 0x3FFF, 3
        if data[12:16] == b"VP8L":
            bits = struct.unpack("<I", data[21:25])[0]
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            return h, w, 3
        if data[12:16] == b"VP8X":
            w = int.from_bytes(data[24:27], "little") + 1
            h = int.from_bytes(data[27:30], "little") + 1
            return h, w, 3
    # fallback: full decode
    img = decode(data)
    return img.shape


def _peek_jpeg(data: bytes):
    i = 2
    n = len(data)
    while i + 9 < n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        length = struct.unpack(">H", data[i + 2 : i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):  # SOFn
            h, w = struct.unpack(">HH", data[i + 5 : i + 9])
            c = data[i + 9]
            return h, w, int(c)
        i += 2 + length
    raise ValueError("No SOF marker found in JPEG")

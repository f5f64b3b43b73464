"""Native (C++) host runtime bindings.

``libdali_tpu.so`` (built from ``dali_tpu/native/src`` via ``build.py``) provides
the GIL-releasing host hot paths, mirroring the reference's C++ core: libjpeg
decode with DCT-domain scaling (1/2, 1/4, 1/8 — the host half of the
decode-shrink-transfer strategy), strided decode-into-canvas, and batched
pad/stack memcpy. Python falls back to numpy/OpenCV when the library hasn't been
built; ``build()`` compiles it on demand.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False
# _load() is called from every pipeline's host-stage thread; two pipelines
# cold-starting together previously raced it: thread B saw _TRIED=True while
# thread A was still mid-CDLL and got None back (the hybrid decoder then
# reported every JPEG as unsupported), and a stale .so could be REBUILT by
# one thread while the other dlopen'ed the half-written file (observed as
# heap corruption). One lock; the stampede is per-process-once.
import threading as _threading  # noqa: E402

# REENTRANT: default_arena()/shared_pool() hold this while constructing
# HostArena/TaskPool, whose __init__ calls _load(), which takes it again —
# a plain Lock self-deadlocks on the first native touch through those paths
_LOAD_LOCK = _threading.RLock()
_REBUILT = False


def _lib_path():
    # DALI_TPU_NATIVE_LIB points at an alternative build (e.g. a
    # -fsanitize=address build, loaded under LD_PRELOAD=libasan.so) so full
    # pipelines can run under sanitizers, not just the fuzz binaries.
    override = os.environ.get("DALI_TPU_NATIVE_LIB")
    if override:
        return override
    return os.path.join(os.path.dirname(__file__), "libdali_tpu.so")


def build():
    with _LOAD_LOCK:
        from .build import build as _b

        _b(verbose=False)
        global _TRIED, _LIB
        _TRIED = False
        _LIB = None
    return _load() is not None


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOAD_LOCK:
        if _TRIED:  # another thread finished while we waited
            return _LIB
        return _load_locked()


def _load_locked():
    global _LIB, _TRIED
    try:
        return _load_locked_inner()
    finally:
        # _TRIED flips only once _LIB holds its FINAL value: the unlocked
        # fast path in _load() reads (_TRIED, _LIB) without the lock, so
        # setting _TRIED at entry would hand racing threads a torn None.
        _TRIED = True


def _load_locked_inner():
    global _LIB
    path = _lib_path()
    if not os.path.exists(path):
        try:
            from .build import build as _b

            _b(verbose=False)
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.dali_tpu_has_jpeg.restype = ctypes.c_int
        lib.dali_tpu_jpeg_scaled_dims.restype = ctypes.c_int
        lib.dali_tpu_jpeg_scaled_dims.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.dali_tpu_decode_jpeg_into.restype = ctypes.c_int
        lib.dali_tpu_decode_jpeg_into.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.dali_tpu_pool_create.restype = ctypes.c_void_p
        lib.dali_tpu_pool_create.argtypes = [ctypes.c_int]
        lib.dali_tpu_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.dali_tpu_task_submit.restype = ctypes.c_int64
        lib.dali_tpu_task_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ]
        lib.dali_tpu_task_wait.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.dali_tpu_pool_wait_all.argtypes = [ctypes.c_void_p]
        lib.dali_tpu_jpeg_coef_info_batch.restype = ctypes.c_int
        lib.dali_tpu_jpeg_coef_info_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_int, ctypes.c_void_p,
        ]
        lib.dali_tpu_jpeg_coeffs_split_flat_crop_batch.restype = ctypes.c_int
        lib.dali_tpu_jpeg_coeffs_split_flat_crop_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
        ]
        lib.dali_tpu_jpeg_coeffs_split_flat_batch.restype = ctypes.c_int
        lib.dali_tpu_jpeg_coeffs_split_flat_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
        ]
        lib.dali_tpu_jpeg_coeffs_split_batch.restype = ctypes.c_int
        lib.dali_tpu_jpeg_coeffs_split_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
        ]
        lib.dali_tpu_decode_jpeg_batch.restype = ctypes.c_int
        lib.dali_tpu_decode_jpeg_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.dali_tpu_decode_jpeg_gray_into.restype = ctypes.c_int
        lib.dali_tpu_decode_jpeg_gray_into.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
        ]
        lib.dali_tpu_jpeg_coef_info.restype = ctypes.c_int
        lib.dali_tpu_jpeg_coef_info.argtypes = [ctypes.c_char_p, ctypes.c_size_t] + [
            ctypes.POINTER(ctypes.c_int)
        ] * 7
        lib.dali_tpu_jpeg_read_coeffs.restype = ctypes.c_int
        lib.dali_tpu_jpeg_read_coeffs.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        try:
            lib.dali_tpu_video_open.restype = ctypes.c_void_p
            lib.dali_tpu_video_open.argtypes = [ctypes.c_char_p]
            lib.dali_tpu_video_info.restype = ctypes.c_int
            lib.dali_tpu_video_info.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_double),
            ]
            lib.dali_tpu_video_read_frames.restype = ctypes.c_int
            lib.dali_tpu_video_read_frames.argtypes = [
                ctypes.c_void_p, ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ]
            lib.dali_tpu_video_close.restype = None
            lib.dali_tpu_video_close.argtypes = [ctypes.c_void_p]
            lib.dali_tpu_video_pixfmt_class.restype = ctypes.c_int
            lib.dali_tpu_video_pixfmt_class.argtypes = [ctypes.c_void_p]
            lib.dali_tpu_video_read_frames_yuv.restype = ctypes.c_int
            lib.dali_tpu_video_read_frames_yuv.argtypes = [
                ctypes.c_void_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib._has_video = True
        except AttributeError:
            lib._has_video = False
        try:
            lib.dali_tpu_audio_decode.restype = ctypes.c_int
            lib.dali_tpu_audio_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.dali_tpu_audio_buffer_free.argtypes = [ctypes.c_void_p]
            lib.dali_tpu_audio_encode.restype = ctypes.c_long
            lib.dali_tpu_audio_encode.argtypes = [
                ctypes.c_void_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
                ctypes.c_char_p, ctypes.c_void_p, ctypes.c_long,
            ]
            lib._has_audio = True
        except AttributeError:
            lib._has_audio = False
        lib.dali_tpu_jpeg_read_coeffs_split.restype = ctypes.c_int
        lib.dali_tpu_jpeg_read_coeffs_split.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.dali_tpu_jpeg_huff_read_coeffs_split_crop.restype = ctypes.c_int
        lib.dali_tpu_jpeg_huff_read_coeffs_split_crop.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.dali_tpu_jpeg_read_coeffs_split_crop.restype = ctypes.c_int
        lib.dali_tpu_jpeg_read_coeffs_split_crop.argtypes = (
            lib.dali_tpu_jpeg_huff_read_coeffs_split_crop.argtypes
        )
        lib.dali_tpu_jpeg_encode_rgb.restype = ctypes.c_long
        lib.dali_tpu_jpeg_encode_rgb.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_long,
        ]
        lib.dali_tpu_pad_stack_u8.restype = ctypes.c_int
        lib.dali_tpu_pad_stack_u8.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_long), ctypes.c_int,
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.dali_tpu_arena_create.restype = ctypes.c_void_p
        lib.dali_tpu_arena_create.argtypes = [ctypes.c_longlong, ctypes.c_int]
        lib.dali_tpu_arena_destroy.argtypes = [ctypes.c_void_p]
        lib.dali_tpu_arena_alloc.restype = ctypes.c_void_p
        lib.dali_tpu_arena_alloc.argtypes = [ctypes.c_void_p, ctypes.c_longlong]
        lib.dali_tpu_arena_free.restype = ctypes.c_int
        lib.dali_tpu_arena_free.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.dali_tpu_arena_trim.argtypes = [ctypes.c_void_p, ctypes.c_longlong]
        lib.dali_tpu_arena_stats.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_longlong)
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    except AttributeError:
        # a stale libdali_tpu.so missing newer symbols: rebuild once and
        # retry; if that fails too, disable the native path (callers fall
        # back to the generic decoders)
        global _REBUILT
        _LIB = None
        if not _REBUILT:
            _REBUILT = True
            try:
                from .build import build as _b

                _b(verbose=False)
                return _load_locked_inner()  # lock already held by _load()
            except Exception:
                _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def has_jpeg() -> bool:
    lib = _load()
    return bool(lib and lib.dali_tpu_has_jpeg())


def jpeg_scaled_dims(data: bytes, denom: int = 1):
    """(h, w, c) of the JPEG when decoded at 1/denom DCT scale; None on error."""
    lib = _load()
    if lib is None:
        return None
    h, w, c = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
    rc = lib.dali_tpu_jpeg_scaled_dims(data, len(data), denom, h, w, c)
    if rc != 0:
        return None
    return h.value, w.value, c.value


def decode_jpeg(data: bytes, denom: int = 1, fancy_upsampling: bool = True, gray: bool = False):
    """Decode a JPEG to HWC uint8 (RGB or grayscale) at 1/denom scale.

    Returns None on failure (caller falls back to OpenCV).
    """
    lib = _load()
    if lib is None:
        return None
    dims = jpeg_scaled_dims(data, denom)
    if dims is None:
        return None
    h, w, _ = dims
    c = 1 if gray else 3
    out = np.empty((h, w, c), dtype=np.uint8)
    if gray:
        rc = lib.dali_tpu_decode_jpeg_gray_into(
            data, len(data), denom, out.ctypes.data_as(ctypes.c_void_p), w * c, h, w
        )
    else:
        rc = lib.dali_tpu_decode_jpeg_into(
            data, len(data), denom, out.ctypes.data_as(ctypes.c_void_p), w * c, h, w,
            1 if fancy_upsampling else 0,
        )
    return out if rc == 0 else None


def decode_jpeg_into(data: bytes, dst: np.ndarray, denom: int = 1, fancy_upsampling: bool = True) -> bool:
    """Decode directly into the top-left of a strided HWC uint8 canvas view.

    ``dst`` must be a C-contiguous-rows view (row stride = dst.strides[0]) at
    least as large as the scaled output. Fuses decode + pad_stack.
    """
    lib = _load()
    if lib is None:
        return False
    dims = jpeg_scaled_dims(data, denom)
    if dims is None:
        return False
    h, w, _ = dims
    if h > dst.shape[0] or w > dst.shape[1] or dst.shape[2] != 3:
        return False
    rc = lib.dali_tpu_decode_jpeg_into(
        data, len(data), denom, dst.ctypes.data_as(ctypes.c_void_p), dst.strides[0], h, w,
        1 if fancy_upsampling else 0,
    )
    return rc == 0


def jpeg_coef_info(data: bytes):
    """(h, w, y_bh, y_bw, c_bh, c_bw, mode) for hybrid decode; None if the JPEG
    is not a supported 3-component YCbCr 4:2:0/4:4:4 stream."""
    lib = _load()
    if lib is None:
        return None
    vals = [ctypes.c_int() for _ in range(7)]
    rc = lib.dali_tpu_jpeg_coef_info(data, len(data), *[ctypes.byref(v) for v in vals])
    if rc != 0:
        return None
    return tuple(v.value for v in vals)


def jpeg_read_coeffs(data: bytes, ky: int, kc: int, y_bh: int, y_bw: int, c_bh: int, c_bw: int):
    """Entropy-decode only: low-freq coefficient planes (ky×ky luma, kc×kc
    chroma) + quant tables.

    Returns (y [y_bh, y_bw, ky*ky] int16, c [2, c_bh, c_bw, kc*kc] int16,
    q [ky*ky + kc*kc] uint16) or None on failure.
    """
    lib = _load()
    if lib is None:
        return None
    y = np.empty((y_bh, y_bw, ky * ky), np.int16)
    cb = np.empty((c_bh, c_bw, kc * kc), np.int16)
    cr = np.empty((c_bh, c_bw, kc * kc), np.int16)
    q = np.empty((ky * ky + kc * kc,), np.uint16)
    rc = lib.dali_tpu_jpeg_read_coeffs(
        data, len(data), ky, kc,
        y.ctypes.data_as(ctypes.c_void_p), cb.ctypes.data_as(ctypes.c_void_p),
        cr.ctypes.data_as(ctypes.c_void_p), q.ctypes.data_as(ctypes.c_void_p),
        y_bh, y_bw, c_bh, c_bw,
    )
    if rc != 0:
        return None
    return y, np.stack([cb, cr]), q


class VideoPixfmtChanged(RuntimeError):
    """The stream's pixel format changed mid-read (video_decode.cc returns
    -2 - got): the planar YUV wire cannot carry such a file — callers fall
    back to the dense RGB path (swscale converts any format) or raise."""

    def __init__(self, path, got):
        super().__init__(
            f"pixel format changed mid-stream in {path!r} after {got} "
            "frames; planar YUV read aborted")
        self.got = got


def has_video() -> bool:
    lib = _load()
    return bool(lib and getattr(lib, "_has_video", False))


class VideoFile:
    """FFmpeg-backed video handle: frame-accurate sequence reads to RGB24.

    Host half of the video stack (reference frames_decoder_base.cc)."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None or not getattr(lib, "_has_video", False):
            raise RuntimeError("native video decoding unavailable (libavformat missing)")
        self._lib = lib
        self._h = lib.dali_tpu_video_open(path.encode())
        if not self._h:
            raise ValueError(f"Failed to open video {path!r}")
        self.path = path
        w, hh = ctypes.c_int(), ctypes.c_int()
        nf, fps = ctypes.c_long(), ctypes.c_double()
        lib.dali_tpu_video_info(self._h, ctypes.byref(w), ctypes.byref(hh), ctypes.byref(nf), ctypes.byref(fps))
        self.width = w.value
        self.height = hh.value
        self.num_frames = nf.value
        self.fps = fps.value
        # 0 = not 4:2:0 (RGB read only); 1 = 4:2:0 limited; 2 = 4:2:0 full
        self.pixfmt_class = int(lib.dali_tpu_video_pixfmt_class(self._h)) \
            if hasattr(lib, "dali_tpu_video_pixfmt_class") else 0

    def read(self, start: int, count: int, stride: int = 1,
             pad: bool = True) -> np.ndarray:
        """Read ``count`` frames; ``pad=False`` returns only the frames that
        exist (short at EOF) so callers can apply their own pad_mode."""
        out = np.empty((count, self.height, self.width, 3), np.uint8)
        got = self._lib.dali_tpu_video_read_frames(
            self._h, start, count, stride, out.ctypes.data_as(ctypes.c_void_p)
        )
        if got < count:
            if got <= 0:
                raise ValueError(f"Failed to read frames [{start}, +{count})")
            if not pad:
                return np.ascontiguousarray(out[:got])
            out[got:] = out[got - 1]  # pad with last frame at EOF
        return out

    def read_yuv(self, start: int, count: int, stride: int = 1,
                 pad: bool = True, out=None):
        """Read ``count`` frames as PLANAR YUV 4:2:0 — the host half of the
        planar video wire (chroma upsample + BT.601 run on the device;
        executor.py "yuv420" boundary). Requires ``pixfmt_class != 0``.

        ``out`` may carry preallocated ``(y, u, v)`` uint8 buffers of at
        least ``count*h*w`` / ``count*ceil(h/2)*ceil(w/2)`` elements (e.g.
        slices of a flat wire buffer) to decode straight into the wire with
        zero extra copies. Returns ``(y, u, v, got)`` with the planes shaped
        [count, ...] (or flat when ``out`` was given) and ``got`` the number
        of real (non-padded) frames."""
        if self.pixfmt_class == 0:
            raise RuntimeError("read_yuv requires a 4:2:0 source")
        h_, w_ = self.height, self.width
        ch, cw = (h_ + 1) // 2, (w_ + 1) // 2
        if out is None:
            y = np.empty((count, h_, w_), np.uint8)
            u = np.empty((count, ch, cw), np.uint8)
            v = np.empty((count, ch, cw), np.uint8)
        else:
            y, u, v = out
            # the native call writes through the BASE pointer (strides are
            # never seen) and the EOF pad below writes through reshape views,
            # so non-contiguous planes would corrupt memory / silently drop
            # the padding into a reshape COPY
            for nm, a, need in (("y", y, count * h_ * w_),
                                ("u", u, count * ch * cw),
                                ("v", v, count * ch * cw)):
                if not (isinstance(a, np.ndarray) and a.dtype == np.uint8
                        and a.flags["C_CONTIGUOUS"]):
                    raise ValueError(
                        f"read_yuv out[{nm}] must be C-contiguous uint8")
                if a.size < need:
                    raise ValueError(
                        f"read_yuv out[{nm}] too small: {a.size} < {need}")
        got = self._lib.dali_tpu_video_read_frames_yuv(
            self._h, start, count, stride,
            y.ctypes.data_as(ctypes.c_void_p),
            u.ctypes.data_as(ctypes.c_void_p),
            v.ctypes.data_as(ctypes.c_void_p),
        )
        if got <= -2:  # mid-stream pixel-format change, NOT an EOF shape
            raise VideoPixfmtChanged(getattr(self, "path", "?"), -2 - got)
        if got < count:
            if got <= 0:
                raise ValueError(f"Failed to read frames [{start}, +{count})")
            if pad:  # repeat the last decoded frame at EOF
                fy, fu, fv = h_ * w_, ch * cw, ch * cw
                yf = y.reshape(-1)[: count * fy].reshape(count, fy)
                uf = u.reshape(-1)[: count * fu].reshape(count, fu)
                vf = v.reshape(-1)[: count * fv].reshape(count, fv)
                yf[got:] = yf[got - 1]
                uf[got:] = uf[got - 1]
                vf[got:] = vf[got - 1]
        return y, u, v, got

    def close(self):
        if self._h:
            self._lib.dali_tpu_video_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class HostArena:
    """Native size-classed host staging arena (src/arena.cc) — the mm::*
    analogue (reference include/dali/core/mm/memory_resource.h pinned kinds +
    mm/pool_resource.h free-list pooling; mm::alloc_raw_unique's deleter
    pattern is mirrored by the weakref finalizer on each block).

    ``alloc(n, dtype)`` returns a numpy array whose storage is an arena block;
    the block returns to the pool when the LAST reference to that array drops
    (finalizer), so in-flight staged buffers can never dangle — lifetime
    semantics are identical to plain ``np.empty``, minus the mmap/page-fault
    churn. ``pin=True`` additionally best-effort mlocks blocks so pages stay
    resident under an async H2D writer."""

    def __init__(self, max_pooled_bytes: int = 512 << 20, pin: bool = True):
        self._lib = _load()
        self._h = None
        if self._lib is not None:
            self._h = self._lib.dali_tpu_arena_create(
                ctypes.c_longlong(int(max_pooled_bytes)), 1 if pin else 0
            )

    @property
    def available(self) -> bool:
        return self._h is not None

    def alloc(self, n: int, dtype) -> np.ndarray:
        """A 1-D writable array of n elements backed by a pooled block."""
        import weakref

        dt = np.dtype(dtype)
        nbytes = max(int(n) * dt.itemsize, 1)
        if self._h is None:
            return np.empty((int(n),), dt)
        ptr = self._lib.dali_tpu_arena_alloc(self._h, ctypes.c_longlong(nbytes))
        if not ptr:
            return np.empty((int(n),), dt)
        cbuf = (ctypes.c_uint8 * nbytes).from_address(ptr)
        # Passing `self` keeps the arena (and its C handle) alive until every
        # outstanding block's finalizer has run.
        weakref.finalize(cbuf, self._free_ptr, ptr)
        return np.frombuffer(cbuf, dtype=dt, count=int(n))

    def _free_ptr(self, ptr: int) -> None:
        if self._h is not None:
            self._lib.dali_tpu_arena_free(self._h, ctypes.c_void_p(ptr))

    def trim(self, keep_bytes: int = 0) -> None:
        if self._h is not None:
            self._lib.dali_tpu_arena_trim(self._h, ctypes.c_longlong(int(keep_bytes)))

    def stats(self) -> dict:
        if self._h is None:
            return {}
        out = (ctypes.c_longlong * 9)()
        self._lib.dali_tpu_arena_stats(self._h, out)
        keys = ("in_use_bytes", "in_use_blocks", "pooled_bytes", "pinned_bytes",
                "alloc_calls", "reuse_hits", "os_allocs", "os_frees",
                "max_pooled_bytes")
        return dict(zip(keys, [int(v) for v in out]))

    def __del__(self):
        try:
            if self._h is not None:
                self._lib.dali_tpu_arena_destroy(self._h)
                self._h = None
        except Exception:
            pass


_DEFAULT_ARENA = None


def default_arena() -> HostArena:
    """Process-wide staging arena shared by every pipeline's wire buffers.
    One pool matches the reference's GetDefaultResource(mm::memory_kind)."""
    global _DEFAULT_ARENA
    if _DEFAULT_ARENA is None:
        with _LOAD_LOCK:
            if _DEFAULT_ARENA is None:
                _DEFAULT_ARENA = HostArena()
    return _DEFAULT_ARENA


def arena_stats() -> dict:
    """Counters for executor_statistics()["staging_arena"]; {} if no native lib."""
    return _DEFAULT_ARENA.stats() if _DEFAULT_ARENA is not None else {}


def decode_stats(reset: bool = False) -> dict:
    """Itemization INSIDE the native hybrid-decode batch call (VERDICT r4 #1:
    reconcile the in-pipeline µs/img against the microbench). Nanosecond
    totals from `dali_tpu_decode_batch_stats` (jpeg_coeffs_split.cc) and
    `dali_tpu_huff_stats` (jpeg_huff.cc); {} if no native lib."""
    lib = _load()
    if lib is None or not hasattr(lib, "dali_tpu_decode_batch_stats"):
        return {}
    b = (ctypes.c_longlong * 7)()
    h = (ctypes.c_longlong * 7)()
    lib.dali_tpu_decode_batch_stats(b, 1 if reset else 0)
    lib.dali_tpu_huff_stats(h, 1 if reset else 0)
    return {
        "batch": {
            "ns_fast": b[0], "ns_fallback": b[1], "ns_compact": b[2],
            "ns_batch": b[3], "n_fast": b[4], "n_fallback": b[5],
            "n_batches": b[6],
        },
        "huff": {
            "ns_parse": h[0], "ns_unstuff": h[1], "ns_scan": h[2],
            "ns_rowcompact": h[3], "tbl_hits": h[4], "tbl_misses": h[5],
            "n_imgs": h[6],
        },
    }


class StagingRing:
    """Reusable wire-buffer ring — the host staging arena's lifetime policy
    (SURVEY §2.1 memory-manager row; reference mm::* pinned staging pools).
    np.empty per batch costs ~17 MB of fresh-page faults at this batch size; a
    ring reuses warm pages. Slots draw their storage from the process
    HostArena (native size-class pool, optionally mlocked) when the native
    lib is present. SAFETY: a slot may be rewritten only after its
    iteration's device transfer completed, so the ring must be owned by ONE
    pipeline's decoder op and sized >= that pipeline's in-flight staged
    iterations (cpu_queue_depth + 2: one being built, one in transfer).
    Replaced (outgrown) slots are returned to the arena pool only when the
    last in-flight reference drops. Callers that can't guarantee a depth
    pass ring=None and get fresh allocations."""

    def __init__(self, depth: int, arena: HostArena | None = None):
        self.depth = max(int(depth), 2)
        self._slots = {}
        self._idx = {}
        self._arena = default_arena() if arena is None else arena

    def take(self, kind: str, n: int, dtype) -> np.ndarray:
        key = (kind, np.dtype(dtype).str)
        ring = self._slots.setdefault(key, [None] * self.depth)
        i = self._idx.get(key, 0)
        self._idx[key] = (i + 1) % self.depth
        buf = ring[i]
        if buf is None or buf.shape[0] < n:
            buf = self._arena.alloc(n, dtype)
            ring[i] = buf
        return buf[:n]


def jpeg_read_coeffs_split(data: bytes, ky: int, kc: int, y_bh: int, y_bw: int, c_bh: int, c_bw: int):
    """Split-precision wire format: DC int16 planes + AC int8 planes (saturated)
    + quant tables. Returns (y_dc [ybh,ybw], y_ac [ybh,ybw,ky²-1],
    c_dc [2,cbh,cbw], c_ac [2,cbh,cbw,kc²-1], q) or None."""
    lib = _load()
    if lib is None:
        return None
    y_dc = np.empty((y_bh, y_bw), np.int16)
    y_ac = np.empty((y_bh, y_bw, ky * ky - 1), np.int8)
    cb_dc = np.empty((c_bh, c_bw), np.int16)
    cb_ac = np.empty((c_bh, c_bw, kc * kc - 1), np.int8)
    cr_dc = np.empty((c_bh, c_bw), np.int16)
    cr_ac = np.empty((c_bh, c_bw, kc * kc - 1), np.int8)
    q = np.empty((ky * ky + kc * kc,), np.uint16)
    rc = lib.dali_tpu_jpeg_read_coeffs_split(
        data, len(data), ky, kc,
        y_dc.ctypes.data_as(ctypes.c_void_p), y_ac.ctypes.data_as(ctypes.c_void_p),
        cb_dc.ctypes.data_as(ctypes.c_void_p), cb_ac.ctypes.data_as(ctypes.c_void_p),
        cr_dc.ctypes.data_as(ctypes.c_void_p), cr_ac.ctypes.data_as(ctypes.c_void_p),
        q.ctypes.data_as(ctypes.c_void_p), y_bh, y_bw, c_bh, c_bw,
    )
    if rc != 0:
        return None
    return y_dc, y_ac, np.stack([cb_dc, cr_dc]), np.stack([cb_ac, cr_ac]), q


def jpeg_read_coeffs_split_crop(data: bytes, ky: int, kc: int, y_bh: int,
                                y_bw: int, c_bh: int, c_bw: int,
                                y_br0: int = 0, y_bc0: int = 0,
                                c_br0: int = 0, c_bc0: int = 0,
                                impl: str = "huff"):
    """Single-sample windowed split read. ``impl`` selects the from-scratch
    Huffman decoder (``huff``, jpeg_huff.cc) or the libjpeg path
    (``libjpeg``) — used by the parity tests to cross-check the two.
    Returns (y_dc, y_ac, c_dc [2,...], c_ac [2,...], q) or None (for the
    huff impl, None also means "unsupported stream — fall back")."""
    lib = _load()
    if lib is None:
        return None
    y_dc = np.empty((y_bh, y_bw), np.int16)
    y_ac = np.empty((y_bh, y_bw, ky * ky - 1), np.int8)
    cb_dc = np.empty((c_bh, c_bw), np.int16)
    cb_ac = np.empty((c_bh, c_bw, kc * kc - 1), np.int8)
    cr_dc = np.empty((c_bh, c_bw), np.int16)
    cr_ac = np.empty((c_bh, c_bw, kc * kc - 1), np.int8)
    q = np.empty((ky * ky + kc * kc,), np.uint16)
    fn = (lib.dali_tpu_jpeg_huff_read_coeffs_split_crop if impl == "huff"
          else lib.dali_tpu_jpeg_read_coeffs_split_crop)
    rc = fn(
        data, len(data), ky, kc,
        y_dc.ctypes.data_as(ctypes.c_void_p), y_ac.ctypes.data_as(ctypes.c_void_p),
        cb_dc.ctypes.data_as(ctypes.c_void_p), cb_ac.ctypes.data_as(ctypes.c_void_p),
        cr_dc.ctypes.data_as(ctypes.c_void_p), cr_ac.ctypes.data_as(ctypes.c_void_p),
        q.ctypes.data_as(ctypes.c_void_p), y_bh, y_bw, c_bh, c_bw,
        y_br0, y_bc0, c_br0, c_bc0,
    )
    if rc != 0:
        return None
    return y_dc, y_ac, np.stack([cb_dc, cr_dc]), np.stack([cb_ac, cr_ac]), q


def jpeg_encode_rgb(img: np.ndarray, quality: int = 85, subsamp: int = 0,
                    restart_interval: int = 0, progressive: bool = False):
    """Encode an HWC uint8 RGB array to JPEG bytes via libjpeg (src/jpeg_encode.cc).
    subsamp: 0 = 4:2:0, 1 = 4:4:4. Returns bytes or None."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    cap = h * w * 3 + (1 << 16)
    out = np.empty((cap,), np.uint8)
    n = lib.dali_tpu_jpeg_encode_rgb(
        img.ctypes.data_as(ctypes.c_void_p), h, w, quality, subsamp,
        restart_interval, 1 if progressive else 0,
        out.ctypes.data_as(ctypes.c_void_p), cap,
    )
    if n < 0:
        return None
    return out[:n].tobytes()


def has_audio() -> bool:
    lib = _load()
    return bool(lib and getattr(lib, "_has_audio", False))


def audio_decode(data: bytes):
    """Decode FLAC/OGG/MP3/WAV/... from memory via FFmpeg
    (src/audio_decode.cc). Returns (float32 array [n] or [n, ch], rate) or
    None if the native path is unavailable or the stream is undecodable."""
    lib = _load()
    if lib is None or not getattr(lib, "_has_audio", False):
        return None
    outp = ctypes.POINTER(ctypes.c_float)()
    frames = ctypes.c_long()
    ch = ctypes.c_int()
    rate = ctypes.c_double()
    rc = lib.dali_tpu_audio_decode(
        data, len(data), ctypes.byref(outp), ctypes.byref(frames),
        ctypes.byref(ch), ctypes.byref(rate),
    )
    if rc != 0:
        return None
    try:
        n, c = frames.value, ch.value
        arr = np.ctypeslib.as_array(outp, shape=(n * c,)).copy()
    finally:
        lib.dali_tpu_audio_buffer_free(outp)
    if c > 1:
        arr = arr.reshape(n, c)
    return arr, float(rate.value)


def audio_encode(pcm: np.ndarray, rate: int, fmt: str = "flac"):
    """Encode float32 PCM ([n] or [n, ch]) to flac/ogg/mp3/wav bytes
    (fixture generation; src/audio_decode.cc). Returns bytes or None."""
    lib = _load()
    if lib is None or not getattr(lib, "_has_audio", False):
        return None
    pcm = np.ascontiguousarray(pcm, np.float32)
    ch = 1 if pcm.ndim == 1 else pcm.shape[1]
    frames = pcm.shape[0]
    cap = frames * ch * 4 + (1 << 16)
    out = np.empty((cap,), np.uint8)
    n = lib.dali_tpu_audio_encode(
        pcm.ctypes.data_as(ctypes.c_void_p), frames, ch, int(rate),
        fmt.encode(), out.ctypes.data_as(ctypes.c_void_p), cap,
    )
    if n < 0:
        return None
    return out[:n].tobytes()


def pad_stack_u8(samples, canvas, fill: int = 0, num_threads: int = 0):
    """Pad+stack HWC uint8 samples into [N, *canvas] via native parallel memcpy."""
    lib = _load()
    if lib is None:
        return None
    n = len(samples)
    ptrs = (ctypes.c_void_p * n)(*[s.ctypes.data_as(ctypes.c_void_p).value for s in samples])
    shp = (ctypes.c_long * (n * 3))()
    for i, s in enumerate(samples):
        shp[3 * i : 3 * i + 3] = (s.shape[0], s.shape[1], s.shape[2])
    out = np.full((n, *canvas), fill, dtype=np.uint8)
    rc = lib.dali_tpu_pad_stack_u8(
        ptrs, shp, n, out.ctypes.data_as(ctypes.c_void_p),
        canvas[0], canvas[1], canvas[2], fill, num_threads,
    )
    return out if rc == 0 else None


# ------------------------------- tasking pool --------------------------------------------


class TaskPool:
    """Native task scheduler handle (src/tasking.cc — the analogue of the
    reference's tasking runtime, include/dali/core/exec/tasking/). Batch work
    is submitted through dedicated C entry points (e.g. ``decode_jpeg_batch``)
    so the per-sample fan-out runs entirely outside the GIL."""

    def __init__(self, num_threads: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = lib.dali_tpu_pool_create(int(num_threads))
        self.num_threads = int(num_threads)

    def close(self):
        if getattr(self, "_h", None):
            self._lib.dali_tpu_pool_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


_POOL = None
_RETIRED_POOLS = []  # outgrown pools: RETAINED, never destroyed mid-flight


def shared_pool(num_threads: int = 0):
    """Process-wide TaskPool (grown to the largest request).

    Growing must never free the old pool: with two pipelines cold-starting
    concurrently, pipeline B can be INSIDE a native fan-out on the old pool
    handle when pipeline A's larger request would otherwise drop the last
    reference and run pool_destroy under it (observed as batched JPEG header
    scans transiently failing and as heap corruption). Outgrown pools are
    retained for the process lifetime — a few idle threads, bounded by the
    number of distinct sizes ever requested.
    """
    global _POOL
    if num_threads <= 0:
        num_threads = os.cpu_count() or 1
    if _POOL is None or _POOL.num_threads < num_threads:
        with _LOAD_LOCK:
            if _POOL is None or _POOL.num_threads < num_threads:
                if _POOL is not None:
                    _RETIRED_POOLS.append(_POOL)
                _POOL = TaskPool(num_threads)
    return _POOL


def decode_jpeg_batch(datas, dsts, denoms, heights, widths, fancy=True, num_threads: int = 0):
    """Decode a whole batch of JPEGs into canvas views with ONE native call
    (per-sample fan-out on the tasking pool). Returns a list of bools."""
    lib = _load()
    if lib is None:
        return None
    n = len(datas)
    pool = shared_pool(num_threads)
    c_datas = (ctypes.c_char_p * n)(*datas)
    c_lens = (ctypes.c_size_t * n)(*[len(d) for d in datas])
    c_denoms = (ctypes.c_int * n)(*denoms)
    c_dsts = (ctypes.c_void_p * n)(*[d.ctypes.data for d in dsts])
    c_strides = (ctypes.c_long * n)(*[d.strides[0] for d in dsts])
    c_hs = (ctypes.c_int * n)(*heights)
    c_ws = (ctypes.c_int * n)(*widths)
    oks = (ctypes.c_int * n)()
    lib.dali_tpu_decode_jpeg_batch(
        pool._h, c_datas, c_lens, c_denoms, c_dsts, c_strides, c_hs, c_ws,
        1 if fancy else 0, n, oks,
    )
    return [bool(v) for v in oks]


def jpeg_coeffs_split_batch(datas, ky, kc, BH, BW, CBH, CBW, num_threads: int = 0):
    """Read every JPEG's coefficient planes straight into padded batch
    canvases (one native call; src/jpeg_coeffs_split.cc batch entry). Returns
    (y_dc [N,BH,BW] i16, y_ac [N,BH,BW,ky²-1] i8, c_dc [N,2,CBH,CBW] i16,
    c_ac [N,2,CBH,CBW,kc²-1] i8, q [N,ky²+kc²] i32, oks) or None."""
    lib = _load()
    if lib is None:
        return None
    n = len(datas)
    arrs = [np.ascontiguousarray(np.frombuffer(d, np.uint8)) if isinstance(d, (bytes, bytearray))
            else np.ascontiguousarray(d).view(np.uint8).reshape(-1) for d in datas]
    y_dc = np.empty((n, BH, BW), np.int16)
    y_ac = np.empty((n, BH, BW, ky * ky - 1), np.int8)
    c_dc = np.empty((n, 2, CBH, CBW), np.int16)
    c_ac = np.empty((n, 2, CBH, CBW, kc * kc - 1), np.int8)
    q = np.empty((n, ky * ky + kc * kc), np.uint16)
    oks = (ctypes.c_int * n)()
    pool = shared_pool(num_threads)
    lib.dali_tpu_jpeg_coeffs_split_batch(
        pool._h,
        ctypes.cast((ctypes.c_void_p * n)(*[a.ctypes.data for a in arrs]),
                    ctypes.POINTER(ctypes.c_char_p)),
        (ctypes.c_size_t * n)(*[a.nbytes for a in arrs]),
        n, ky, kc, BH, BW, CBH, CBW,
        y_dc.ctypes.data_as(ctypes.c_void_p), y_ac.ctypes.data_as(ctypes.c_void_p),
        c_dc.ctypes.data_as(ctypes.c_void_p), c_ac.ctypes.data_as(ctypes.c_void_p),
        q.ctypes.data_as(ctypes.c_void_p), oks,
    )
    return y_dc, y_ac, c_dc, c_ac, q.astype(np.int32), [bool(v) for v in oks]


def jpeg_coeffs_split_flat_batch(datas, ky, kc, blocks, flat_lens, num_threads: int = 0,
                                 ring=None):
    """Flat-packed coefficient read: every sample's planes written densely at
    computed offsets of four flat buffers (no padding bytes). ``blocks`` is
    [N,4] int32 (ybh, ybw, cbh, cbw); ``flat_lens`` the grow-policy element
    counts for (y_dc, y_ac, c_dc, c_ac). Returns (y_dc, y_ac, c_dc, c_ac, q,
    offsets dict, oks)."""
    lib = _load()
    if lib is None:
        return None
    n = len(datas)
    arrs = [np.ascontiguousarray(np.frombuffer(d, np.uint8)) if isinstance(d, (bytes, bytearray))
            else np.ascontiguousarray(d).view(np.uint8).reshape(-1) for d in datas]
    ybh, ybw, cbh, cbw = (blocks[:, j].astype(np.int32) for j in range(4))
    y_n = (ybh.astype(np.int64) * ybw)
    c_n = (cbh.astype(np.int64) * cbw)
    offs = {
        "y_dc": np.concatenate([[0], np.cumsum(y_n)[:-1]]),
        "y_ac": np.concatenate([[0], np.cumsum(y_n * (ky * ky - 1))[:-1]]),
        "c_dc": np.concatenate([[0], np.cumsum(2 * c_n)[:-1]]),
        "c_ac": np.concatenate([[0], np.cumsum(2 * c_n * (kc * kc - 1))[:-1]]),
    }
    # no pre-zero (the decoder writes every in-window cell; gaps are never
    # gathered on device); with a caller-owned ring, buffers reuse warm pages
    if ring is not None:
        y_dc = ring.take("y_dc", flat_lens[0], np.int16)
        y_ac = ring.take("y_ac", flat_lens[1], np.int8)
        c_dc = ring.take("c_dc", flat_lens[2], np.int16)
        c_ac = ring.take("c_ac", flat_lens[3], np.int8)
    else:
        y_dc = np.empty((flat_lens[0],), np.int16)
        y_ac = np.empty((flat_lens[1],), np.int8)
        c_dc = np.empty((flat_lens[2],), np.int16)
        c_ac = np.empty((flat_lens[3],), np.int8)
    q = np.empty((n, ky * ky + kc * kc), np.uint16)
    oks = (ctypes.c_int * n)()

    pool = shared_pool(num_threads)
    # keep the int32/int64 views alive through the call
    holds = [np.ascontiguousarray(x, np.int32) for x in (ybh, ybw, cbh, cbw)]
    holds2 = [np.ascontiguousarray(offs[k], np.int64) for k in ("y_dc", "y_ac", "c_dc", "c_ac")]
    lib.dali_tpu_jpeg_coeffs_split_flat_batch(
        pool._h,
        ctypes.cast((ctypes.c_void_p * n)(*[a.ctypes.data for a in arrs]),
                    ctypes.POINTER(ctypes.c_char_p)),
        (ctypes.c_size_t * n)(*[a.nbytes for a in arrs]),
        n, ky, kc,
        holds[0].ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        holds[1].ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        holds[2].ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        holds[3].ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        holds2[0].ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        holds2[1].ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        holds2[2].ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        holds2[3].ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        y_dc.ctypes.data_as(ctypes.c_void_p), y_ac.ctypes.data_as(ctypes.c_void_p),
        c_dc.ctypes.data_as(ctypes.c_void_p), c_ac.ctypes.data_as(ctypes.c_void_p),
        q.ctypes.data_as(ctypes.c_void_p), oks,
    )
    return y_dc, y_ac, c_dc, c_ac, q.astype(np.int32), offs, [bool(v) for v in oks]


def has_sparse_pack() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "dali_tpu_sparse_pack_i8")


def sparse_pack_i8(dense: np.ndarray, n_blocks: int, nac: int,
                   mask_out: np.ndarray, vals_out: np.ndarray) -> int:
    """Pack a dense flat AC plane ([n_blocks * nac] int8) into the sparse
    wire form: per-block nonzero bitmap (uint16) + packed nonzero values.
    ``vals_out`` must hold n_blocks*nac + 16 bytes (worst case + SIMD slack).
    Returns the number of packed values. See native/src/sparse_pack.cc."""
    lib = _load()
    fn = lib.dali_tpu_sparse_pack_i8
    if fn.restype is not ctypes.c_longlong:
        fn.restype = ctypes.c_longlong
    assert dense.dtype == np.int8 and mask_out.dtype == np.uint16
    assert vals_out.dtype == np.int8
    if not (mask_out.shape[0] >= n_blocks and vals_out.shape[0] >= n_blocks * nac + 16):
        raise ValueError(
            "sparse_pack_i8 output buffers undersized (native would write out of bounds)")
    nnz = fn(
        dense.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_longlong(int(n_blocks)), int(nac),
        mask_out.ctypes.data_as(ctypes.c_void_p),
        vals_out.ctypes.data_as(ctypes.c_void_p),
    )
    if nnz < 0:
        raise ValueError(f"sparse_pack_i8: unsupported nac={nac}")
    return int(nnz)


def nib_pack_i8(vals: np.ndarray, n: int, nibbles_out: np.ndarray,
                escapes_out: np.ndarray) -> int:
    """Nibble-pack a packed int8 value stream: 4-bit codes in [-7,7], code
    -8 escapes to a full int8 in ``escapes_out``. Returns the escape count.
    See native/src/sparse_pack.cc."""
    lib = _load()
    fn = lib.dali_tpu_nib_pack_i8
    if fn.restype is not ctypes.c_longlong:
        fn.restype = ctypes.c_longlong
    assert vals.dtype == np.int8 and nibbles_out.dtype == np.uint8
    assert escapes_out.dtype == np.int8
    if not (nibbles_out.shape[0] >= (n + 1) // 2 and escapes_out.shape[0] >= n + 16):
        raise ValueError(
            "nib_pack_i8 output buffers undersized (native needs SIMD store slack)")
    return int(fn(
        vals.ctypes.data_as(ctypes.c_void_p), ctypes.c_longlong(int(n)),
        nibbles_out.ctypes.data_as(ctypes.c_void_p),
        escapes_out.ctypes.data_as(ctypes.c_void_p),
    ))


def esc_pack_i16(vals: np.ndarray, n: int, out8: np.ndarray,
                 escapes_out: np.ndarray) -> int:
    """Escape-pack an int16 stream to int8 (-128 marks an escape carried in
    ``escapes_out``). Returns the escape count. See sparse_pack.cc."""
    lib = _load()
    fn = lib.dali_tpu_esc_pack_i16
    if fn.restype is not ctypes.c_longlong:
        fn.restype = ctypes.c_longlong
    assert vals.dtype == np.int16 and out8.dtype == np.int8
    assert escapes_out.dtype == np.int16
    if not (out8.shape[0] >= n and escapes_out.shape[0] >= n):
        raise ValueError(
            "esc_pack_i16 output buffers undersized")
    return int(fn(
        vals.ctypes.data_as(ctypes.c_void_p), ctypes.c_longlong(int(n)),
        out8.ctypes.data_as(ctypes.c_void_p),
        escapes_out.ctypes.data_as(ctypes.c_void_p),
    ))


def pack_wire(y_ac, ny_blocks, nac_y, c_ac, nc_blocks, nac_c,
              y_dc, c_dc, y_dc_len, c_dc_len,
              y_mask, y_nibs, y_vals, c_mask, c_nibs, c_vals,
              y_dc8, y_esc16, c_dc8, c_esc16, num_threads: int = 0):
    """ONE-call wire pack for the hybrid decoder (sparse_pack.cc
    dali_tpu_pack_wire): both AC planes -> mask + nibble stream and both DC
    planes -> int8 + escapes in a single native entry (the six per-primitive
    ctypes round-trips this replaces dominate the cost on 1-core hosts).
    The AC value escapes are written IN-PLACE into the front of
    ``{y,c}_vals`` after nibble-packing consumes them. Returns
    (y_nnz, y_val_esc, c_nnz, c_val_esc, y_dc_esc, c_dc_esc)."""
    lib = _load()
    fn = lib.dali_tpu_pack_wire
    if fn.argtypes is None:
        ll, vp, ci = ctypes.c_longlong, ctypes.c_void_p, ctypes.c_int
        fn.restype = None
        fn.argtypes = [vp, vp, ll, ci, vp, ll, ci, vp, vp, ll, ll,
                       vp, vp, vp, vp, vp, vp, vp, vp, vp, vp,
                       ctypes.POINTER(ctypes.c_longlong)]
    assert y_ac.dtype == np.int8 and c_ac.dtype == np.int8
    assert y_dc.dtype == np.int16 and c_dc.dtype == np.int16
    assert y_mask.dtype == np.uint16 and c_mask.dtype == np.uint16
    assert y_nibs.dtype == np.uint8 and c_nibs.dtype == np.uint8
    assert y_vals.dtype == np.int8 and c_vals.dtype == np.int8
    assert y_dc8.dtype == np.int8 and c_dc8.dtype == np.int8
    assert y_esc16.dtype == np.int16 and c_esc16.dtype == np.int16
    if not (y_vals.shape[0] >= ny_blocks * nac_y + 16 and c_vals.shape[0] >= nc_blocks * nac_c + 16 and y_nibs.shape[0] >= (ny_blocks * nac_y + 1) // 2 and c_nibs.shape[0] >= (nc_blocks * nac_c + 1) // 2 and y_mask.shape[0] >= ny_blocks and c_mask.shape[0] >= nc_blocks and y_dc8.shape[0] >= y_dc_len and c_dc8.shape[0] >= c_dc_len and y_dc.shape[0] >= ny_blocks and c_dc.shape[0] >= nc_blocks and y_esc16.shape[0] >= ny_blocks and c_esc16.shape[0] >= nc_blocks):
        raise ValueError(
            "pack_wire output buffers undersized (native would write out of bounds)")
    counts = (ctypes.c_longlong * 6)()
    pool = shared_pool(num_threads)
    fn(
        pool._h,
        y_ac.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_longlong(int(ny_blocks)), int(nac_y),
        c_ac.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_longlong(int(nc_blocks)), int(nac_c),
        y_dc.ctypes.data_as(ctypes.c_void_p),
        c_dc.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_longlong(int(y_dc_len)), ctypes.c_longlong(int(c_dc_len)),
        y_mask.ctypes.data_as(ctypes.c_void_p),
        y_nibs.ctypes.data_as(ctypes.c_void_p),
        y_vals.ctypes.data_as(ctypes.c_void_p),
        c_mask.ctypes.data_as(ctypes.c_void_p),
        c_nibs.ctypes.data_as(ctypes.c_void_p),
        c_vals.ctypes.data_as(ctypes.c_void_p),
        y_dc8.ctypes.data_as(ctypes.c_void_p),
        y_esc16.ctypes.data_as(ctypes.c_void_p),
        c_dc8.ctypes.data_as(ctypes.c_void_p),
        c_esc16.ctypes.data_as(ctypes.c_void_p),
        counts,
    )
    return tuple(int(c) for c in counts)


def has_host_imgproc() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "dali_tpu_median_blur_u8")


def median_blur_u8(img: np.ndarray, k: int) -> np.ndarray:
    """Own-code median filter (host_ops.cc, Huang sliding histogram,
    replicate border — cv2.medianBlur semantics for uint8)."""
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    out = np.empty_like(img)
    rc = lib.dali_tpu_median_blur_u8(
        img.ctypes.data_as(ctypes.c_void_p), h, w, c, int(k),
        out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise ValueError(f"median_blur_u8: bad window {k}")
    return out


def morph_u8(img: np.ndarray, mh: int, mw: int, anchor_y: int, anchor_x: int,
             iterations: int, dilate: bool, replicate: bool) -> np.ndarray:
    """Own-code erode/dilate (host_ops.cc, separable min/max over the
    full-ones structuring element; reference morphology.cc)."""
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    out = np.empty_like(img)
    rc = lib.dali_tpu_morph_u8(
        img.ctypes.data_as(ctypes.c_void_p), h, w, c, int(mh), int(mw),
        int(anchor_y), int(anchor_x), int(iterations), 1 if dilate else 0,
        1 if replicate else 0, out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise ValueError("morph_u8: bad parameters")
    return out


def clahe_f32(plane: np.ndarray, clip: float, tiles_x: int, tiles_y: int,
              bins: int) -> np.ndarray:
    """Own-code CLAHE on one float plane in [0,255] (host_ops.cc); math
    mirrors the gpu lowering (ClaheGPU) operation-for-operation."""
    lib = _load()
    fn = lib.dali_tpu_clahe_f32
    if fn.argtypes is None:
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                       ctypes.c_float, ctypes.c_int, ctypes.c_int,
                       ctypes.c_int, ctypes.c_void_p]
    plane = np.ascontiguousarray(plane, np.float32)
    h, w = plane.shape
    out = np.empty_like(plane)
    rc = fn(plane.ctypes.data_as(ctypes.c_void_p), h, w,
            ctypes.c_float(float(clip)), int(tiles_x), int(tiles_y),
            int(bins), out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise ValueError("clahe_f32: bins must be a power of 2")
    return out


_BORDER_CODES = {"reflect_101": 0, "reflect": 1, "replicate": 2, "wrap": 3,
                 "constant": 4}


def sep_conv_f32(img: np.ndarray, ky: np.ndarray, kx: np.ndarray,
                 border: str = "reflect_101", fill: float = 0.0,
                 anchor_y: int = -1, anchor_x: int = -1) -> np.ndarray:
    """Own-code separable 2-D correlation (host_ops.cc): vertical window
    ``ky`` then horizontal ``kx`` on an HWC float32 image. Reference:
    dali/kernels/imgproc/convolution/convolution_cpu.h."""
    lib = _load()
    fn = lib.dali_tpu_sep_conv_f32
    if fn.argtypes is None:
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                       ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
                       ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                       ctypes.c_int, ctypes.c_int, ctypes.c_float,
                       ctypes.c_void_p]
    img = np.ascontiguousarray(img, np.float32)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    h, w, c = img.shape
    ky = np.ascontiguousarray(ky, np.float32).reshape(-1)
    kx = np.ascontiguousarray(kx, np.float32).reshape(-1)
    out = np.empty_like(img)
    rc = fn(img.ctypes.data_as(ctypes.c_void_p), h, w, c,
            ky.ctypes.data_as(ctypes.c_void_p), len(ky),
            kx.ctypes.data_as(ctypes.c_void_p), len(kx),
            int(anchor_y), int(anchor_x), _BORDER_CODES[border],
            ctypes.c_float(float(fill)), out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise ValueError("sep_conv_f32: bad window/anchor")
    return out[:, :, 0] if squeeze else out


def filter2d_f32(img: np.ndarray, kernel: np.ndarray,
                 border: str = "reflect_101", fill: float = 0.0,
                 anchor_y: int = -1, anchor_x: int = -1) -> np.ndarray:
    """Own-code general 2-D correlation (host_ops.cc; cv2.filter2D
    semantics). Reference: dali/kernels/imgproc/convolution/
    baseline_convolution.h."""
    lib = _load()
    fn = lib.dali_tpu_filter2d_f32
    if fn.argtypes is None:
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                       ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
                       ctypes.c_int, ctypes.c_int, ctypes.c_int,
                       ctypes.c_int, ctypes.c_float, ctypes.c_void_p]
    img = np.ascontiguousarray(img, np.float32)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    h, w, c = img.shape
    kernel = np.ascontiguousarray(kernel, np.float32)
    if kernel.ndim != 2:
        raise ValueError("filter2d_f32: kernel must be 2-D")
    kh, kw = kernel.shape
    out = np.empty_like(img)
    rc = fn(img.ctypes.data_as(ctypes.c_void_p), h, w, c,
            kernel.ctypes.data_as(ctypes.c_void_p), kh, kw,
            int(anchor_y), int(anchor_x), _BORDER_CODES[border],
            ctypes.c_float(float(fill)), out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise ValueError("filter2d_f32: bad kernel/anchor")
    return out[:, :, 0] if squeeze else out


def resize_area_u8(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Own-code area resize (host_ops.cc exact fractional box integration —
    cv2 INTER_AREA semantics)."""
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    out_shape = (oh, ow, c) if img.ndim == 3 else (oh, ow)
    out = np.empty(out_shape, np.uint8)
    rc = lib.dali_tpu_resize_area_u8(
        img.ctypes.data_as(ctypes.c_void_p), h, w, c, int(oh), int(ow),
        out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise ValueError("resize_area_u8: bad output size")
    return out


def debayer_bilinear(raw: np.ndarray, by: int, bx: int) -> np.ndarray:
    """Own-code bilinear Bayer→RGB demosaic (host_ops.cc): per color, a
    mask-normalized 3x3 tent interpolation — the cpu twin of the device
    lowering (backend/straggler_gpu.py DebayerGPU), bit-identical by
    construction (all accumulators are exact ints < 2^24 in f32; round half
    to even). Reference: dali/kernels/imgproc/color_manipulation/debayer/."""
    lib = _load()
    h, w = raw.shape[:2]
    if raw.dtype == np.uint8:
        fn = lib.dali_tpu_debayer_bilinear_u8
    elif raw.dtype == np.uint16:
        fn = lib.dali_tpu_debayer_bilinear_u16
    else:
        raise TypeError(f"debayer_bilinear: unsupported dtype {raw.dtype}")
    raw = np.ascontiguousarray(raw)
    out = np.empty((h, w, 3), raw.dtype)
    rc = fn(raw.ctypes.data_as(ctypes.c_void_p), h, w, int(by), int(bx),
            out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise ValueError("debayer_bilinear: bad geometry/blue_position")
    return out


def has_debayer() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "dali_tpu_debayer_bilinear_u8")


def has_pack_batch() -> bool:
    lib = _load()
    return lib is not None and hasattr(
        lib, "dali_tpu_jpeg_coeffs_split_flat_crop_pack_batch")


def decode_idx_blob_bytes(mcus_x: int, mcus_y: int) -> int:
    """Byte size of a per-file ROI decode-index blob (jpeg_huff.cc IdxHeader
    16 B + (mcus_x*mcus_y + 1) IdxEntry of 24 B). Allocate zeroed (uint8);
    the decoder validates/initializes the header itself."""
    return 16 + (int(mcus_x) * int(mcus_y) + 1) * 24


def jpeg_coeffs_split_flat_crop_pack_batch(datas, ky, kc, blocks, brc0,
                                           flat_lens, num_threads: int = 0,
                                           ring=None, c_brc0=None,
                                           idx_blobs=None):
    """ONE native call from file bytes to the sparse wire (VERDICT r3 #1):
    per-sample Huffman decode emits zigzag-convention masks + contiguous
    value streams directly (no dense AC planes anywhere); DC planes stay
    dense int16. Returns (y_dc, y_mask, y_vals, y_total, c_dc, c_mask,
    c_vals, c_total, q, offs, oks); masks live at the dc offsets, the value
    streams are contiguous from 0 after the driver's compaction pass.

    idx_blobs: optional per-sample uint8 arrays (None entries allowed) —
    ROI decode-index side blobs (see decode_idx_blob_bytes); the decoder
    fills them on first decode of a file and SEEKS on later decodes so only
    the crop window's MCUs are entropy-decoded (r4 headline optimization)."""
    lib = _load()
    if lib is None or not hasattr(
            lib, "dali_tpu_jpeg_coeffs_split_flat_crop_pack_batch"):
        return None
    fn = lib.dali_tpu_jpeg_coeffs_split_flat_crop_pack_batch
    if fn.argtypes is None:
        vp, ip = ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)
        lp = ctypes.POINTER(ctypes.c_long)
        llp = ctypes.POINTER(ctypes.c_longlong)
        fn.restype = ctypes.c_int
        fn.argtypes = [vp, ctypes.POINTER(ctypes.c_char_p),
                       ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
                       ctypes.c_int, ctypes.c_int,
                       ip, ip, ip, ip, ip, ip, ip, ip,
                       lp, lp, lp, lp,
                       vp, vp, vp, vp, vp, vp, vp, ip, llp, llp,
                       ctypes.POINTER(ctypes.c_void_p), llp]
    n = len(datas)
    arrs = [np.ascontiguousarray(np.frombuffer(d, np.uint8)) if isinstance(d, (bytes, bytearray))
            else np.ascontiguousarray(d).view(np.uint8).reshape(-1) for d in datas]
    ybh, ybw, cbh, cbw = (np.ascontiguousarray(blocks[:, j], np.int32) for j in range(4))
    br0 = np.ascontiguousarray(brc0[:, 0], np.int32)
    bc0 = np.ascontiguousarray(brc0[:, 1], np.int32)
    if c_brc0 is None:
        c_brc0 = np.stack([brc0[:, 0] // 2, brc0[:, 1] // 2], 1)  # 4:2:0
    cbr0 = np.ascontiguousarray(c_brc0[:, 0], np.int32)
    cbc0 = np.ascontiguousarray(c_brc0[:, 1], np.int32)
    y_n = ybh.astype(np.int64) * ybw
    c_n = cbh.astype(np.int64) * cbw
    offs = {
        "y_dc": np.concatenate([[0], np.cumsum(y_n)[:-1]]),
        "y_ac": np.concatenate([[0], np.cumsum(y_n * (ky * ky - 1))[:-1]]),
        "c_dc": np.concatenate([[0], np.cumsum(2 * c_n)[:-1]]),
        "c_ac": np.concatenate([[0], np.cumsum(2 * c_n * (kc * kc - 1))[:-1]]),
    }
    if ring is not None:
        y_dc = ring.take("y_dc", flat_lens[0], np.int16)
        y_mask = ring.take("y_ac_mask", flat_lens[0], np.uint16)
        y_vals = ring.take("y_ac_vals", flat_lens[1] + 16, np.int8)
        c_dc = ring.take("c_dc", flat_lens[2], np.int16)
        c_mask = ring.take("c_ac_mask", flat_lens[2], np.uint16)
        c_vals = ring.take("c_ac_vals", flat_lens[3] + 16, np.int8)
    else:
        y_dc = np.empty((flat_lens[0],), np.int16)
        y_mask = np.empty((flat_lens[0],), np.uint16)
        y_vals = np.empty((flat_lens[1] + 16,), np.int8)
        c_dc = np.empty((flat_lens[2],), np.int16)
        c_mask = np.empty((flat_lens[2],), np.uint16)
        c_vals = np.empty((flat_lens[3] + 16,), np.int8)
    q = np.empty((n, ky * ky + kc * kc), np.uint16)
    oks = (ctypes.c_int * n)()
    y_total = ctypes.c_longlong(0)
    c_total = ctypes.c_longlong(0)
    if idx_blobs is not None:
        idx_ptrs = (ctypes.c_void_p * n)(
            *[b.ctypes.data if b is not None else None for b in idx_blobs])
        idx_caps = (ctypes.c_longlong * n)(
            *[b.nbytes if b is not None else 0 for b in idx_blobs])
    else:
        idx_ptrs = ctypes.cast(None, ctypes.POINTER(ctypes.c_void_p))
        idx_caps = ctypes.cast(None, ctypes.POINTER(ctypes.c_longlong))
    holds = [np.ascontiguousarray(offs[k], np.int64)
             for k in ("y_dc", "y_ac", "c_dc", "c_ac")]
    fn(
        shared_pool(num_threads)._h,
        ctypes.cast((ctypes.c_void_p * n)(*[a.ctypes.data for a in arrs]),
                    ctypes.POINTER(ctypes.c_char_p)),
        (ctypes.c_size_t * n)(*[a.nbytes for a in arrs]), n, ky, kc,
        ybh.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ybw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        cbh.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        cbw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        br0.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        bc0.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        cbr0.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        cbc0.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        holds[0].ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        holds[1].ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        holds[2].ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        holds[3].ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        y_dc.ctypes.data_as(ctypes.c_void_p),
        y_mask.ctypes.data_as(ctypes.c_void_p),
        y_vals.ctypes.data_as(ctypes.c_void_p),
        c_dc.ctypes.data_as(ctypes.c_void_p),
        c_mask.ctypes.data_as(ctypes.c_void_p),
        c_vals.ctypes.data_as(ctypes.c_void_p),
        q.ctypes.data_as(ctypes.c_void_p), oks,
        ctypes.byref(y_total), ctypes.byref(c_total),
        idx_ptrs, idx_caps,
    )
    return (y_dc, y_mask, y_vals, int(y_total.value), c_dc, c_mask, c_vals,
            int(c_total.value), q.astype(np.int32), offs,
            [bool(v) for v in oks])


def pack_wire2(y_vals, y_nnz, c_vals, c_nnz, y_dc, c_dc, ny_blocks,
               nc_blocks, y_dc_len, c_dc_len, y_nibs, c_nibs,
               y_dc8, y_esc16, c_dc8, c_esc16, num_threads: int = 0):
    """Wire pack for PRE-COMPACTED value streams (pack-emit decoder output):
    nibble-pack both AC streams (escapes in-place into the vals front) +
    escape-pack both DC planes. Returns (y_val_esc, c_val_esc, y_dc_esc,
    c_dc_esc)."""
    lib = _load()
    fn = lib.dali_tpu_pack_wire2
    if fn.argtypes is None:
        ll, vp = ctypes.c_longlong, ctypes.c_void_p
        fn.restype = None
        fn.argtypes = [vp, vp, ll, vp, ll, vp, vp, ll, ll, ll, ll,
                       vp, vp, vp, vp, vp, vp,
                       ctypes.POINTER(ctypes.c_longlong)]
    assert y_vals.dtype == np.int8 and c_vals.dtype == np.int8
    assert y_dc.dtype == np.int16 and c_dc.dtype == np.int16
    if not (y_nibs.shape[0] >= (y_nnz + 1) // 2 and c_nibs.shape[0] >= (c_nnz + 1) // 2):
        raise ValueError(
            "nibble buffers undersized")
    assert y_dc8.shape[0] >= y_dc_len and c_dc8.shape[0] >= c_dc_len
    assert y_esc16.shape[0] >= ny_blocks and c_esc16.shape[0] >= nc_blocks
    counts = (ctypes.c_longlong * 4)()
    fn(
        shared_pool(num_threads)._h,
        y_vals.ctypes.data_as(ctypes.c_void_p), ctypes.c_longlong(int(y_nnz)),
        c_vals.ctypes.data_as(ctypes.c_void_p), ctypes.c_longlong(int(c_nnz)),
        y_dc.ctypes.data_as(ctypes.c_void_p),
        c_dc.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_longlong(int(ny_blocks)), ctypes.c_longlong(int(nc_blocks)),
        ctypes.c_longlong(int(y_dc_len)), ctypes.c_longlong(int(c_dc_len)),
        y_nibs.ctypes.data_as(ctypes.c_void_p),
        c_nibs.ctypes.data_as(ctypes.c_void_p),
        y_dc8.ctypes.data_as(ctypes.c_void_p),
        y_esc16.ctypes.data_as(ctypes.c_void_p),
        c_dc8.ctypes.data_as(ctypes.c_void_p),
        c_esc16.ctypes.data_as(ctypes.c_void_p),
        counts,
    )
    return tuple(int(c) for c in counts)


def jpeg_coef_info_batch(datas, num_threads: int = 0):
    """Header scan for a whole batch: [n, 7] int32 (h, w, y_bh, y_bw, c_bh,
    c_bw, mode); mode -1 = unsupported stream."""
    lib = _load()
    if lib is None:
        return None
    n = len(datas)
    arrs = [np.ascontiguousarray(np.frombuffer(d, np.uint8)) if isinstance(d, (bytes, bytearray))
            else np.ascontiguousarray(d).view(np.uint8).reshape(-1) for d in datas]
    out = np.zeros((n, 7), np.int32)
    lib.dali_tpu_jpeg_coef_info_batch(
        shared_pool(num_threads)._h,
        ctypes.cast((ctypes.c_void_p * n)(*[a.ctypes.data for a in arrs]),
                    ctypes.POINTER(ctypes.c_char_p)),
        (ctypes.c_size_t * n)(*[a.nbytes for a in arrs]), n,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def jpeg_coeffs_split_flat_crop_batch(datas, ky, kc, blocks, brc0, flat_lens,
                                      num_threads: int = 0, ring=None,
                                      c_brc0=None):
    """Flat-packed CROPPED coefficient read (DCT-domain random crop): only the
    block window [brc0, brc0+blocks) of each sample is read and packed.
    ``blocks`` [N,4] = cropped (ybh, ybw, cbh, cbw); ``brc0`` [N,2] = luma
    block offsets (must be even — 16px alignment keeps chroma exact)."""
    lib = _load()
    if lib is None:
        return None
    n = len(datas)
    arrs = [np.ascontiguousarray(np.frombuffer(d, np.uint8)) if isinstance(d, (bytes, bytearray))
            else np.ascontiguousarray(d).view(np.uint8).reshape(-1) for d in datas]
    ybh, ybw, cbh, cbw = (np.ascontiguousarray(blocks[:, j], np.int32) for j in range(4))
    br0 = np.ascontiguousarray(brc0[:, 0], np.int32)
    bc0 = np.ascontiguousarray(brc0[:, 1], np.int32)
    if c_brc0 is None:
        c_brc0 = np.stack([brc0[:, 0] // 2, brc0[:, 1] // 2], 1)  # 4:2:0
    cbr0 = np.ascontiguousarray(c_brc0[:, 0], np.int32)
    cbc0 = np.ascontiguousarray(c_brc0[:, 1], np.int32)
    y_n = ybh.astype(np.int64) * ybw
    c_n = cbh.astype(np.int64) * cbw
    offs = {
        "y_dc": np.concatenate([[0], np.cumsum(y_n)[:-1]]),
        "y_ac": np.concatenate([[0], np.cumsum(y_n * (ky * ky - 1))[:-1]]),
        "c_dc": np.concatenate([[0], np.cumsum(2 * c_n)[:-1]]),
        "c_ac": np.concatenate([[0], np.cumsum(2 * c_n * (kc * kc - 1))[:-1]]),
    }
    # no pre-zero (the decoder writes every in-window cell; gaps are never
    # gathered on device); with a caller-owned ring, buffers reuse warm pages
    if ring is not None:
        y_dc = ring.take("y_dc", flat_lens[0], np.int16)
        y_ac = ring.take("y_ac", flat_lens[1], np.int8)
        c_dc = ring.take("c_dc", flat_lens[2], np.int16)
        c_ac = ring.take("c_ac", flat_lens[3], np.int8)
    else:
        y_dc = np.empty((flat_lens[0],), np.int16)
        y_ac = np.empty((flat_lens[1],), np.int8)
        c_dc = np.empty((flat_lens[2],), np.int16)
        c_ac = np.empty((flat_lens[3],), np.int8)
    q = np.empty((n, ky * ky + kc * kc), np.uint16)
    oks = (ctypes.c_int * n)()
    holds = [np.ascontiguousarray(offs[k], np.int64) for k in ("y_dc", "y_ac", "c_dc", "c_ac")]
    lib.dali_tpu_jpeg_coeffs_split_flat_crop_batch(
        shared_pool(num_threads)._h,
        ctypes.cast((ctypes.c_void_p * n)(*[a.ctypes.data for a in arrs]),
                    ctypes.POINTER(ctypes.c_char_p)),
        (ctypes.c_size_t * n)(*[a.nbytes for a in arrs]), n, ky, kc,
        ybh.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ybw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        cbh.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        cbw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        br0.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        bc0.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        cbr0.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        cbc0.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        holds[0].ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        holds[1].ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        holds[2].ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        holds[3].ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        y_dc.ctypes.data_as(ctypes.c_void_p), y_ac.ctypes.data_as(ctypes.c_void_p),
        c_dc.ctypes.data_as(ctypes.c_void_p), c_ac.ctypes.data_as(ctypes.c_void_p),
        q.ctypes.data_as(ctypes.c_void_p), oks,
    )
    return y_dc, y_ac, c_dc, c_ac, q.astype(np.int32), offs, [bool(v) for v in oks]

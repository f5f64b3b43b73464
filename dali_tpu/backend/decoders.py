"""Image decoders.

Reference: ``dali/operators/imgcodec/`` (``image_decoder.h:36-40`` delegating to
nvImageCodec: libjpeg-turbo / libtiff / opencv / nvjpeg). TPU-native plan
(SURVEY §2.4 "Image decode"): host-side entropy decode (C++/libjpeg) with the
device='mixed' path eventually splitting Huffman (host) from IDCT + chroma
upsampling (Pallas, device). This module is the operator layer; the actual byte
decoding lives in :mod:`dali_tpu.imgcodec` which prefers the native C++ decoder and
falls back to OpenCV.
"""

from __future__ import annotations

import time

import numpy as np

from .._schema import DALI_SCHEMA, ArgType, register_operator
from .. import imgcodec
from ..batch import DeviceBatch, HostBatch
from ..types import DALIImageType
from .base import HostCtx, Operator


def _decoder_schema(name, extra_doc=""):
    return (
        DALI_SCHEMA(name)
        .NumInput(1)
        .NumOutput(1)
        .Devices("cpu", "mixed")
        .AddOptionalArg("output_type", ArgType.IMAGE_TYPE, "Output color space.", DALIImageType.RGB)
        .AddOptionalArg("dtype", ArgType.DATA_TYPE, "Output dtype (uint8).", None)
        .AddOptionalArg("hybrid_huffman_threshold", ArgType.INT, "Compatibility no-op.", 1000000)
        .AddOptionalArg("device_memory_padding", ArgType.INT, "Compatibility no-op.", 0)
        .AddOptionalArg("host_memory_padding", ArgType.INT, "Compatibility no-op.", 0)
        .AddOptionalArg("hw_decoder_load", ArgType.FLOAT, "Compatibility no-op.", 0.9)
        .AddOptionalArg("preallocate_width_hint", ArgType.INT, "Canvas width hint.", 0)
        .AddOptionalArg("preallocate_height_hint", ArgType.INT, "Canvas height hint.", 0)
        .AddOptionalArg("use_fast_idct", ArgType.BOOL, "Use fast IDCT path.", False)
        .AddOptionalArg("memory_stats", ArgType.BOOL, "Compatibility no-op.", False)
        .AddOptionalArg("adjust_orientation", ArgType.BOOL, "Apply EXIF orientation.", True)
        .AddOptionalArg("jpeg_fancy_upsampling", ArgType.BOOL,
                        "Triangular chroma upsampling for subsampled JPEGs "
                        "(libjpeg fancy path; reference decoder_schema.cc "
                        "`jpeg_fancy_upsampling`). False = box replication.", True)
        .AddOptionalArg("device_memory_padding_jpeg2k", ArgType.INT,
                        "Compatibility no-op (nvJPEG2k buffer hint).", 0)
        .AddOptionalArg("host_memory_padding_jpeg2k", ArgType.INT,
                        "Compatibility no-op (nvJPEG2k buffer hint).", 0)
        .AddOptionalArg("cache_size", ArgType.INT,
                        "Decoded-image cache size in MB (0 = off; reference "
                        "decoder/cache/cached_decoder_impl.cc). Keyed by the "
                        "reader's source_info.", 0)
        .AddOptionalArg("cache_type", ArgType.STRING, "'threshold' or 'largest'.", "threshold")
        .AddOptionalArg("cache_threshold", ArgType.INT, "Only cache images <= this many bytes.", 0)
        .AddOptionalArg("cache_debug", ArgType.BOOL, "Log cache hits/misses.", False)
        .AddOptionalArg("cache_batch_copy", ArgType.BOOL, "Compatibility no-op.", True)
        .AddOptionalArg(
            "downscale_shorter_hint",
            ArgType.INT,
            "dali_tpu extension: decode JPEGs at the largest DCT scale (1/2, 1/4, "
            "1/8) that keeps the shorter edge >= this hint. Shrinks host decode "
            "time and host->device transfer when the pipeline resizes downward "
            "anyway (e.g. hint 256 for a 224 training crop). 0 = full resolution.",
            0,
        )
    )


_decoder_schema("decoders.Image").DocStr(
    """Decodes images (JPEG/PNG/BMP/TIFF/WEBP) to HWC uint8 (reference
    ``decoders__Image``; ``imgcodec/decoder_schema.cc``). device='mixed' marks the
    output as device-resident: the executor pads it across the host→device boundary
    (the TPU analogue of DALI's CPU-parse + GPU-decode split)."""
)


def _content_key(k, d):
    """source_info PLUS a cheap content fingerprint (length and first/last
    8 bytes) so re-used source_info keys or files whose bytes change across
    epochs cannot serve stale cached geometry or decode indexes."""
    if not k:
        return None
    n = len(d)
    head = d[:8].tobytes() if hasattr(d, "tobytes") else bytes(d[:8])
    tail = d[-8:].tobytes() if hasattr(d, "tobytes") else bytes(d[-8:])
    return (k, n, head, tail)


def choose_denom(h: int, w: int, hint: int) -> int:
    """Largest DCT scale denominator in {1,2,4,8} keeping min(h,w)/denom >= hint."""
    if hint <= 0:
        return 1
    denom = 1
    for d in (2, 4, 8):
        if min(h, w) // d >= hint:
            denom = d
    return denom


class _DecoderCache:
    """Decoded-image cache (reference ImageCacheBlob/ImageCacheLargest,
    dali/operators/decoder/cache/): bounded byte budget, keyed by source_info.
    'threshold' caches anything <= cache_threshold while space remains;
    'largest' evicts the smallest entries to admit larger images."""

    def __init__(self, size_mb: int, policy: str, threshold: int, debug: bool = False):
        self.capacity = size_mb << 20
        self.policy = policy
        self.threshold = threshold
        self.debug = debug
        self.used = 0
        self.map = {}
        self.hits = 0
        self.misses = 0

    def get(self, key):
        v = self.map.get(key)
        if v is None:
            self.misses += 1
        else:
            self.hits += 1
        if self.debug:
            print(f"[dali_tpu] decoder cache {'hit' if v is not None else 'miss'}: "
                  f"{key} ({self.hits} hits / {self.misses} misses)")
        return v

    def insert(self, key, img):
        if key in self.map:
            return
        nbytes = img.nbytes
        if self.threshold and nbytes > self.threshold:
            return
        if self.used + nbytes > self.capacity:
            if self.policy != "largest":
                return
            # evict strictly smaller entries until it fits (largest-wins)
            for k in sorted(self.map, key=lambda k: self.map[k].nbytes):
                if self.used + nbytes <= self.capacity or self.map[k].nbytes >= nbytes:
                    break
                self.used -= self.map[k].nbytes
                del self.map[k]
            if self.used + nbytes > self.capacity:
                return
        self.map[key] = np.ascontiguousarray(img)
        self.used += nbytes


class _ImageDecoderBase(Operator):
    def _decode(self, ctx, idx, encoded: np.ndarray) -> np.ndarray:
        out_type = self.spec.GetArgument("output_type", DALIImageType.RGB)
        data = np.ascontiguousarray(encoded).tobytes()
        hint = self.spec.GetArgument("downscale_shorter_hint", 0)
        denom = 1
        if hint and imgcodec.is_jpeg(data):
            try:
                h, w, _ = imgcodec.peek_shape(data)
                denom = choose_denom(h, w, hint)
            except Exception:
                denom = 1
        return imgcodec.decode(
            data, output_type=out_type, denom=denom,
            adjust_orientation=self.spec.GetArgument("adjust_orientation", True),
            fancy_upsampling=self.spec.GetArgument("jpeg_fancy_upsampling", True),
            dtype=self.spec.GetArgument("dtype", None))

    def output_layout(self, output_idx, inputs):
        return "HWC"


@register_operator("decoders.Image", "cpu")
class ImageDecoderCPU(_ImageDecoderBase):
    def run_sample(self, ctx, idx, encoded):
        return self._decode(ctx, idx, encoded)


@register_operator("decoders.Image", "mixed")
class ImageDecoderMixed(_ImageDecoderBase):
    """Mixed decode: host entropy decode, output lives on the device side.

    Fast path (``stage_batch``): each JPEG is decoded by the native libjpeg
    decoder *directly into its slot of the padded staging canvas* (strided
    scanline writes), fusing decode + pad_stack into one pass — the TPU analogue
    of DALI's decode-into-pinned-buffer. Non-JPEG samples and exotic output types
    fall back to the generic per-sample path.
    """

    def run_sample(self, ctx, idx, encoded):
        return self._decode(ctx, idx, encoded)

    def _cache(self):
        size = self.spec.GetArgument("cache_size", 0)
        if not size:
            return None
        if not hasattr(self, "_img_cache"):
            self._img_cache = _DecoderCache(
                size,
                self.spec.GetArgument("cache_type", "threshold"),
                self.spec.GetArgument("cache_threshold", 0) or (size << 20),
                debug=self.spec.GetArgument("cache_debug", False),
            )
        return self._img_cache

    def stage_batch(self, ctx, inputs, canvas):
        """Decode the whole batch straight into a padded canvas.

        Returns (arr [N, ch, cw, 3] uint8, shapes [N, 3] int32, layout). Padding
        bytes are left uninitialized: downstream kernels only address within each
        sample's valid extent.
        """
        from .. import native

        out_type = self.spec.GetArgument("output_type", DALIImageType.RGB)
        if out_type != DALIImageType.RGB or not native.available():
            return None  # generic path
        from ..types import DALIDataType

        if self.spec.GetArgument("dtype", None) not in (None, DALIDataType.UINT8):
            return None  # dynamic-range conversion rides the generic path
        enc = inputs[0].samples
        n = len(enc)
        cache = self._cache()
        keys = inputs[0].source_info if cache is not None else None
        hint = self.spec.GetArgument("downscale_shorter_hint", 0)
        datas = [np.ascontiguousarray(e).tobytes() for e in enc]
        if self.spec.GetArgument("adjust_orientation", True):
            # per-file orientation verdicts, content-fingerprint-keyed like
            # _check_exif: epoch 2+ skips the per-sample APP1 marker walk
            srcs = inputs[0].source_info
            ecache = getattr(self, "_exif_scan_cache", None)
            if ecache is None:
                ecache = self._exif_scan_cache = {}
            for i, d in enumerate(datas):
                ck = (_content_key(srcs[i], d)
                      if srcs and i < len(srcs) and srcs[i] else None)
                orient = ecache.get(ck) if ck else None
                if orient is None:
                    orient = imgcodec.exif_orientation(d)
                    if ck:
                        if len(ecache) > (1 << 20):  # bound the verdict map
                            ecache.clear()
                        ecache[ck] = orient
                if orient != 1:
                    return None  # EXIF-rotated: generic path applies the tag
        dims = []
        denoms = []
        for d in datas:
            if imgcodec.is_jpeg(d):
                try:
                    h, w, _ = imgcodec.peek_shape(d)
                except Exception:
                    return None
                dn = choose_denom(h, w, hint)
                sd = native.jpeg_scaled_dims(d, dn)
                if sd is None:
                    return None
                dims.append((sd[0], sd[1]))
                denoms.append(dn)
            else:
                return None  # mixed-format batch: generic path
        shapes = np.array([[h, w, 3] for h, w in dims], dtype=np.int32)
        align = self.pipeline.pad_align
        ch = max(int(-(-shapes[:, 0].max() // align) * align), canvas[0] if canvas else 0)
        cw = max(int(-(-shapes[:, 1].max() // align) * align), canvas[1] if canvas else 0)
        arr = np.empty((n, ch, cw, 3), dtype=np.uint8)

        # serve cache hits by memcpy; decode only the misses (reference
        # cached decoder: CacheLoad before the decode, CacheStore after)
        hit = [False] * n
        if cache is not None and keys:
            for i in range(n):
                img = cache.get(keys[i]) if keys[i] else None
                if img is not None and img.shape[0] <= arr.shape[1] and img.shape[1] <= arr.shape[2]:
                    h, w = img.shape[:2]
                    arr[i, :h, :w] = img
                    shapes[i] = (h, w, 3)
                    hit[i] = True
        todo = [i for i in range(n) if not hit[i]]
        if not todo:
            return arr, shapes, "HWC"
        # whole-batch native decode: one C call, per-sample fan-out on the
        # native tasking pool (no per-sample GIL crossings)
        fancy = self.spec.GetArgument("jpeg_fancy_upsampling", True)
        oks_partial = native.decode_jpeg_batch(
            [datas[i] for i in todo], [arr[i] for i in todo], [denoms[i] for i in todo],
            [int(shapes[i][0]) for i in todo], [int(shapes[i][1]) for i in todo],
            fancy=fancy, num_threads=self.pipeline.num_threads,
        )
        oks = None
        if oks_partial is not None:
            oks = [True] * n
            for j, i in enumerate(todo):
                oks[i] = oks_partial[j]
        if oks is None:
            oks = [True] * n

            def one(j):
                i = todo[j]
                if not native.decode_jpeg_into(datas[i], arr[i], denom=denoms[i],
                                               fancy_upsampling=fancy):
                    oks[i] = False
                return True

            ctx.map_samples(one, len(todo))
        for i, ok in enumerate(oks):
            if not ok:  # corrupt sample: decode via fallback into the slot
                # SAME denom/fancy as the native attempt: the canvas was
                # sized for scaled dims, so a full-res fallback decode would
                # overflow the slot (and silently mix resolutions in the
                # batch); clip defensively — a corrupt file's actual decode
                # can still disagree with its header's predicted dims
                img = imgcodec.decode(datas[i], output_type=out_type,
                                      denom=denoms[i], fancy_upsampling=fancy)
                h = min(img.shape[0], arr.shape[1])
                w = min(img.shape[1], arr.shape[2])
                shapes[i] = (h, w, 3)
                arr[i, :h, :w] = img[:h, :w]
        if cache is not None and keys:
            for i in todo:
                if keys[i]:
                    h, w = int(shapes[i][0]), int(shapes[i][1])
                    cache.insert(keys[i], arr[i, :h, :w])
        return arr, shapes, "HWC"


# -- decoders.ImageRandomCrop --------------------------------------------------------------
_decoder_schema("decoders.ImageRandomCrop").DocStr(
    """Decode + random crop fused on host (reference ``decoders__ImageRandomCrop``):
    samples an area/aspect window like RandomResizedCrop and decodes only that
    region (here: decode then crop)."""
).AddOptionalArg(
    "random_area", ArgType.FLOAT_VEC, "Area range of the crop.", [0.08, 1.0]
).AddOptionalArg(
    "random_aspect_ratio", ArgType.FLOAT_VEC, "Aspect-ratio range.", [3 / 4, 4 / 3]
).AddOptionalArg(
    "num_attempts", ArgType.INT, "Sampling attempts before fallback.", 10
).AddRandomSeedArg()


def sample_rrc_windows_batch(rng, hw, random_area, random_aspect_ratio, num_attempts):
    """Vectorized RRC window sampling for a whole batch: one Generator, one
    set of array draws (the per-sample python loop + per-sample Philox
    construction costs ~0.08 ms/sample — measurable against a ~0.65 ms/sample
    decode). Same rejection semantics as sample_rrc_window; streams differ
    (documented divergence — determinism is per (op, iteration) batch draw).

    hw: [n, 2] int array. Returns [n, 4] int array of (y, x, ch, cw)."""
    hw = np.asarray(hw, np.int64)
    n = hw.shape[0]
    h, w = hw[:, 0], hw[:, 1]
    area = (h * w).astype(np.float64)
    ta = rng.uniform(random_area[0], random_area[1], (num_attempts, n)) * area
    log_lo, log_hi = np.log(random_aspect_ratio[0]), np.log(random_aspect_ratio[1])
    ar = np.exp(rng.uniform(log_lo, log_hi, (num_attempts, n)))
    cw = np.round(np.sqrt(ta * ar)).astype(np.int64)
    ch = np.round(np.sqrt(ta / ar)).astype(np.int64)
    ok = (cw > 0) & (cw <= w) & (ch > 0) & (ch <= h)
    # uniform offset per attempt (inverse-CDF on a shared uniform draw)
    u_y = rng.random((num_attempts, n))
    u_x = rng.random((num_attempts, n))
    y = np.floor(u_y * np.maximum(h - ch + 1, 1)).astype(np.int64)
    x = np.floor(u_x * np.maximum(w - cw + 1, 1)).astype(np.int64)
    first = np.argmax(ok, axis=0)  # first valid attempt (0 if none)
    any_ok = ok.any(axis=0)
    idx = (first, np.arange(n))
    out = np.stack([y[idx], x[idx], ch[idx], cw[idx]], axis=1)
    if not any_ok.all():
        # fallback: center crop with clamped aspect (same as the scalar path)
        in_ar = w / np.maximum(h, 1)
        f_cw = np.where(in_ar < random_aspect_ratio[0], w,
                        np.where(in_ar > random_aspect_ratio[1],
                                 np.minimum(w, np.round(h * random_aspect_ratio[1])), w))
        f_ch = np.where(in_ar < random_aspect_ratio[0],
                        np.minimum(h, np.round(w / random_aspect_ratio[0])),
                        np.where(in_ar > random_aspect_ratio[1], h, h))
        f_ch = f_ch.astype(np.int64)
        f_cw = f_cw.astype(np.int64)
        fb = np.stack([(h - f_ch) // 2, (w - f_cw) // 2, f_ch, f_cw], axis=1)
        out = np.where(any_ok[:, None], out, fb)
    return out


def sample_rrc_window(rng, h, w, random_area, random_aspect_ratio, num_attempts):
    """Sample a random-resized-crop window; mirrors the reference
    ``RandomCropAttr`` (``dali/operators/image/crop/random_crop_attr.h``) /
    torchvision semantics."""
    area = h * w
    for _ in range(num_attempts):
        target_area = rng.uniform(random_area[0], random_area[1]) * area
        log_lo, log_hi = np.log(random_aspect_ratio[0]), np.log(random_aspect_ratio[1])
        ar = np.exp(rng.uniform(log_lo, log_hi))
        cw = int(round(np.sqrt(target_area * ar)))
        ch = int(round(np.sqrt(target_area / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            y = int(rng.integers(0, h - ch + 1))
            x = int(rng.integers(0, w - cw + 1))
            return y, x, ch, cw
    # fallback: center crop with clamped aspect
    in_ar = w / h
    if in_ar < random_aspect_ratio[0]:
        cw, ch = w, min(h, int(round(w / random_aspect_ratio[0])))
    elif in_ar > random_aspect_ratio[1]:
        ch, cw = h, min(w, int(round(h * random_aspect_ratio[1])))
    else:
        ch, cw = h, w
    return (h - ch) // 2, (w - cw) // 2, ch, cw


class _ImageRandomCropBase(_ImageDecoderBase):
    """Decode + random crop. The crop window is sampled from the *header* dims
    first, which lets the JPEG fast path decode at a reduced DCT scale when the
    window is large relative to ``downscale_shorter_hint`` — the reference
    ``decoders__ImageRandomCrop`` fused-ROI idea adapted to libjpeg scaled decode."""

    def run_sample(self, ctx, idx, encoded):
        from .. import native

        data = np.ascontiguousarray(encoded).tobytes()
        rng = ctx.rng(self, idx)
        area = self.spec.GetArgument("random_area")
        ar = self.spec.GetArgument("random_aspect_ratio")
        attempts = self.spec.GetArgument("num_attempts")
        hint = self.spec.GetArgument("downscale_shorter_hint", 0)
        out_type = self.spec.GetArgument("output_type", DALIImageType.RGB)

        from ..types import DALIDataType

        # the native fast path decodes raw uint8 RGB with no orientation or
        # dtype handling — any sample needing those must ride the generic
        # path (same guards as ImageDecoderMixed.stage_batch), or the same
        # pipeline would emit unrotated/uint8 output only when native is
        # available (review r5)
        fast = (imgcodec.is_jpeg(data) and native.available()
                and out_type == DALIImageType.RGB
                and self.spec.GetArgument("dtype", None) in (None, DALIDataType.UINT8)
                and (not self.spec.GetArgument("adjust_orientation", True)
                     or imgcodec.exif_orientation(data) == 1))
        if fast:
            try:
                h, w, _ = imgcodec.peek_shape(data)
            except Exception:
                h = w = None
            if h is not None:
                y, x, ch, cw = sample_rrc_window(rng, h, w, area, ar, attempts)
                denom = choose_denom(ch, cw, hint) if hint else 1
                img = native.decode_jpeg(
                    data, denom=denom,
                    fancy_upsampling=self.spec.GetArgument("jpeg_fancy_upsampling", True))
                if img is not None:
                    if denom > 1:
                        # crop coordinates in scaled space (libjpeg rounds up)
                        y, x = y // denom, x // denom
                        ch = max(1, min(ch // denom, img.shape[0] - y))
                        cw = max(1, min(cw // denom, img.shape[1] - x))
                    return np.ascontiguousarray(img[y : y + ch, x : x + cw])
        img = self._decode(ctx, idx, encoded)
        y, x, ch, cw = sample_rrc_window(rng, img.shape[0], img.shape[1], area, ar, attempts)
        return np.ascontiguousarray(img[y : y + ch, x : x + cw])


@register_operator("decoders.ImageRandomCrop", "cpu")
class ImageRandomCropCPU(_ImageRandomCropBase):
    pass


@register_operator("decoders.ImageRandomCrop", "mixed")
class ImageRandomCropMixed(_ImageRandomCropBase):
    pass


# -- decoders.ImageCrop / ImageSlice ----------------------------------------------------------
_decoder_schema("decoders.ImageCrop").DocStr(
    "Decode + static crop (reference decoders__ImageCrop)."
).AddOptionalArg("crop", ArgType.FLOAT_VEC, "Crop (H, W).", None).AddOptionalArg(
    "crop_pos_x", ArgType.FLOAT, "Horizontal window position [0,1].", 0.5, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "crop_pos_y", ArgType.FLOAT, "Vertical window position [0,1].", 0.5, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "crop_w", ArgType.FLOAT, "Crop width.", 0.0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "crop_h", ArgType.FLOAT, "Crop height.", 0.0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "crop_d", ArgType.FLOAT,
    "Volumetric crop depth (CropAttr compat; decoded images are 2-D, so this "
    "is accepted but unused).", 0.0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "crop_pos_z", ArgType.FLOAT, "Volumetric window z (CropAttr compat).", 0.5,
    tensor_ok=True, per_sample=True
).AddOptionalArg(
    "rounding", ArgType.STRING,
    'Crop-start integer conversion: "round" or "truncate" (crop_attr.cc).',
    "round"
)


class _ImageCropBase(_ImageDecoderBase):
    def run_sample(self, ctx, idx, encoded):
        from .generic2 import _crop_round

        img = self._decode(ctx, idx, encoded)
        h, w = img.shape[:2]
        crop = self.spec.GetArgument("crop", None)
        ch = int(ctx.arg(self, "crop_h", idx, 0) or (crop[0] if crop else h))
        cw = int(ctx.arg(self, "crop_w", idx, 0) or (crop[1] if crop else w))
        py = float(ctx.arg(self, "crop_pos_y", idx, 0.5))
        px = float(ctx.arg(self, "crop_pos_x", idx, 0.5))
        ch, cw = min(ch, h), min(cw, w)
        rnd = self.spec.GetArgument("rounding", "round")
        y = _crop_round(py * (h - ch), rnd)
        x = _crop_round(px * (w - cw), rnd)
        return np.ascontiguousarray(img[y : y + ch, x : x + cw])


@register_operator("decoders.ImageCrop", "cpu")
class ImageCropCPU(_ImageCropBase):
    pass


@register_operator("decoders.ImageCrop", "mixed")
class ImageCropMixed(_ImageCropBase):
    pass


# -- hybrid TPU decode: host entropy → device IDCT ------------------------------------------------

DALI_SCHEMA("_JpegCoeffs").DocStr(
    """Host half of the hybrid JPEG decoder (native/src/jpeg_coeffs.cc): entropy
    decode only, exporting low-frequency DCT coefficient planes + quant tables.
    Outputs: (y_coeffs, chroma_coeffs, quant_tables, dims)."""
).NumInput(1).NumOutput(4).Devices("mixed").MakeInternal().AddOptionalArg(
    "cache_size", ArgType.INT, "Coefficient cache budget in MB (0 = off).", 0
).AddOptionalArg(
    "adjust_orientation", ArgType.BOOL,
    "Reference default True: EXIF-rotated JPEGs cannot ride the hybrid "
    "coefficient wire (rotation happens in pixel space), so orientation "
    "tags != 1 raise with guidance; pass False to decode ignoring the tag "
    "(reference imgcodec applies the tag — use the generic decoder for "
    "rotated corpora).", True
).AddOptionalArg(
    "hybrid_scale", ArgType.INT, "Decode scale denominator (1, 2, or 4).", 1
).AddOptionalArg("chroma_full", ArgType.BOOL, "Full-spectrum chroma (2x traffic).", False)

DALI_SCHEMA("_JpegIdct").DocStr(
    """Device half of the hybrid JPEG decoder (kernels/jpeg.py): dequantize +
    scaled IDCT (MXU matmuls) + chroma upsample + BT.601 YCbCr→RGB — the
    BASELINE.json north-star decode split."""
).NumInput(4).NumOutput(1).Devices("gpu").MakeInternal().AddOptionalArg(
    "hybrid_scale", ArgType.INT, "Decode scale denominator (1, 2, or 4).", 1
).AddOptionalArg("chroma_full", ArgType.BOOL, "Full-spectrum chroma (2x traffic).", False)


@register_operator("_JpegCoeffs", "mixed")
class JpegCoeffs(Operator):
    def _check_exif(self, datas, keys=None):
        """EXIF orientation tags can't ride the coefficient wire (rotation
        happens in pixel space after IDCT); raise with guidance unless
        adjust_orientation=False. Cached by source_info so epoch 2+ skips
        the APP1 scan."""
        if not self.spec.GetArgument("adjust_orientation", True):
            return
        cache = getattr(self, "_exif_ok_cache", None)
        if cache is None:
            cache = self._exif_ok_cache = set()
        for i, d in enumerate(datas):
            # fingerprinted key (_content_key), like every other cache in
            # this file: a file re-encoded across epochs under a stable
            # source_info must re-run the APP1 scan, or a replacement
            # carrying a rotation tag would silently ride the wire
            k = (_content_key(keys[i], d)
                 if keys and i < len(keys) and keys[i] else None)
            if k and k in cache:
                continue
            b = d if isinstance(d, (bytes, bytearray)) else (
                d.tobytes() if hasattr(d, "tobytes") else bytes(d))
            if imgcodec.exif_orientation(b) != 1:
                raise ValueError(
                    "hybrid_device_decode: sample carries an EXIF orientation "
                    "tag; the coefficient wire cannot rotate. Use the generic "
                    "decoder (hybrid_device_decode=False) for rotated corpora "
                    "or pass adjust_orientation=False to decode ignoring the "
                    "tag.")
            if k:
                cache.add(k)

    def _coef_cache(self):
        """Coefficient cache (reference decoder cache applied to the hybrid
        wire): entropy-decoded full-image planes keyed by source_info, so
        repeat epochs over small datasets skip the Huffman work entirely and
        pay only a window memcpy. Enabled via cache_size (MB)."""
        mb = self.spec.GetArgument("cache_size", 0)
        if not mb:
            return None
        if not hasattr(self, "_ccache"):
            self._ccache = {"cap": int(mb) << 20, "used": 0, "map": {},
                            "hits": 0, "misses": 0}
        return self._ccache

    def _planes_for(self, cache, datas, keys, infos, ky, kc):
        """Full-image coefficient planes per sample, from cache or one native
        batch decode of the misses. Returns a list of
        (y_dc [ybh,ybw], y_ac [ybh,ybw,ky²-1], c_dc [2,cbh,cbw], c_ac, q)."""
        from .. import native

        n = len(datas)
        out = [None] * n
        miss = []
        for i in range(n):
            ent = cache["map"].get(keys[i]) if keys[i] else None
            if ent is not None:
                out[i] = ent
            else:
                miss.append(i)
        if miss:
            blocks = infos[np.asarray(miss), 2:6].astype(np.int32)
            y_n = blocks[:, 0].astype(np.int64) * blocks[:, 1]
            c_n = blocks[:, 2].astype(np.int64) * blocks[:, 3]
            flat = [int(y_n.sum()), int((y_n * (ky * ky - 1)).sum()),
                    int(2 * c_n.sum()), int((2 * c_n * (kc * kc - 1)).sum())]
            r = native.jpeg_coeffs_split_flat_batch(
                [datas[i] for i in miss], ky, kc, blocks, flat,
                num_threads=self.pipeline.num_threads)
            if r is None:
                return None
            y_dc, y_ac, c_dc, c_ac, q, offs, oks = r
            if not all(oks):
                raise ValueError(
                    "JPEG coefficient read failed (corrupt sample in hybrid path)")
            for j, i in enumerate(miss):
                ybh, ybw, cbh, cbw = (int(v) for v in blocks[j])
                ent = (
                    y_dc[offs["y_dc"][j]:offs["y_dc"][j] + ybh * ybw]
                    .reshape(ybh, ybw).copy(),
                    y_ac[offs["y_ac"][j]:offs["y_ac"][j] + ybh * ybw * (ky * ky - 1)]
                    .reshape(ybh, ybw, ky * ky - 1).copy(),
                    c_dc[offs["c_dc"][j]:offs["c_dc"][j] + 2 * cbh * cbw]
                    .reshape(2, cbh, cbw).copy(),
                    c_ac[offs["c_ac"][j]:offs["c_ac"][j] + 2 * cbh * cbw * (kc * kc - 1)]
                    .reshape(2, cbh, cbw, kc * kc - 1).copy(),
                    q[j].copy(),
                )
                out[i] = ent
                # falsy keys never cache (they cannot identify a file);
                # the not-in-map guard stops duplicate keys within one
                # batch from re-inserting and over-counting "used", which
                # would exhaust the budget with bytes that store nothing
                if keys[i] and keys[i] not in cache["map"]:
                    nbytes = sum(a.nbytes for a in ent)
                    if cache["used"] + nbytes <= cache["cap"]:
                        cache["map"][keys[i]] = ent
                        cache["used"] += nbytes
        return out

    @staticmethod
    def _chroma_origin(mode, r0, c0):
        """Chroma window origin for a luma block origin, per sampling mode."""
        if mode == 0:    # 4:2:0
            return r0 // 2, c0 // 2
        if mode == 2:    # 4:2:2
            return r0, c0 // 2
        return r0, c0    # 4:4:4

    def _stage_via_cache(self, cache, datas, keys, infos, blocks, brc0, ky, kc):
        """Per-sample window planes: from the cache, from a batch decode of
        the misses (inserted while the budget allows), or — once the budget
        is exhausted — from a CROP-BOUNDED native read (never a full-image
        decode: an over-budget cache must not be slower than cache_size=0)."""
        from .. import native

        mode = getattr(self, "_last_mode", 0)
        n = len(datas)
        windows = [None] * n  # (y_dc, y_ac, c_dc, c_ac, q) window arrays
        for i in range(n):
            if keys[i] and keys[i] in cache["map"]:
                cache["hits"] += 1
            else:
                cache["misses"] += 1
        # keyless samples can't be cached — send them down the crop-bounded
        # read (the budget-exhausted branch below) instead of paying a
        # full-image decode that nothing can ever hit
        to_fill = [i for i in range(n)
                   if keys[i] and keys[i] not in cache["map"]
                   and cache["used"] < cache["cap"]]
        if to_fill:
            planes = self._planes_for(cache, [datas[i] for i in to_fill],
                                      [keys[i] for i in to_fill],
                                      infos[np.asarray(to_fill)], ky, kc)
            if planes is None:
                return None
            fill_planes = dict(zip(to_fill, planes))
        else:
            fill_planes = {}
        for i in range(n):
            bh, bw, cbh, cbw = (int(v) for v in blocks[i])
            r0, c0 = (int(v) for v in brc0[i])
            cr0, cc0 = self._chroma_origin(mode, r0, c0)
            ent = ((cache["map"].get(keys[i]) if keys[i] else None)
                   or fill_planes.get(i))
            if ent is not None:
                pyd, pya, pcd, pca, q = ent
                windows[i] = (
                    np.ascontiguousarray(pyd[r0:r0 + bh, c0:c0 + bw]),
                    np.ascontiguousarray(pya[r0:r0 + bh, c0:c0 + bw]),
                    np.ascontiguousarray(pcd[:, cr0:cr0 + cbh, cc0:cc0 + cbw]),
                    np.ascontiguousarray(pca[:, cr0:cr0 + cbh, cc0:cc0 + cbw]),
                    q,
                )
            else:  # budget exhausted: crop-bounded native decode
                r = native.jpeg_read_coeffs_split_crop(
                    np.ascontiguousarray(datas[i]).tobytes(), ky, kc,
                    bh, bw, cbh, cbw, y_br0=r0, y_bc0=c0, c_br0=cr0, c_bc0=cc0)
                if r is None:
                    raise ValueError("JPEG coefficient read failed")
                y_dc, y_ac, c_dc, c_ac, q = r
                windows[i] = (y_dc, y_ac, c_dc, c_ac, q.astype(np.int32))
        return self._pack_flat(windows, blocks, ky, kc)

    @staticmethod
    def _pack_flat(windows, blocks, ky, kc):
        """Pack per-sample window arrays densely into the flat wire buffers."""
        n = len(windows)
        y_n = blocks[:, 0].astype(np.int64) * blocks[:, 1]
        c_n = blocks[:, 2].astype(np.int64) * blocks[:, 3]
        offs = {
            "y_dc": np.concatenate([[0], np.cumsum(y_n)[:-1]]),
            "y_ac": np.concatenate([[0], np.cumsum(y_n * (ky * ky - 1))[:-1]]),
            "c_dc": np.concatenate([[0], np.cumsum(2 * c_n)[:-1]]),
            "c_ac": np.concatenate([[0], np.cumsum(2 * c_n * (kc * kc - 1))[:-1]]),
        }
        y_dc = np.empty((int(y_n.sum()),), np.int16)
        y_ac = np.empty((int((y_n * (ky * ky - 1)).sum()),), np.int8)
        c_dc = np.empty((int(2 * c_n.sum()),), np.int16)
        c_ac = np.empty((int((2 * c_n * (kc * kc - 1)).sum()),), np.int8)
        qs = np.empty((n, windows[0][4].shape[0]), windows[0][4].dtype)
        for i, (wyd, wya, wcd, wca, q) in enumerate(windows):
            y_dc[offs["y_dc"][i]:offs["y_dc"][i] + wyd.size] = wyd.ravel()
            y_ac[offs["y_ac"][i]:offs["y_ac"][i] + wya.size] = wya.ravel()
            c_dc[offs["c_dc"][i]:offs["c_dc"][i] + wcd.size] = wcd.ravel()
            c_ac[offs["c_ac"][i]:offs["c_ac"][i] + wca.size] = wca.ravel()
            qs[i] = q
        return y_dc, y_ac, c_dc, c_ac, qs, offs

    def _check_modes(self, modes):
        """4:2:0 / 4:4:4 / 4:2:2 all ride the hybrid wire; the sampling mode
        is a jit-static of the device IDCT program, so a batch must be
        homogeneous (mixed-sampling corpora: decode with device='mixed'
        without hybrid_device_decode, or bucket by sampling)."""
        modes = np.asarray(modes)
        if (modes < 0).any() or (modes > 2).any():
            raise ValueError(
                "hybrid_device_decode requires grayscale or 3-component YCbCr "
                "4:2:0/4:2:2/4:4:4 JPEGs"
            )
        if (modes != modes[0]).any():
            raise ValueError(
                "hybrid_device_decode: mixed chroma samplings in one batch "
                f"({sorted(set(int(m) for m in modes))}); the sampling mode is "
                "a compile-time static — bucket the dataset or disable "
                "hybrid_device_decode"
            )
        if modes[0] != 0 and self.spec.GetArgument("chroma_full", False):
            raise ValueError("chroma_full=True is only meaningful for 4:2:0")
        self._last_mode = int(modes[0])

    def _ks(self):
        denom = int(self.spec.GetArgument("hybrid_scale", 1))
        ky = {1: 8, 2: 4, 4: 2}[denom]
        from ..kernels.jpeg import chroma_k

        return ky, chroma_k(ky, True, bool(self.spec.GetArgument("chroma_full", False)))

    def run_batch(self, ctx, inp: HostBatch):
        from .. import native

        ky, kc = self._ks()
        datas = [np.ascontiguousarray(e).tobytes() for e in inp.samples]
        self._check_exif(datas, inp.source_info)
        infos = []
        for d in datas:
            info = native.jpeg_coef_info(d)
            if info is None:
                raise ValueError(
                    "hybrid_device_decode requires 3-component YCbCr "
                    "4:2:0/4:2:2/4:4:4 JPEGs; use hybrid_device_decode=False "
                    "for this dataset"
                )
            infos.append(info)
        self._check_modes(np.asarray([i[6] for i in infos]))
        cache = self._coef_cache()
        # CONTENT keys (source_info + length/head/tail fingerprint,
        # _content_key): raw source_info would serve stale planes when a
        # file's bytes change across epochs, and a falsy per-sample entry
        # must never become a shared cache slot (review r5; the split-path
        # idx cache already keys this way)
        keys = ([_content_key(k, d) for k, d in zip(inp.source_info, datas)]
                if cache is not None and inp.source_info else None)

        def one(i):
            h, w, ybh, ybw, cbh, cbw, mode = infos[i]
            if keys and keys[i]:
                ent = cache["map"].get(keys[i])
                if ent is not None:
                    cache["hits"] += 1
                    y, c, q = ent
                    return y, c, q, np.array([h, w, mode], np.int32)
                cache["misses"] += 1
            r = native.jpeg_read_coeffs(datas[i], ky, kc, ybh, ybw, cbh, cbw)
            if r is None:
                raise ValueError("JPEG coefficient read failed")
            y, c, q = r
            q = q.astype(np.int32)
            if keys and keys[i] and keys[i] not in cache["map"]:
                # the not-in-map guard stops duplicate keys within one batch
                # from re-inserting and over-counting "used"
                nbytes = y.nbytes + c.nbytes + q.nbytes
                if cache["used"] + nbytes <= cache["cap"]:
                    cache["map"][keys[i]] = (y, c, q)
                    cache["used"] += nbytes
            dims = np.array([h, w, mode], np.int32)
            return y, c, q, dims

        results = ctx.map_samples(one, len(datas))
        return [
            HostBatch([r[0] for r in results], layout=""),
            HostBatch([r[1] for r in results], layout=""),
            HostBatch([r[2] for r in results], layout=""),
            HostBatch([r[3] for r in results], layout=""),
        ]

    def boundary_align(self, output_idx, ndim):
        if output_idx == 0:
            return [8, 8, 1]  # luma block grid
        if output_idx == 1:
            # chroma canvas must track the luma canvas through the device
            # upsample: 4:2:0 halves both dims, 4:2:2 only width, 4:4:4 neither
            mode = getattr(self, "_last_mode", 0)
            ch = {0: 4, 1: 8, 2: 8}[mode]
            cw = {0: 4, 1: 8, 2: 4}[mode]
            return [1, ch, cw, 1]  # chroma planes [2, cbh, cbw, kc²]
        return [1] * ndim


@register_operator("_JpegIdct", "gpu")
class JpegIdct(Operator):
    def host_output_layouts(self, in_layouts):
        return ["HWC"]  # coefficient wires carry no layout; output is RGB HWC

    def device_statics(self, ctx, in_shapes, in_batches=None):
        # chroma sampling mode (col 2 of the dims batch); jit-static
        if in_batches is None or in_batches[3] is None:
            return (0,)
        d0 = np.asarray(in_batches[3].samples[0])
        return (int(d0[2]) if d0.shape[0] > 2 else 0,)

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        dims_hb = input_batches[3]
        if dims_hb is None:
            return None
        denom = int(self.spec.GetArgument("hybrid_scale", 1))
        n = len(dims_hb)
        out = np.zeros((n, 3), np.int32)
        for i, d in enumerate(dims_hb.samples):
            h, w = int(d[0]), int(d[1])
            out[i] = (-(-h // denom), -(-w // denom), 3)
        return [out]

    def lower(self, dctx, y_b, c_b, q_b, dims_b):
        import jax
        import jax.numpy as jnp

        from ..kernels import jpeg as jk

        denom = int(self.spec.GetArgument("hybrid_scale", 1))
        ky = {1: 8, 2: 4, 4: 2}[denom]

        chroma_full = bool(self.spec.GetArgument("chroma_full", False))
        (mode,) = dctx.static(self) or (0,)
        fn = lambda y, c, q: jk.jpeg_device_tail(jnp, y, c, q, ky, mode, chroma_full)
        rgb = jax.vmap(fn)(y_b.data, c_b.data, q_b.data)
        dims = dims_b.data  # [N, >=2] full-res (h, w[, mode])
        out_h = (dims[:, 0] + denom - 1) // denom
        out_w = (dims[:, 1] + denom - 1) // denom
        n = rgb.shape[0]
        shapes = jnp.stack([out_h, out_w, jnp.full((n,), 3, out_h.dtype)], axis=1).astype(jnp.int32)
        return [DeviceBatch(rgb, shapes, "HWC")]


DALI_SCHEMA("_JpegCoeffsSplit").DocStr(
    """_JpegCoeffs with the split-precision wire format: DC int16 + AC int8
    (saturated) planes — half the host→device traffic
    (native/src/jpeg_coeffs_split.cc). Outputs: (y_dc, y_ac, c_dc, c_ac, q, dims)."""
).NumInput(1).NumOutput(6).Devices("mixed").MakeInternal().AddOptionalArg(
    "cache_size", ArgType.INT, "Coefficient cache budget in MB (0 = off).", 0
).AddOptionalArg(
    "adjust_orientation", ArgType.BOOL,
    "Reference default True: EXIF-rotated JPEGs cannot ride the hybrid "
    "coefficient wire (rotation happens in pixel space), so orientation "
    "tags != 1 raise with guidance; pass False to decode ignoring the tag "
    "(reference imgcodec applies the tag — use the generic decoder for "
    "rotated corpora).", True
).AddOptionalArg(
    "hybrid_scale", ArgType.INT, "Decode scale denominator (1, 2, or 4).", 1
).AddOptionalArg("chroma_full", ArgType.BOOL, "Full-spectrum chroma.", False)

DALI_SCHEMA("_JpegIdctSplit").DocStr(
    "_JpegIdct for the split-precision wire format."
).NumInput(6).NumOutput(1).Devices("gpu").MakeInternal().AddOptionalArg(
    "hybrid_scale", ArgType.INT, "Decode scale denominator (1, 2, or 4).", 1
).AddOptionalArg("chroma_full", ArgType.BOOL, "Full-spectrum chroma.", False)


@register_operator("_JpegCoeffsSplit", "mixed")
class JpegCoeffsSplit(JpegCoeffs):
    def _sparse_wire_enabled(self, nac_y: int, nac_c: int) -> bool:
        """Sparse AC wire (per-block bitmap + packed nonzeros): on by default
        when the native pack kernel exists and the selection fits a uint16
        bitmap. Kill switch: DALI_TPU_DISABLE_SPARSE_WIRE=1 (docs/env_vars)."""
        import os

        from .. import native

        if os.environ.get("DALI_TPU_DISABLE_SPARSE_WIRE", "0") not in ("", "0"):
            return False
        return native.has_sparse_pack() and nac_y <= 16 and nac_c <= 16

    def _esc_cap(self, name: str, worst: int) -> int:
        """Escape-buffer capacity: covers both the worst-case escape count of
        THIS batch (every value escapes) and any already-ratcheted wire
        length, so the post-pack ratchet slice is always in bounds."""
        chunk = 1 << 14 if name.endswith("_esc") else 1 << 18
        first_growth = -(-(int(max(worst, 1) * 1.1) + 16) // chunk) * chunk
        if not hasattr(self, "_sparse_lens"):
            self._sparse_lens = {}
        return max(first_growth, self._sparse_lens.get(name, 0))

    def _wire_ratchet(self, name: str, need: int) -> int:
        """Monotonic wire-length grow policy: 256K-element chunks with 1.1x
        headroom on first growth — coarse 1M chunks overshipped ~15% of the
        wire as ratchet padding, finer ones recompile the gather program on
        every new maximum. Headroom sizing (r4): measured batch-to-batch
        need swings are ~4% (luma nnz) and ~27% (chroma nnz); the monotonic
        ratchet absorbs the swing with at most one extra recompile either
        way, while 1.25x permanently shipped ~5 KiB/img of padding."""
        if not hasattr(self, "_sparse_lens"):
            self._sparse_lens = {}
        # low-volume escape streams (a few KB real data) use 16K-element
        # chunks: a 256K minimum would re-waste ~1.5 MB/batch of padding
        chunk = 1 << 14 if name.endswith("_esc") else 1 << 18
        prev = self._sparse_lens.get(name, 0)
        want = max(need, 1) if prev else int(max(need, 1) * 1.1)
        want = max(prev, -(-want // chunk) * chunk)
        self._sparse_lens[name] = want
        return want

    def _use_pack_batch(self, ky, kc, cache, keys):
        """The pack-emit decode path (ONE native call file-bytes -> sparse
        wire) applies when the sparse wire is on, the native entry exists,
        and the coefficient cache is off (the cache stores dense planes).
        Kill switch: DALI_TPU_DISABLE_PACK_EMIT=1 (A/B + escape hatch)."""
        import os

        from .. import native

        if os.environ.get("DALI_TPU_DISABLE_PACK_EMIT", "0") not in ("", "0"):
            return False
        return (self._sparse_wire_enabled(ky * ky - 1, kc * kc - 1)
                and native.has_pack_batch()
                and not (cache is not None and keys))

    def _decode_idx_blobs(self, keys, infos, mode, n, datas=None):
        """Per-file ROI decode-index blobs (jpeg_huff.cc IdxHeader/IdxEntry):
        the decoder records the bit-reader state before every MCU on the
        first decode of a file and SEEKS straight to the crop window on
        later decodes — epoch 2+ of training pays only for the window's
        MCUs. ~24 B/MCU (~30 KB per ImageNet-sized file), capped by
        DALI_TPU_DECODE_IDX_MB (default 256; 0 or DALI_TPU_DISABLE_DECODE_IDX
        disables). Reference analogue: the decoder caches keyed by source
        info (dali/operators/decoder/cache/ — pixels there, positions here)."""
        import os

        from .. import native

        if os.environ.get("DALI_TPU_DISABLE_DECODE_IDX", "0") not in ("", "0"):
            return None
        if not keys:
            return None
        cache = getattr(self, "_idx_cache", None)
        if cache is None:
            cap_mb = int(os.environ.get("DALI_TPU_DECODE_IDX_MB", "256") or 0)
            if cap_mb <= 0:
                return None
            cache = self._idx_cache = {"map": {}, "used": 0,
                                       "cap": cap_mb << 20}
        vdiv = 2 if mode == 0 else 1
        hdiv = 1 if mode == 1 else 2
        blobs = [None] * n
        seen = set()
        for i in range(n):
            k = keys[i] if i < len(keys) else None
            if not k or k in seen:
                continue  # file twice in one batch: one writer only
            seen.add(k)
            # map by raw source_info -> (content fingerprint, blob): a
            # replaced file or re-used source_info must never replay a stale
            # index (idx_init's us_len check catches most swaps, but an
            # equal-length different-bytes stream would seek into garbage) —
            # and the superseded blob is RECLAIMED, not leaked, so corpora
            # that re-encode between epochs don't creep to the cap and
            # silently lose the ROI-seek optimization
            fp = _content_key(k, datas[i]) if datas is not None else k
            entry = cache["map"].get(k)
            if entry is not None and entry[0] != fp:
                # decrement and removal MUST happen together: if the stale
                # entry stayed in the map while a cap-exceeding replacement
                # skipped re-insertion, every later batch would re-decrement
                # the same bytes and "used" would underflow past zero,
                # unbounding the cap
                cache["used"] -= entry[1].nbytes
                del cache["map"][k]
                entry = None
            if entry is None:
                my = -(-int(infos[i, 2]) // vdiv)
                mx = -(-int(infos[i, 3]) // hdiv)
                nb = native.decode_idx_blob_bytes(mx, my)
                if cache["used"] + nb > cache["cap"]:
                    continue
                entry = (fp, np.zeros(nb, np.uint8))
                cache["map"][k] = entry
                cache["used"] += nb
            blobs[i] = entry[1]
        return blobs

    def _stage_wire_packed(self, y_dc, y_mask, y_vals, y_tot, c_dc, c_mask,
                           c_vals, c_tot, offs, y_ac_shapes, c_ac_shapes,
                           y_dc_shapes, c_dc_shapes, y_ac_canvas, c_ac_canvas,
                           y_dc_canvas, c_dc_canvas, n_y_blocks, n_c_blocks):
        """Stage the pack-emit decoder's output: masks + contiguous value
        streams already exist, so the only remaining native work is
        nibble-packing the AC streams and escape-packing the DC planes
        (pack_wire2, one call)."""
        from .. import native
        from ..executor import _Esc16Staged, _SparseStaged

        ring = self._wire_ring()
        n_y_blocks = int(n_y_blocks)
        n_c_blocks = int(n_c_blocks)
        y_dc_len, y_ac_cap = int(self._flat_lens[0]), int(self._flat_lens[1])
        c_dc_len, c_ac_cap = int(self._flat_lens[2]), int(self._flat_lens[3])
        y_nibs = ring.take("y_ac_nibs", (y_ac_cap + 1) // 2 + 8, np.uint8)
        c_nibs = ring.take("c_ac_nibs", (c_ac_cap + 1) // 2 + 8, np.uint8)
        y_dc8 = ring.take("y_dc_8", y_dc_len, np.int8)
        c_dc8 = ring.take("c_dc_8", c_dc_len, np.int8)
        y_esc16 = ring.take("y_dc_esc16",
                            self._esc_cap("y_dc_esc", n_y_blocks), np.int16)
        c_esc16 = ring.take("c_dc_esc16",
                            self._esc_cap("c_dc_esc", n_c_blocks), np.int16)
        y_ve, c_ve, y_de, c_de = native.pack_wire2(
            y_vals, y_tot, c_vals, c_tot, y_dc, c_dc,
            n_y_blocks, n_c_blocks, y_dc_len, c_dc_len,
            y_nibs, c_nibs, y_dc8, y_esc16, c_dc8, c_esc16,
            num_threads=self.pipeline.num_threads,
        )
        y_nib_len = self._wire_ratchet("y_ac_nibs", (y_tot + 1) // 2)
        c_nib_len = self._wire_ratchet("c_ac_nibs", (c_tot + 1) // 2)
        y_ve_w = min(self._wire_ratchet("y_ac_esc", y_ve), y_vals.shape[0])
        c_ve_w = min(self._wire_ratchet("c_ac_esc", c_ve), c_vals.shape[0])
        y_de_w = min(self._wire_ratchet("y_dc_esc", y_de), y_esc16.shape[0])
        c_de_w = min(self._wire_ratchet("c_dc_esc", c_de), c_esc16.shape[0])
        return (
            _Esc16Staged(y_dc8, y_esc16[:y_de_w], offs["y_dc"], y_dc_shapes,
                         y_dc_canvas),
            _SparseStaged(y_mask, y_nibs[:y_nib_len], y_vals[:y_ve_w],
                          offs["y_dc"], y_ac_shapes, y_ac_canvas),
            _Esc16Staged(c_dc8, c_esc16[:c_de_w], offs["c_dc"], c_dc_shapes,
                         c_dc_canvas),
            _SparseStaged(c_mask, c_nibs[:c_nib_len], c_vals[:c_ve_w],
                          offs["c_dc"], c_ac_shapes, c_ac_canvas),
        )

    def _stage_wire(self, y_dc, y_ac, c_dc, c_ac, offs, y_ac_shapes,
                    c_ac_shapes, y_dc_shapes, c_dc_shapes, y_ac_canvas,
                    c_ac_canvas, y_dc_canvas, c_dc_canvas, n_y_blocks,
                    n_c_blocks, ky, kc):
        """Stage all four planes. Sparse wire: ONE native call packs both AC
        planes (mask + nibbles, escapes in-place into the vals temp) and both
        DC planes (int8 + in-place int16 escapes) — the six per-primitive
        ctypes round-trips this replaces cost more than the packing itself
        (docs/performance.md r3). Dense fallback: flat-packed planes."""
        from .. import _prof, native
        from ..executor import _Esc16Staged, _FlatStaged, _SparseStaged

        nac_y, nac_c = ky * ky - 1, kc * kc - 1
        if not self._sparse_wire_enabled(nac_y, nac_c) or not hasattr(
                native._load(), "dali_tpu_pack_wire"):
            return (
                _FlatStaged(y_dc, offs["y_dc"], y_dc_shapes, y_dc_canvas),
                _FlatStaged(y_ac, offs["y_ac"], y_ac_shapes, y_ac_canvas),
                _FlatStaged(c_dc, offs["c_dc"], c_dc_shapes, c_dc_canvas),
                _FlatStaged(c_ac, offs["c_ac"], c_ac_shapes, c_ac_canvas),
            )
        ring = self._wire_ring()
        n_y_blocks = int(n_y_blocks)
        n_c_blocks = int(n_c_blocks)
        y_dc_len, y_ac_cap = int(self._flat_lens[0]), int(self._flat_lens[1])
        c_dc_len, c_ac_cap = int(self._flat_lens[2]), int(self._flat_lens[3])
        y_mask = ring.take("y_ac_mask", y_dc_len, np.uint16)
        c_mask = ring.take("c_ac_mask", c_dc_len, np.uint16)
        y_nibs = ring.take("y_ac_nibs", (y_ac_cap + 1) // 2 + 8, np.uint8)
        c_nibs = ring.take("c_ac_nibs", (c_ac_cap + 1) // 2 + 8, np.uint8)
        y_vals = ring.take("y_ac_vals", y_ac_cap + 16, np.int8)
        c_vals = ring.take("c_ac_vals", c_ac_cap + 16, np.int8)
        y_dc8 = ring.take("y_dc_8", y_dc_len, np.int8)
        c_dc8 = ring.take("c_dc_8", c_dc_len, np.int8)
        y_esc16 = ring.take("y_dc_esc16",
                            self._esc_cap("y_dc_esc", n_y_blocks), np.int16)
        c_esc16 = ring.take("c_dc_esc16",
                            self._esc_cap("c_dc_esc", n_c_blocks), np.int16)
        y_nnz, y_ve, c_nnz, c_ve, y_de, c_de = native.pack_wire(
            y_ac, n_y_blocks, nac_y, c_ac, n_c_blocks, nac_c,
            y_dc, c_dc, y_dc_len, c_dc_len,
            y_mask, y_nibs, y_vals, c_mask, c_nibs, c_vals,
            y_dc8, y_esc16, c_dc8, c_esc16,
            num_threads=self.pipeline.num_threads,
        )
        # wire-length ratchets (shape-stable jit): nibble streams ride their
        # grow policy; escape slices ride the small-chunk policy, clamped to
        # the buffer they view into (the AC escapes live IN-PLACE in the
        # front of the vals temp)
        y_nib_len = self._wire_ratchet("y_ac_nibs", (y_nnz + 1) // 2)
        c_nib_len = self._wire_ratchet("c_ac_nibs", (c_nnz + 1) // 2)
        y_ve_w = min(self._wire_ratchet("y_ac_esc", y_ve), y_vals.shape[0])
        c_ve_w = min(self._wire_ratchet("c_ac_esc", c_ve), c_vals.shape[0])
        y_de_w = min(self._wire_ratchet("y_dc_esc", y_de), y_esc16.shape[0])
        c_de_w = min(self._wire_ratchet("c_dc_esc", c_de), c_esc16.shape[0])
        return (
            _Esc16Staged(y_dc8, y_esc16[:y_de_w], offs["y_dc"], y_dc_shapes,
                         y_dc_canvas),
            _SparseStaged(y_mask, y_nibs[:y_nib_len], y_vals[:y_ve_w],
                          offs["y_dc"], y_ac_shapes, y_ac_canvas),
            _Esc16Staged(c_dc8, c_esc16[:c_de_w], offs["c_dc"], c_dc_shapes,
                         c_dc_canvas),
            _SparseStaged(c_mask, c_nibs[:c_nib_len], c_vals[:c_ve_w],
                          offs["c_dc"], c_ac_shapes, c_ac_canvas),
        )

    def _wire_ring(self):
        """Per-op wire-buffer ring sized to this pipeline's in-flight staged
        iterations (cpu_queue_depth + one being built + one in transfer) —
        see native.StagingRing safety contract."""
        from .. import native

        ring = getattr(self, "_ring", None)
        depth = getattr(self.pipeline, "cpu_queue_depth", 2) + 2
        if ring is None or ring.depth < depth:
            ring = self._ring = native.StagingRing(depth)
        return ring

    def _cached_infos(self, inp, datas):
        """Header info (dims/blocks/sampling) is immutable per file: cache it
        by source_info so epoch 2+ skips the per-image marker parse."""
        from .. import native

        ikeys = [_content_key(k, d) for k, d in zip(inp.source_info or [], datas)]
        n = len(datas)
        icache = getattr(self, "_info_cache", None)
        if icache is None:
            icache = self._info_cache = {}
        if ikeys and len(ikeys) == n and all(k and k in icache for k in ikeys):
            return np.stack([icache[k] for k in ikeys])
        infos = native.jpeg_coef_info_batch(datas, num_threads=self.pipeline.num_threads)
        if infos is not None and ikeys and len(ikeys) == n:
            if len(icache) > 1_000_000:  # ~200 MB of keys+rows: trim the
                # oldest half (dict preserves insertion order) instead of a
                # wholesale clear that would force a full re-parse epoch
                for k in list(icache.keys())[: len(icache) // 2]:
                    del icache[k]
            for k, row in zip(ikeys, infos):
                if k:
                    icache[k] = row.copy()
        return infos

    def stage_batch_multi(self, ctx, inputs, canvases):
        """Fused path: ONE native call reads every sample's coefficient planes
        straight into the padded boundary canvases (batch entry in
        jpeg_coeffs_split.cc on the tasking pool) — no per-sample numpy
        allocations and no separate pad_and_stack pass."""
        from .. import native

        if not native.available():
            return None
        ky, kc = self._ks()
        inp = inputs[0]
        datas = [np.ascontiguousarray(e) for e in inp.samples]
        n = len(datas)
        self._check_exif(datas, inp.source_info)
        infos = self._cached_infos(inp, datas)
        if infos is None:
            return None
        self._check_modes(infos[:, 6])
        blocks = infos[:, 2:6].copy()

        def grow(cur, want, align):
            want = int(-(-int(want) // align) * align)
            return max(want, cur)

        mode = getattr(self, "_last_mode", 0)
        if getattr(self, "_canvas_mode", mode) != mode:
            canvases = [None] * len(canvases)  # stale mode: canvases restart
        self._canvas_mode = mode
        prev = canvases[1] or [0, 0, 0]  # y_ac canvas [BH, BW, k²-1]
        BH = grow(prev[0], blocks[:, 0].max(), 8)
        BW = grow(prev[1], blocks[:, 1].max(), 8)
        prevc = canvases[3] or [0, 0, 0, 0]  # c_ac canvas [2, CBH, CBW, k²-1]
        CBH = grow(prevc[1], blocks[:, 2].max(), {0: 4, 1: 8, 2: 8}[mode])
        CBW = grow(prevc[2], blocks[:, 3].max(), {0: 4, 1: 8, 2: 4}[mode])

        # flat-packed wire: per-sample planes dense at offsets (no padding
        # bytes in the transfer); lengths follow a grow policy so the jit
        # cache stabilizes. ~30% less host→device traffic than padded
        # canvases on ImageNet-shaped batches.
        from ..executor import _FlatStaged

        y_n = blocks[:, 0].astype(np.int64) * blocks[:, 1]
        c_n = blocks[:, 2].astype(np.int64) * blocks[:, 3]
        need = (
            int(y_n.sum()),
            int((y_n * (ky * ky - 1)).sum()),
            int(2 * c_n.sum()),
            int((2 * c_n * (kc * kc - 1)).sum()),
        )
        if not hasattr(self, "_flat_lens"):
            self._flat_lens = [0, 0, 0, 0]
        # fine-grained grow policy (matches executor._unsparse_boundary's
        # flat-wire chunking): 256K-element chunks,
        # 1.1x headroom on first growth so early batches don't recompile
        chunk = 1 << 18
        for j in range(4):
            want = need[j] if self._flat_lens[j] else int(need[j] * 1.1)
            self._flat_lens[j] = max(self._flat_lens[j], -(-want // chunk) * chunk)

        cache = self._coef_cache()
        keys = inputs[0].source_info
        # the plane cache keys by CONTENT fingerprint (_content_key): raw
        # source_info would serve stale planes across re-encodes, and falsy
        # holes must never share a slot (review r5)
        ckeys = ([_content_key(k, d) for k, d in zip(keys, datas)]
                 if cache is not None and keys else None)
        pack_mode = self._use_pack_batch(ky, kc, cache, keys)
        zero_brc0 = np.zeros((n, 2), np.int32)
        if pack_mode:
            r = native.jpeg_coeffs_split_flat_crop_pack_batch(
                datas, ky, kc, blocks, zero_brc0, self._flat_lens,
                num_threads=self.pipeline.num_threads, ring=self._wire_ring(),
                c_brc0=zero_brc0,
            )
            pack_mode = r is not None
        if not pack_mode:
            if cache is not None and ckeys:
                packed = self._stage_via_cache(cache, datas, ckeys, infos,
                                               blocks, zero_brc0, ky, kc)
                r = None if packed is None else (*packed, [True] * n)
            else:
                r = native.jpeg_coeffs_split_flat_batch(
                    datas, ky, kc, blocks, self._flat_lens,
                    num_threads=self.pipeline.num_threads,
                    ring=self._wire_ring(),
                )
        if r is None:
            return None
        yb = blocks[:, :2]
        cb = blocks[:, 2:]
        two = np.full((n, 1), 2, np.int32)
        y_shapes = np.concatenate([yb, np.full((n, 1), ky * ky - 1, np.int32)], 1)
        c_shapes = np.concatenate([two, cb, np.full((n, 1), kc * kc - 1, np.int32)], 1)
        stage_args = (y_shapes, c_shapes, yb.copy(), np.concatenate([two, cb], 1),
                      (BH, BW, ky * ky - 1), (2, CBH, CBW, kc * kc - 1),
                      (BH, BW), (2, CBH, CBW))
        if pack_mode:
            (y_dc, y_mask, y_vals, y_tot, c_dc, c_mask, c_vals, c_tot, q,
             offs, oks) = r
            if not all(oks):
                raise ValueError(
                    "JPEG coefficient read failed (corrupt sample in hybrid path)")
            y_dc_st, y_ac_st, c_dc_st, c_ac_st = self._stage_wire_packed(
                y_dc, y_mask, y_vals, y_tot, c_dc, c_mask, c_vals, c_tot,
                offs, *stage_args, int(y_n.sum()), int(2 * c_n.sum()),
            )
        else:
            y_dc, y_ac, c_dc, c_ac, q, offs, oks = r
            if not all(oks):
                raise ValueError(
                    "JPEG coefficient read failed (corrupt sample in hybrid path)")
            y_dc_st, y_ac_st, c_dc_st, c_ac_st = self._stage_wire(
                y_dc, y_ac, c_dc, c_ac, offs, *stage_args,
                int(y_n.sum()), int(2 * c_n.sum()), ky, kc,
            )
        out = [
            y_dc_st,
            y_ac_st,
            c_dc_st,
            c_ac_st,
            (q, np.full((n, 1), q.shape[1], np.int32), ""),
            HostBatch([infos[i, [0, 1, 6]].copy() for i in range(n)], layout=""),
        ]
        return out

    def run_batch(self, ctx, inp: HostBatch):
        from .. import native

        ky, kc = self._ks()
        datas = [np.ascontiguousarray(e).tobytes() for e in inp.samples]
        self._check_exif(datas, inp.source_info)
        infos = []
        for d in datas:
            info = native.jpeg_coef_info(d)
            if info is None:
                raise ValueError(
                    "hybrid_device_decode requires grayscale or 3-component YCbCr 4:2:0/4:2:2/4:4:4 JPEGs"
                )
            infos.append(info)
        self._check_modes(np.asarray([i[6] for i in infos]))

        def one(i):
            h, w, ybh, ybw, cbh, cbw, mode = infos[i]
            r = native.jpeg_read_coeffs_split(datas[i], ky, kc, ybh, ybw, cbh, cbw)
            if r is None:
                raise ValueError("JPEG coefficient read failed")
            y_dc, y_ac, c_dc, c_ac, q = r
            return y_dc, y_ac, c_dc, c_ac, q.astype(np.int32), np.array([h, w, mode], np.int32)

        results = ctx.map_samples(one, len(datas))
        return [HostBatch([r[j] for r in results], layout="") for j in range(6)]

    def boundary_align(self, output_idx, ndim):
        if output_idx in (0, 1):
            return [8, 8, 1][:ndim]
        if output_idx in (2, 3):
            # chroma canvas tracks the luma canvas through the mode's upsample
            mode = getattr(self, "_last_mode", 0)
            ch = {0: 4, 1: 8, 2: 8}[mode]
            cw = {0: 4, 1: 8, 2: 4}[mode]
            return [1, ch, cw, 1][:ndim]
        return [1] * ndim


@register_operator("_JpegIdctSplit", "gpu")
class JpegIdctSplit(Operator):
    def host_output_layouts(self, in_layouts):
        return ["HWC"]  # coefficient wires carry no layout; output is RGB HWC

    def device_statics(self, ctx, in_shapes, in_batches=None):
        # chroma sampling mode (0=4:2:0, 1=4:4:4, 2=4:2:2) rides the dims
        # batch (col 2); it's a jit-static of the device program (the batch
        # is mode-homogeneous — enforced by _check_modes on the host side)
        if in_batches is None or in_batches[5] is None:
            return (0,)
        d0 = np.asarray(in_batches[5].samples[0])
        return (int(d0[2]) if d0.shape[0] > 2 else 0,)

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        dims_hb = input_batches[5]
        if dims_hb is None:
            return None
        denom = int(self.spec.GetArgument("hybrid_scale", 1))
        n = len(dims_hb)
        out = np.zeros((n, 3), np.int32)
        for i, d in enumerate(dims_hb.samples):
            h, w = int(d[0]), int(d[1])
            out[i] = (-(-h // denom), -(-w // denom), 3)
        return [out]

    def lower(self, dctx, ydc_b, yac_b, cdc_b, cac_b, q_b, dims_b):
        import jax
        import jax.numpy as jnp

        from ..kernels import jpeg as jk

        denom = int(self.spec.GetArgument("hybrid_scale", 1))
        ky = {1: 8, 2: 4, 4: 2}[denom]
        chroma_full = bool(self.spec.GetArgument("chroma_full", False))

        def combine(dc, ac):
            return jnp.concatenate(
                [dc[..., None].astype(jnp.int32), ac.astype(jnp.int32)], axis=-1
            )

        y = combine(ydc_b.data, yac_b.data)
        c = combine(cdc_b.data, cac_b.data)
        (mode,) = dctx.static(self) or (0,)
        fn = lambda yy, cc, q: jk.jpeg_device_tail(jnp, yy, cc, q, ky, mode, chroma_full)
        rgb = jax.vmap(fn)(y, c, q_b.data)
        dims = dims_b.data
        out_h = (dims[:, 0] + denom - 1) // denom
        out_w = (dims[:, 1] + denom - 1) // denom
        n = rgb.shape[0]
        shapes = jnp.stack([out_h, out_w, jnp.full((n,), 3, out_h.dtype)], axis=1).astype(jnp.int32)
        return [DeviceBatch(rgb, shapes, "HWC")]


# -- PeekImageShape -----------------------------------------------------------------------------
DALI_SCHEMA("PeekImageShape").DocStr(
    "Image shape from the encoded header without decoding (reference "
    "``imgcodec/peek_image_shape.cc``)."
).NumInput(1).NumOutput(1).Devices("cpu").AddOptionalArg(
    "dtype", ArgType.DATA_TYPE, "Output dtype.", None
).AddOptionalArg(
    "image_type", ArgType.IMAGE_TYPE,
    "Color space the decode would produce — GRAY reports 1 channel "
    "(reference peek_image_shape.cc `image_type`).", DALIImageType.RGB
).AddOptionalArg(
    "adjust_orientation", ArgType.BOOL,
    "Report the post-EXIF-rotation shape (reference default): orientations "
    "5-8 swap height/width.", True
)


@register_operator("PeekImageShape", "cpu")
class PeekImageShape(Operator):
    def run_sample(self, ctx, idx, encoded):
        from ..types import to_numpy_type

        data = np.ascontiguousarray(encoded).tobytes()
        h, w, c = imgcodec.peek_shape(data)
        if self.spec.GetArgument("adjust_orientation", True) and imgcodec.is_jpeg(data):
            if imgcodec.exif_orientation(data) >= 5:
                h, w = w, h
        if self.spec.GetArgument("image_type", DALIImageType.RGB) == DALIImageType.GRAY:
            c = 1
        dtype = self.spec.GetArgument("dtype", None)
        np_dt = to_numpy_type(dtype) if dtype is not None else np.int64
        return np.array([h, w, c], dtype=np_dt)


# ============================ hybrid decode fused with RandomResizedCrop ==========================

DALI_SCHEMA("_JpegCoeffsSplitRRC").DocStr(
    """Hybrid decoder fused with RandomResizedCrop's window sampling
    (dali_tpu extension of reference decoders__ImageRandomCrop): the host
    samples the area/aspect window (RandomCropAttr semantics), snaps it to the
    16-pixel MCU grid, and reads ONLY the window's DCT blocks — wire and device
    work scale with the crop, not the image. Outputs the split-precision planes
    + dims (decoded-region size) + roi (residual window within the region)."""
).NumInput(1).NumOutput(7).Devices("mixed").MakeInternal().AddRandomSeedArg().AddOptionalArg(
    "cache_size", ArgType.INT, "Coefficient cache budget in MB (0 = off).", 0
).AddOptionalArg(
    "adjust_orientation", ArgType.BOOL,
    "Reference default True: EXIF-rotated JPEGs cannot ride the hybrid "
    "coefficient wire (rotation happens in pixel space), so orientation "
    "tags != 1 raise with guidance; pass False to decode ignoring the tag "
    "(reference imgcodec applies the tag — use the generic decoder for "
    "rotated corpora).", True
).AddOptionalArg(
    "hybrid_scale", ArgType.INT, "Decode scale denominator (1, 2, or 4).", 1
).AddOptionalArg(
    "chroma_full", ArgType.BOOL, "Full-spectrum chroma.", False
).AddOptionalArg(
    "random_area", ArgType.FLOAT_VEC, "Crop area range.", [0.08, 1.0]
).AddOptionalArg(
    "random_aspect_ratio", ArgType.FLOAT_VEC, "Aspect-ratio range.", [3 / 4, 4 / 3]
).AddOptionalArg("num_attempts", ArgType.INT, "Window sampling attempts.", 10)

DALI_SCHEMA("_JpegIdctSplitRRC").DocStr(
    "_JpegIdctSplit + residual window shift: output extents are exactly the "
    "sampled crop (quantized to the decode scale)."
).NumInput(7).NumOutput(1).Devices("gpu").MakeInternal().AddOptionalArg(
    "hybrid_scale", ArgType.INT, "Decode scale denominator.", 1
).AddOptionalArg("chroma_full", ArgType.BOOL, "Full-spectrum chroma.", False)


@register_operator("_JpegCoeffsSplitRRC", "mixed")
class JpegCoeffsSplitRRC(JpegCoeffsSplit):
    def stage_batch_multi(self, ctx, inputs, canvases):
        from .. import _prof, native

        if not native.available():
            return None
        ky, kc = self._ks()
        inp = inputs[0]
        datas = [np.ascontiguousarray(e) for e in inp.samples]
        n = len(datas)
        self._check_exif(datas, inp.source_info)
        with _prof.section("host.decode.header_info"):
            infos = self._cached_infos(inp, datas)
        if infos is None:
            return None
        self._check_modes(infos[:, 6])
        mode = int(infos[0, 6])
        # MCU pixel grid per sampling mode: the decoded region snaps to it
        # (one-MCU halo keeps the chroma upsample's border neighborhood exact)
        mcu_h, mcu_w = {0: (16, 16), 2: (8, 16), 1: (8, 8)}[mode]

        area = self.spec.GetArgument("random_area")
        ar = self.spec.GetArgument("random_aspect_ratio")
        attempts = self.spec.GetArgument("num_attempts", 10)
        _t_rrc = time.perf_counter()
        wins = sample_rrc_windows_batch(ctx.rng(self), infos[:, :2], area, ar, attempts)
        # vectorized MCU-grid snap of all n windows (was a python loop —
        # measurable at batch 256 on the 1-core host)
        y, x = wins[:, 0].astype(np.int64), wins[:, 1].astype(np.int64)
        ch, cw = wins[:, 2].astype(np.int64), wins[:, 3].astype(np.int64)
        # Exact halo (round 4): the only cross-block dependency in the device
        # tail is the triangular chroma upsample (kernels/jpeg.py _up1d),
        # whose taps reach ONE chroma pixel = 2*hybrid_scale ORIGINAL pixels
        # beyond the ROI. The previous unconditional 1-MCU halo overshipped
        # ~12 px per side (~13% of all decoded blocks = wire bytes AND host
        # entropy-decode work); margin + MCU snap is both necessary and
        # sufficient for bit-identical ROI pixels (A/B kill switch:
        # DALI_TPU_FULL_HALO=1, parity-tested in test_decode_idx.py).
        denom = int(self.spec.GetArgument("hybrid_scale", 1))
        import os as _os
        if _os.environ.get("DALI_TPU_FULL_HALO", "0") not in ("", "0"):
            m_lo_h = m_lo_w = mcu_h  # legacy full-MCU halo (A/B)
            m_hi = mcu_h
            y0 = np.maximum((y // mcu_h) * mcu_h - m_lo_h, 0)
            x0 = np.maximum((x // mcu_w) * mcu_w - m_lo_w, 0)
            y1 = -(-(y + ch) // mcu_h) * mcu_h + m_hi
            x1 = -(-(x + cw) // mcu_w) * mcu_w + m_hi
        else:
            m = 2 * denom
            y0 = (np.maximum(y - m, 0) // mcu_h) * mcu_h
            x0 = (np.maximum(x - m, 0) // mcu_w) * mcu_w
            y1 = -(-(y + ch + m) // mcu_h) * mcu_h
            x1 = -(-(x + cw + m) // mcu_w) * mcu_w
        y1 = np.minimum(y1, infos[:, 2].astype(np.int64) * 8)  # full luma extent
        x1 = np.minimum(x1, infos[:, 3].astype(np.int64) * 8)
        # region must stay MCU-aligned (full extent may be odd-block)
        y1 += (-(y1 - y0)) % mcu_h
        x1 += (-(x1 - x0)) % mcu_w
        cbh = (y1 - y0) // (8 if mode != 0 else 16)
        cbw = (x1 - x0) // (8 if mode == 1 else 16)
        blocks = np.stack([(y1 - y0) // 8, (x1 - x0) // 8, cbh, cbw], 1).astype(np.int32)
        brc0 = np.stack([y0 // 8, x0 // 8], 1).astype(np.int32)
        dims = np.stack([y1 - y0, x1 - x0, np.full(n, mode)], 1).astype(np.int32)
        roi = np.stack([y - y0, x - x0, ch, cw], 1).astype(np.int32)
        cdiv_r = 2 if mode == 0 else 1
        cdiv_c = 1 if mode == 1 else 2
        c_brc0 = np.stack([brc0[:, 0] // cdiv_r, brc0[:, 1] // cdiv_c], 1)

        def grow(cur, want, align):
            want = int(-(-int(want) // align) * align)
            return max(want, cur)

        if getattr(self, "_canvas_mode", mode) != mode:
            canvases = [None] * len(canvases)  # stale mode: canvases restart
        self._canvas_mode = mode
        prev = canvases[1] or [0, 0, 0]
        BH = grow(prev[0], blocks[:, 0].max(), 8)
        BW = grow(prev[1], blocks[:, 1].max(), 8)
        prevc = canvases[3] or [0, 0, 0, 0]
        CBH = grow(prevc[1], blocks[:, 2].max(), {0: 4, 1: 8, 2: 8}[mode])
        CBW = grow(prevc[2], blocks[:, 3].max(), {0: 4, 1: 8, 2: 4}[mode])

        from ..executor import _FlatStaged

        y_n = blocks[:, 0].astype(np.int64) * blocks[:, 1]
        c_n = blocks[:, 2].astype(np.int64) * blocks[:, 3]
        need = (int(y_n.sum()), int((y_n * (ky * ky - 1)).sum()),
                int(2 * c_n.sum()), int((2 * c_n * (kc * kc - 1)).sum()))
        if not hasattr(self, "_flat_lens"):
            self._flat_lens = [0, 0, 0, 0]
        # fine-grained grow policy (matches executor._unsparse_boundary's
        # flat-wire chunking): 256K-element chunks,
        # 1.1x headroom on first growth so early batches don't recompile
        chunk = 1 << 18
        for j in range(4):
            want = need[j] if self._flat_lens[j] else int(need[j] * 1.1)
            self._flat_lens[j] = max(self._flat_lens[j], -(-want // chunk) * chunk)

        _prof.add("host.decode.rrc_windows", time.perf_counter() - _t_rrc)
        cache = self._coef_cache()
        keys = inp.source_info
        # content keys for the plane cache (see the zero-crop path);
        # _decode_idx_blobs fingerprints internally, so it takes raw keys
        ckeys = ([_content_key(k, d) for k, d in zip(keys, datas)]
                 if cache is not None and keys else None)
        pack_mode = self._use_pack_batch(ky, kc, cache, keys)
        with _prof.section("host.decode.entropy"):
            if pack_mode:
                r = native.jpeg_coeffs_split_flat_crop_pack_batch(
                    datas, ky, kc, blocks, brc0, self._flat_lens,
                    num_threads=self.pipeline.num_threads,
                    ring=self._wire_ring(), c_brc0=c_brc0,
                    idx_blobs=self._decode_idx_blobs(keys, infos, mode, n,
                                                     datas=datas),
                )
                pack_mode = r is not None
            if not pack_mode:
                if cache is not None and ckeys:
                    packed = self._stage_via_cache(cache, datas, ckeys, infos,
                                                   blocks, brc0, ky, kc)
                    r = None if packed is None else (*packed, [True] * n)
                else:
                    r = native.jpeg_coeffs_split_flat_crop_batch(
                        datas, ky, kc, blocks, brc0, self._flat_lens,
                        num_threads=self.pipeline.num_threads,
                        ring=self._wire_ring(), c_brc0=c_brc0,
                    )
        if r is None:
            return None
        yb = blocks[:, :2]
        cb = blocks[:, 2:]
        two = np.full((n, 1), 2, np.int32)
        y_shapes = np.concatenate([yb, np.full((n, 1), ky * ky - 1, np.int32)], 1)
        c_shapes = np.concatenate([two, cb, np.full((n, 1), kc * kc - 1, np.int32)], 1)
        stage_args = (y_shapes, c_shapes, yb.copy(), np.concatenate([two, cb], 1),
                      (BH, BW, ky * ky - 1), (2, CBH, CBW, kc * kc - 1),
                      (BH, BW), (2, CBH, CBW))
        if pack_mode:
            (y_dc, y_mask, y_vals, y_tot, c_dc, c_mask, c_vals, c_tot, q,
             offs, oks) = r
            if not all(oks):
                raise ValueError(
                    "JPEG coefficient read failed (corrupt sample in hybrid path)")
            with _prof.section("host.decode.sparse_pack"):
                y_dc_st, y_ac_st, c_dc_st, c_ac_st = self._stage_wire_packed(
                    y_dc, y_mask, y_vals, y_tot, c_dc, c_mask, c_vals, c_tot,
                    offs, *stage_args, int(y_n.sum()), int(2 * c_n.sum()),
                )
        else:
            y_dc, y_ac, c_dc, c_ac, q, offs, oks = r
            if not all(oks):
                raise ValueError(
                    "JPEG coefficient read failed (corrupt sample in hybrid path)")
            with _prof.section("host.decode.sparse_pack"):
                y_dc_st, y_ac_st, c_dc_st, c_ac_st = self._stage_wire(
                    y_dc, y_ac, c_dc, c_ac, offs, *stage_args,
                    int(y_n.sum()), int(2 * c_n.sum()), ky, kc,
                )
        return [
            y_dc_st,
            y_ac_st,
            c_dc_st,
            c_ac_st,
            (q, np.full((n, 1), q.shape[1], np.int32), ""),
            HostBatch([dims[i].copy() for i in range(n)], layout=""),
            HostBatch([roi[i].copy() for i in range(n)], layout=""),
        ]

    def run_batch(self, ctx, inp):
        raise RuntimeError("_JpegCoeffsSplitRRC requires the native runtime")


@register_operator("_JpegIdctSplitRRC", "gpu")
class JpegIdctSplitRRC(JpegIdctSplit):
    def host_output_shapes(self, ctx, input_shapes, input_batches):
        roi_hb = input_batches[6]
        if roi_hb is None:
            return None
        denom = int(self.spec.GetArgument("hybrid_scale", 1))
        n = len(roi_hb)
        out = np.zeros((n, 3), np.int32)
        for i, r in enumerate(roi_hb.samples):
            out[i] = (-(-int(r[2]) // denom), -(-int(r[3]) // denom), 3)
        return [out]

    def lower(self, dctx, ydc_b, yac_b, cdc_b, cac_b, q_b, dims_b, roi_b):
        import jax
        import jax.numpy as jnp

        (rgb_b,) = super().lower(dctx, ydc_b, yac_b, cdc_b, cac_b, q_b, dims_b)
        denom = int(self.spec.GetArgument("hybrid_scale", 1))
        roi = roi_b.data  # [N, 4] full-res residual window
        n, Hc, Wc, _ = rgb_b.data.shape
        dy = roi[:, 0] // denom
        dx = roi[:, 1] // denom
        ch = -(-roi[:, 2] // denom)
        cw = -(-roi[:, 3] // denom)

        def shift(img, oy, ox):
            img = jnp.take(img, jnp.clip(jnp.arange(Hc) + oy, 0, Hc - 1), axis=0)
            return jnp.take(img, jnp.clip(jnp.arange(Wc) + ox, 0, Wc - 1), axis=1)

        out = jax.vmap(shift)(rgb_b.data, dy.astype(jnp.int32), dx.astype(jnp.int32))
        shapes = jnp.stack([ch, cw, jnp.full((n,), 3, ch.dtype)], axis=1).astype(jnp.int32)
        return [DeviceBatch(out, shapes, "HWC")]

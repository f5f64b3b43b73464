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

import numpy as np

from .._schema import DALI_SCHEMA, ArgType, register_operator
from .. import imgcodec
from ..batch import HostBatch
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
    )


_decoder_schema("decoders.Image").DocStr(
    """Decodes images (JPEG/PNG/BMP/TIFF/WEBP) to HWC uint8 (reference
    ``decoders__Image``; ``imgcodec/decoder_schema.cc``). device='mixed' marks the
    output as device-resident: the executor pads it across the host→device boundary
    (the TPU analogue of DALI's CPU-parse + GPU-decode split)."""
)


class _ImageDecoderBase(Operator):
    def _decode(self, ctx, idx, encoded: np.ndarray) -> np.ndarray:
        out_type = self.spec.GetArgument("output_type", DALIImageType.RGB)
        img = imgcodec.decode(np.ascontiguousarray(encoded).tobytes(), output_type=out_type)
        return img

    def output_layout(self, output_idx, inputs):
        return "HWC"


@register_operator("decoders.Image", "cpu")
class ImageDecoderCPU(_ImageDecoderBase):
    def run_sample(self, ctx, idx, encoded):
        return self._decode(ctx, idx, encoded)


@register_operator("decoders.Image", "mixed")
class ImageDecoderMixed(_ImageDecoderBase):
    """Mixed decode: host entropy decode, output lives on the device side.

    The executor stages the ragged decoded batch to a padded device canvas; any
    downstream 'gpu' op (resize, CMN, ...) consumes it inside the jitted program.
    """

    def run_sample(self, ctx, idx, encoded):
        return self._decode(ctx, idx, encoded)


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
)
GetSchemaFix = None  # placeholder to keep module flat


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
    def run_sample(self, ctx, idx, encoded):
        img = self._decode(ctx, idx, encoded)
        rng = ctx.rng(self, idx)
        y, x, ch, cw = sample_rrc_window(
            rng,
            img.shape[0],
            img.shape[1],
            self.spec.GetArgument("random_area"),
            self.spec.GetArgument("random_aspect_ratio"),
            self.spec.GetArgument("num_attempts"),
        )
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
)


class _ImageCropBase(_ImageDecoderBase):
    def run_sample(self, ctx, idx, encoded):
        img = self._decode(ctx, idx, encoded)
        h, w = img.shape[:2]
        crop = self.spec.GetArgument("crop", None)
        ch = int(ctx.arg(self, "crop_h", idx, 0) or (crop[0] if crop else h))
        cw = int(ctx.arg(self, "crop_w", idx, 0) or (crop[1] if crop else w))
        py = float(ctx.arg(self, "crop_pos_y", idx, 0.5))
        px = float(ctx.arg(self, "crop_pos_x", idx, 0.5))
        ch, cw = min(ch, h), min(cw, w)
        y = int(round(py * (h - ch)))
        x = int(round(px * (w - cw)))
        return np.ascontiguousarray(img[y : y + ch, x : x + cw])


@register_operator("decoders.ImageCrop", "cpu")
class ImageCropCPU(_ImageCropBase):
    pass


@register_operator("decoders.ImageCrop", "mixed")
class ImageCropMixed(_ImageCropBase):
    pass


# -- PeekImageShape -----------------------------------------------------------------------------
DALI_SCHEMA("PeekImageShape").DocStr(
    "Image shape from the encoded header without decoding (reference "
    "``imgcodec/peek_image_shape.cc``)."
).NumInput(1).NumOutput(1).Devices("cpu").AddOptionalArg(
    "dtype", ArgType.DATA_TYPE, "Output dtype.", None
)


@register_operator("PeekImageShape", "cpu")
class PeekImageShape(Operator):
    def run_sample(self, ctx, idx, encoded):
        from ..types import to_numpy_type, INT64

        h, w, c = imgcodec.peek_shape(np.ascontiguousarray(encoded).tobytes())
        dtype = self.spec.GetArgument("dtype", None)
        np_dt = to_numpy_type(dtype) if dtype is not None else np.int64
        return np.array([h, w, c], dtype=np_dt)

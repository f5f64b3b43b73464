"""Remaining operator tail: noise ops, SSDRandomCrop, Reinterpret,
ResizeCropMirror, NemoAsr reader, generic Filter (gpu), TensorResize.

Reference: ``random/noise/{salt_and_pepper,shot}_noise.cc``, ``ssd/random_crop.cc``,
``generic/reshape.cc`` (Reinterpret), ``image/resize/resize_crop_mirror.cc``,
``reader/nemo_asr_loader.cc``, ``image/filter/filter.cc``.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .._schema import DALI_SCHEMA, ArgType, register_operator
from ..batch import DeviceBatch, HostBatch
from ..types import DALIDataType, DALIInterpType, to_jnp_type, to_numpy_type
from .base import Operator
from .readers import BaseReader

# ====================================== noise ops ===================================================

DALI_SCHEMA("noise.SaltAndPepper").DocStr(
    "Salt-and-pepper noise (reference noise/salt_and_pepper_noise.cc)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddRandomSeedArg().AddOptionalArg(
    "prob", ArgType.FLOAT, "Probability a pixel is corrupted.", 0.05, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "salt_vs_pepper", ArgType.FLOAT, "Fraction of corrupted pixels that are salt.", 0.5, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "salt_val", ArgType.FLOAT, "Salt value (default dtype max).", None
).AddOptionalArg(
    "pepper_val", ArgType.FLOAT, "Pepper value (default dtype min).", None
).AddOptionalArg("per_channel", ArgType.BOOL, "Corrupt channels independently.", False)


def _sp_vals(spec, dtype):
    salt = spec.GetArgument("salt_val", None)
    pepper = spec.GetArgument("pepper_val", None)
    if np.issubdtype(dtype, np.integer):
        info = np.iinfo(dtype)
        return (info.max if salt is None else salt), (info.min if pepper is None else pepper)
    return (1.0 if salt is None else salt), (0.0 if pepper is None else pepper)


@register_operator("noise.SaltAndPepper", "cpu")
class SaltAndPepperCPU(Operator):
    def run_sample(self, ctx, idx, x):
        rng = ctx.rng(self, idx)
        prob = float(np.asarray(ctx.arg(self, "prob", idx, 0.05)))
        svp = float(np.asarray(ctx.arg(self, "salt_vs_pepper", idx, 0.5)))
        salt, pepper = _sp_vals(self.spec, x.dtype)
        shape = x.shape if self.spec.GetArgument("per_channel", False) else x.shape[:-1] + (1,)
        u = rng.random(shape)
        out = x.copy()
        out = np.where(np.broadcast_to(u < prob * svp, x.shape), np.asarray(salt, x.dtype), out)
        out = np.where(
            np.broadcast_to((u >= prob * svp) & (u < prob), x.shape), np.asarray(pepper, x.dtype), out
        )
        return out


@register_operator("noise.SaltAndPepper", "gpu")
class SaltAndPepperGPU(Operator):
    def lower(self, dctx, inp: DeviceBatch):
        import jax
        import jax.numpy as jnp

        prob = dctx.arg(self, "prob", 0.05)
        svp = dctx.arg(self, "salt_vs_pepper", 0.5)
        salt, pepper = _sp_vals(self.spec, np.dtype(str(inp.data.dtype)))
        shape = inp.data.shape if self.spec.GetArgument("per_channel", False) else inp.data.shape[:-1] + (1,)
        u = jax.random.uniform(dctx.key(self), shape)
        n = inp.data.shape[0]
        if hasattr(prob, "ndim") and getattr(prob, "ndim", 0) >= 1:
            prob = prob.reshape(n, *([1] * (len(shape) - 1)))
        if hasattr(svp, "ndim") and getattr(svp, "ndim", 0) >= 1:
            svp = svp.reshape(n, *([1] * (len(shape) - 1)))
        out = jnp.where(u < prob * svp, jnp.asarray(salt, inp.data.dtype), inp.data)
        out = jnp.where((u >= prob * svp) & (u < prob), jnp.asarray(pepper, inp.data.dtype), out)
        return [inp.with_data(out)]


DALI_SCHEMA("noise.Shot").DocStr(
    "Shot (Poisson) noise (reference noise/shot_noise.cc): out ~ Poisson(x / factor) * factor."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddRandomSeedArg().AddOptionalArg(
    "factor", ArgType.FLOAT, "Noise factor.", 20.0, tensor_ok=True, per_sample=True
)


@register_operator("noise.Shot", "cpu")
class ShotNoiseCPU(Operator):
    def run_sample(self, ctx, idx, x):
        rng = ctx.rng(self, idx)
        factor = float(np.asarray(ctx.arg(self, "factor", idx, 20.0)))
        if factor <= 0:
            return x.copy()
        lam = x.astype(np.float64) / factor
        out = rng.poisson(lam).astype(np.float64) * factor
        if np.issubdtype(x.dtype, np.integer):
            info = np.iinfo(x.dtype)
            out = np.clip(out, info.min, info.max)
        return out.astype(x.dtype)


# ====================================== SSDRandomCrop ================================================

DALI_SCHEMA("SSDRandomCrop").DocStr(
    "Legacy fused SSD crop (reference ssd/random_crop.cc): IoU-constrained window "
    "applied to the image, boxes, and labels together."
).NumInput(3).NumOutput(3).Devices("cpu").AddRandomSeedArg().AddOptionalArg(
    "num_attempts", ArgType.INT, "Sampling attempts.", 1
)


@register_operator("SSDRandomCrop", "cpu")
class SSDRandomCrop(Operator):
    def run_batch(self, ctx, imgs: HostBatch, boxes: HostBatch, labels: HostBatch):
        from .bbox import RandomBBoxCrop, _iou

        rng = ctx.rng(self)
        out_imgs, out_boxes, out_labels = [], [], []
        thresholds = [None, 0.1, 0.3, 0.5, 0.7, 0.9]
        attempts = self.spec.GetArgument("num_attempts", 1)
        for i in range(len(imgs)):
            img = imgs.samples[i]
            bxs = boxes.samples[i].reshape(-1, 4).astype(np.float32)
            lbl = labels.samples[i].reshape(-1)
            h, w = img.shape[:2]
            done = False
            while not done:
                thr = thresholds[int(rng.integers(0, len(thresholds)))]
                if thr is None:
                    out_imgs.append(img)
                    out_boxes.append(bxs)
                    out_labels.append(lbl.astype(np.int32))
                    done = True
                    break
                for _ in range(max(attempts, 1)):
                    cw = rng.uniform(0.3, 1.0)
                    chh = rng.uniform(0.3, 1.0)
                    if not (0.5 <= cw / chh <= 2.0):
                        continue
                    x0 = rng.uniform(0, 1 - cw)
                    y0 = rng.uniform(0, 1 - chh)
                    win = np.array([x0, y0, x0 + cw, y0 + chh], np.float32)
                    if bxs.shape[0]:
                        centers = (bxs[:, :2] + bxs[:, 2:]) / 2
                        inside = (
                            (centers[:, 0] >= win[0]) & (centers[:, 0] <= win[2])
                            & (centers[:, 1] >= win[1]) & (centers[:, 1] <= win[3])
                        )
                        if not inside.any() or (_iou(bxs, win)[inside] < thr).any():
                            continue
                        kept = bxs[inside].copy()
                        kept[:, [0, 2]] = (np.clip(kept[:, [0, 2]], win[0], win[2]) - win[0]) / cw
                        kept[:, [1, 3]] = (np.clip(kept[:, [1, 3]], win[1], win[3]) - win[1]) / chh
                        new_lbl = lbl[inside].astype(np.int32)
                    else:
                        kept = bxs
                        new_lbl = lbl.astype(np.int32)
                    ix0, iy0 = int(x0 * w), int(y0 * h)
                    iw, ih = max(int(cw * w), 1), max(int(chh * h), 1)
                    out_imgs.append(np.ascontiguousarray(img[iy0 : iy0 + ih, ix0 : ix0 + iw]))
                    out_boxes.append(kept)
                    out_labels.append(new_lbl)
                    done = True
                    break
        return [
            HostBatch(out_imgs, layout=imgs.layout),
            HostBatch(out_boxes),
            HostBatch(out_labels),
        ]


# ====================================== Reinterpret ==================================================

DALI_SCHEMA("Reinterpret").DocStr(
    "Reinterprets the underlying bytes with a new dtype and/or shape "
    "(reference generic/reshape.cc Reinterpret)."
).NumInput(1, 2).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
    "dtype", ArgType.DATA_TYPE, "New dtype (bit reinterpret).", None
).AddOptionalArg(
    "shape", ArgType.FLOAT_VEC, "New shape (-1 infers).", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "rel_shape", ArgType.FLOAT_VEC, "Shape relative to input.", None
).AddOptionalArg("layout", ArgType.TENSOR_LAYOUT, "New layout.", None)


@register_operator("Reinterpret", "cpu")
class Reinterpret(Operator):
    def run_sample(self, ctx, idx, x, *shape_in):
        dt = self.spec.GetArgument("dtype", None)
        out = x.view(to_numpy_type(dt)) if dt is not None else x
        shape = None
        if shape_in:
            shape = [int(v) for v in np.asarray(shape_in[0]).reshape(-1)]
        else:
            v = ctx.arg(self, "shape", idx, None)  # constant OR tensor arg
            if v is not None:
                shape = [int(round(float(s))) for s in np.asarray(v).reshape(-1)]
        if shape is not None:
            total = out.size
            if -1 in shape:
                known = int(np.prod([v for v in shape if v != -1]))
                shape[shape.index(-1)] = total // max(known, 1)
            out = out.reshape(shape)
        return out

    def output_layout(self, j, inputs):
        return self.spec.GetArgument("layout", None) or ""


@register_operator("Reinterpret", "gpu")
class ReinterpretGPU(Operator):
    """Device lowering (reference reshape.cc GPU registration): a dtype
    reinterpret is a bitcast on the LAST canvas axis (narrower dtypes widen
    it by the itemsize ratio, wider dtypes require divisibility and shrink
    it); a static `shape` reshapes uniform batches. Per-sample shape inputs
    are cpu-only (a padded canvas cannot hold per-sample reshapes)."""

    def lower(self, dctx, inp: DeviceBatch, *shape_in):
        import jax
        import jax.numpy as jnp

        if shape_in or dctx.has_tensor_arg(self, "shape"):
            raise ValueError(
                "Reinterpret(gpu): per-sample shapes are cpu-only "
                "(fn.reshape supports per-sample tensor shapes on gpu)")
        data = inp.data
        shapes = inp.shapes
        dt = self.spec.GetArgument("dtype", None)
        if dt is not None:
            new = to_jnp_type(dt)
            old_sz = jnp.dtype(data.dtype).itemsize
            new_sz = jnp.dtype(new).itemsize
            if new_sz == old_sz:
                data = jax.lax.bitcast_convert_type(data, new)
            elif new_sz < old_sz:
                r = old_sz // new_sz
                d2 = jax.lax.bitcast_convert_type(data, new)  # [..., W, r]
                data = d2.reshape(d2.shape[:-2] + (d2.shape[-2] * r,))
                if shapes is not None:  # ragged extents scale exactly
                    last = shapes[:, -1] * r
                    shapes = jnp.concatenate([shapes[:, :-1], last[:, None]], axis=1)
            else:
                r = new_sz // old_sz
                if shapes is not None:
                    # per-sample divisibility cannot be checked at trace time
                    raise ValueError(
                        "Reinterpret(gpu): widening dtype reinterpret of a "
                        "ragged batch is cpu-only (per-sample extents must "
                        "divide by the itemsize ratio)")
                if data.shape[-1] % r:
                    raise ValueError(
                        "Reinterpret(gpu): last extent not divisible by the "
                        "itemsize ratio")
                d2 = data.reshape(data.shape[:-1] + (data.shape[-1] // r, r))
                data = jax.lax.bitcast_convert_type(d2, new)
        req = self.spec.GetArgument("shape", None)
        if req is not None:
            if shapes is not None:
                raise ValueError(
                    "Reinterpret(gpu): static `shape` on a ragged batch is "
                    "cpu-only (the padded canvas cannot reshape per sample)")
            shape = [int(round(v)) for v in req]
            total = int(np.prod(data.shape[1:]))
            if -1 in shape:
                known = int(np.prod([v for v in shape if v != -1]))
                shape[shape.index(-1)] = total // max(known, 1)
            data = data.reshape((data.shape[0],) + tuple(shape))
        return [DeviceBatch(data, shapes,
                            self.spec.GetArgument("layout", None) or "")]


# ====================================== ResizeCropMirror ==============================================


def _resize_crop_mirror_schema(name):
    from .image import DALI_SCHEMA as _  # noqa: F401  (schema fn shared)

    s = DALI_SCHEMA(name).DocStr(
        "Fused resize + crop + mirror (reference image/resize/resize_crop_mirror.h)."
    ).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
        "resize_x", ArgType.FLOAT, "Output width.", 0.0, tensor_ok=True, per_sample=True
    ).AddOptionalArg(
        "resize_y", ArgType.FLOAT, "Output height.", 0.0, tensor_ok=True, per_sample=True
    ).AddOptionalArg(
        "resize_shorter", ArgType.FLOAT, "Resize shorter edge.", 0.0, tensor_ok=True, per_sample=True
    ).AddOptionalArg(
        "crop", ArgType.FLOAT_VEC, "Crop size (H, W).", None
    ).AddOptionalArg(
        "crop_pos_x", ArgType.FLOAT, "Crop x position.", 0.5, tensor_ok=True, per_sample=True
    ).AddOptionalArg(
        "crop_pos_y", ArgType.FLOAT, "Crop y position.", 0.5, tensor_ok=True, per_sample=True
    ).AddOptionalArg(
        "mirror", ArgType.INT, "Horizontal mirror flag.", 0, tensor_ok=True, per_sample=True
    ).AddOptionalArg(
        "interp_type", ArgType.INTERP_TYPE, "Interpolation.", DALIInterpType.INTERP_LINEAR
    ).AddOptionalArg(
        "antialias", ArgType.BOOL, "Antialiasing for downscaling.", True
    ).AddOptionalArg(
        "mag_filter", ArgType.INTERP_TYPE, "Filter for upscaling.", None
    ).AddOptionalArg(
        "min_filter", ArgType.INTERP_TYPE, "Filter for downscaling.", None
    ).AddOptionalArg(
        "resize_longer", ArgType.FLOAT, "Resize longer edge.", 0.0, tensor_ok=True, per_sample=True
    ).AddOptionalArg(
        "size", ArgType.FLOAT_VEC, "Output size (H, W).", None, tensor_ok=True, per_sample=True
    ).AddOptionalArg(
        "mode", ArgType.STRING, '"default", "stretch", "not_larger", "not_smaller".', "default"
    ).AddOptionalArg(
        "roi_start", ArgType.FLOAT_VEC, "Input ROI origin.", None, tensor_ok=True, per_sample=True
    ).AddOptionalArg(
        "roi_end", ArgType.FLOAT_VEC, "Input ROI end.", None, tensor_ok=True, per_sample=True
    ).AddOptionalArg(
        "roi_relative", ArgType.BOOL, "ROI given in relative [0,1] coords.", False
    ).AddOptionalArg(
        "subpixel_scale", ArgType.BOOL, "Adjust scale for fractional sizes.", True
    ).AddOptionalArg(
        "crop_w", ArgType.FLOAT, "Crop width.", 0.0, tensor_ok=True, per_sample=True
    ).AddOptionalArg(
        "crop_h", ArgType.FLOAT, "Crop height.", 0.0, tensor_ok=True, per_sample=True
    ).AddOptionalArg(
        "dtype", ArgType.DATA_TYPE, "Output dtype.", None
    ).AddOptionalArg(
        "crop_d", ArgType.FLOAT, "Volumetric crop depth (unsupported here).", 0.0
    ).AddOptionalArg(
        "crop_pos_z", ArgType.FLOAT, "Volumetric z pos.", 0.5
    ).AddOptionalArg(
        "resize_z", ArgType.FLOAT, "Volumetric resize depth (unsupported here).", 0.0
    ).AddOptionalArg(
        "rounding", ArgType.STRING,
        'Crop-start integer conversion: "round" or "truncate" (crop_attr.cc).',
        "round"
    ).AddOptionalArg(
        "minibatch_size", ArgType.INT,
        "Reference GPU kernel batching hint; accepted for compatibility.", 32
    ).AddOptionalArg(
        "temp_buffer_hint", ArgType.INT,
        "Reference GPU scratch-size hint; accepted for compatibility.", 0)
    return s


_resize_crop_mirror_schema("ResizeCropMirror")
_resize_crop_mirror_schema("FastResizeCropMirror")


class _RCMBase(Operator):
    """cpu ResizeCropMirror/FastResizeCropMirror: ONE fused resample on the
    framework's own tap-plan resampler — the crop window maps back through
    the resize scale into an input ROI, exactly the math of the gpu lowering
    (_RCMGPU.host_params), so cpu == gpu is bit-controlled and RCM shares
    Resize's pixels. The reference derives the whole family from its one
    resampling kernel the same way
    (dali/operators/image/resize/resize_crop_mirror.h:1-60,
    dali/kernels/imgproc/resample/separable.h)."""

    def run_sample(self, ctx, idx, img):
        from ..kernels.resample import host_resample
        from .generic2 import _crop_round
        from .image import _pick_filter, compute_resize_size

        spec = self.spec
        h, w = img.shape[:2]
        iy0 = ix0 = 0.0
        # optional input ROI (reference ResizeAttr roi_start/roi_end) —
        # float start + rounded extent, identical to _RCMGPU.host_params
        rs = ctx.arg(self, "roi_start", idx, None)
        re_ = ctx.arg(self, "roi_end", idx, None)
        if rs is not None or re_ is not None:
            rel = spec.GetArgument("roi_relative", False)
            s0 = np.asarray(rs if rs is not None else ([0.0, 0.0] if rel else [0, 0]), np.float64)
            e0 = np.asarray(re_ if re_ is not None else ([1.0, 1.0] if rel else [h, w]), np.float64)
            if rel:
                s0 = s0 * [h, w]
                e0 = e0 * [h, w]
            iy0, ix0 = float(s0[0]), float(s0[1])
            h = max(int(round(e0[0])) - int(round(s0[0])), 1)
            w = max(int(round(e0[1])) - int(round(s0[1])), 1)
        out_h, out_w = compute_resize_size(h, w, spec, lambda n, d=None: ctx.arg(self, n, idx, d))
        crop = spec.GetArgument("crop", None)
        if not crop:
            ch_ = int(np.asarray(ctx.arg(self, "crop_h", idx, 0.0)) or 0)
            cw_ = int(np.asarray(ctx.arg(self, "crop_w", idx, 0.0)) or 0)
            if ch_ and cw_:
                crop = [ch_, cw_]
        if crop:
            ch, cw = int(crop[0]), int(crop[1])
            py = float(np.asarray(ctx.arg(self, "crop_pos_y", idx, 0.5)))
            px = float(np.asarray(ctx.arg(self, "crop_pos_x", idx, 0.5)))
            rnd = spec.GetArgument("rounding", "round")
            y = max(_crop_round(py * (out_h - ch), rnd), 0)
            x = max(_crop_round(px * (out_w - cw), rnd), 0)
            sy, sx = h / out_h, w / out_w
            roi_start = (iy0 + y * sy, ix0 + x * sx)
            roi_size = (ch * sy, cw * sx)
            to_h, to_w = ch, cw
        else:
            roi_start, roi_size = (iy0, ix0), (float(h), float(w))
            to_h, to_w = out_h, out_w
        interp = _pick_filter(spec, out_h < h or out_w < w)
        dt = spec.GetArgument("dtype", None)
        out = host_resample(img, to_h, to_w, interp,
                            spec.GetArgument("antialias", True),
                            roi_start, roi_size,
                            out_dtype=to_numpy_type(dt) if dt is not None else None)
        if out.ndim == 2:
            out = out[:, :, None]
        if int(np.asarray(ctx.arg(self, "mirror", idx, 0))):
            out = out[:, ::-1]
        return np.ascontiguousarray(out)

    def output_layout(self, j, inputs):
        return "HWC"


register_operator("ResizeCropMirror", "cpu")(type("ResizeCropMirror", (_RCMBase,), {}))
register_operator("FastResizeCropMirror", "cpu")(type("FastResizeCropMirror", (_RCMBase,), {}))


class _RCMGPU(Operator):
    """Device RCM: resize→crop→mirror collapses into ONE resample with a
    per-sample input ROI (the crop window mapped back through the resize
    scale), so the fused kernel the reference implements by hand
    (resize_crop_mirror.h) falls out of the existing gather resampler. The
    crop extent must be batch-static (it fixes the output canvas); per-sample
    tensor crop sizes need the cpu backend."""

    def _crop_size(self):
        crop = self.spec.GetArgument("crop", None)
        if crop:
            return int(crop[0]), int(crop[1])
        for nm in ("crop_h", "crop_w"):
            if nm in self.spec.arg_inputs:
                raise ValueError(
                    f"{self.spec.schema_name}(gpu): per-sample tensor {nm} is "
                    "cpu-only (the crop extent fixes the device output shape)")
        ch = int(self.spec.GetArgument("crop_h", 0.0) or 0)
        cw = int(self.spec.GetArgument("crop_w", 0.0) or 0)
        if ch and cw:
            return ch, cw
        return None  # no crop: pure resize

    def host_params(self, ctx, input_shapes):
        from .generic2 import _crop_round
        from .image import compute_resize_size

        shapes = input_shapes[0]
        if shapes is None:
            raise RuntimeError(
                f"{self.spec.schema_name}(gpu) requires direct boundary input shapes")
        cs = self._crop_size()
        n = shapes.shape[0]
        roi = np.zeros((n, 4), np.float32)  # y0, x0, h, w in input pixels
        out_sizes = np.zeros((n, 2), np.int32)
        rnd = self.spec.GetArgument("rounding", "round")
        rel = self.spec.GetArgument("roi_relative", False)
        for i in range(n):
            h, w = int(shapes[i][0]), int(shapes[i][1])
            iy0, ix0 = 0.0, 0.0
            rs = ctx.arg(self, "roi_start", i, None)
            re_ = ctx.arg(self, "roi_end", i, None)
            if rs is not None or re_ is not None:
                s0 = np.asarray(rs if rs is not None else ([0.0, 0.0] if rel else [0, 0]), np.float64)
                e0 = np.asarray(re_ if re_ is not None else ([1.0, 1.0] if rel else [h, w]), np.float64)
                if rel:
                    s0, e0 = s0 * [h, w], e0 * [h, w]
                iy0, ix0 = float(s0[0]), float(s0[1])
                h = max(int(round(e0[0])) - int(round(s0[0])), 1)
                w = max(int(round(e0[1])) - int(round(s0[1])), 1)
            oh, ow = compute_resize_size(h, w, self.spec,
                                         lambda nm, d=None: ctx.arg(self, nm, i, d))
            out_sizes[i] = (oh, ow)
            if cs is None:
                roi[i] = (iy0, ix0, h, w)
                continue
            ch, cw = cs
            py = float(np.asarray(ctx.arg(self, "crop_pos_y", i, 0.5)))
            px = float(np.asarray(ctx.arg(self, "crop_pos_x", i, 0.5)))
            y = max(_crop_round(py * (oh - ch), rnd), 0)
            x = max(_crop_round(px * (ow - cw), rnd), 0)
            sy, sx = h / oh, w / ow
            roi[i] = (iy0 + y * sy, ix0 + x * sx, ch * sy, cw * sx)
        if cs is None:
            # pure resize: batch-uniform OUTPUT size only (per-sample sizes
            # need the grow-canvas machinery of fn.resize)
            ohw = {(int(r[0]), int(r[1])) for r in out_sizes}
            if len(ohw) > 1:
                raise ValueError(
                    f"{self.spec.schema_name}(gpu) without `crop` needs a "
                    "batch-uniform output size; use fn.resize for per-sample "
                    "sizes")
            self._nocrop_ohw = next(iter(ohw))
        # mag/min filter choice latches on the first batch (jit cache key),
        # like Resize._choose_filter
        if getattr(self, "_filter", None) is None and (
                self.spec.GetArgument("mag_filter", None) is not None
                or self.spec.GetArgument("min_filter", None) is not None):
            from .image import _pick_filter

            ohw = (np.tile(np.array([cs], np.float32), (n, 1)) if cs
                   else out_sizes.astype(np.float32))
            down = int((roi[:, 2] > ohw[:, 0]).sum() + (roi[:, 3] > ohw[:, 1]).sum())
            up = int((roi[:, 2] < ohw[:, 0]).sum() + (roi[:, 3] < ohw[:, 1]).sum())
            self._filter = int(_pick_filter(self.spec, down >= up))
        return {"rcm_roi": roi}

    def device_statics(self, ctx, input_shapes):
        cs = self._crop_size()
        filt = getattr(self, "_filter", None)
        if cs is not None:
            return (*cs, filt)
        # no crop: the uniform output size computed (and validated) by
        # host_params, which the executor runs first
        return (*self._nocrop_ohw, filt)

    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp

        from ..kernels import resample as resample_kernel

        out_h, out_w, filt = dctx.static(self)
        spec = self.spec
        interp = (DALIInterpType(filt) if filt is not None
                  else spec.GetArgument("interp_type", DALIInterpType.INTERP_LINEAR))
        antialias = bool(spec.GetArgument("antialias", True))
        dtype_arg = spec.GetArgument("dtype", None)
        out_dtype = to_jnp_type(dtype_arg) if dtype_arg is not None else inp.data.dtype
        roi = dctx.param(self, "rcm_roi")
        ext = inp.shapes
        if ext is None:
            ext = jnp.tile(jnp.array([[inp.data.shape[1], inp.data.shape[2]]], jnp.int32),
                           (inp.data.shape[0], 1))
        data = resample_kernel.resample_batch(
            inp.data, ext, roi[:, 0:2], roi[:, 2:4], out_h, out_w,
            interp, antialias, out_dtype)
        n = data.shape[0]
        mirror = dctx.arg(self, "mirror", 0)
        if dctx.has_tensor_arg(self, "mirror"):
            m = jnp.asarray(mirror).reshape(-1).astype(bool)
            data = jnp.where(m[:, None, None, None], data[:, :, ::-1, :], data)
        elif int(np.asarray(mirror)):
            data = data[:, :, ::-1, :]
        return [DeviceBatch(data, None, inp.layout or "HWC")]

    def output_layout(self, j, inputs):
        return "HWC"


register_operator("ResizeCropMirror", "gpu")(type("ResizeCropMirrorGPU", (_RCMGPU,), {}))
register_operator("FastResizeCropMirror", "gpu")(type("FastResizeCropMirrorGPU", (_RCMGPU,), {}))


# ====================================== readers.NemoAsr ==============================================

DALI_SCHEMA("readers.NemoAsr").DocStr(
    "Reads NeMo ASR manifests (reference ``readers__NemoAsr``, nemo_asr_loader.cc): "
    "JSON-lines with audio_filepath/duration/text. Outputs (audio, sample_rate, "
    "transcript bytes)."
).NumInput(0).OutputFn(
    lambda spec: (1 + (1 if spec.GetArgument("read_sample_rate", True) else 0)
                  + (1 if spec.GetArgument("read_text", True) else 0)
                  + (1 if spec.GetArgument("read_idxs", False) else 0))
).Devices(
    "cpu"
).MakeReader().AddArg(
    "manifest_filepaths", ArgType.STRING_VEC, "Manifest JSON-lines files."
).AddOptionalArg(
    "sample_rate", ArgType.FLOAT, "Resample target (0 = keep).", 0.0
).AddOptionalArg(
    "read_sample_rate", ArgType.BOOL,
    "Output the sample rate as a separate output (reference "
    "nemo_asr_reader_op.cc).", True
).AddOptionalArg(
    "read_text", ArgType.BOOL, "Also output transcripts.", True
).AddOptionalArg(
    "read_idxs", ArgType.BOOL,
    "Output each sample's manifest index as a separate output.", False
).AddOptionalArg(
    "downmix", ArgType.BOOL, "Downmix to mono.", True
).AddOptionalArg(
    "min_duration", ArgType.FLOAT, "Skip shorter clips.", 0.0
).AddOptionalArg(
    "max_duration", ArgType.FLOAT, "Skip longer clips (0 = inf).", 0.0
).AddOptionalArg(
    "quality", ArgType.FLOAT, "Resampling quality (0..100; hint).", 50.0
).AddOptionalArg(
    "dtype", ArgType.DATA_TYPE,
    "Audio output dtype: FLOAT (default) or INT16 (reference "
    "nemo_asr_reader_op.cc `dtype`).", DALIDataType.FLOAT)


@register_operator("readers.NemoAsr", "cpu")
class NemoAsrReader(BaseReader):
    def __init__(self, spec, op_id):
        super().__init__(spec, op_id)
        self._entries = None

    def _build_index(self):
        if self._entries is not None:
            return
        spec = self.spec
        lo = spec.GetArgument("min_duration", 0.0)
        hi = spec.GetArgument("max_duration", 0.0)
        paths = spec.GetArgument("manifest_filepaths")
        if isinstance(paths, str):
            paths = [paths]
        self._entries = []
        for mp in paths:
            base = os.path.dirname(os.path.abspath(mp))
            with open(mp) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    e = json.loads(line)
                    dur = float(e.get("duration", 0.0))
                    if dur < lo or (hi > 0 and dur > hi):
                        continue
                    ap = e["audio_filepath"]
                    if not os.path.isabs(ap):
                        ap = os.path.join(base, ap)
                    self._entries.append((ap, e.get("text", "")))
        if not self._entries:
            raise ValueError("readers.nemo_asr found no usable manifest entries")

    def _num_samples(self):
        return len(self._entries)

    def _read_payload(self, index: int):
        from .audio import _resample_audio, decode_audio

        path, text = self._entries[index]
        with open(path, "rb") as f:
            audio, rate = decode_audio(f.read())  # WAV builtin; FLAC/OGG via FFmpeg
        if self.spec.GetArgument("downmix", True) and audio.ndim == 2:
            audio = audio.mean(axis=1)
        target = self.spec.GetArgument("sample_rate", 0.0)
        if target and target > 0:
            audio = _resample_audio(audio, rate, target)
            rate = target
        dt = self.spec.GetArgument("dtype", DALIDataType.FLOAT)
        if dt == DALIDataType.INT16:
            audio = np.clip(np.round(np.asarray(audio, np.float32) * 32767.0),
                            -32768, 32767).astype(np.int16)
            outs = (audio,)
        else:
            outs = (audio.astype(to_numpy_type(dt)),)
        if self.spec.GetArgument("read_sample_rate", True):
            outs += (np.float32(rate),)
        if self.spec.GetArgument("read_text", True):
            outs += (np.frombuffer(text.encode(), np.uint8).copy(),)
        if self.spec.GetArgument("read_idxs", False):
            outs += (np.array([index], np.int64),)
        return outs


# ====================================== Filter (gpu) ==================================================


@register_operator("experimental.Filter", "gpu")
class FilterGPU(Operator):
    """General 2D correlation with per-sample kernels via vmapped XLA conv."""

    def lower(self, dctx, img_b: DeviceBatch, kern_b: DeviceBatch, *fill):
        import jax
        import jax.numpy as jnp
        from jax import lax

        kh, kw = int(kern_b.data.shape[1]), int(kern_b.data.shape[2])
        ph, pw = kh // 2, kw // 2

        def one(img, k):
            x = img.astype(jnp.float32)
            C = x.shape[-1]
            xp = jnp.pad(x, ((ph, kh - 1 - ph), (pw, kw - 1 - pw), (0, 0)), mode="reflect")
            rhs = jnp.broadcast_to(k[::-1, ::-1, None, None].astype(jnp.float32), (kh, kw, 1, C))
            # correlation = convolution with flipped kernel; flip back for corr
            rhs = rhs[::-1, ::-1]
            out = lax.conv_general_dilated(
                xp[None], rhs, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
            )
            return out[0]

        out = jax.vmap(one)(img_b.data, kern_b.data)
        dt = img_b.data.dtype
        if jnp.issubdtype(dt, jnp.integer):
            info = jnp.iinfo(dt)
            out = jnp.clip(jnp.round(out), info.min, info.max)
        return [img_b.with_data(out.astype(dt))]

"""Image geometry & normalization operators.

Reference: ``dali/operators/image/resize/`` (ResizeAttr size logic), ``image/crop/``
(CropMirrorNormalize), ``generic/flip.cc``. Device lowerings ride the kernels in
:mod:`dali_tpu.kernels` — the per-sample-ROI separable resampler and the fused CMN.
CPU implementations use OpenCV/numpy so cpu-only pipelines work everywhere.
"""

from __future__ import annotations

import numpy as np

from .._schema import DALI_SCHEMA, ArgType, register_operator
from ..batch import DeviceBatch, HostBatch
from ..kernels import cmn as cmn_kernel
from ..kernels import resample as resample_kernel
from ..types import DALIDataType, DALIImageType, DALIInterpType, to_jnp_type, to_numpy_type
from .base import Operator
from .decoders import sample_rrc_window




def _fold_frames(inp):
    """Fold the frame dim of an FHWC DeviceBatch into the batch dim so 2D
    image kernels apply per frame (AllowSequences support). Ragged batches
    fold their per-sample (H, W, C) extents per frame; canvas-padding frames
    past a sample's logical F are processed wastefully and trimmed by the
    restored shapes. Returns (folded_batch, unfold) where unfold(db)
    restores [N, F, ...]."""
    import jax.numpy as jnp

    if not (inp.layout or "").startswith("F"):
        return inp, None
    n, f = inp.data.shape[0], inp.data.shape[1]
    fsh = None
    if inp.shapes is not None:
        fsh = jnp.repeat(inp.shapes[:, 1:], f, axis=0)
    folded = DeviceBatch(inp.data.reshape(n * f, *inp.data.shape[2:]), fsh, inp.layout[1:])

    def unfold(db):
        sh = None
        if db.shapes is not None:
            per = db.shapes[::f]
            fcol = (inp.shapes[:, :1] if inp.shapes is not None
                    else jnp.full((n, 1), f, jnp.int32))
            sh = jnp.concatenate([fcol.astype(per.dtype), per], axis=1)
        elif inp.shapes is not None:
            hw = jnp.tile(jnp.asarray([list(db.data.shape[1:])], jnp.int32), (n, 1))
            sh = jnp.concatenate([inp.shapes[:, :1].astype(jnp.int32), hw], axis=1)
        return DeviceBatch(
            db.data.reshape(n, f, *db.data.shape[1:]),
            sh,
            "F" + db.layout if db.layout and not db.layout.startswith("F") else ("F" + (inp.layout[1:] or "HWC") if not db.layout else db.layout),
        )

    return folded, unfold


# =================================== Resize =====================================================

DALI_SCHEMA("Resize").DocStr(
    """Resizes images with per-sample sizes/ROI (reference ``image/resize/resize.cc``,
    ``resize_attr.cc``). Device path: gather-based separable resampler traced into
    the jitted program."""
).NumInput(1).OutputFn(
    lambda spec: 1 + int(bool(spec.GetArgument("save_attrs", False)))
).Devices("cpu", "gpu").AllowSequences().AddOptionalArg(
    "save_attrs", ArgType.BOOL,
    "Add a second output with each sample's ORIGINAL input shape (int32), "
    "reference resize.cc `save_attrs` (used by SSD-style recipes).", False
).AddOptionalArg(
    "resize_z", ArgType.FLOAT,
    "Output depth for volumetric (DHWC) inputs.", 0.0,
    tensor_ok=True, per_sample=True
).AddOptionalArg(
    "minibatch_size", ArgType.INT,
    "Reference GPU kernel batching hint; accepted for compatibility (XLA "
    "handles the whole batch in one program here).", 32
).AddOptionalArg(
    "temp_buffer_hint", ArgType.INT,
    "Reference GPU scratch-size hint; accepted for compatibility.", 0
).AddOptionalArg(
    "resize_x", ArgType.FLOAT, "Output width (0 = keep aspect).", 0.0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "resize_y", ArgType.FLOAT, "Output height (0 = keep aspect).", 0.0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "resize_shorter", ArgType.FLOAT, "Resize shorter edge, keep aspect.", 0.0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "resize_longer", ArgType.FLOAT, "Resize longer edge, keep aspect.", 0.0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "size", ArgType.FLOAT_VEC, "Output size (H, W).", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "mode", ArgType.STRING, '"default", "stretch", "not_larger", "not_smaller".', "default"
).AddOptionalArg(
    "interp_type", ArgType.INTERP_TYPE, "Interpolation filter.", DALIInterpType.INTERP_LINEAR
).AddOptionalArg(
    "mag_filter", ArgType.INTERP_TYPE, "Filter for upscaling.", None
).AddOptionalArg(
    "min_filter", ArgType.INTERP_TYPE, "Filter for downscaling.", None
).AddOptionalArg(
    "antialias", ArgType.BOOL, "Antialiasing for downscaling.", True
).AddOptionalArg(
    "dtype", ArgType.DATA_TYPE, "Output dtype (default: input dtype).", None
).AddOptionalArg(
    "max_size", ArgType.FLOAT_VEC, "Upper bound on output size.", None
).AddOptionalArg(
    "roi_start", ArgType.FLOAT_VEC, "Input ROI origin.", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "roi_end", ArgType.FLOAT_VEC, "Input ROI end.", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "roi_relative", ArgType.BOOL, "ROI given in relative [0,1] coords.", False
).AddOptionalArg(
    "subpixel_scale", ArgType.BOOL, "Adjust scale for fractional sizes (output extents are integral here, making this the default behavior; accepted for compatibility).", True
)


def _apply_max_size(spec, oh, ow):
    """Cap keep-aspect outputs at `max_size` (reference resize_attr.cc:
    scalar or (H, W) bound; scales down preserving aspect)."""
    ms = spec.GetArgument("max_size", None)
    if not ms:
        return oh, ow
    ms = np.asarray(ms, np.float64).reshape(-1)
    mh, mw = (float(ms[0]), float(ms[-1])) if ms.size > 1 else (float(ms[0]),) * 2
    r = min((mh / oh) if mh > 0 else 1.0, (mw / ow) if mw > 0 else 1.0, 1.0)
    if r < 1.0:
        return max(1, round(oh * r)), max(1, round(ow * r))
    return oh, ow


def compute_volumetric_sizes(spec, sample_arg, d, h, w):
    """(out_d, out_h, out_w) for DHWC inputs: `size` must carry 3 values
    (D, H, W, reference resize docs — one per spatial dim), or use explicit
    resize_x/resize_y/resize_z; keep-aspect modes ignore depth and are
    rejected rather than silently mishandled."""
    size = sample_arg("size", None)
    if size is not None:
        sz = np.asarray(size, np.float64).reshape(-1)
        if sz.size != 3:
            raise ValueError(
                "Resize: volumetric (DHWC) inputs need a 3-element `size` "
                "(D, H, W)")
        return (max(1, round(float(sz[0]))), max(1, round(float(sz[1]))),
                max(1, round(float(sz[2]))))
    if float(sample_arg("resize_shorter", 0.0) or 0.0) or \
            float(sample_arg("resize_longer", 0.0) or 0.0):
        raise NotImplementedError(
            "Resize: resize_shorter/resize_longer are 2-D modes; volumetric "
            "inputs need `size` (D, H, W) or resize_x/resize_y/resize_z")
    oh, ow = compute_resize_size(h, w, spec, sample_arg)
    rz = float(sample_arg("resize_z", 0.0) or 0.0)
    od = max(1, round(rz)) if rz > 0 else d
    return od, oh, ow


def compute_resize_size(in_h, in_w, spec, sample_arg, mode=None):
    """Output (h, w) from the Resize argument set — mirrors the reference
    ``ResizeAttr`` logic (``resize_attr.cc``), including `max_size` caps on
    the keep-aspect modes."""
    rx = float(sample_arg("resize_x", 0.0) or 0.0)
    ry = float(sample_arg("resize_y", 0.0) or 0.0)
    rs = float(sample_arg("resize_shorter", 0.0) or 0.0)
    rl = float(sample_arg("resize_longer", 0.0) or 0.0)
    size = sample_arg("size", None)
    mode = mode or spec.GetArgument("mode", "default")
    if size is not None:
        sz = np.asarray(size, dtype=np.float64).reshape(-1)
        if sz.size == 1:
            ry = rx = float(sz[0])
        else:
            ry, rx = float(sz[0]), float(sz[1])
    if rs > 0:
        scale = rs / min(in_h, in_w)
        return _apply_max_size(spec, max(1, round(in_h * scale)), max(1, round(in_w * scale)))
    if rl > 0:
        scale = rl / max(in_h, in_w)
        return _apply_max_size(spec, max(1, round(in_h * scale)), max(1, round(in_w * scale)))
    if rx > 0 and ry > 0:
        if mode == "not_larger":
            scale = min(rx / in_w, ry / in_h)
            return _apply_max_size(spec, max(1, round(in_h * scale)), max(1, round(in_w * scale)))
        if mode == "not_smaller":
            scale = max(rx / in_w, ry / in_h)
            return _apply_max_size(spec, max(1, round(in_h * scale)), max(1, round(in_w * scale)))
        return max(1, round(ry)), max(1, round(rx))
    if rx > 0:
        scale = rx / in_w
        return _apply_max_size(spec, max(1, round(in_h * scale)), max(1, round(rx)))
    if ry > 0:
        scale = ry / in_h
        return _apply_max_size(spec, max(1, round(ry)), max(1, round(in_w * scale)))
    raise ValueError("Resize requires one of: size, resize_x/y, resize_shorter/longer")


_CV2_INTERP = None


def _cv2_interp(interp, scale_down):
    import cv2

    table = {
        DALIInterpType.INTERP_NN: cv2.INTER_NEAREST,
        DALIInterpType.INTERP_LINEAR: cv2.INTER_LINEAR,
        DALIInterpType.INTERP_TRIANGULAR: cv2.INTER_AREA if scale_down else cv2.INTER_LINEAR,
        DALIInterpType.INTERP_CUBIC: cv2.INTER_CUBIC,
        DALIInterpType.INTERP_GAUSSIAN: cv2.INTER_LINEAR,
        DALIInterpType.INTERP_LANCZOS3: cv2.INTER_LANCZOS4,
    }
    return table[interp]


def _resize_cv(img, out_w, out_h, cv_interp):
    """cv2.resize with the INTER_AREA case routed to the own-code area
    resampler (host_ops.cc resize_area_u8 — exact fractional box
    integration; test_host_imgproc states the cv2 tolerance). Keeps the
    framework's antialiased cpu downscale path bit-controlled."""
    import cv2

    from .. import native

    if (cv_interp == cv2.INTER_AREA and img.dtype == np.uint8
            and native.available() and native.has_host_imgproc()):
        return native.resize_area_u8(img, out_h, out_w)
    return cv2.resize(img, (out_w, out_h), interpolation=cv_interp)


def _pick_filter(spec, scale_down):
    """Per-direction filter override (reference ResamplingFilterAttr:
    min_filter for downscale, mag_filter for upscale; fall back to interp_type)."""
    f = spec.GetArgument("min_filter" if scale_down else "mag_filter", None)
    if f is None:
        f = spec.GetArgument("interp_type", DALIInterpType.INTERP_LINEAR)
    return f


@register_operator("Resize", "cpu")
class ResizeCPU(Operator):
    def run_sample(self, ctx, idx, img):
        from ..kernels.resample import host_resample

        spec = self.spec
        vol = img.ndim == 4  # DHWC
        antialias = spec.GetArgument("antialias", True)
        if vol:
            d, h, w = img.shape[:3]
            # volumetric: 2-D resample per depth slice + a depth pass with
            # the SAME tap-plan math (bit-controlled against the device's
            # three-matmul lowering)
            from ..kernels.resample import _host_tap_plan

            out_d, out_h, out_w = compute_volumetric_sizes(
                spec, lambda n, dv=None: ctx.arg(self, n, idx, dv), d, h, w)
            interp = _pick_filter(spec, out_d * out_h * out_w < d * h * w)
            # stay in float through ALL passes — one final quantization, like
            # the device's three-matmul lowering
            planes = np.stack([host_resample(img[k].astype(np.float32),
                                             out_h, out_w, interp, antialias)
                               for k in range(d)])
            if planes.ndim == 3:
                planes = planes[..., None]
            if out_d != d:
                idx_z, w_z = _host_tap_plan(out_d, 0.0, float(d), d, interp, antialias)
                planes = np.einsum("tq,tqhwc->qhwc", w_z, planes[idx_z])
            if np.issubdtype(img.dtype, np.integer):
                info = np.iinfo(img.dtype)
                planes = np.clip(np.round(planes), info.min, info.max)
            out = planes.astype(img.dtype)
        else:
            h, w = img.shape[:2]
            out_h, out_w = compute_resize_size(
                h, w, spec, lambda n, d=None: ctx.arg(self, n, idx, d))
            interp = _pick_filter(spec, out_h < h or out_w < w)
            # the framework's own resampler (bit-controlled against the device
            # lowering — same window math), not a cv2 delegate
            out = host_resample(img, out_h, out_w, interp, antialias)
            if out.ndim == 2:
                out = out[:, :, None]
        if spec.GetArgument("save_attrs", False):
            attrs = np.array([d, h, w] if vol else [h, w], np.int32)
            return np.ascontiguousarray(out), attrs
        return np.ascontiguousarray(out)

    def output_layout(self, j, inputs):
        if j == 1:
            return ""
        return inputs[0].layout if inputs else ""


@register_operator("Resize", "gpu")
class ResizeGPU(Operator):
    """Device resize.

    * Static sizes (``resize_x`` & ``resize_y``, or ``size``, as constants) →
      uniform output, no host work.
    * Per-sample sizes (``resize_shorter``/``resize_longer`` or tensor size args)
      → sizes computed on host per iteration; the output canvas is a grow-policy
      static (``device_statics``) so XLA recompiles only while the canvas grows.
    """

    def __init__(self, spec, op_id):
        super().__init__(spec, op_id)
        self._grow_canvas = [0, 0]

    def _static_size(self):
        """(h, w) if the output size is a batch-invariant constant, else None."""
        spec = self.spec
        for nm in ("resize_x", "resize_y", "resize_shorter", "resize_longer", "size"):
            if nm in spec.arg_inputs:
                return None
        if spec.GetArgument("resize_shorter", 0.0) or spec.GetArgument("resize_longer", 0.0):
            return None  # depends on per-sample input shape
        mode = spec.GetArgument("mode", "default")
        if mode in ("not_larger", "not_smaller"):
            return None
        rx = float(spec.GetArgument("resize_x", 0.0) or 0.0)
        ry = float(spec.GetArgument("resize_y", 0.0) or 0.0)
        size = spec.GetArgument("size", None)
        if size is not None:
            sz = np.asarray(size, np.float64).reshape(-1)
            ry, rx = (float(sz[0]), float(sz[-1])) if sz.size > 1 else (float(sz[0]), float(sz[0]))
        if rx > 0 and ry > 0:
            return int(round(ry)), int(round(rx))
        return None  # one-sided scale depends on input aspect

    def _has_filter_override(self):
        return (self.spec.GetArgument("mag_filter", None) is not None
                or self.spec.GetArgument("min_filter", None) is not None)

    def _choose_filter(self, in_shapes, out_sizes):
        """Batch-level mag/min filter choice (documented TPU adaptation: the
        whole batch runs as ONE XLA program, so the filter is picked from the
        majority scaling direction rather than per sample). The choice LATCHES
        on the first batch — device_statics participates in the jit program
        cache key, and a per-batch flip would recompile the whole device
        program (20-60 s) every time the majority direction changed."""
        if not self._has_filter_override():
            return None
        latched = getattr(self, "_filter_latched", None)
        if latched is not None:
            return latched
        down = int((out_sizes[:, 0] < in_shapes[:, 0]).sum()
                   + (out_sizes[:, 1] < in_shapes[:, 1]).sum())
        up = int((out_sizes[:, 0] > in_shapes[:, 0]).sum()
                 + (out_sizes[:, 1] > in_shapes[:, 1]).sum())
        self._filter_latched = int(_pick_filter(self.spec, down >= up))
        return self._filter_latched

    def _volumetric_out(self, shapes):
        """(out_d, out_h, out_w, filt) for DHWC inputs — batch-static only
        (the device canvas is fixed); per-sample volumetric sizes are
        cpu-only."""
        spec = self.spec
        for nm in ("resize_x", "resize_y", "resize_z", "resize_shorter",
                   "resize_longer", "size"):
            if nm in spec.arg_inputs:
                raise NotImplementedError(
                    "Resize(gpu): per-sample sizes on volumetric (DHWC) "
                    "inputs are cpu-only")
        outs = set()
        for row in np.asarray(shapes):
            d, h, w = int(row[0]), int(row[1]), int(row[2])
            outs.add(compute_volumetric_sizes(
                spec, lambda nm, dv=None: spec.GetArgument(nm, dv),
                max(d, 1), max(h, 1), max(w, 1)))
        if len(outs) != 1:
            raise NotImplementedError(
                "Resize(gpu): volumetric inputs need a batch-uniform output "
                "size; per-sample outputs are cpu-only")
        od, oh, ow = next(iter(outs))
        filt = None
        if self._has_filter_override():
            sh = np.asarray(shapes)
            vox_in = float(np.median(sh[:, 0].astype(np.float64)
                                     * sh[:, 1] * sh[:, 2]))
            filt = int(_pick_filter(spec, od * oh * ow < vox_in))
        return od, oh, ow, filt

    # -- host side -----------------------------------------------------------------
    def host_params(self, ctx, input_shapes):
        shapes0 = input_shapes[0]
        if shapes0 is not None and np.asarray(shapes0).shape[1] >= 4:
            # DHWC volume or FHWC sequence — device_statics disambiguates by
            # the boundary batch's layout; both need batch-static sizes
            self._maybe_vol_shapes = np.asarray(shapes0)
            return {}
        if self.spec.GetArgument("resize_z", 0.0) or "resize_z" in self.spec.arg_inputs:
            raise NotImplementedError(
                "Resize(gpu): resize_z applies to volumetric (DHWC) inputs")
        static = self._static_size()
        shapes = input_shapes[0]
        if static is not None:
            self._filter = (self._choose_filter(
                np.asarray(shapes)[:, :2], np.tile(np.array([static], np.int32), (len(shapes), 1)))
                if shapes is not None and self._has_filter_override() else None)
            return {}
        if shapes is None:
            raise RuntimeError(
                "Resize(gpu) with per-sample sizes requires its input to come "
                "directly from the host boundary"
            )
        n = shapes.shape[0]
        out = np.zeros((n, 2), dtype=np.int32)
        for i in range(n):
            h, w = int(shapes[i][0]), int(shapes[i][1])
            out[i] = compute_resize_size(h, w, self.spec, lambda nm, d=None: ctx.arg(self, nm, i, d))
        self._last_out_sizes = out
        self._filter = self._choose_filter(np.asarray(shapes)[:, :2], out)
        align = 32
        self._grow_canvas[0] = max(self._grow_canvas[0], int(-(-out[:, 0].max() // align) * align))
        self._grow_canvas[1] = max(self._grow_canvas[1], int(-(-out[:, 1].max() // align) * align))
        # Antialias tap bound must cover the TRUE per-sample scale in_ext/out
        # (the device packs each sample's grid into a larger canvas by
        # stretching the ROI, so the canvas ratio under-counts taps for heavy
        # downscales). Grow-latched like the canvas to avoid recompiles.
        from ..kernels.resample import max_taps

        interp = (DALIInterpType(self._filter) if self._filter is not None
                  else self.spec.GetArgument("interp_type", DALIInterpType.INTERP_LINEAR))
        aa = bool(self.spec.GetArgument("antialias", True))
        in_hw = np.asarray(shapes)[:, :2].astype(np.float64)
        sc_y = float((in_hw[:, 0] / np.maximum(out[:, 0], 1)).max())
        sc_x = float((in_hw[:, 1] / np.maximum(out[:, 1], 1)).max())
        latch = getattr(self, "_taps_latch", [0, 0])
        self._taps_latch = [max(latch[0], max_taps(interp, sc_y, aa)),
                            max(latch[1], max_taps(interp, sc_x, aa))]
        return {"out_sizes": out}

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        # Propagate output extents to downstream device ops whose canvas math
        # runs on the host (Rotate/WarpAffine keep_size, Crop window checks).
        shapes0 = input_shapes[0] if input_shapes else None
        if shapes0 is None:
            return None
        sh = np.asarray(shapes0)
        n = sh.shape[0]
        static = self._static_size()
        lay = (ctx.in_layouts(self) or [""])[0]
        if sh.shape[1] == 4 and lay.startswith("F"):
            # FHWC sequence: per-frame resize keeps F, sets (H, W)
            if static is None:
                return None  # per-sample sizes on sequences are cpu-only
            oh, ow = static
            hw = np.tile(np.array([[oh, ow]], np.int64), (n, 1))
            return [np.concatenate(
                [sh[:, :1].astype(np.int64), hw, sh[:, 3:4].astype(np.int64)],
                axis=1)]
        if sh.shape[1] != 3:
            return None  # volumetric canvases resolve in statics
        if static is not None:
            oh, ow = static
            hw = np.tile(np.array([[oh, ow]], np.int64), (n, 1))
        elif getattr(self, "_last_out_sizes", None) is not None:
            hw = np.asarray(self._last_out_sizes, np.int64)
        else:
            return None
        out = np.concatenate([hw, sh[:, 2:3].astype(np.int64)], axis=1)
        if self.spec.GetArgument("save_attrs", False):
            return [out, sh[:, :2].astype(np.int64)]
        return [out]

    def device_statics(self, ctx, input_shapes, input_batches=None):
        shapes0 = input_shapes[0]
        if shapes0 is not None and np.asarray(shapes0).shape[1] >= 4:
            b = input_batches[0] if input_batches else None
            layout = getattr(b, "layout", "") or ""
            if layout.startswith("D"):
                return ("vol",) + self._volumetric_out(np.asarray(shapes0))
            # FHWC sequence: the fold-frames path needs a batch-static size
            if self._static_size() is None:
                raise NotImplementedError(
                    "Resize(gpu): per-sample sizes on sequence inputs are "
                    "cpu-only")
            filt = getattr(self, "_filter", None)
            return None if filt is None else ("filt", filt)
        filt = getattr(self, "_filter", None)
        if self._static_size() is not None:
            return None if filt is None else ("filt", filt)
        ty, tx = getattr(self, "_taps_latch", [0, 0])
        return (self._grow_canvas[0], self._grow_canvas[1], filt, ty, tx)

    # -- device side -----------------------------------------------------------------
    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp

        if inp.data.ndim == 5 and (inp.layout or "").startswith("D"):
            # volumetric DHWC: three separable interpolation matmuls
            st = dctx.static(self)
            if not (isinstance(st, tuple) and st and st[0] == "vol"):
                raise NotImplementedError(
                    "Resize(gpu): volumetric inputs need host-boundary shapes")
            _, od, oh, ow, filt = st
            spec = self.spec
            interp = (DALIInterpType(filt) if filt is not None
                      else spec.GetArgument("interp_type", DALIInterpType.INTERP_LINEAR))
            dt_arg = spec.GetArgument("dtype", None)
            out_dtype = to_jnp_type(dt_arg) if dt_arg is not None else inp.data.dtype
            data = resample_kernel.resample_volume_batch(
                inp.data, inp.shapes[:, :3] if inp.shapes is not None else None,
                od, oh, ow, interp, bool(spec.GetArgument("antialias", True)),
                out_dtype)
            outs = [DeviceBatch(data, None, inp.layout or "DHWC")]
            if spec.GetArgument("save_attrs", False):
                a = (inp.shapes[:, :3].astype(jnp.int32) if inp.shapes is not None
                     else jnp.tile(jnp.asarray([list(inp.data.shape[1:4])], jnp.int32),
                                   (inp.data.shape[0], 1)))
                outs.append(DeviceBatch(a, None, ""))
            return outs

        folded, unfold = _fold_frames(inp)
        if unfold is not None:
            outs = self.lower(dctx, folded)
            ret = [unfold(outs[0])]
            if len(outs) > 1:  # save_attrs: per-sequence, not per-frame
                n, f = inp.data.shape[0], inp.data.shape[1]
                ret.append(DeviceBatch(outs[1].data.reshape(n, f, -1)[:, 0, :], None, ""))
            return ret

        spec = self.spec
        interp = spec.GetArgument("interp_type", DALIInterpType.INTERP_LINEAR)
        antialias = bool(spec.GetArgument("antialias", True))
        dtype_arg = spec.GetArgument("dtype", None)
        out_dtype = to_jnp_type(dtype_arg) if dtype_arg is not None else inp.data.dtype
        save_attrs = bool(spec.GetArgument("save_attrs", False))

        def attrs_out():
            if inp.shapes is not None:
                a = inp.shapes[:, :2].astype(jnp.int32)
            else:
                a = jnp.tile(jnp.array([[inp.data.shape[1], inp.data.shape[2]]], jnp.int32),
                             (inp.data.shape[0], 1))
            return DeviceBatch(a, None, "")

        st = dctx.static(self)
        static = self._static_size()
        if static is not None:
            if isinstance(st, tuple) and len(st) == 2 and st[0] == "filt":
                interp = DALIInterpType(st[1])
            out_h, out_w = static
            data = resample_kernel.resample_batch(
                inp.data, inp.shapes, None, None, out_h, out_w, interp, antialias, out_dtype
            )
            outs = [DeviceBatch(data, None, inp.layout or "HWC")]
            if save_attrs:
                outs.append(attrs_out())
            return outs
        # per-sample sizes on a grow-policy canvas
        max_h, max_w, filt, taps_y, taps_x = st
        if filt is not None:
            interp = DALIInterpType(filt)
        sizes = dctx.param(self, "out_sizes")
        # host-propagated shapes may carry (H, W) or (H, W, C): keep H, W
        ext = inp.shapes[:, :2] if inp.shapes is not None else jnp.tile(
            jnp.array([[inp.data.shape[1], inp.data.shape[2]]], jnp.int32), (inp.data.shape[0], 1)
        )
        # Sample k's own output grid occupies the first (h_k, w_k) of the canvas:
        # stretch the ROI by canvas/out so dst pixel i maps to i * ext/out_k.
        roi_size = ext.astype(jnp.float32) * jnp.stack(
            [max_h / sizes[:, 0].astype(jnp.float32), max_w / sizes[:, 1].astype(jnp.float32)], axis=1
        )
        data = resample_kernel.resample_batch(
            inp.data, ext, None, roi_size, max_h, max_w, interp, antialias, out_dtype,
            taps_y=taps_y or None, taps_x=taps_x or None,
        )
        out_shapes = jnp.concatenate(
            [sizes, jnp.full((sizes.shape[0], 1), inp.data.shape[3], jnp.int32)], axis=1
        )
        outs = [DeviceBatch(data, out_shapes, inp.layout or "HWC")]
        if save_attrs:
            outs.append(attrs_out())
        return outs


# ============================== RandomResizedCrop ===============================================

DALI_SCHEMA("RandomResizedCrop").DocStr(
    """Random area/aspect crop + resize to fixed size (reference
    ``image/resize/random_resized_crop.cc``). Window sampling happens on the host
    (checkpointable Philox); the crop+resize is one fused device resample with
    per-sample ROI."""
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddRandomSeedArg().AddArg(
    "size", ArgType.INT_VEC, "Output size (H, W)."
).AddOptionalArg(
    "random_area", ArgType.FLOAT_VEC, "Crop area range (fraction of input).", [0.08, 1.0]
).AddOptionalArg(
    "random_aspect_ratio", ArgType.FLOAT_VEC, "Aspect ratio range.", [3 / 4, 4 / 3]
).AddOptionalArg(
    "num_attempts", ArgType.INT, "Sampling attempts.", 10
).AddOptionalArg(
    "interp_type", ArgType.INTERP_TYPE, "Interpolation filter.", DALIInterpType.INTERP_LINEAR
).AddOptionalArg(
    "antialias", ArgType.BOOL, "Antialiasing when downscaling.", True
).AddOptionalArg(
    "dtype", ArgType.DATA_TYPE, "Output dtype.", None
).AddOptionalArg(
    "mag_filter", ArgType.INTERP_TYPE, "Filter for upscaling.", None
).AddOptionalArg(
    "min_filter", ArgType.INTERP_TYPE, "Filter for downscaling.", None
).AddOptionalArg(
    "minibatch_size", ArgType.INT,
    "Reference GPU kernel batching hint; accepted for compatibility.", 32
).AddOptionalArg(
    "temp_buffer_hint", ArgType.INT,
    "Reference GPU scratch-size hint; accepted for compatibility.", 0
)


class _RRCWindows:
    def _windows(self, ctx, shapes):
        n = shapes.shape[0]
        wins = np.zeros((n, 4), dtype=np.float32)  # y, x, h, w
        area = self.spec.GetArgument("random_area")
        ar = self.spec.GetArgument("random_aspect_ratio")
        attempts = self.spec.GetArgument("num_attempts")
        rng = ctx.rng(self)
        for i in range(n):
            h, w = int(shapes[i][0]), int(shapes[i][1])
            wins[i] = sample_rrc_window(rng, h, w, area, ar, attempts)
        return wins


@register_operator("RandomResizedCrop", "gpu")
class RandomResizedCropGPU(Operator, _RRCWindows):
    def host_params(self, ctx, input_shapes):
        shapes = input_shapes[0]
        if shapes is None:
            raise RuntimeError("RandomResizedCrop(gpu) requires direct boundary input shapes")
        wins = self._windows(ctx, shapes)
        size = self.spec.GetArgument("size")
        oh, ow = (int(size[0]), int(size[-1])) if len(size) > 1 else (int(size[0]), int(size[0]))
        if (self.spec.GetArgument("mag_filter", None) is not None
                or self.spec.GetArgument("min_filter", None) is not None):
            # latched on the first batch — see Resize._choose_filter (the
            # choice is part of the jit cache key; flips would recompile)
            if getattr(self, "_filter", None) is None:
                down = int((wins[:, 2] > oh).sum() + (wins[:, 3] > ow).sum())
                up = int((wins[:, 2] < oh).sum() + (wins[:, 3] < ow).sum())
                self._filter = int(_pick_filter(self.spec, down >= up))
        else:
            self._filter = None
        return {"windows": wins}

    def device_statics(self, ctx, input_shapes):
        return getattr(self, "_filter", None)

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        shapes0 = input_shapes[0] if input_shapes else None
        if shapes0 is None:
            return None
        sh = np.asarray(shapes0)
        if sh.shape[1] != 3:
            return None
        size = self.spec.GetArgument("size")
        oh, ow = (int(size[0]), int(size[-1])) if len(size) > 1 else (int(size[0]), int(size[0]))
        n = sh.shape[0]
        hw = np.tile(np.array([[oh, ow]], np.int64), (n, 1))
        return [np.concatenate([hw, sh[:, 2:3].astype(np.int64)], axis=1)]

    def lower(self, dctx, inp: DeviceBatch):
        spec = self.spec
        size = spec.GetArgument("size")
        out_h, out_w = (int(size[0]), int(size[-1])) if len(size) > 1 else (int(size[0]), int(size[0]))
        filt = dctx.static(self)
        interp = (DALIInterpType(filt) if filt is not None
                  else spec.GetArgument("interp_type", DALIInterpType.INTERP_LINEAR))
        antialias = bool(spec.GetArgument("antialias", True))
        dtype_arg = spec.GetArgument("dtype", None)
        out_dtype = to_jnp_type(dtype_arg) if dtype_arg is not None else inp.data.dtype
        wins = dctx.param(self, "windows")
        roi_start = wins[:, 0:2]
        roi_size = wins[:, 2:4]
        data = resample_kernel.resample_batch(
            inp.data, inp.shapes, roi_start, roi_size, out_h, out_w, interp, antialias, out_dtype
        )
        return [DeviceBatch(data, None, inp.layout or "HWC")]


@register_operator("RandomResizedCrop", "cpu")
class RandomResizedCropCPU(Operator, _RRCWindows):
    def run_batch(self, ctx, inp: HostBatch):
        from ..kernels.resample import host_resample

        spec = self.spec
        size = spec.GetArgument("size")
        out_h, out_w = (int(size[0]), int(size[-1])) if len(size) > 1 else (int(size[0]), int(size[0]))
        wins = self._windows(ctx, inp.shapes())
        antialias = spec.GetArgument("antialias", True)

        def one(i):
            img = inp.samples[i]
            y, x, h, w = (int(v) for v in wins[i])
            crop = img[y : y + h, x : x + w]
            interp = _pick_filter(spec, out_h < h or out_w < w)
            out = host_resample(crop, out_h, out_w, interp, antialias)
            return out[:, :, None] if out.ndim == 2 else out

        samples = ctx.map_samples(one, len(inp))
        return [HostBatch(samples, layout=inp.layout or "HWC")]


# ============================== CropMirrorNormalize ==============================================

DALI_SCHEMA("CropMirrorNormalize").DocStr(
    """Fused crop + horizontal mirror + normalize + cast + layout transform
    (reference ``image/crop/crop_mirror_normalize.h``; the fusion DALI implements
    as a dedicated kernel falls out of XLA here, with a Pallas kernel for the hot
    path). out = scale * (in - mean) / std + shift."""
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AllowSequences().AddOptionalArg(
    "crop", ArgType.FLOAT_VEC, "Crop size (H, W).", None
).AddOptionalArg(
    "crop_h", ArgType.FLOAT, "Crop height.", 0.0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "crop_w", ArgType.FLOAT, "Crop width.", 0.0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "crop_pos_x", ArgType.FLOAT, "Window x position in [0,1].", 0.5, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "crop_pos_y", ArgType.FLOAT, "Window y position in [0,1].", 0.5, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "mirror", ArgType.INT, "Horizontal flip flag.", 0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "mean", ArgType.FLOAT_VEC, "Per-channel mean.", [0.0]
).AddOptionalArg(
    "std", ArgType.FLOAT_VEC, "Per-channel std.", [1.0]
).AddOptionalArg(
    "scale", ArgType.FLOAT, "Output scaling factor.", 1.0
).AddOptionalArg(
    "shift", ArgType.FLOAT, "Output shift.", 0.0
).AddOptionalArg(
    "dtype", ArgType.DATA_TYPE, "Output dtype.", DALIDataType.FLOAT
).AddOptionalArg(
    "output_layout", ArgType.TENSOR_LAYOUT, "Output layout (CHW/HWC).", "CHW"
).AddOptionalArg(
    "pad_output", ArgType.BOOL, "Pad channels to 4.", False
).AddOptionalArg(
    "out_of_bounds_policy", ArgType.STRING,
    '"error" (default), "pad" (out-of-image pixels become fill_values), or '
    '"trim_to_shape" (window clamped into the image; output may be smaller). '
    "Reference slice OutOfBoundsPolicy (slice_attr / crop_mirror_normalize).",
    "error"
).AddOptionalArg(
    "fill_values", ArgType.FLOAT_VEC,
    "Per-channel OUTPUT values for out-of-bounds pixels (pad policy); "
    "used as-is, not normalized (reference crop_mirror_normalize.cc).",
    [0.0]
).AddOptionalArg(
    "image_type", ArgType.IMAGE_TYPE, "Compatibility arg (deprecated in the "
    "reference; ignored).", DALIImageType.RGB
).DeprecateArg(
    "image_type", None, "the reference removed it in 0.25 (ignored here)"
).AddOptionalArg(
    "crop_d", ArgType.FLOAT, "Volumetric crop depth (DHWC inputs).", 0.0,
    tensor_ok=True, per_sample=True
).AddOptionalArg(
    "crop_pos_z", ArgType.FLOAT, "Volumetric window z in [0,1].", 0.5,
    tensor_ok=True, per_sample=True
).AddOptionalArg(
    "rounding", ArgType.STRING,
    'Window-start conversion to integer: "round" (half away from zero) or '
    '"truncate" (toward zero). Reference crop_attr.cc `rounding`.', "round"
)


class _CMNCommon:
    def _crop_size(self, inp_hw):
        crop = self.spec.GetArgument("crop", None)
        ch = self.spec.GetArgument("crop_h", 0.0)
        cw = self.spec.GetArgument("crop_w", 0.0)
        if crop:
            return int(crop[0]), int(crop[1])
        if ch and cw:
            return int(ch), int(cw)
        return None  # no crop


@register_operator("CropMirrorNormalize", "gpu")
class CropMirrorNormalizeGPU(Operator, _CMNCommon):
    def host_output_layouts(self, in_layouts):
        base = self.spec.GetArgument("output_layout", "CHW")
        il = in_layouts[0] if in_layouts else ""
        if il.startswith("D"):
            return ["D" + base]
        if il.startswith("F"):
            return [base if base.startswith("F") else "F" + base]
        return [base]

    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp

        if inp.data.ndim == 5 and (inp.layout or "").startswith("D"):
            # volumetric DHWC: depth-crop with dynamic_slice, fold the depth
            # axis into the batch, run the 2-D CMN path per slice, unfold
            # (cpu path semantics: depth layout leads the output, e.g. DCHW)
            import jax

            spec = self.spec
            n, D, H, W, C = inp.data.shape
            cd = int(spec.GetArgument("crop_d", 0.0) or 0) or D
            ext_d = inp.extent(0) if inp.shapes is not None else jnp.full((n,), D, jnp.int32)
            pz = dctx.arg(self, "crop_pos_z", 0.5)
            pz = jnp.asarray(pz, jnp.float32).reshape(-1)
            if pz.shape[0] == 1:
                pz = jnp.broadcast_to(pz, (n,))
            from .generic2 import crop_round_jnp

            _rz = crop_round_jnp(spec.GetArgument("rounding", "round"))
            z = jnp.clip(_rz(pz * (ext_d - cd).astype(jnp.float32)), 0, None).astype(jnp.int32)
            data5 = jax.vmap(lambda im, zz: jax.lax.dynamic_slice(
                im, (zz, 0, 0, 0), (cd, H, W, C)))(inp.data, z)
            fold_shapes = (jnp.repeat(inp.shapes[:, 1:3], cd, axis=0)
                           if inp.shapes is not None else None)
            folded = DeviceBatch(data5.reshape(n * cd, H, W, C), fold_shapes, "HWC")
            sub = _SequenceDctx(dctx, cd)
            out = self.lower(sub, folded)[0]
            layout = "D" + out.layout
            return [DeviceBatch(out.data.reshape(n, cd, *out.data.shape[1:]),
                                None, layout)]

        folded, unfold = _fold_frames(inp)
        if unfold is not None:
            n, f = inp.data.shape[0], inp.data.shape[1]
            # per-sample args repeat per frame
            sub = _SequenceDctx(dctx, f)
            outs = self.lower(sub, folded)
            out = outs[0]
            layout = "F" + out.layout if not out.layout.startswith("F") else out.layout
            return [DeviceBatch(out.data.reshape(n, f, *out.data.shape[1:]), None, layout)]

        spec = self.spec
        n, H, W, C = inp.data.shape
        cs = self._crop_size((H, W))
        crop_h, crop_w = cs if cs else (H, W)
        ext_h = inp.extent(0) if inp.shapes is not None else jnp.full((n,), H, jnp.int32)
        ext_w = inp.extent(1) if inp.shapes is not None else jnp.full((n,), W, jnp.int32)
        py = dctx.arg(self, "crop_pos_y", 0.5)
        px = dctx.arg(self, "crop_pos_x", 0.5)
        py = jnp.asarray(py, jnp.float32).reshape(-1)
        px = jnp.asarray(px, jnp.float32).reshape(-1)
        if py.shape[0] == 1:
            py = jnp.broadcast_to(py, (n,))
        if px.shape[0] == 1:
            px = jnp.broadcast_to(px, (n,))
        policy = spec.GetArgument("out_of_bounds_policy", "error")
        from .generic2 import crop_round_jnp

        _r = crop_round_jnp(spec.GetArgument("rounding", "round"))
        crop_y = _r(py * (ext_h - crop_h).astype(jnp.float32)).astype(jnp.int32)
        crop_x = _r(px * (ext_w - crop_w).astype(jnp.float32)).astype(jnp.int32)
        if policy != "pad":
            # error/trim: window clamped into the image ("error" raises on the
            # host in host_output_shapes, where per-sample extents are numpy)
            crop_y = jnp.maximum(crop_y, 0)
            crop_x = jnp.maximum(crop_x, 0)
        mirror = dctx.arg(self, "mirror", 0)
        if dctx.has_tensor_arg(self, "mirror"):
            mirror = jnp.asarray(mirror).reshape(-1)
        elif mirror:
            mirror = jnp.full((n,), int(mirror), jnp.int32)
        else:
            mirror = None
        dtype = to_jnp_type(spec.GetArgument("dtype", DALIDataType.FLOAT))
        # volumetric/sequence callers fold D/F into the batch before this 2-D
        # path; a leading D/F in the requested layout belongs to the fold
        layout = spec.GetArgument("output_layout", "CHW").lstrip("FD")
        out = cmn_kernel.crop_mirror_normalize(
            inp.data,
            crop_y,
            crop_x,
            mirror,
            crop_h,
            crop_w,
            np.asarray(spec.GetArgument("mean", [0.0]), np.float32),
            np.asarray(spec.GetArgument("std", [1.0]), np.float32),
            float(spec.GetArgument("scale", 1.0)),
            float(spec.GetArgument("shift", 0.0)),
            layout,
            dtype,
            bool(spec.GetArgument("pad_output", False)),
            ext_h=ext_h,
            ext_w=ext_w,
            fill=np.asarray(spec.GetArgument("fill_values", [0.0]), np.float32)
            if policy == "pad" else None,
        )
        if policy == "trim_to_shape" and inp.shapes is not None:
            # window clamped into each image; the output shrinks per sample
            oh = jnp.minimum(jnp.full((n,), crop_h, jnp.int32), ext_h)
            ow = jnp.minimum(jnp.full((n,), crop_w, jnp.int32), ext_w)
            oc = jnp.full((n,), out.shape[1] if layout.endswith("HW") else out.shape[-1], jnp.int32)
            cols = [oc, oh, ow] if layout in ("CHW", "FCHW") else [oh, ow, oc]
            return [DeviceBatch(out, jnp.stack(cols, axis=1), layout)]
        return [DeviceBatch(out, None, layout)]

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        # Computes per-sample output extents (crop window / passthrough, channel
        # padding, CHW<->HWC permutation) and enforces the "error" policy on
        # the host (reference OutOfBoundsPolicy::Error).
        spec = self.spec
        policy = spec.GetArgument("out_of_bounds_policy", "error")
        shapes = input_shapes[0] if input_shapes else None
        if shapes is None:
            return None
        sh = np.asarray(shapes).astype(np.int64)
        il = (ctx.in_layouts(self) or [""])[0]
        ncol = sh.shape[1]
        if ncol == 3:
            lead = None
        elif ncol == 4 and il[:1] in ("F", "D"):
            lead = il[0]
        else:
            return None  # ambiguous rank: don't guess
        h = sh[:, -3]
        w = sh[:, -2]
        c = sh[:, -1]
        cs = self._crop_size(None)
        if cs is not None:
            ch, cw = int(cs[0]), int(cs[1])
            if policy == "error":
                bad = (h < ch) | (w < cw)
                if bad.any():
                    i = int(np.argmax(bad))
                    raise ValueError(
                        f"CropMirrorNormalize: crop window {ch}x{cw} out of bounds for "
                        f"sample {i} of extent {int(h[i])}x{int(w[i])} "
                        f"(out_of_bounds_policy='error'; use 'pad' or 'trim_to_shape')")
                oh = np.full_like(h, ch)
                ow = np.full_like(w, cw)
            elif policy == "trim_to_shape":
                oh = np.minimum(h, ch)
                ow = np.minimum(w, cw)
            else:  # pad
                oh = np.full_like(h, ch)
                ow = np.full_like(w, cw)
        else:
            oh, ow = h, w
        oc = np.full_like(c, 4) if spec.GetArgument("pad_output", False) else c
        base = spec.GetArgument("output_layout", "CHW").lstrip("FD")
        if base == "CHW":
            cols = [oc, oh, ow]
        elif base == "HWC":
            cols = [oh, ow, oc]
        else:
            return None
        if lead is not None:
            lead_ext = sh[:, 0].copy()
            if lead == "D":
                cd = int(spec.GetArgument("crop_d", 0.0) or 0)
                if cd:
                    lead_ext = np.full_like(lead_ext, cd)
            cols = [lead_ext] + cols
        return [np.stack(cols, axis=1)]


@register_operator("CropMirrorNormalize", "cpu")
class CropMirrorNormalizeCPU(Operator, _CMNCommon):
    def run_sample(self, ctx, idx, img):
        spec = self.spec
        vol = img.ndim == 4  # DHWC (crop_d / crop_pos_z)
        if vol:
            d, h, w, c = img.shape
        else:
            h, w, c = img.shape
        cs = self._crop_size((h, w))
        crop_h, crop_w = cs if cs else (h, w)
        policy = spec.GetArgument("out_of_bounds_policy", "error")
        fill = np.asarray(spec.GetArgument("fill_values", [0.0]), np.float32)
        py = float(ctx.arg(self, "crop_pos_y", idx, 0.5))
        px = float(ctx.arg(self, "crop_pos_x", idx, 0.5))
        from .generic2 import _crop_round

        rnd = spec.GetArgument("rounding", "round")
        y = _crop_round(py * (h - crop_h), rnd)
        x = _crop_round(px * (w - crop_w), rnd)
        if vol:
            crop_d = int(ctx.arg(self, "crop_d", idx, 0.0) or 0) or d
            pz = float(ctx.arg(self, "crop_pos_z", idx, 0.5))
            z = _crop_round(pz * (d - crop_d), rnd)
        oob = y < 0 or x < 0 or y + crop_h > h or x + crop_w > w or (
            vol and (z < 0 or z + crop_d > d))
        if oob and policy == "error":
            raise ValueError(
                f"CropMirrorNormalize: crop window {crop_h}x{crop_w} out of "
                f"bounds for {h}x{w} (out_of_bounds_policy='error')")
        if policy == "trim_to_shape":
            y = max(y, 0); x = max(x, 0)
            crop_h = min(crop_h, h - y); crop_w = min(crop_w, w - x)
            if vol:
                z = max(z, 0); crop_d = min(crop_d, d - z)
        pad_mode = oob and policy == "pad"
        sl = (slice(max(z, 0), z + crop_d),) if vol else ()
        win = img[sl + (slice(max(y, 0), y + crop_h),
                        slice(max(x, 0), x + crop_w))].astype(np.float32)
        oob_mask = None
        if pad_mode:
            # pad up to the requested window; mask remembers what was padded
            # (fill_values are final OUTPUT values — not normalized)
            pads = []
            if vol:
                pads.append((max(-z, 0), crop_d - win.shape[0] - max(-z, 0)))
            pads += [(max(-y, 0), crop_h - win.shape[-3] - max(-y, 0)),
                     (max(-x, 0), crop_w - win.shape[-2] - max(-x, 0)), (0, 0)]
            oob_mask = np.pad(np.zeros(win.shape[:-1], bool), [p for p in pads[:-1]],
                              constant_values=True)
            win = np.pad(win, pads)
        m = ctx.arg(self, "mirror", idx, 0)
        if int(np.asarray(m)) != 0:
            win = win[..., :, ::-1, :]
            if oob_mask is not None:
                oob_mask = oob_mask[..., :, ::-1]
        mean = np.asarray(spec.GetArgument("mean", [0.0]), np.float32)
        std = np.asarray(spec.GetArgument("std", [1.0]), np.float32)
        scale = float(spec.GetArgument("scale", 1.0))
        shift = float(spec.GetArgument("shift", 0.0))
        out = scale * (win - mean) / std + shift
        if oob_mask is not None:
            out[oob_mask] = fill if fill.size == c else fill.reshape(-1)[0]
        if spec.GetArgument("pad_output", False) and c < 4:
            out = np.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, 4 - c)])
        layout = spec.GetArgument("output_layout", "CHW")
        if layout in ("CHW", "FCHW", "DCHW"):
            out = np.transpose(out, (0, 3, 1, 2) if out.ndim == 4 else (2, 0, 1))
        dtype = to_numpy_type(spec.GetArgument("dtype", DALIDataType.FLOAT))
        return np.ascontiguousarray(out.astype(dtype))

    def output_layout(self, output_idx, inputs):
        return self.spec.GetArgument("output_layout", "CHW")


# ===================================== Flip ========================================================

DALI_SCHEMA("Flip").DocStr(
    "Flips images horizontally/vertically (reference ``generic/flip.cc``)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AllowSequences().SupportVolumetric().AddOptionalArg(
    "horizontal", ArgType.INT, "Flip horizontally.", 1, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "vertical", ArgType.INT, "Flip vertically.", 0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "depthwise", ArgType.INT,
    "Flip the depth (D) axis of volumetric DHWC inputs (reference "
    "generic/flip.cc `depthwise`).", 0, tensor_ok=True, per_sample=True
)


@register_operator("Flip", "cpu")
class FlipCPU(Operator):
    def run_sample(self, ctx, idx, img):
        h = int(np.asarray(ctx.arg(self, "horizontal", idx, 1)))
        v = int(np.asarray(ctx.arg(self, "vertical", idx, 0)))
        d = int(np.asarray(ctx.arg(self, "depthwise", idx, 0)))
        vol = img.ndim >= 4  # DHWC
        out = img
        if h:
            out = out[..., :, ::-1, :] if vol else out[:, ::-1]
        if v:
            out = out[..., ::-1, :, :] if vol else out[::-1]
        if d:
            if not vol:
                raise ValueError("Flip depthwise=1 requires volumetric (DHWC) input")
            out = out[::-1]
        return np.ascontiguousarray(out)


@register_operator("Flip", "gpu")
class FlipGPU(Operator):
    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp

        n = inp.data.shape[0]

        def flag(name, default):
            f = jnp.asarray(dctx.arg(self, name, default)).reshape(-1)
            return jnp.broadcast_to(f, (n,)) if f.shape[0] == 1 else f

        h = flag("horizontal", 1)
        v = flag("vertical", 0)
        data = inp.data
        vol = data.ndim == 5 and (inp.layout or "").startswith("D")
        if inp.shapes is None:
            # axes by position from the END (matches the cpu path): W = -2,
            # H = -3 — correct for HWC, DHWC and FHWC alike (a 5-D FHWC
            # batch previously flipped H/F instead of W/H)
            ax_v = data.ndim - 3
            bcast = (n,) + (1,) * (data.ndim - 1)
            out = jnp.where(h.reshape(bcast) != 0,
                            jnp.flip(data, axis=ax_v + 1), data)
            out = jnp.where(v.reshape(bcast) != 0,
                            jnp.flip(out, axis=ax_v), out)
            if vol:
                d_f = flag("depthwise", 0)
                out = jnp.where(d_f.reshape(bcast) != 0,
                                jnp.flip(out, axis=1), out)
            return [inp.with_data(out)]
        if vol:
            # ragged DHWC: flip within per-sample (D, H, W) extents
            D, H, W = data.shape[1:4]
            ed, eh, ew = inp.extent(0), inp.extent(1), inp.extent(2)
            d_f = flag("depthwise", 0)
            deps = jnp.arange(D)[None, :]
            rows = jnp.arange(H)[None, :]
            cols = jnp.arange(W)[None, :]
            dep_idx = jnp.where(
                (d_f[:, None] != 0) & (deps < ed[:, None]), ed[:, None] - 1 - deps, deps)
            row_idx = jnp.where(
                (v[:, None] != 0) & (rows < eh[:, None]), eh[:, None] - 1 - rows, rows)
            col_idx = jnp.where(
                (h[:, None] != 0) & (cols < ew[:, None]), ew[:, None] - 1 - cols, cols)
            out = jax.vmap(lambda img, di, ri, ci: img[di][:, ri][:, :, ci])(
                data, dep_idx, row_idx, col_idx)
            return [inp.with_data(out)]
        # ragged: flip within the valid extent via index arithmetic; FHWC
        # sequences flip H/W per frame (shapes columns are (F, H, W, C))
        seq = data.ndim == 5
        sp = 1 if seq else 0
        H, W = data.shape[1 + sp], data.shape[2 + sp]
        ext_h = inp.extent(0 + sp)
        ext_w = inp.extent(1 + sp)
        rows = jnp.arange(H)[None, :]  # [1, H]
        cols = jnp.arange(W)[None, :]
        row_idx = jnp.where(
            (v[:, None] != 0) & (rows < ext_h[:, None]), ext_h[:, None] - 1 - rows, rows
        )
        col_idx = jnp.where(
            (h[:, None] != 0) & (cols < ext_w[:, None]), ext_w[:, None] - 1 - cols, cols
        )
        if seq:
            out = jax.vmap(lambda img, ri, ci: img[:, ri][:, :, ci])(data, row_idx, col_idx)
        else:
            out = jax.vmap(lambda img, ri, ci: img[ri][:, ci])(data, row_idx, col_idx)
        return [inp.with_data(out)]


import jax  # noqa: E402  (used inside FlipGPU.lower)


class _SequenceDctx:
    """DeviceCtx proxy that repeats per-sample args per frame (PerFrame-less
    default: one value per sequence, reference sequence broadcasting)."""

    def __init__(self, dctx, frames):
        self._d = dctx
        self._f = frames
        self.batch_size = dctx.batch_size * frames

    def key(self, op):
        return self._d.key(op)

    def param(self, op, name):
        import jax.numpy as jnp

        return jnp.repeat(self._d.param(op, name), self._f, axis=0)

    def has_param(self, op, name):
        return self._d.has_param(op, name)

    def has_tensor_arg(self, op, name):
        return self._d.has_tensor_arg(op, name)

    def static(self, op):
        return self._d.static(op)

    def arg(self, op, name, default=None):
        import jax.numpy as jnp

        v = self._d.arg(op, name, default)
        if self._d.has_tensor_arg(op, name):
            return jnp.repeat(jnp.asarray(v), self._f, axis=0)
        return v

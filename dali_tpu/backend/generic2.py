"""More generic operators: Slice, Crop, Erase, Normalize, Join (cat/stack),
PermuteBatch, LookupTable, full/zeros/ones family, GetProperty.

Reference: ``dali/operators/generic/`` (slice.cc, erase.cc, join.cc,
permute_batch.cc, lookup_table.cc, constant_value.cc), ``dali/operators/image/crop/crop.cc``,
``dali/operators/math/normalize/normalize.cc``, ``util/get_property.cc``.
"""

from __future__ import annotations

import numpy as np

from .._schema import DALI_SCHEMA, ArgType, register_operator
from ..batch import DeviceBatch, HostBatch
from ..types import DALIImageType, DALIDataType, to_jnp_type, to_numpy_type
from .base import Operator

# ======================================== Slice ==================================================

DALI_SCHEMA("Slice").DocStr(
    """Extracts a subtensor per sample (reference generic/slice.cc): anchor/shape
    given as kwargs (absolute or relative) or as two positional inputs."""
).NumInput(1, 3).NumOutput(1).Devices("cpu", "gpu").AllowSequences().AddOptionalArg(
    "start", ArgType.FLOAT_VEC, "Absolute anchor.", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "rel_start", ArgType.FLOAT_VEC, "Relative anchor.", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "end", ArgType.FLOAT_VEC, "Absolute end.", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "rel_end", ArgType.FLOAT_VEC, "Relative end.", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "shape", ArgType.FLOAT_VEC, "Absolute shape.", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "rel_shape", ArgType.FLOAT_VEC, "Relative shape.", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "axes", ArgType.INT_VEC, "Axes the anchor/shape refer to.", None
).AddOptionalArg(
    "axis_names", ArgType.TENSOR_LAYOUT, "Axes by layout name.", None
).AddOptionalArg(
    "normalized_anchor", ArgType.BOOL, "Positional anchor input is relative.", True
).AddOptionalArg(
    "normalized_shape", ArgType.BOOL, "Positional shape input is relative.", True
).AddOptionalArg(
    "out_of_bounds_policy", ArgType.STRING, '"error", "pad", "trim_to_shape".', "error"
).AddOptionalArg("fill_values", ArgType.FLOAT_VEC, "Padding values for policy 'pad'.", [0.0]).AddOptionalArg(
    "dtype", ArgType.DATA_TYPE, "Output dtype.", None
)


def _slice_axes(spec, layout, ndim):
    names = spec.GetArgument("axis_names", None)
    if names:
        if not layout:
            raise ValueError(
                f"{spec.schema.name}: axis_names={names!r} requires a layout "
                "on the input; pass `axes` (by index) instead")
        missing = [c for c in names if c not in layout]
        if missing:
            raise ValueError(
                f"{spec.schema.name}: axis name(s) {missing} not in input "
                f"layout {layout!r}")
        return [layout.index(c) for c in names]
    axes = spec.GetArgument("axes", None)
    if axes is not None and len(axes):
        return [a % ndim for a in axes]
    # reference SliceAttr defaults (slice_attr.cc:33-38): axis_names="WH"
    # (resolved against the layout, highest priority), else axes=[1, 0];
    # 1-D inputs keep the pragmatic [0] (the reference errors there unless
    # axes is passed explicitly)
    if layout and "W" in layout and "H" in layout:
        return [layout.index("W"), layout.index("H")]
    if ndim >= 2:
        return [1, 0]
    return [0]


@register_operator("Slice", "cpu")
class SliceCPU(Operator):
    def run_batch(self, ctx, *inputs):
        # axis_names resolves against the data input's layout
        self._in_layout = inputs[0].layout if inputs else ""
        return super().run_batch(ctx, *inputs)

    def run_sample(self, ctx, idx, data, *pos):
        spec = self.spec
        layout = getattr(self, "_in_layout", "")
        ndim = data.ndim
        axes = _slice_axes(spec, layout, ndim)

        def geta(name):
            v = ctx.arg(self, name, idx, None)
            return None if v is None else np.asarray(v, np.float64).reshape(-1)

        if pos:
            anchor = np.asarray(pos[0], np.float64).reshape(-1)
            shape = np.asarray(pos[1], np.float64).reshape(-1) if len(pos) > 1 else None
            if spec.GetArgument("normalized_anchor", True):
                anchor = anchor * np.array([data.shape[a] for a in axes])
            if shape is not None and spec.GetArgument("normalized_shape", True):
                shape = shape * np.array([data.shape[a] for a in axes])
        else:
            anchor = geta("start")
            if anchor is None:
                ra = geta("rel_start")
                anchor = ra * np.array([data.shape[a] for a in axes]) if ra is not None else np.zeros(len(axes))
            shape = geta("shape")
            if shape is None:
                rs = geta("rel_shape")
                if rs is not None:
                    shape = rs * np.array([data.shape[a] for a in axes])
            if shape is None:
                end = geta("end")
                if end is None:
                    re = geta("rel_end")
                    end = re * np.array([data.shape[a] for a in axes]) if re is not None else None
                if end is not None:
                    shape = end - anchor
            if shape is None:
                shape = np.array([data.shape[a] for a in axes]) - anchor

        anchor = np.round(anchor).astype(np.int64)
        shape = np.round(shape).astype(np.int64)
        policy = spec.GetArgument("out_of_bounds_policy", "error")
        slices = [slice(None)] * ndim
        pads = [(0, 0)] * ndim
        for k, a in enumerate(axes):
            lo, ln = int(anchor[k]), int(shape[k])
            hi = lo + ln
            if lo < 0 or hi > data.shape[a]:
                if policy == "error":
                    raise ValueError(
                        f"Slice [{lo}, {hi}) out of bounds for dim {a} (size {data.shape[a]})"
                    )
                if policy == "trim_to_shape":
                    lo2, hi2 = max(lo, 0), min(hi, data.shape[a])
                    slices[a] = slice(lo2, hi2)
                    continue
                # pad
                pads[a] = (max(-lo, 0), max(hi - data.shape[a], 0))
                slices[a] = slice(max(lo, 0), min(hi, data.shape[a]))
            else:
                slices[a] = slice(lo, hi)
        out = data[tuple(slices)]
        if any(p != (0, 0) for p in pads):
            fill = spec.GetArgument("fill_values", [0.0])[0]
            out = np.pad(out, pads, constant_values=fill)
        dt = spec.GetArgument("dtype", None)
        if dt is not None:
            out = out.astype(to_numpy_type(dt))
        return np.ascontiguousarray(out)


# ======================================== Crop ====================================================

DALI_SCHEMA("Crop").DocStr(
    "Fixed-size window crop (reference image/crop/crop.cc)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AllowSequences().AddOptionalArg(
    "crop", ArgType.FLOAT_VEC, "Crop size (H, W).", None
).AddOptionalArg(
    "crop_h", ArgType.FLOAT, "Crop height.", 0.0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "crop_w", ArgType.FLOAT, "Crop width.", 0.0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "crop_pos_x", ArgType.FLOAT, "Window x in [0,1].", 0.5, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "crop_pos_y", ArgType.FLOAT, "Window y in [0,1].", 0.5, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "out_of_bounds_policy", ArgType.STRING, '"error"|"pad"|"trim_to_shape".', "error"
).AddOptionalArg("fill_values", ArgType.FLOAT_VEC, "Pad fill.", [0.0]).AddOptionalArg(
    "dtype", ArgType.DATA_TYPE, "Output dtype.", None
).AddOptionalArg(
    "image_type", ArgType.IMAGE_TYPE,
    "Compatibility arg (deprecated in the reference; ignored).",
    DALIImageType.RGB
).DeprecateArg(
    "image_type", None, "the reference removed it in 0.25 (ignored here)"
).AddOptionalArg(
    "crop_d", ArgType.FLOAT, "Volumetric crop depth (DHWC inputs; cpu).", 0.0,
    tensor_ok=True, per_sample=True
).AddOptionalArg(
    "crop_pos_z", ArgType.FLOAT, "Volumetric window z in [0,1] (cpu).", 0.5,
    tensor_ok=True, per_sample=True
).AddOptionalArg(
    "rounding", ArgType.STRING,
    'Window-start conversion to integer: "round" (half away from zero) or '
    '"truncate" (toward zero). Reference crop_attr.cc `rounding`.', "round"
)


def _crop_round(v, mode):
    """Reference crop_attr.cc round_fn_: std::round (half away from zero) or
    truncation toward zero."""
    v = float(v)
    if mode == "truncate":
        return int(v)
    return int(np.floor(v + 0.5)) if v >= 0 else int(np.ceil(v - 0.5))


def crop_round_jnp(mode):
    """Traced variant of _crop_round for device lowerings."""
    import jax.numpy as jnp

    if mode == "truncate":
        return jnp.trunc
    return lambda v: jnp.trunc(v + jnp.copysign(0.5, v))  # std::round


class _CropCommon(Operator):
    def _size(self):
        crop = self.spec.GetArgument("crop", None)
        if crop:
            return int(crop[0]), int(crop[1])
        ch = int(self.spec.GetArgument("crop_h", 0.0) or 0)
        cw = int(self.spec.GetArgument("crop_w", 0.0) or 0)
        if ch and cw:
            return ch, cw
        raise ValueError("Crop requires `crop` or crop_h/crop_w")

    def _size_sample(self, ctx, idx):
        """Per-sample window: crop_h/crop_w may be TENSOR args (reference
        CropAttr argument inputs)."""
        crop = self.spec.GetArgument("crop", None)
        if crop:
            return int(crop[0]), int(crop[1])
        ch = int(np.asarray(ctx.arg(self, "crop_h", idx, 0.0)) or 0)
        cw = int(np.asarray(ctx.arg(self, "crop_w", idx, 0.0)) or 0)
        if ch and cw:
            return ch, cw
        raise ValueError("Crop requires `crop` or crop_h/crop_w")

    def _has_tensor_size(self):
        return ("crop_h" in self.spec.arg_inputs or
                "crop_w" in self.spec.arg_inputs)


@register_operator("Crop", "cpu")
class CropCPU(_CropCommon):
    def run_sample(self, ctx, idx, img):
        ch, cw = self._size_sample(ctx, idx)
        rnd = self.spec.GetArgument("rounding", "round")
        if img.ndim == 4:  # DHWC: crop depth first, then the 2-D path
            d = img.shape[0]
            cd = int(np.asarray(ctx.arg(self, "crop_d", idx, 0.0)) or 0) or d
            pz = float(np.asarray(ctx.arg(self, "crop_pos_z", idx, 0.5)))
            z = max(_crop_round(pz * (d - cd), rnd), 0)
            img = img[z : z + cd]
        h, w = img.shape[-3:-1]
        py = float(np.asarray(ctx.arg(self, "crop_pos_y", idx, 0.5)))
        px = float(np.asarray(ctx.arg(self, "crop_pos_x", idx, 0.5)))
        y = _crop_round(py * (h - ch), rnd)
        x = _crop_round(px * (w - cw), rnd)
        if y < 0 or x < 0 or y + ch > h or x + cw > w:
            policy = self.spec.GetArgument("out_of_bounds_policy", "error")
            if policy == "error":
                raise ValueError(f"Crop window {ch}x{cw} out of bounds for {h}x{w}")
        # H/W are the trailing spatial axes (..., H, W, C) — 4-D DHWC inputs
        # keep their (already-cropped) leading depth axis
        out = img[..., max(y, 0) : y + ch, max(x, 0) : x + cw, :]
        if out.shape[-3] != ch or out.shape[-2] != cw:
            fill = self.spec.GetArgument("fill_values", [0.0])[0]
            pad = ([(0, 0)] * (img.ndim - 3)
                   + [(0, ch - out.shape[-3]), (0, cw - out.shape[-2]), (0, 0)])
            out = np.pad(out, pad, constant_values=fill)
        dt = self.spec.GetArgument("dtype", None)
        return np.ascontiguousarray(out.astype(to_numpy_type(dt)) if dt is not None else out)


@register_operator("Crop", "gpu")
class CropGPU(_CropCommon):
    def host_params(self, ctx, input_shapes):
        if not self._has_tensor_size():
            self._ps_sizes = None
            return {}
        # Per-sample window sizes are HOST data (tensor args): compute them
        # here, grow-latch the output canvas, and ship the sizes as params.
        batches = ctx._arg_batches.get(self.op_id, {})
        n = None
        for nm in ("crop_h", "crop_w"):
            if nm in batches:
                n = len(batches[nm].samples)
                break
        if n is None:
            # tensor crop sizes riding a DEVICE edge: not host-known
            raise ValueError(
                "Crop(gpu): tensor crop_h/crop_w must be cpu tensors (the "
                "window sizes drive host-side canvas math)")
        sizes = np.zeros((n, 2), np.int32)
        for i in range(n):
            sizes[i] = self._size_sample(ctx, i)
        latch = getattr(self, "_canvas_latch", [0, 0])
        self._canvas_latch = [max(latch[0], int(sizes[:, 0].max())),
                              max(latch[1], int(sizes[:, 1].max()))]
        self._ps_sizes = sizes
        return {"crop_sizes": sizes}

    def device_statics(self, ctx, input_shapes):
        if getattr(self, "_ps_sizes", None) is None:
            return None
        return ("ps", self._canvas_latch[0], self._canvas_latch[1])

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        sizes = getattr(self, "_ps_sizes", None)
        if sizes is None:
            return None
        sh = input_shapes[0] if input_shapes else None
        if sh is None:
            return None
        sh = np.asarray(sh)
        if sh.shape[1] != 3:
            return None
        out = sh.astype(np.int64).copy()
        out[:, 0] = sizes[:, 0]
        out[:, 1] = sizes[:, 1]
        return [out]

    def _lower_per_sample_sizes(self, dctx, inp):
        """Per-sample (crop_h, crop_w) windows: each sample's crop lands in
        the top-left of a grow-latched canvas; logical extents ride the
        shapes. Row/col TAKE with clipped indices (dynamic_slice would shift
        the window when it runs past the canvas edge)."""
        import jax
        import jax.numpy as jnp

        st = dctx.static(self)
        CH, CW = int(st[1]), int(st[2])
        n = inp.data.shape[0]
        H, W = inp.data.shape[1], inp.data.shape[2]
        sizes = jnp.asarray(dctx.param(self, "crop_sizes"))  # [n, 2] int32
        _r = crop_round_jnp(self.spec.GetArgument("rounding", "round"))

        def arg(name, default):
            v = dctx.arg(self, name, default)
            if dctx.has_tensor_arg(self, name):
                return jnp.asarray(v, jnp.float32).reshape(-1)
            return jnp.full((n,), float(v), jnp.float32)

        py = arg("crop_pos_y", 0.5)
        px = arg("crop_pos_x", 0.5)
        ext_h = inp.extent(0)
        ext_w = inp.extent(1)
        y = jnp.clip(_r(py * (ext_h - sizes[:, 0]).astype(jnp.float32)), 0, None).astype(jnp.int32)
        x = jnp.clip(_r(px * (ext_w - sizes[:, 1]).astype(jnp.float32)), 0, None).astype(jnp.int32)

        def one(im, yy, xx):
            rows = jnp.clip(yy + jnp.arange(CH, dtype=jnp.int32), 0, H - 1)
            cols = jnp.clip(xx + jnp.arange(CW, dtype=jnp.int32), 0, W - 1)
            return jnp.take(jnp.take(im, rows, axis=0), cols, axis=1)

        out = jax.vmap(one)(inp.data, y, x)
        dt = self.spec.GetArgument("dtype", None)
        if dt is not None:
            out = out.astype(to_jnp_type(dt))
        shapes = jnp.stack(
            [sizes[:, 0], sizes[:, 1],
             jnp.full((n,), inp.data.shape[-1], jnp.int32)], axis=1)
        return [DeviceBatch(out, shapes, inp.layout)]

    def lower(self, dctx, inp: DeviceBatch):
        import jax
        import jax.numpy as jnp

        st = dctx.static(self)
        if isinstance(st, tuple) and st and st[0] == "ps":
            if inp.data.ndim != 4:
                raise NotImplementedError(
                    "Crop(gpu): per-sample crop_h/crop_w tensor args support "
                    "HWC inputs only (volumetric/sequence: use the cpu path)")
            return self._lower_per_sample_sizes(dctx, inp)
        ch, cw = self._size()
        vol = inp.data.ndim == 5 and (inp.layout or "").startswith("D")
        n = inp.data.shape[0]
        C = inp.data.shape[-1]

        def arg(name, default):
            v = dctx.arg(self, name, default)
            if dctx.has_tensor_arg(self, name):
                return jnp.asarray(v, jnp.float32).reshape(-1)
            return jnp.full((n,), float(v), jnp.float32)

        _r = crop_round_jnp(self.spec.GetArgument("rounding", "round"))
        py = arg("crop_pos_y", 0.5)
        px = arg("crop_pos_x", 0.5)
        if vol:
            # DHWC: slice depth too (cpu path semantics; reference
            # SupportVolumetric crop)
            D = inp.data.shape[1]
            ext_d = inp.extent(0)
            ext_h = inp.extent(1)
            ext_w = inp.extent(2)
            cd = int(self.spec.GetArgument("crop_d", 0.0) or 0) or D
            pz = arg("crop_pos_z", 0.5)
            z = jnp.clip(_r(pz * (ext_d - cd)), 0, None).astype(jnp.int32)
            y = jnp.clip(_r(py * (ext_h - ch)), 0, None).astype(jnp.int32)
            x = jnp.clip(_r(px * (ext_w - cw)), 0, None).astype(jnp.int32)
            out = jax.vmap(lambda im, zz, yy, xx: jax.lax.dynamic_slice(
                im, (zz, yy, xx, 0), (cd, ch, cw, C)))(inp.data, z, y, x)
        else:
            ext_h = inp.extent(0)
            ext_w = inp.extent(1)
            y = jnp.clip(_r(py * (ext_h - ch)), 0, None).astype(jnp.int32)
            x = jnp.clip(_r(px * (ext_w - cw)), 0, None).astype(jnp.int32)
            out = jax.vmap(lambda im, yy, xx: jax.lax.dynamic_slice(
                im, (yy, xx, 0), (ch, cw, C)))(inp.data, y, x)
        dt = self.spec.GetArgument("dtype", None)
        if dt is not None:
            out = out.astype(to_jnp_type(dt))
        return [DeviceBatch(out, None, inp.layout)]


# ======================================== Erase ====================================================

DALI_SCHEMA("Erase").DocStr(
    "Erases (fills) regions (reference generic/erase/erase.cc)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AllowSequences().AddOptionalArg(
    "anchor", ArgType.FLOAT_VEC, "Region anchors (flattened).", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "shape", ArgType.FLOAT_VEC, "Region shapes (flattened).", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "axes", ArgType.INT_VEC, "Axes the regions refer to.", None
).AddOptionalArg(
    "axis_names", ArgType.TENSOR_LAYOUT, "Axes by layout name.", None
).AddOptionalArg(
    "fill_value", ArgType.FLOAT_VEC, "Fill values.", [0.0]
).AddOptionalArg(
    "normalized_anchor", ArgType.BOOL, "Anchors are relative.", False
).AddOptionalArg(
    "normalized_shape", ArgType.BOOL, "Shapes are relative.", False
).AddOptionalArg("normalized", ArgType.BOOL, "Both relative.", False).AddOptionalArg(
    "centered_anchor", ArgType.BOOL, "Anchors denote region centers.", False
)


@register_operator("Erase", "cpu")
class EraseCPU(Operator):
    def run_batch(self, ctx, *inputs):
        # axis_names resolves against the data input's layout
        self._in_layout = inputs[0].layout if inputs else ""
        return super().run_batch(ctx, *inputs)

    def run_sample(self, ctx, idx, img):
        spec = self.spec
        layout = getattr(self, "_in_layout", "")
        axes = spec.GetArgument("axes", None)
        names = spec.GetArgument("axis_names", None)
        if names and not axes:
            if not layout:
                raise ValueError(
                    f"Erase: axis_names={names!r} requires a layout on the "
                    "input; pass `axes` (by index) instead")
            missing = [c for c in names if c not in layout]
            if missing:
                raise ValueError(
                    f"Erase: axis name(s) {missing} not in input layout "
                    f"{layout!r}")
            axes = [layout.index(c) for c in names]
        if not axes:
            axes = list(range(min(2, img.ndim)))
        nd = len(axes)
        anchor = ctx.arg(self, "anchor", idx, None)
        shape = ctx.arg(self, "shape", idx, None)
        if anchor is None or shape is None:
            return img.copy()
        anchor = np.asarray(anchor, np.float64).reshape(-1, nd)
        shape = np.asarray(shape, np.float64).reshape(-1, nd)
        normalized = spec.GetArgument("normalized", False)
        na = normalized or spec.GetArgument("normalized_anchor", False)
        ns = normalized or spec.GetArgument("normalized_shape", False)
        dims = np.array([img.shape[a] for a in axes], np.float64)
        if na:
            anchor = anchor * dims
        if ns:
            shape = shape * dims
        if spec.GetArgument("centered_anchor", False):
            anchor = anchor - shape / 2
        fill = spec.GetArgument("fill_value", [0.0])
        out = img.copy()
        for r in range(anchor.shape[0]):
            sl = [slice(None)] * img.ndim
            for k, a in enumerate(axes):
                lo = int(round(anchor[r, k]))
                hi = lo + int(round(shape[r, k]))
                sl[a] = slice(max(lo, 0), max(min(hi, img.shape[a]), 0))
            region = out[tuple(sl)]
            fv = np.asarray(fill, out.dtype)
            if fv.size == 1:
                region[...] = fv.reshape(-1)[0]
            else:
                region[...] = fv.reshape((1,) * (region.ndim - 1) + (-1,))
        return out


# ======================================== Normalize ================================================

DALI_SCHEMA("Normalize").DocStr(
    """Mean/stddev normalization (reference math/normalize/normalize.cc):
    out = scale * (in - mean) / stddev + shift; mean/stddev computed over ``axes``
    unless given; ``batch=True`` normalizes across the whole batch."""
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AllowSequences().AddOptionalArg(
    "axes", ArgType.INT_VEC, "Reduction axes.", None
).AddOptionalArg(
    "axis_names", ArgType.TENSOR_LAYOUT, "Reduction axes by name.", None
).AddOptionalArg(
    "mean", ArgType.FLOAT, "Fixed mean.", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "stddev", ArgType.FLOAT, "Fixed stddev.", None, tensor_ok=True, per_sample=True
).AddOptionalArg("batch", ArgType.BOOL, "Normalize across the whole batch.", False).AddOptionalArg(
    "scale", ArgType.FLOAT, "Output scale.", 1.0
).AddOptionalArg("shift", ArgType.FLOAT, "Output shift.", 0.0).AddOptionalArg(
    "epsilon", ArgType.FLOAT, "Added to variance.", 0.0
).AddOptionalArg("ddof", ArgType.INT, "Delta degrees of freedom.", 0).AddOptionalArg(
    "dtype", ArgType.DATA_TYPE, "Output dtype.", DALIDataType.FLOAT
)


def _norm_axes(spec, ndim, layout=""):
    names = spec.GetArgument("axis_names", None)
    if names and layout:
        return tuple(layout.index(c) for c in names)
    axes = spec.GetArgument("axes", None)
    if axes:
        return tuple(a % ndim for a in axes)
    return tuple(range(ndim))


@register_operator("Normalize", "cpu")
class NormalizeCPU(Operator):
    def run_batch(self, ctx, inp: HostBatch):
        spec = self.spec
        dt = to_numpy_type(spec.GetArgument("dtype", DALIDataType.FLOAT))
        scale = spec.GetArgument("scale", 1.0)
        shift = spec.GetArgument("shift", 0.0)
        eps = spec.GetArgument("epsilon", 0.0)
        ddof = spec.GetArgument("ddof", 0)
        batch_mode = spec.GetArgument("batch", False)
        outs = []
        if batch_mode:
            flat = np.concatenate([s.astype(np.float64).reshape(-1) for s in inp.samples])
            mean = flat.mean()
            var = flat.var(ddof=ddof)
            std = np.sqrt(var + eps)
            for s in inp.samples:
                outs.append((scale * (s.astype(np.float64) - mean) / max(std, 1e-12) + shift).astype(dt))
            return [HostBatch(outs, layout=inp.layout)]
        for i, s in enumerate(inp.samples):
            axes = _norm_axes(spec, s.ndim, inp.layout)
            mean = ctx.arg(self, "mean", i, None)
            std = ctx.arg(self, "stddev", i, None)
            x = s.astype(np.float64)
            m = x.mean(axis=axes, keepdims=True) if mean is None else np.asarray(mean, np.float64)
            if std is None:
                var = ((x - m) ** 2).mean(axis=axes, keepdims=True)
                if ddof:
                    nred = np.prod([s.shape[a] for a in axes])
                    var = var * nred / max(nred - ddof, 1)
                sd = np.sqrt(var + eps)
            else:
                sd = np.asarray(std, np.float64)
            sd = np.where(sd == 0, 1.0, sd)
            outs.append((scale * (x - m) / sd + shift).astype(dt))
        return [HostBatch(outs, layout=inp.layout)]


@register_operator("Normalize", "gpu")
class NormalizeGPU(Operator):
    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp

        spec = self.spec
        dt = to_jnp_type(spec.GetArgument("dtype", DALIDataType.FLOAT))
        scale = spec.GetArgument("scale", 1.0)
        shift = spec.GetArgument("shift", 0.0)
        eps = spec.GetArgument("epsilon", 0.0)
        x = inp.data.astype(jnp.float32)
        sample_axes = _norm_axes(spec, x.ndim - 1, inp.layout)
        axes = tuple(a + 1 for a in sample_axes)
        if spec.GetArgument("batch", False):
            axes = (0,) + axes
        mean_arg = dctx.arg(self, "mean", None)
        std_arg = dctx.arg(self, "stddev", None)

        def fixed(v, name):
            """Fixed mean/stddev: per-sample tensor args arrive as [N, ...]
            and must broadcast RIGHT-ALIGNED over each sample's dims (cpu/
            numpy semantics); constants broadcast as scalars."""
            v = jnp.asarray(v, jnp.float32)
            if not dctx.has_tensor_arg(self, name):
                return v
            pad = x.ndim - v.ndim
            return v.reshape(v.shape[0], *([1] * pad), *v.shape[1:])

        if inp.shapes is None:
            m = x.mean(axis=axes, keepdims=True) if mean_arg is None else fixed(mean_arg, "mean")
            if std_arg is None:
                sd = jnp.sqrt(((x - m) ** 2).mean(axis=axes, keepdims=True) + eps)
            else:
                sd = fixed(std_arg, "stddev")
        else:
            # ragged: masked moments over each sample's valid region only
            mask = jnp.ones(x.shape, bool)
            for d in range(x.ndim - 1):
                ext = inp.extent(d)
                idx = jnp.arange(x.shape[d + 1]).reshape(
                    *([1] * (d + 1)), -1, *([1] * (x.ndim - d - 2))
                )
                mask = mask & (idx < ext.reshape(-1, *([1] * (x.ndim - 1))))
            w = mask.astype(jnp.float32)
            count = jnp.maximum(w.sum(axis=axes, keepdims=True), 1.0)
            if mean_arg is None:
                m = (x * w).sum(axis=axes, keepdims=True) / count
            else:
                m = fixed(mean_arg, "mean")
            if std_arg is None:
                var = (((x - m) * w) ** 2).sum(axis=axes, keepdims=True) / count
                sd = jnp.sqrt(var + eps)
            else:
                sd = fixed(std_arg, "stddev")
        sd = jnp.where(sd == 0, 1.0, sd)
        out = (scale * (x - m) / sd + shift).astype(dt)
        return [inp.with_data(out)]


# ======================================== Join (cat / stack) ========================================

DALI_SCHEMA("Cat").DocStr("Concatenate samples along an axis (reference generic/join.cc).").NumInput(
    1, 16
).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg("axis", ArgType.INT, "Join axis.", 0).AddOptionalArg(
    "axis_name", ArgType.TENSOR_LAYOUT, "Join axis by name.", None
)

DALI_SCHEMA("Stack").DocStr("Stack samples along a new axis (reference generic/join.cc).").NumInput(
    1, 16
).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg("axis", ArgType.INT, "New axis position.", 0).AddOptionalArg(
    "axis_name", ArgType.TENSOR_LAYOUT, "New axis name.", None
)


@register_operator("Cat", "cpu")
class CatCPU(Operator):
    def run_batch(self, ctx, *inputs):
        # axis_name resolves against the data input's layout (join.cc:201-206)
        self._in_layout = inputs[0].layout if inputs else ""
        return super().run_batch(ctx, *inputs)

    def run_sample(self, ctx, idx, *inputs):
        axis = self.spec.GetArgument("axis", 0)
        name = self.spec.GetArgument("axis_name", None)
        if name:
            layout = getattr(self, "_in_layout", "")
            axis = layout.find(name)
            if axis < 0:
                raise ValueError(
                    f"Cat: axis_name={name!r} not found in input layout "
                    f"{layout!r}")
        return np.concatenate(inputs, axis=axis)


@register_operator("Stack", "cpu")
class StackCPU(Operator):
    def run_batch(self, ctx, *inputs):
        self._in_layout = inputs[0].layout if inputs else ""
        return super().run_batch(ctx, *inputs)

    def run_sample(self, ctx, idx, *inputs):
        axis = self.spec.GetArgument("axis", 0)
        return np.stack(inputs, axis=axis)

    def output_layout(self, output_idx, inputs):
        return _stack_layout(self.spec, getattr(self, "_in_layout", ""))


class _JoinAxisMixin:
    def _join_axis(self, ctx, ndim):
        axis = self.spec.GetArgument("axis", 0)
        name = self.spec.GetArgument("axis_name", None)
        if name:
            il = (ctx.in_layouts(self) or [""])[0]
            i = il.find(name)
            if i < 0:
                raise ValueError(
                    f"{self.spec.schema.name}: axis_name={name!r} not found in "
                    f"input layout {il!r}")
            axis = i
        if axis < 0:
            axis += ndim
        return axis


@register_operator("Cat", "gpu")
class CatGPU(_JoinAxisMixin, Operator):
    def host_output_shapes(self, ctx, input_shapes, input_batches):
        if not input_shapes or any(s is None for s in input_shapes):
            return None
        shs = [np.asarray(s).astype(np.int64) for s in input_shapes]
        axis = self._join_axis(ctx, shs[0].shape[1])
        out = shs[0].copy()
        out[:, axis] = np.sum([s[:, axis] for s in shs], axis=0)
        return [out]

    def host_params(self, ctx, input_shapes):
        if any(s is None for s in input_shapes):
            self._mode = ("concat", self._join_axis(ctx, None))
            return {}
        shs = [np.asarray(s) for s in input_shapes]
        axis = self._join_axis(ctx, shs[0].shape[1])
        self._mode = ("place", axis)
        n = shs[0].shape[0]
        # running per-sample start offset of each input along the join axis
        offsets = np.zeros((n, len(shs)), np.int32)
        acc = np.zeros((n,), np.int64)
        for k, s in enumerate(shs):
            offsets[:, k] = acc
            acc = acc + s[:, axis]
        return {"cat_offsets": offsets}

    def _join_axis(self, ctx, ndim):
        ax = self.spec.GetArgument("axis", 0)
        if ndim is None and (ax < 0 or self.spec.GetArgument("axis_name", None)):
            raise RuntimeError(
                "Cat(gpu): negative axis / axis_name need host-known input "
                "shapes; the producing op must implement host_output_shapes")
        return super()._join_axis(ctx, ndim)

    def device_statics(self, ctx, input_shapes):
        return self._mode

    def lower(self, dctx, *inputs: DeviceBatch):
        import jax
        import jax.numpy as jnp

        mode, axis0 = dctx.static(self)
        axis = axis0 + 1
        if len(inputs) == 1:
            return [inputs[0]]
        if mode == "concat":
            return [DeviceBatch(
                jnp.concatenate([i.data for i in inputs], axis=axis), None,
                inputs[0].layout)]
        # Placement-exact join: each input's true rows start where the previous
        # input's true rows END — not at its padded-canvas end — so write each
        # canvas with dynamic_update_slice at the per-sample running offset.
        # Later writes overwrite earlier inputs' canvas padding; the final
        # input's padding tail lies past the logical extent and is trimmed by
        # the propagated host shapes. (reference generic/join.cc joins true
        # sample extents on the host; here placement happens on-device.)
        offsets = jnp.asarray(dctx.param(self, "cat_offsets"))  # [n, k]
        ndim = inputs[0].data.ndim
        out_shape = list(inputs[0].data.shape)
        out_shape[axis] = sum(i.data.shape[axis] for i in inputs)
        for d in range(1, ndim):
            if d != axis:
                out_shape[d] = max(i.data.shape[d] for i in inputs)
        out = jnp.zeros(out_shape, inputs[0].data.dtype)

        def place(dst, src, o, _axis=axis, _nd=ndim):
            starts = [jnp.int32(0)] * (_nd - 1)
            starts[_axis - 1] = o
            return jax.lax.dynamic_update_slice(dst, src, tuple(starts))

        for k, inp in enumerate(inputs):
            out = jax.vmap(place)(out, inp.data, offsets[:, k])
        return [DeviceBatch(out, None, inputs[0].layout)]


def _stack_layout(spec, in_layout):
    """reference join.cc:54-87 — Stack's axis_name NAMES the new axis; it is
    inserted into the input layout at `axis` (empty when unset)."""
    name = spec.GetArgument("axis_name", None)
    if not name or not in_layout:
        return ""
    axis = spec.GetArgument("axis", 0)
    if axis < 0:
        axis += len(in_layout) + 1
    return in_layout[:axis] + name + in_layout[axis:]


@register_operator("Stack", "gpu")
class StackGPU(Operator):
    def _stack_axis(self, ndim_in):
        axis = self.spec.GetArgument("axis", 0)
        return axis + ndim_in + 1 if axis < 0 else axis

    def host_output_layouts(self, in_layouts):
        return [_stack_layout(self.spec, in_layouts[0] if in_layouts else "")]

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        if not input_shapes or input_shapes[0] is None:
            return None
        sh = np.asarray(input_shapes[0]).astype(np.int64)
        axis = self._stack_axis(sh.shape[1])
        # count the ACTUAL inputs, not spec.inputs — eager (ndd) mode builds
        # the OpSpec without traced input nodes (spec.inputs would be 0)
        n_in = len(input_shapes)
        new_col = np.full((sh.shape[0], 1), n_in, np.int64)
        return [np.concatenate([sh[:, :axis], new_col, sh[:, axis:]], axis=1)]

    def lower(self, dctx, *inputs: DeviceBatch):
        import jax.numpy as jnp

        axis = self._stack_axis(inputs[0].data.ndim - 1) + 1
        layout = _stack_layout(self.spec, inputs[0].layout)
        return [DeviceBatch(jnp.stack([i.data for i in inputs], axis=axis), None, layout)]


# ======================================== PermuteBatch ==============================================

DALI_SCHEMA("PermuteBatch").DocStr(
    "Reorders samples in the batch by indices (reference generic/permute_batch.cc)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddArg(
    "indices", ArgType.INT_VEC, "Source index for each output sample.", tensor_ok=True, per_sample=True
)


@register_operator("PermuteBatch", "cpu")
class PermuteBatchCPU(Operator):
    def run_batch(self, ctx, inp: HostBatch):
        idx_arg = ctx.arg(self, "indices", None)
        if isinstance(idx_arg, HostBatch):
            indices = [int(np.asarray(s).reshape(-1)[0]) for s in idx_arg.samples]
        else:
            indices = [int(v) for v in idx_arg]
        return [HostBatch([inp.samples[i] for i in indices], layout=inp.layout)]


@register_operator("PermuteBatch", "gpu")
class PermuteBatchGPU(Operator):
    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp

        idx = dctx.arg(self, "indices")
        idx = jnp.asarray(idx).reshape(-1)
        shapes = inp.shapes[idx] if inp.shapes is not None else None
        return [DeviceBatch(inp.data[idx], shapes, inp.layout)]


# ======================================== LookupTable ================================================

DALI_SCHEMA("LookupTable").DocStr(
    "Value mapping through a lookup table (reference generic/lookup_table.cc)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AllowSequences().AddOptionalArg(
    "keys", ArgType.INT_VEC, "Keys.", None
).AddOptionalArg(
    "values", ArgType.FLOAT_VEC, "Values for the keys.", None
).AddOptionalArg(
    "default_value", ArgType.FLOAT, "Value for unmapped keys.", 0.0
).AddOptionalArg("dtype", ArgType.DATA_TYPE, "Output dtype.", DALIDataType.FLOAT)


class _LUTCommon(Operator):
    def _table(self):
        keys = self.spec.GetArgument("keys", None) or []
        values = self.spec.GetArgument("values", None) or []
        default = self.spec.GetArgument("default_value", 0.0)
        lut = np.full(0x10000, default, np.float32)
        for k, v in zip(keys, values):
            lut[int(k)] = v
        return lut


@register_operator("LookupTable", "cpu")
class LookupTableCPU(_LUTCommon):
    def run_sample(self, ctx, idx, x):
        lut = self._table()
        dt = to_numpy_type(self.spec.GetArgument("dtype", DALIDataType.FLOAT))
        return lut[x.astype(np.int64)].astype(dt)


@register_operator("LookupTable", "gpu")
class LookupTableGPU(_LUTCommon):
    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp

        lut = jnp.asarray(self._table())
        dt = to_jnp_type(self.spec.GetArgument("dtype", DALIDataType.FLOAT))
        out = lut[inp.data.astype(jnp.int32)].astype(dt)
        return [inp.with_data(out)]


# ================================== Full / Zeros / Ones family ======================================


def _value_schema(name, doc):
    return (
        DALI_SCHEMA(name)
        .DocStr(doc + " (reference generic/constant_value.cc)")
        .NumInput(0, 1)
        .NumOutput(1)
        .Devices("cpu", "gpu")
        .AddOptionalArg("shape", ArgType.INT_VEC, "Output shape.", None, tensor_ok=True, per_sample=True)
        .AddOptionalArg("dtype", ArgType.DATA_TYPE, "Output dtype.", None)
        .AddOptionalArg("layout", ArgType.STRING,
                        "Layout string of the output (reference "
                        "generic/constant_value.cc `layout`).", None)
    )


_value_schema("Zeros", "Batch of zero tensors.")
_value_schema("Ones", "Batch of one tensors.")
_value_schema("Full", "Batch filled with `fill_value`.").AddArg(
    "fill_value", ArgType.FLOAT_VEC, "Fill value(s).", tensor_ok=True, per_sample=True
)
_value_schema("ZerosLike", "Zeros with input's shape.")
_value_schema("OnesLike", "Ones with input's shape.")
_value_schema("FullLike", "`fill_value` with input's shape.").AddArg(
    "fill_value", ArgType.FLOAT_VEC, "Fill value(s).", tensor_ok=True, per_sample=True
)


class _ValueOpCPU(Operator):
    fill = 0.0
    like = False

    def output_layout(self, output_idx, inputs):
        explicit = self.spec.GetArgument("layout", None)
        if explicit:
            return explicit
        return inputs[0].layout if (self.like and inputs) else ""

    def run_sample(self, ctx, idx, *inputs):
        if self.like:
            shape = inputs[0].shape
            base_dt = inputs[0].dtype
        else:
            shp = ctx.arg(self, "shape", idx, None)
            shape = tuple(int(v) for v in np.asarray(shp).reshape(-1)) if shp is not None else ()
            base_dt = np.dtype(np.int32)
        dt_arg = self.spec.GetArgument("dtype", None)
        dt = to_numpy_type(dt_arg) if dt_arg is not None else base_dt
        fv = self.fill
        if fv is None:  # Full/FullLike
            fv = np.asarray(ctx.arg(self, "fill_value", idx, 0.0))
            if fv.size > 1:
                return np.broadcast_to(fv.astype(dt), shape if shape else fv.shape).copy()
            fv = fv.reshape(-1)[0]
            if dt_arg is None and not self.like:
                dt = np.asarray(ctx.arg(self, "fill_value", idx, 0.0)).dtype
        return np.full(shape, fv, dtype=dt)


for _nm, _fill, _like in (
    ("Zeros", 0.0, False),
    ("Ones", 1.0, False),
    ("Full", None, False),
    ("ZerosLike", 0.0, True),
    ("OnesLike", 1.0, True),
    ("FullLike", None, True),
):
    register_operator(_nm, "cpu")(type(_nm + "CPU", (_ValueOpCPU,), {"fill": _fill, "like": _like}))


# ======================================== GetProperty ================================================

DALI_SCHEMA("GetProperty").DocStr(
    "Extracts a metadata property of the input (reference util/get_property.cc)."
).NumInput(1).NumOutput(1).Devices("cpu").AddArg("key", ArgType.STRING, "'source_info' or 'layout'.")


@register_operator("GetProperty", "cpu")
class GetProperty(Operator):
    def run_batch(self, ctx, inp: HostBatch):
        key = self.spec.GetArgument("key")
        if key == "layout":
            payload = np.frombuffer(inp.layout.encode(), dtype=np.uint8)
            return [HostBatch([payload.copy() for _ in inp.samples])]
        if key == "source_info":
            infos = inp.source_info or [""] * len(inp.samples)
            return [
                HostBatch([np.frombuffer(str(s).encode(), dtype=np.uint8).copy() for s in infos])
            ]
        raise ValueError(f"Unknown property '{key}'")

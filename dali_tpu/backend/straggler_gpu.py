"""Device (gpu) lowerings for operators that round 1 left cpu-only.

Reference GPU counterparts:
  CoordFlip            geometry/coord_flip.cc (GPU backend)
  noise.Shot           noise/shot_noise.h (GPU rng kernels)
  Erode/Dilate         image/morphology/morphology.cc (CV-CUDA)
  MedianBlur           image/morphology (CV-CUDA MedianBlur)
  NonsilentRegion      kernels/signal/moving_mean_square.cu
  TensorResize         generic/resize/tensor_resize.cc (GPU)
  MultiPaste           image/paste/multipaste.cu
  JpegCompressionDistortion  kernels/imgproc/jpeg/ (DCT-domain GPU kernel)

Each lowering is an XLA program over the padded batch canvas: per-sample
raggedness is handled with iota masks / clipped gathers instead of per-sample
kernel launches, and everything fuses into the pipeline's single jitted
device program.
"""

from __future__ import annotations

import numpy as np

from .._schema import register_operator
from ..batch import DeviceBatch
from ..types import DALIInterpType
from .base import Operator

# ====================================== CoordFlip ==================================================


@register_operator("CoordFlip", "gpu")
class CoordFlipGPU(Operator):
    def host_output_shapes(self, ctx, input_shapes, input_batches):
        return [input_shapes[0]]

    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp

        layout = self.spec.GetArgument("layout", "xy")
        out = inp.data.astype(jnp.float32)
        n = out.shape[0]

        def flip_axis(out, name, flag_name, center_name, default_flag):
            i = layout.find(name)
            if i < 0:
                return out
            flag = dctx.arg(self, flag_name, default_flag)
            flag = jnp.asarray(flag).reshape(-1)
            flag = jnp.broadcast_to(flag, (n,)).astype(jnp.float32)
            c = float(self.spec.GetArgument(center_name, 0.5))
            flipped = 2.0 * c - out[..., i]
            fl = flag.reshape((n,) + (1,) * (out.ndim - 2))
            return out.at[..., i].set(fl * flipped + (1 - fl) * out[..., i])

        out = flip_axis(out, "x", "flip_x", "center_x", 1)
        out = flip_axis(out, "y", "flip_y", "center_y", 0)
        out = flip_axis(out, "z", "flip_z", "center_z", 0)
        return [inp.with_data(out)]


# ====================================== noise.Shot =================================================


@register_operator("noise.Shot", "gpu")
class ShotNoiseGPU(Operator):
    def host_output_shapes(self, ctx, input_shapes, input_batches):
        return [input_shapes[0]]

    def lower(self, dctx, inp: DeviceBatch):
        import jax
        import jax.numpy as jnp

        key = dctx.key(self)
        factor = dctx.arg(self, "factor", 20.0)
        factor = jnp.asarray(factor, jnp.float32).reshape(-1)
        factor = jnp.broadcast_to(factor, (inp.data.shape[0],))
        f = factor.reshape((-1,) + (1,) * (inp.data.ndim - 1))
        safe_f = jnp.where(f <= 0, 1.0, f)
        lam = inp.data.astype(jnp.float32) / safe_f
        noisy = jax.random.poisson(key, lam).astype(jnp.float32) * safe_f
        out = jnp.where(f <= 0, inp.data.astype(jnp.float32), noisy)
        if jnp.issubdtype(inp.data.dtype, jnp.integer):
            info = jnp.iinfo(inp.data.dtype)
            out = jnp.clip(out, info.min, info.max)
        return [inp.with_data(out.astype(inp.data.dtype))]


# ====================================== Erode / Dilate =============================================


class _MorphGPU(Operator):
    is_dilate = True

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        return [input_shapes[0]]

    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp
        from jax import lax

        ms = self.spec.GetArgument("mask_size", [3, 3])
        mh, mw = int(ms[0]), int(ms[-1])
        x = inp.data
        dt = x.dtype
        if jnp.issubdtype(dt, jnp.integer):
            ident = jnp.iinfo(dt).min if self.is_dilate else jnp.iinfo(dt).max
        else:
            ident = -jnp.inf if self.is_dilate else jnp.inf
        # out-of-extent canvas cells must not bleed in: set them to the
        # reduction identity (cv2's default border ignores outside pixels)
        if inp.shapes is not None:
            n = x.shape[0]
            hmask = jnp.arange(x.shape[1])[None, :] < inp.shapes[:, 0, None]
            wmask = jnp.arange(x.shape[2])[None, :] < inp.shapes[:, 1, None]
            valid = hmask[:, :, None] & wmask[:, None, :]
            valid = valid.reshape(valid.shape + (1,) * (x.ndim - 3))
            x = jnp.where(valid, x, jnp.asarray(ident, dt))
        window = (1, mh, mw) + (1,) * (x.ndim - 3)
        red = lax.max if self.is_dilate else lax.min
        if self.spec.GetArgument("border_mode", "constant") == "replicate":
            # replicate border: pad with edge values before the reduction
            ph, pw = mh // 2, mw // 2
            pads = [(0, 0), (ph, ph), (pw, pw)] + [(0, 0)] * (x.ndim - 3)
            xr = jnp.pad(x, pads, mode="edge")
            out = lax.reduce_window(xr, jnp.asarray(ident, dt), red, window,
                                    (1,) * x.ndim, "VALID")
        else:
            out = lax.reduce_window(x, jnp.asarray(ident, dt), red, window,
                                    (1,) * x.ndim, "SAME")
        for _ in range(int(self.spec.GetArgument("iterations", 1)) - 1):
            out = lax.reduce_window(out, jnp.asarray(ident, dt), red, window,
                                    (1,) * x.ndim, "SAME")
        if inp.shapes is not None:
            out = jnp.where(valid, out, jnp.zeros((), dt))
        return [inp.with_data(out)]


@register_operator("experimental.Dilate", "gpu")
class DilateGPU(_MorphGPU):
    is_dilate = True


@register_operator("experimental.Erode", "gpu")
class ErodeGPU(_MorphGPU):
    is_dilate = False


# ====================================== MedianBlur =================================================


@register_operator("experimental.MedianBlur", "gpu")
class MedianBlurGPU(Operator):
    def host_output_shapes(self, ctx, input_shapes, input_batches):
        return [input_shapes[0]]

    def lower(self, dctx, inp: DeviceBatch):
        import jax
        import jax.numpy as jnp

        k = int(self.spec.GetArgument("window_size", [3])[0])
        r = k // 2
        H, W = inp.data.shape[1], inp.data.shape[2]
        n = inp.data.shape[0]
        if inp.shapes is not None:
            eh, ew = inp.shapes[:, 0], inp.shapes[:, 1]
        else:
            eh = jnp.full((n,), H, jnp.int32)
            ew = jnp.full((n,), W, jnp.int32)

        def one(img, h, w):
            # replicate border WITHIN the sample's valid extent (cv2 semantics)
            planes = []
            for dy in range(-r, r + 1):
                iy = jnp.clip(jnp.arange(H) + dy, 0, h - 1)
                row = jnp.take(img, iy, axis=0)
                for dx in range(-r, r + 1):
                    ix = jnp.clip(jnp.arange(W) + dx, 0, w - 1)
                    planes.append(jnp.take(row, ix, axis=1))
            stack = jnp.stack(planes, 0)  # [k*k, H, W, C]
            return jnp.sort(stack, axis=0)[(k * k) // 2]

        out = jax.vmap(one)(inp.data, eh, ew)
        return [inp.with_data(out)]


# ====================================== NonsilentRegion ============================================


@register_operator("NonsilentRegion", "gpu")
class NonsilentRegionGPU(Operator):
    """Moving-mean-square + threshold scan as one fused XLA program
    (cumsum-based, reference kernels/signal/moving_mean_square.cu)."""

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        if input_shapes[0] is None:
            return None
        n = input_shapes[0].shape[0]
        return [np.zeros((n, 0), np.int32), np.zeros((n, 0), np.int32)]

    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp

        L = int(np.prod(inp.canvas))
        x = inp.data.reshape(inp.data.shape[0], L).astype(jnp.float32)
        n_valid = (inp.shapes[:, 0] if inp.shapes is not None
                   else jnp.full((x.shape[0],), L, jnp.int32))
        win_cfg = int(self.spec.GetArgument("window_length", 2048))
        win = jnp.minimum(win_cfg, jnp.maximum(n_valid, 1))  # per-sample
        idx = jnp.arange(L)
        x = jnp.where(idx[None, :] < n_valid[:, None], x, 0.0)
        xx = x * x
        cs = jnp.concatenate([jnp.zeros((x.shape[0], 1), jnp.float32),
                              jnp.cumsum(xx, axis=1)], axis=1)
        # mms[i] = mean over window starting at i; valid for i < n - win + 1
        hi = jnp.clip(idx[None, :] + win[:, None], 0, L)
        mms = (jnp.take_along_axis(cs, hi, 1) - cs[:, :L]) / win[:, None].astype(jnp.float32)
        m_valid = jnp.maximum(n_valid - win + 1, 1)
        ok = idx[None, :] < m_valid[:, None]
        mms = jnp.where(ok, mms, -1.0)
        ref_cfg = float(self.spec.GetArgument("reference_power", 0.0))
        ref = jnp.max(mms, axis=1) if ref_cfg == 0.0 else jnp.full((x.shape[0],), ref_cfg)
        cutoff = float(self.spec.GetArgument("cutoff_db", -60.0))
        thresh = jnp.maximum(ref * (10.0 ** (cutoff / 10.0)), 1e-20)
        above = (mms >= thresh[:, None]) & ok
        any_above = jnp.any(above, axis=1)
        begin = jnp.argmax(above, axis=1)
        last = L - 1 - jnp.argmax(above[:, ::-1], axis=1)
        end = jnp.minimum(last + win, n_valid)
        begin = jnp.where(any_above, begin, 0).astype(jnp.int32)
        length = jnp.where(any_above, end - begin, 0).astype(jnp.int32)
        return [DeviceBatch(begin, None, ""), DeviceBatch(length, None, "")]


# ====================================== TensorResize ===============================================


@register_operator("TensorResize", "gpu")
class TensorResizeGPU(Operator):
    """Per-axis linear/NN resize with per-sample dynamic scales; output canvas
    is a grow-policy static. Matches the cpu path's scipy ``zoom(grid_mode=
    True)`` coordinate convention: src = (j + 0.5) * in/out - 0.5."""

    def _out_shapes(self, ctx, in_shapes):
        shapes = np.asarray(in_shapes[0])
        n, nd = shapes.shape
        axes = self.spec.GetArgument("axes", None)
        if not axes:
            names = self.spec.GetArgument("axis_names", None)
            if names:
                lays = ctx.in_layouts(self)
                layout = lays[0] if lays else ""
                if not layout:
                    raise ValueError(
                        "TensorResize(gpu): axis_names requires an input with "
                        "a known layout; pass `axes` instead")
                axes = [layout.index(ch) for ch in names]
        axes = list(range(nd)) if not axes else [a % nd for a in axes]
        out = shapes.astype(np.float64).copy()
        for i in range(n):
            sizes = ctx.arg(self, "sizes", i, None)
            scales = ctx.arg(self, "scales", i, None)
            if sizes is not None:
                sz = np.asarray(sizes, np.float64).reshape(-1)
                for k, a in enumerate(axes):
                    out[i, a] = sz[k]
            elif scales is not None:
                sc = np.asarray(scales, np.float64).reshape(-1)
                for k, a in enumerate(axes):
                    out[i, a] = shapes[i, a] * sc[k]
            else:
                raise ValueError("TensorResize requires `sizes` or `scales`")
        return axes, np.maximum(np.round(out), 1).astype(np.int32)

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        if input_shapes[0] is None:
            return None
        _, out = self._out_shapes(ctx, input_shapes)
        self._pending_out = out
        return [out]

    def host_params(self, ctx, in_shapes):
        _, out = self._out_shapes(ctx, in_shapes)
        return {"out_ext": out}

    def device_statics(self, ctx, in_shapes):
        axes, out = self._out_shapes(ctx, in_shapes)
        canvas = tuple(int(-(-int(c) // 8) * 8) for c in out.max(axis=0))
        return (tuple(axes), canvas)

    def lower(self, dctx, inp: DeviceBatch):
        import jax
        import jax.numpy as jnp

        axes, canvas = dctx.static(self)
        out_ext = dctx.param(self, "out_ext")  # [N, nd] int32
        interp = self.spec.GetArgument("interp_type", DALIInterpType.INTERP_LINEAR)
        nn = interp == DALIInterpType.INTERP_NN
        nd = len(inp.canvas)
        in_ext = (inp.shapes if inp.shapes is not None
                  else jnp.tile(jnp.asarray(inp.canvas, jnp.int32)[None], (inp.data.shape[0], 1)))

        def one(x, ie, oe):
            for a in range(nd):
                tgt = canvas[a] if a in axes else x.shape[a]
                if a in axes:
                    scale = ie[a].astype(jnp.float32) / oe[a].astype(jnp.float32)
                    j = jnp.arange(tgt, dtype=jnp.float32)
                    src = (j + 0.5) * scale - 0.5
                    if nn:
                        i0 = jnp.clip(jnp.round(src).astype(jnp.int32), 0, ie[a] - 1)
                        x = jnp.take(x.astype(jnp.float32), i0, axis=a)
                    else:
                        f0 = jnp.floor(src)
                        frac = src - f0
                        i0 = jnp.clip(f0.astype(jnp.int32), 0, ie[a] - 1)
                        i1 = jnp.clip(f0.astype(jnp.int32) + 1, 0, ie[a] - 1)
                        shp = [1] * x.ndim
                        shp[a] = tgt
                        w = frac.reshape(shp)
                        x = (jnp.take(x.astype(jnp.float32), i0, axis=a) * (1 - w)
                             + jnp.take(x.astype(jnp.float32), i1, axis=a) * w)
                    mask = (jnp.arange(tgt) < oe[a]).reshape(shp if not nn else
                                                             [tgt if d == a else 1 for d in range(x.ndim)])
                    x = x * mask
                else:
                    x = x.astype(jnp.float32)
            return x

        out = jax.vmap(one)(inp.data, in_ext, out_ext)
        from ..types import to_jnp_type

        dt_arg = self.spec.GetArgument("dtype", None)
        if dt_arg is not None:
            dt = to_jnp_type(dt_arg)
        else:
            dt = inp.data.dtype
        if jnp.issubdtype(dt, jnp.integer):
            info = jnp.iinfo(dt)
            out = jnp.clip(jnp.round(out), info.min, info.max)
        return [DeviceBatch(out.astype(dt), out_ext, inp.layout)]


# ====================================== MultiPaste =================================================


@register_operator("MultiPaste", "gpu")
class MultiPasteGPU(Operator):
    """Mosaic paste on device: each region becomes an iota-mask + cross-sample
    gather; regions compose with `where` (reference multipaste.cu)."""

    def _meta(self, ctx, in_shapes):
        shapes = np.asarray(in_shapes[0])
        n = shapes.shape[0]
        kmax = 0
        outs = np.zeros((n, 3), np.int32)
        for i in range(n):
            ids = np.asarray(ctx.arg(self, "in_ids", i), np.int64).reshape(-1)
            kmax = max(kmax, len(ids))
            osz = ctx.arg(self, "output_size", i, None)
            if osz is not None:
                outs[i] = (int(osz[0]), int(osz[1]), shapes[i, 2])
            else:
                outs[i] = shapes[i]
        return kmax, outs

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        if input_shapes[0] is None:
            return None
        _, outs = self._meta(ctx, input_shapes)
        return [outs]

    def host_params(self, ctx, in_shapes):
        shapes = np.asarray(in_shapes[0])
        n = shapes.shape[0]
        kmax, outs = self._meta(ctx, in_shapes)
        ids = np.zeros((n, kmax), np.int32)
        ia = np.zeros((n, kmax, 2), np.int32)
        oa = np.zeros((n, kmax, 2), np.int32)
        rs = np.zeros((n, kmax, 2), np.int32)  # region sizes (clipped)
        from .misc import resolve_mp_regions

        for i in range(n):
            v = np.asarray(ctx.arg(self, "in_ids", i), np.int64).reshape(-1)
            k = len(v)
            ids[i, :k] = v
            src_hw = [(shapes[int(s), 0], shapes[int(s), 1]) for s in v]
            ia_i, oa_i, sh_arg = resolve_mp_regions(
                self, ctx, i, v, src_hw, (outs[i, 0], outs[i, 1]))
            for j in range(k):
                sid = int(v[j])
                if sh_arg is not None:
                    rh, rw = sh_arg[j]
                else:
                    rh, rw = shapes[sid, 0], shapes[sid, 1]
                rh = int(min(rh, shapes[sid, 0] - ia_i[j, 0], outs[i, 0] - oa_i[j, 0]))
                rw = int(min(rw, shapes[sid, 1] - ia_i[j, 1], outs[i, 1] - oa_i[j, 1]))
                ia[i, j] = ia_i[j]
                oa[i, j] = oa_i[j]
                rs[i, j] = (max(rh, 0), max(rw, 0))
        return {"mp_ids": ids, "mp_ia": ia, "mp_oa": oa, "mp_rs": rs,
                "mp_out": outs}

    def device_statics(self, ctx, in_shapes):
        kmax, outs = self._meta(ctx, in_shapes)
        oh = int(-(-int(outs[:, 0].max()) // 8) * 8)
        ow = int(-(-int(outs[:, 1].max()) // 8) * 8)
        return (kmax, oh, ow)

    def lower(self, dctx, inp: DeviceBatch):
        import jax
        import jax.numpy as jnp

        kmax, OH, OW = dctx.static(self)
        ids = dctx.param(self, "mp_ids")
        ia = dctx.param(self, "mp_ia")
        oa = dctx.param(self, "mp_oa")
        rs = dctx.param(self, "mp_rs")
        outs = dctx.param(self, "mp_out")
        data = inp.data  # [N, H, W, C]
        C = data.shape[-1]

        oy = jnp.arange(OH)[:, None]
        ox = jnp.arange(OW)[None, :]

        def one(i):
            canvas = jnp.zeros((OH, OW, C), jnp.float32)
            for j in range(kmax):
                src = jnp.take(data, ids[i, j], axis=0).astype(jnp.float32)
                sy = jnp.clip(oy - oa[i, j, 0] + ia[i, j, 0], 0, data.shape[1] - 1)
                sx = jnp.clip(ox - oa[i, j, 1] + ia[i, j, 1], 0, data.shape[2] - 1)
                gathered = src[sy, sx]  # [OH, OW, C]
                valid = ((oy >= oa[i, j, 0]) & (oy < oa[i, j, 0] + rs[i, j, 0])
                         & (ox >= oa[i, j, 1]) & (ox < oa[i, j, 1] + rs[i, j, 1]))
                canvas = jnp.where(valid[:, :, None], gathered, canvas)
            return canvas

        out = jax.vmap(one)(jnp.arange(data.shape[0]))
        if jnp.issubdtype(inp.data.dtype, jnp.integer):
            info = jnp.iinfo(inp.data.dtype)
            out = jnp.clip(jnp.round(out), info.min, info.max)
        return [DeviceBatch(out.astype(inp.data.dtype), outs, inp.layout or "HWC")]


# ============================= JpegCompressionDistortion ============================================

# ITU-T.81 Annex K reference quantization tables (spec constants)
_K1_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], np.float32)
_K2_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], np.float32)


def _ijg_scale(tbl: np.ndarray, quality):
    """IJG quality scaling (jcparam.c convention, re-derived)."""
    import jax.numpy as jnp

    q = jnp.clip(jnp.asarray(quality, jnp.float32), 1.0, 100.0)
    scale = jnp.where(q < 50.0, 5000.0 / q, 200.0 - 2.0 * q)
    t = jnp.floor((jnp.asarray(tbl) * scale + 50.0) / 100.0)
    return jnp.clip(t, 1.0, 255.0)


@register_operator("JpegCompressionDistortion", "gpu")
class JpegDistortionGPU(Operator):
    """DCT-domain JPEG artifact simulation on device: blockify -> forward DCT
    (MXU einsum) -> quantize/dequantize with IJG-scaled Annex K tables ->
    IDCT -> 4:2:0 chroma round-trip. Reference dali/kernels/imgproc/jpeg/
    (the GPU ChromaSubsample + DCT quantization kernels)."""

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        return [input_shapes[0]]

    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp

        from ..kernels.jpeg import idct_matrix, upsample2x, ycbcr_to_rgb

        x = inp.data.astype(jnp.float32)  # [N, H, W, 3]
        n, H, W = x.shape[0], x.shape[1], x.shape[2]
        quality = dctx.arg(self, "quality", 50.0)
        quality = jnp.broadcast_to(jnp.asarray(quality, jnp.float32).reshape(-1), (n,))

        # pad to 16x16 (replicate edge so blocks at the border behave like
        # libjpeg's edge extension)
        H16, W16 = -(-H // 16) * 16, -(-W // 16) * 16
        x = jnp.pad(x, ((0, 0), (0, H16 - H), (0, W16 - W), (0, 0)), mode="edge")

        # RGB -> YCbCr, JPEG full-range (color_space_conversion_impl.h `jpeg`)
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.16873589 * r - 0.33126411 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.41868759 * g - 0.08131241 * b + 128.0
        # libjpeg's encoder quantizes samples to uint8 BEFORE the DCT; matching
        # that rounding halves the cpu<->gpu divergence (measured: mean |d| at
        # q30 1.53 -> 0.60, max 34 -> 8 on the contract-test image class)
        def int_sample(p):
            return jnp.clip(jnp.round(p), 0.0, 255.0)

        y, cb, cr = int_sample(y), int_sample(cb), int_sample(cr)

        # 4:2:0 chroma: 2x2 mean, quantized like the encoder's h2v2 downsample
        def down2(c):
            return (c[:, 0::2, 0::2] + c[:, 1::2, 0::2] + c[:, 0::2, 1::2]
                    + c[:, 1::2, 1::2]) * 0.25

        cbd, crd = int_sample(down2(cb)), int_sample(down2(cr))

        T = jnp.asarray(idct_matrix(8))  # orthonormal IDCT-II basis; T.T = DCT

        def roundtrip(plane, base_tbl):
            # [N, h, w] -> 8x8 blocks -> DCT -> quant -> dequant -> IDCT
            N_, h, w = plane.shape
            blocks = plane.reshape(N_, h // 8, 8, w // 8, 8).transpose(0, 1, 3, 2, 4)
            coef = jnp.einsum("ij,nabjk,kl->nabil", T.T, blocks - 128.0, T)
            tbl = _ijg_scale(base_tbl, quality[:, None, None]
                             .reshape((N_,) + (1,) * 2))  # [N,1,1] broadcast
            tbl = tbl.reshape(N_, 1, 1, 8, 8)
            qc = jnp.round(coef / tbl) * tbl
            rec = jnp.einsum("ij,nabjk,kl->nabil", T, qc, T.T) + 128.0
            return rec.transpose(0, 1, 3, 2, 4).reshape(N_, h, w)

        y2 = roundtrip(y, _K1_LUMA)
        cb2 = roundtrip(cbd, _K2_CHROMA)
        cr2 = roundtrip(crd, _K2_CHROMA)
        cb2 = upsample2x(jnp, cb2)
        cr2 = upsample2x(jnp, cr2)
        rgb = ycbcr_to_rgb(jnp, y2, cb2, cr2)  # returns stacked RGB
        out = rgb[:, :H, :W]
        if jnp.issubdtype(inp.data.dtype, jnp.integer):
            info = jnp.iinfo(inp.data.dtype)
            out = jnp.clip(jnp.round(out), info.min, info.max)
        return [inp.with_data(out.astype(inp.data.dtype))]


# the experimental.* aliases were mirrored before this module registered the
# gpu impls — mirror them explicitly
register_operator("experimental.TensorResize", "gpu")(TensorResizeGPU)


# ====================================== CLAHE =======================================================


@register_operator("experimental.Clahe", "gpu")
class ClaheGPU(Operator):
    """Contrast-limited adaptive histogram equalization as one XLA program:
    per-tile scatter-add histograms -> clip + uniform excess redistribution ->
    CDF LUTs -> bilinearly interpolated lookup (reference image/clahe GPU
    kernels; algorithm per cv2::CLAHE). Luma-only for RGB inputs (applied in
    a float Lab-free approximation: equalize BT.601 luma, scale chroma)."""

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        return [input_shapes[0]]

    def lower(self, dctx, inp: DeviceBatch):
        import jax
        import jax.numpy as jnp

        tiles_x = int(self.spec.GetArgument("tiles_x", 8))
        tiles_y = int(self.spec.GetArgument("tiles_y", 8))
        clip = float(self.spec.GetArgument("clip_limit", 4.0))
        bins = int(self.spec.GetArgument("bins", 256))
        if bins < 2 or bins & (bins - 1):
            raise ValueError(f"Clahe bins must be a power of 2, got {bins}")
        luma_only = bool(self.spec.GetArgument("luma_only", True))
        H, W = inp.data.shape[1], inp.data.shape[2]
        n = inp.data.shape[0]
        chans = inp.data.shape[3] if inp.data.ndim == 4 else 1
        if inp.shapes is not None:
            eh, ew = inp.shapes[:, 0], inp.shapes[:, 1]
        else:
            eh = jnp.full((n,), H, jnp.int32)
            ew = jnp.full((n,), W, jnp.int32)

        yy = jnp.arange(H, dtype=jnp.float32)[:, None]
        xx = jnp.arange(W, dtype=jnp.float32)[None, :]

        def clahe_plane(p, h, w):
            """p: [H, W] float in [0,255]; h/w: valid extent (dynamic)."""
            v = jnp.clip(jnp.round(p * ((bins - 1) / 255.0)), 0, bins - 1).astype(jnp.int32)
            th = h.astype(jnp.float32) / tiles_y
            tw = w.astype(jnp.float32) / tiles_x
            ty = jnp.clip((yy / th).astype(jnp.int32), 0, tiles_y - 1)
            tx = jnp.clip((xx / tw).astype(jnp.int32), 0, tiles_x - 1)
            tid = ty * tiles_x + tx  # [H, W] via broadcast
            valid = (yy < h) & (xx < w)
            ids = (tid * bins + v).reshape(-1)
            hist = jnp.zeros((tiles_y * tiles_x * bins,), jnp.float32)
            hist = hist.at[ids].add(valid.reshape(-1).astype(jnp.float32))
            hist = hist.reshape(tiles_y * tiles_x, bins)
            # clip limit scaled by tile area (cv2 convention), excess spread
            area = th * tw
            lim = jnp.maximum(clip * area / bins, 1.0)
            excess = jnp.sum(jnp.maximum(hist - lim, 0.0), axis=1, keepdims=True)
            hist = jnp.minimum(hist, lim) + excess / bins
            cdf = jnp.cumsum(hist, axis=1)
            scale = 255.0 / jnp.maximum(area, 1.0)
            luts = jnp.clip(jnp.round((cdf - cdf[:, :1]) * scale), 0, 255)
            # bilinear interpolation between the 4 neighboring tile LUTs
            fy = jnp.clip(yy / th - 0.5, 0.0, tiles_y - 1.0)
            fx = jnp.clip(xx / tw - 0.5, 0.0, tiles_x - 1.0)
            y0 = jnp.floor(fy).astype(jnp.int32)
            x0 = jnp.floor(fx).astype(jnp.int32)
            wy = fy - y0
            wx = fx - x0
            y1 = jnp.minimum(y0 + 1, tiles_y - 1)
            x1 = jnp.minimum(x0 + 1, tiles_x - 1)

            def lut_at(tyi, txi):
                flat = (tyi * tiles_x + txi) * bins + v
                return jnp.take(luts.reshape(-1), flat)

            out = ((1 - wy) * (1 - wx) * lut_at(y0, x0)
                   + (1 - wy) * wx * lut_at(y0, x1)
                   + wy * (1 - wx) * lut_at(y1, x0)
                   + wy * wx * lut_at(y1, x1))
            return jnp.where(valid, out, p)

        def one(img, h, w):
            f = img.astype(jnp.float32)
            if chans == 3:
                if not luma_only:
                    return jnp.stack(
                        [clahe_plane(f[..., c], h, w) for c in range(3)], axis=-1)
                luma = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
                eq = clahe_plane(luma, h, w)
                ratio = (eq + 1.0) / (luma + 1.0)
                return f * ratio[..., None]
            plane = f[..., 0] if f.ndim == 3 else f
            eq = clahe_plane(plane, h, w)
            return eq[..., None] if f.ndim == 3 else eq

        out = jax.vmap(one)(inp.data, eh, ew)
        if jnp.issubdtype(inp.data.dtype, jnp.integer):
            info = jnp.iinfo(inp.data.dtype)
            out = jnp.clip(jnp.round(out), info.min, info.max)
        return [inp.with_data(out.astype(inp.data.dtype))]


# ====================================== Debayer =====================================================


@register_operator("experimental.Debayer", "gpu")
class DebayerGPU(Operator):
    """Bilinear demosaic as mask-normalized 3x3 convolutions (reference
    imgproc/color_manipulation/debayer: NPP bilinear algorithm). Each color's
    samples are isolated by a 2x2-phase mask; missing values interpolate with
    the tent kernel normalized by the mask's own response."""

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        if input_shapes[0] is None:
            return None
        shapes = np.asarray(input_shapes[0])
        out = shapes[:, :2].copy()
        return [np.concatenate([out, np.full((out.shape[0], 1), 3, out.dtype)], 1)]

    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp
        from jax import lax

        bp = tuple(int(v) for v in self.spec.GetArgument("blue_position", [0, 0]))
        x = inp.data
        if x.ndim == 4:  # [N, H, W, 1] -> [N, H, W]
            x = x[..., 0]
        f = x.astype(jnp.float32)
        H, W = f.shape[1], f.shape[2]
        ry, rx = 1 - bp[0], 1 - bp[1]  # red is diagonal from blue
        iy = jnp.arange(H)[:, None]
        ix = jnp.arange(W)[None, :]
        masks = {
            "b": ((iy % 2 == bp[0]) & (ix % 2 == bp[1])),
            "r": ((iy % 2 == ry) & (ix % 2 == rx)),
        }
        masks["g"] = ~(masks["b"] | masks["r"])
        k = jnp.asarray([[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]])

        def interp(mask):
            m = jnp.broadcast_to(mask[None].astype(jnp.float32), f.shape)
            num = lax.conv_general_dilated(
                (f * m)[:, None], k[None, None], (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0]
            den = lax.conv_general_dilated(
                m[:, None], k[None, None], (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0]
            return num / jnp.maximum(den, 1e-6)

        rgb = jnp.stack([interp(masks["r"]), interp(masks["g"]), interp(masks["b"])], -1)
        if jnp.issubdtype(inp.data.dtype, jnp.integer):
            info = jnp.iinfo(inp.data.dtype)
            rgb = jnp.clip(jnp.round(rgb), info.min, info.max)
        shapes = None
        if inp.shapes is not None:
            three = jnp.full((inp.shapes.shape[0], 1), 3, inp.shapes.dtype)
            shapes = jnp.concatenate([inp.shapes[:, :2], three], axis=1)
        return [DeviceBatch(rgb.astype(inp.data.dtype), shapes, "HWC")]

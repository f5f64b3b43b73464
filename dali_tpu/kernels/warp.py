"""Affine warping on padded batches.

Reference: ``dali/kernels/imgproc/warp/`` (affine.h, warp_gpu.h) — DALI maps each
output pixel through the (inverse) affine matrix and samples the input with NN or
bilinear filtering, filling out-of-bounds pixels with a border value. Here the
mapping is computed inside the jitted program and the sampling lowers to XLA
gathers; per-sample matrices come in as a [N, 2, 3] array.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..types import DALIInterpType


def warp_affine_sample(img, matrix, out_h, out_w, interp, fill_value, extent_hw):
    """Warp one sample [H, W, C] by the inverse matrix [2, 3] → [out_h, out_w, C].

    dst (x, y) samples src at (sx, sy) = M @ (x, y, 1) — matching the reference
    convention (inverse_map=True: matrix is destination→source).
    """
    H, W, C = img.shape
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # [out_h, out_w]
    sx = matrix[0, 0] * gx + matrix[0, 1] * gy + matrix[0, 2]
    sy = matrix[1, 0] * gx + matrix[1, 1] * gy + matrix[1, 2]
    eh = extent_hw[0].astype(jnp.float32)
    ew = extent_hw[1].astype(jnp.float32)
    imgf = img.astype(jnp.float32)

    if interp == DALIInterpType.INTERP_NN:
        ix = jnp.round(sx).astype(jnp.int32)
        iy = jnp.round(sy).astype(jnp.int32)
        valid = (ix >= 0) & (ix < ew) & (iy >= 0) & (iy < eh)
        ix = jnp.clip(ix, 0, W - 1)
        iy = jnp.clip(iy, 0, H - 1)
        out = imgf[iy, ix]
        return jnp.where(valid[..., None], out, fill_value)

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)

    def tap(iy, ix):
        valid = (ix >= 0) & (ix < ew.astype(jnp.int32)) & (iy >= 0) & (iy < eh.astype(jnp.int32))
        v = imgf[jnp.clip(iy, 0, H - 1), jnp.clip(ix, 0, W - 1)]
        return jnp.where(valid[..., None], v, fill_value)

    v00 = tap(iy0, ix0)
    v01 = tap(iy0, ix0 + 1)
    v10 = tap(iy0 + 1, ix0)
    v11 = tap(iy0 + 1, ix0 + 1)
    wxe = wx[..., None]
    wye = wy[..., None]
    return (v00 * (1 - wxe) + v01 * wxe) * (1 - wye) + (v10 * (1 - wxe) + v11 * wxe) * wye


def warp_affine_batch(
    data,  # [N, H, W, C]
    matrices,  # [N, 2, 3] destination→source
    out_h: int,
    out_w: int,
    extents=None,  # [N, 2] valid (h, w)
    interp: DALIInterpType = DALIInterpType.INTERP_LINEAR,
    fill_value: float = 0.0,
    out_dtype=None,
):
    n, H, W, C = data.shape
    if extents is None:
        extents = jnp.tile(jnp.array([[H, W]], jnp.int32), (n, 1))
    fn = partial(warp_affine_sample, out_h=out_h, out_w=out_w, interp=interp, fill_value=fill_value)
    out = jax.vmap(lambda i, m, e: fn(i, m, extent_hw=e))(data, matrices, extents)
    dt = out_dtype if out_dtype is not None else data.dtype
    if jnp.issubdtype(dt, jnp.integer):
        info = jnp.iinfo(dt)
        out = jnp.clip(jnp.round(out), info.min, info.max)
    return out.astype(dt)


def warp_affine_volumetric_batch(
    data,  # [N, D, H, W, C]
    matrices,  # [N, 3, 4] destination→source, (x, y, z) row order
    out_d: int,
    out_h: int,
    out_w: int,
    extents=None,  # [N, 3] valid (d, h, w)
    interp: DALIInterpType = DALIInterpType.INTERP_LINEAR,
    fill_value: float = 0.0,
    out_dtype=None,
):
    """Volumetric affine warp (reference ``image/remap/warp.h``
    SupportVolumetric): dst (x, y, z) samples src at M @ (x, y, z, 1) with
    NN or trilinear filtering, constant fill outside the valid extent."""
    n, D, H, W, C = data.shape
    if extents is None:
        extents = jnp.tile(jnp.array([[D, H, W]], jnp.int32), (n, 1))

    def one(img, m, e):
        zs = jnp.arange(out_d, dtype=jnp.float32)
        ys = jnp.arange(out_h, dtype=jnp.float32)
        xs = jnp.arange(out_w, dtype=jnp.float32)
        gz, gy, gx = jnp.meshgrid(zs, ys, xs, indexing="ij")
        sx = m[0, 0] * gx + m[0, 1] * gy + m[0, 2] * gz + m[0, 3]
        sy = m[1, 0] * gx + m[1, 1] * gy + m[1, 2] * gz + m[1, 3]
        sz = m[2, 0] * gx + m[2, 1] * gy + m[2, 2] * gz + m[2, 3]
        ed = e[0].astype(jnp.float32)
        eh = e[1].astype(jnp.float32)
        ew = e[2].astype(jnp.float32)
        imgf = img.astype(jnp.float32)

        def tap(iz, iy, ix):
            valid = ((ix >= 0) & (ix < ew) & (iy >= 0) & (iy < eh)
                     & (iz >= 0) & (iz < ed))
            v = imgf[jnp.clip(iz, 0, D - 1), jnp.clip(iy, 0, H - 1),
                     jnp.clip(ix, 0, W - 1)]
            return jnp.where(valid[..., None], v, fill_value)

        if interp == DALIInterpType.INTERP_NN:
            return tap(jnp.round(sz).astype(jnp.int32),
                       jnp.round(sy).astype(jnp.int32),
                       jnp.round(sx).astype(jnp.int32))
        z0 = jnp.floor(sz)
        y0 = jnp.floor(sy)
        x0 = jnp.floor(sx)
        wz, wy, wx = sz - z0, sy - y0, sx - x0
        iz0 = z0.astype(jnp.int32)
        iy0 = y0.astype(jnp.int32)
        ix0 = x0.astype(jnp.int32)
        wze = wz[..., None]
        wye = wy[..., None]
        wxe = wx[..., None]

        def bilin(iz):
            v00 = tap(iz, iy0, ix0)
            v01 = tap(iz, iy0, ix0 + 1)
            v10 = tap(iz, iy0 + 1, ix0)
            v11 = tap(iz, iy0 + 1, ix0 + 1)
            return ((v00 * (1 - wxe) + v01 * wxe) * (1 - wye)
                    + (v10 * (1 - wxe) + v11 * wxe) * wye)

        return bilin(iz0) * (1 - wze) + bilin(iz0 + 1) * wze

    out = jax.vmap(one)(data, matrices, extents)
    dt = out_dtype if out_dtype is not None else data.dtype
    if jnp.issubdtype(dt, jnp.integer):
        info = jnp.iinfo(dt)
        out = jnp.clip(jnp.round(out), info.min, info.max)
    return out.astype(dt)


def warp_affine_volumetric_np(img, m, out_d, out_h, out_w, interp, fill):
    """Host (numpy) trilinear volumetric warp — same tap math as the device
    kernel (cv2 has no 3-D warp; this is the own-code cpu reference)."""
    D, H, W, C = img.shape
    gz, gy, gx = np.meshgrid(np.arange(out_d, dtype=np.float32),
                             np.arange(out_h, dtype=np.float32),
                             np.arange(out_w, dtype=np.float32), indexing="ij")
    sx = m[0, 0] * gx + m[0, 1] * gy + m[0, 2] * gz + m[0, 3]
    sy = m[1, 0] * gx + m[1, 1] * gy + m[1, 2] * gz + m[1, 3]
    sz = m[2, 0] * gx + m[2, 1] * gy + m[2, 2] * gz + m[2, 3]
    imgf = img.astype(np.float32)

    def tap(iz, iy, ix):
        valid = ((ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
                 & (iz >= 0) & (iz < D))
        v = imgf[np.clip(iz, 0, D - 1), np.clip(iy, 0, H - 1),
                 np.clip(ix, 0, W - 1)]
        return np.where(valid[..., None], v, np.float32(fill))

    if interp == DALIInterpType.INTERP_NN:
        return tap(np.round(sz).astype(np.int32), np.round(sy).astype(np.int32),
                   np.round(sx).astype(np.int32))
    z0, y0, x0 = np.floor(sz), np.floor(sy), np.floor(sx)
    wz, wy, wx = (sz - z0)[..., None], (sy - y0)[..., None], (sx - x0)[..., None]
    iz0, iy0, ix0 = z0.astype(np.int32), y0.astype(np.int32), x0.astype(np.int32)

    def bilin(iz):
        v00 = tap(iz, iy0, ix0)
        v01 = tap(iz, iy0, ix0 + 1)
        v10 = tap(iz, iy0 + 1, ix0)
        v11 = tap(iz, iy0 + 1, ix0 + 1)
        return (v00 * (1 - wx) + v01 * wx) * (1 - wy) + (v10 * (1 - wx) + v11 * wx) * wy

    return bilin(iz0) * (1 - wz) + bilin(iz0 + 1) * wz


def rotation_matrix_3d(angle_deg, axis, center_xyz, out_center_xyz):
    """Destination→source 3-D rotation about ``axis`` through a center
    (reference ``rotate_params.h`` 3-D branch: Rodrigues rotation)."""
    a = np.deg2rad(angle_deg)
    u = np.asarray(axis, np.float64)
    nrm = np.linalg.norm(u)
    u = u / (nrm if nrm > 0 else 1.0)
    c, s = np.cos(a), np.sin(a)
    ux, uy, uz = u
    K = np.array([[0, -uz, uy], [uz, 0, -ux], [-uy, ux, 0]])
    # Rodrigues form used DIRECTLY as the dst→src map: about +z this yields
    # [[c,-s],[s,c]] — identical to the 2-D rotation_matrix convention, so
    # angle=90, axis=(0,0,1) on a volume equals the 2-D rotate per slice.
    m = np.eye(3) + s * K + (1 - c) * (K @ K)
    t = np.asarray(center_xyz, np.float64) - m @ np.asarray(out_center_xyz, np.float64)
    return np.concatenate([m, t[:, None]], axis=1).astype(np.float32)  # [3,4] (x,y,z)


def warp_affine_separable_batch(
    data,  # [N, H, W, C]
    matrices,  # [N, 2, 3] destination→source, AXIS-ALIGNED (m01 == m10 == 0)
    out_h: int,
    out_w: int,
    extents=None,
    interp: DALIInterpType = DALIInterpType.INTERP_LINEAR,
    fill_value: float = 0.0,
    out_dtype=None,
):
    """MXU formulation of the axis-aligned warp family (scale + translate):
    ``sx = a·x + c`` and ``sy = e·y + f`` decouple, so the warp is two dense
    matmuls against per-sample interpolation matrices — the same rewrite that
    made the resampler MXU work (kernels/resample.py) instead of VPU gathers.
    Exact fill semantics: out-of-extent taps carry weight 0 in the matrices
    and the lost weight is restored as ``(1 - Σwy·Σwx)·fill`` (separable
    because a 2-D tap is OOB iff its row or column is), which is arithmetic-
    identical to the gather path's per-tap ``where(valid, v, fill)`` lerp.
    General affines stay on the gather path — a dense interpolation-matrix
    form needs a per-ROW matrix (out_h·out_w·W floats ≈ 50 MB/sample at RN50
    shapes vs 0.6 MB of image), three orders of magnitude more HBM traffic;
    rejected on arithmetic (docs/performance.md)."""
    n, H, W, C = data.shape
    if extents is None:
        extents = jnp.tile(jnp.array([[H, W]], jnp.int32), (n, 1))

    def axis_matrix(scale, off, out_n, in_n, ext):
        # interpolation matrix [out_n, in_n]: row j holds the taps of
        # s = scale*j + off; OOB taps (>= ext or < 0) get weight 0
        s = scale * jnp.arange(out_n, dtype=jnp.float32) + off
        i = jnp.arange(in_n, dtype=jnp.float32)[None, :]
        extf = ext.astype(jnp.float32)
        if interp == DALIInterpType.INTERP_NN:
            t = jnp.round(s)[:, None]
            return ((i == t) & (t >= 0) & (t < extf)).astype(jnp.float32)
        t0 = jnp.floor(s)[:, None]
        w1 = (s[:, None] - t0)
        a0 = jnp.where((i == t0) & (t0 >= 0) & (t0 < extf), 1.0 - w1, 0.0)
        a1 = jnp.where((i == t0 + 1) & (t0 + 1 >= 0) & (t0 + 1 < extf), w1, 0.0)
        return a0 + a1

    def one(img, m, e):
        a_y = axis_matrix(m[1, 1], m[1, 2], out_h, H, e[0])
        a_x = axis_matrix(m[0, 0], m[0, 2], out_w, W, e[1])
        imgf = img.astype(jnp.float32)
        tmp = jnp.einsum("oh,hwc->owc", a_y, imgf)
        core = jnp.einsum("pw,owc->opc", a_x, tmp)
        wy = a_y.sum(axis=1)  # [out_h]
        wx = a_x.sum(axis=1)  # [out_w]
        lost = 1.0 - wy[:, None] * wx[None, :]
        return core + lost[..., None] * fill_value

    out = jax.vmap(one)(data, matrices, extents)
    dt = out_dtype if out_dtype is not None else data.dtype
    if jnp.issubdtype(dt, jnp.integer):
        info = jnp.iinfo(dt)
        out = jnp.clip(jnp.round(out), info.min, info.max)
    return out.astype(dt)


def rotation_matrix(angle_deg, center_xy, out_center_xy):
    """Destination→source rotation matrix about a center (host-side numpy;
    reference ``dali/operators/image/remap/rotate_params.h``)."""
    a = np.deg2rad(angle_deg)
    c, s = np.cos(a), np.sin(a)
    # dst→src for a visually counter-clockwise rotation in y-down image coords
    # (positive angle = CCW, matching the reference rotate.cc)
    m = np.array([[c, -s], [s, c]], np.float32)
    t = np.asarray(center_xy, np.float32) - m @ np.asarray(out_center_xy, np.float32)
    return np.concatenate([m, t[:, None]], axis=1).astype(np.float32)  # [2,3], (x,y) order


def rotated_canvas_size(h, w, angle_deg):
    a = np.deg2rad(angle_deg)
    c, s = abs(np.cos(a)), abs(np.sin(a))
    return int(np.ceil(h * c + w * s - 0.5)), int(np.ceil(w * c + h * s - 0.5))


def warp_perspective_batch(
    data,  # [N, H, W, C]
    matrices,  # [N, 3, 3] destination→source homographies
    out_h: int,
    out_w: int,
    extents=None,
    interp: DALIInterpType = DALIInterpType.INTERP_LINEAR,
    fill_value: float = 0.0,
    out_dtype=None,
    replicate: bool = False,
):
    """Perspective warp (reference ``operators/image/remap/cvcuda/warp_perspective``):
    per-pixel homography divide, then the same NN/bilinear taps as affine.
    ``replicate`` clamps out-of-image taps to the edge instead of filling."""
    n, H, W, C = data.shape
    if extents is None:
        extents = jnp.tile(jnp.array([[H, W]], jnp.int32), (n, 1))

    def one(img, m, e):
        ys = jnp.arange(out_h, dtype=jnp.float32)
        xs = jnp.arange(out_w, dtype=jnp.float32)
        gx, gy = jnp.meshgrid(xs, ys)
        wdiv = m[2, 0] * gx + m[2, 1] * gy + m[2, 2]
        wdiv = jnp.where(jnp.abs(wdiv) < 1e-9, 1e-9, wdiv)
        sx = (m[0, 0] * gx + m[0, 1] * gy + m[0, 2]) / wdiv
        sy = (m[1, 0] * gx + m[1, 1] * gy + m[1, 2]) / wdiv
        # reuse the affine sampler with a pre-resolved coordinate field: emulate
        # by constructing a matrix-free tap (duplicated from warp_affine_sample)
        eh = e[0].astype(jnp.float32)
        ew = e[1].astype(jnp.float32)
        imgf = img.astype(jnp.float32)
        if interp == DALIInterpType.INTERP_NN:
            ix = jnp.round(sx).astype(jnp.int32)
            iy = jnp.round(sy).astype(jnp.int32)
            iyc = jnp.clip(iy, 0, jnp.maximum(eh.astype(jnp.int32) - 1, 0))
            ixc = jnp.clip(ix, 0, jnp.maximum(ew.astype(jnp.int32) - 1, 0))
            out = imgf[jnp.clip(iyc, 0, H - 1), jnp.clip(ixc, 0, W - 1)]
            if replicate:
                return out
            valid = (ix >= 0) & (ix < ew) & (iy >= 0) & (iy < eh)
            return jnp.where(valid[..., None], out, fill_value)
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        wx, wy = sx - x0, sy - y0
        ix0, iy0 = x0.astype(jnp.int32), y0.astype(jnp.int32)

        def tap(iy, ix):
            iyc = jnp.clip(iy, 0, jnp.maximum(eh.astype(jnp.int32) - 1, 0))
            ixc = jnp.clip(ix, 0, jnp.maximum(ew.astype(jnp.int32) - 1, 0))
            v = imgf[jnp.clip(iyc, 0, H - 1), jnp.clip(ixc, 0, W - 1)]
            if replicate:
                return v
            valid = (ix >= 0) & (ix < ew.astype(jnp.int32)) & (iy >= 0) & (iy < eh.astype(jnp.int32))
            return jnp.where(valid[..., None], v, fill_value)

        wxe, wye = wx[..., None], wy[..., None]
        return (tap(iy0, ix0) * (1 - wxe) + tap(iy0, ix0 + 1) * wxe) * (1 - wye) + (
            tap(iy0 + 1, ix0) * (1 - wxe) + tap(iy0 + 1, ix0 + 1) * wxe
        ) * wye

    out = jax.vmap(one)(data, matrices, extents)
    dt = out_dtype if out_dtype is not None else data.dtype
    if jnp.issubdtype(dt, jnp.integer):
        info = jnp.iinfo(dt)
        out = jnp.clip(jnp.round(out), info.min, info.max)
    return out.astype(dt)

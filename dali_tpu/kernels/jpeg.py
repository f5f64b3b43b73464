"""JPEG device tail: dequantize + (scaled) IDCT + chroma upsample + YCbCr→RGB.

The TPU half of the hybrid decoder (host half: ``native/src/jpeg_coeffs.cc``).
Reference analogue: nvJPEG's GPU IDCT path (SURVEY §2.4) and
``dali/kernels/imgproc/jpeg`` DCT machinery. Per-block IDCT is ``T @ C @ T.T``
lifted over [N, Hb, Wb] blocks as an ORDER-FIXED elementwise multiply-add
chain (not a dot — see ``_mm_rows_fixed``; the k ≤ 8 contraction would run
the MXU at ≤ 8/128 utilisation anyway, and the fixed order makes decoded
pixels bit-stable across SPMD partitionings); chroma upsample is bilinear;
color conversion is the BT.601 matrix.

The scaled IDCT matrix ``T_k`` maps the k×k low-frequency coefficients directly
to the k×k box-downsampled pixels of the 8×8 block (k=8: full resolution; k=4:
half; k=2: quarter) — numerically exact w.r.t. box downsampling of the
truncated-spectrum reconstruction, matching libjpeg's scaled-decode outputs
closely.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


@lru_cache(maxsize=None)
def idct_matrix(k: int) -> np.ndarray:
    """[k, k] matrix T: pixels_k = T @ coeffs_k (one dimension).

    Derivation: x8 = B @ C8 with B[i,m] = c_m/2 * cos((2i+1)mπ/16); box
    downsample P (k out of 8 rows averaging 8/k pixels); T = (P @ B)[:, :k].
    """
    i = np.arange(8)[:, None]
    m = np.arange(8)[None, :]
    B = 0.5 * np.cos((2 * i + 1) * m * np.pi / 16)
    B[:, 0] *= 1 / np.sqrt(2)
    step = 8 // k
    P = np.zeros((k, 8))
    for r in range(k):
        P[r, r * step : (r + 1) * step] = 1.0 / step
    return (P @ B)[:, :k].astype(np.float32)


def _mm_rows_fixed(T, c):
    """out[..., i, l] = Σ_k T[i, k]·c[..., k, l], summed in FIXED ascending-k
    order as an explicit elementwise multiply-add chain (k ≤ 8, unrolled).

    Deliberately NOT a dot/einsum: XLA's dot lowering is shape-specialised and
    may reassociate the contraction, so the same sample decoded under a
    different SPMD partitioning (solo vs batch-sharded mesh) can land ±1 ulp
    either side of a rounding tie and flip the uint8 pixel. Elementwise graphs
    keep IEEE evaluation order under any partitioning, making the decode tail
    bit-stable across mesh shapes (__graft_entry__.check_real_program_sharded
    asserts this). The contraction is only k ≤ 8 wide, where the MXU would run
    at ≤ 8/128 utilisation anyway — the VPU elementwise form costs the same
    FLOPs without the zero-padding waste.
    """
    acc = T[:, 0][:, None] * c[..., 0, None, :]
    for kk in range(1, T.shape[1]):
        acc = acc + T[:, kk][:, None] * c[..., kk, None, :]
    return acc


def _mm_cols_fixed(c, T):
    """out[..., i, j] = Σ_l c[..., i, l]·T[j, l], fixed ascending-l order
    (elementwise chain; see _mm_rows_fixed for why this is not a dot)."""
    acc = c[..., :, 0, None] * T[:, 0]
    for ll in range(1, T.shape[1]):
        acc = acc + c[..., :, ll, None] * T[:, ll]
    return acc


def decode_blocks(xp, coeffs, qtab, k: int):
    """coeffs [..., Hb, Wb, k*k] int16, qtab [k*k] → pixels [..., Hb*k, Wb*k] f32.

    Dequantize, 2-D scaled IDCT per block (order-fixed multiply-add chain, not
    a dot — see _mm_rows_fixed), +128 level shift.
    """
    T = xp.asarray(idct_matrix(k))
    c = coeffs.astype(xp.float32) * qtab.astype(xp.float32)
    *lead, Hb, Wb, _ = c.shape
    c = c.reshape(*lead, Hb, Wb, k, k)
    # pixels = T @ C @ T.T  per block, left-to-right in fixed order
    px = _mm_cols_fixed(_mm_rows_fixed(T, c), T) + 128.0
    # blocks [..., Hb, Wb, k, k] → [..., Hb*k, Wb*k]
    px = xp.moveaxis(px, -2, -3)  # [..., Hb, k, Wb, k]
    return px.reshape(*lead, Hb * k, Wb * k)


def _up1d(xp, v, axis):
    """Triangular (3/4, 1/4) 2x upsample along one axis — libjpeg's fancy
    upsampling filter, shared by the h2v2 (4:2:0) and h2v1 (4:2:2) paths."""
    a = xp.moveaxis(v, axis, -1)
    left = xp.concatenate([a[..., :1], a[..., :-1]], axis=-1)
    right = xp.concatenate([a[..., 1:], a[..., -1:]], axis=-1)
    lo = 0.75 * a + 0.25 * left
    hi = 0.75 * a + 0.25 * right
    out = xp.stack([lo, hi], axis=-1).reshape(*a.shape[:-1], a.shape[-1] * 2)
    return xp.moveaxis(out, -1, axis)


def upsample2x(xp, x):
    """Bilinear 2x chroma upsample in both dims (libjpeg h2v2 fancy path)."""
    return _up1d(xp, _up1d(xp, x, -1), -2)


def ycbcr_to_rgb(xp, y, cb, cr):
    """BT.601 full-range (reference color_space_conversion_impl.h / libjpeg)."""
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = xp.stack([r, g, b], axis=-1)
    return xp.clip(xp.round(rgb), 0, 255).astype(xp.uint8)


def upsample2x_h(xp, x):
    """Horizontal-only triangular 2x upsample (libjpeg h2v1 fancy path) —
    the 4:2:2 chroma reconstruction."""
    return _up1d(xp, x, -1)


def chroma_k(ky: int, mode_420: bool, chroma_full: bool = False) -> int:
    """Chroma IDCT size. Default: decode chroma at ky (quarter of luma pixel
    count) and bilinearly upsample 2x — halves the host→device coefficient
    traffic vs full-spectrum chroma, with near-invisible impact on 4:2:0 content
    (luma stays exact; see tests). ``chroma_full=True`` decodes chroma at
    min(2·ky, 8) for bit-faithful chroma (no upsample needed below ky=8)."""
    if chroma_full and mode_420:
        return min(2 * ky, 8)
    return ky


def jpeg_device_tail(xp, y_coef, c_coef, qtabs, ky: int, mode_420=True, chroma_full: bool = False):
    """Full device tail for one sample (vmap over batch outside).

    ``mode_420`` is the sampling mode: True/0 = 4:2:0, False/1 = 4:4:4,
    2 = 4:2:2 (bool form kept for API compatibility).
    y_coef [Yh, Yw, ky*ky] int16; c_coef [2, Ch, Cw, kc*kc];
    qtabs [ky*ky + kc*kc] uint16 (luma then chroma corner).
    Returns RGB [Yh*ky, Yw*ky, 3] uint8 (valid extent = image size / (8/ky)).
    """
    # bool form is legacy API; NB True == 1 and False == 0 in dict/eq terms,
    # so this must be identity-based
    if mode_420 is True:
        mode = 0
    elif mode_420 is False:
        mode = 1
    else:
        mode = int(mode_420)
    kc = chroma_k(ky, mode == 0, chroma_full)
    qy = qtabs[: ky * ky]
    qc = qtabs[ky * ky : ky * ky + kc * kc]
    y = decode_blocks(xp, y_coef, qy, ky)
    cb = decode_blocks(xp, c_coef[0], qc, kc)
    cr = decode_blocks(xp, c_coef[1], qc, kc)
    if mode == 0 and kc < 2 * ky:
        cb = upsample2x(xp, cb)
        cr = upsample2x(xp, cr)
    elif mode == 2:
        cb = upsample2x_h(xp, cb)
        cr = upsample2x_h(xp, cr)
    # reconcile chroma with the luma extent: canvas paddings may differ (the
    # grow policy is per-plane, and the staged canvases can outlive a batch
    # whose sampling mode differed) — crop when larger, zero-pad when smaller
    # (the padding region lies outside every sample's valid extent)
    def fit(c):
        c = c[..., : y.shape[-2], : y.shape[-1]]
        pad_h = y.shape[-2] - c.shape[-2]
        pad_w = y.shape[-1] - c.shape[-1]
        if pad_h or pad_w:
            widths = [(0, 0)] * (c.ndim - 2) + [(0, pad_h), (0, pad_w)]
            c = xp.pad(c, widths)
        return c

    cb = fit(cb)
    cr = fit(cr)
    return ycbcr_to_rgb(xp, y, cb, cr)

"""Fused crop + mirror + normalize (+ layout/dtype conversion).

TPU-native analogue of DALI's fused ``CropMirrorNormalize`` operator
(reference ``dali/operators/image/crop/crop_mirror_normalize.h``; kernels under
``dali/kernels/slice/`` + ``normalize/``). One fused pass: per-sample dynamic-slice
crop, horizontal mirror, (x - mean)/std normalization folded into a single
multiply-add (scale/shift pre-divided), dtype cast and optional HWC→CHW transpose —
XLA fuses the whole thing into one elementwise kernel after the gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def crop_mirror_normalize(
    data,  # [N, H, W, C] uniform padded batch
    crop_y,  # [N] int32 window origin (already computed from crop_pos & extents)
    crop_x,  # [N] int32
    mirror,  # [N] int32/bool horizontal mirror flags (or None)
    crop_h: int,
    crop_w: int,
    mean,  # [C] float32
    std,  # [C] float32
    scale: float = 1.0,
    shift: float = 0.0,
    output_layout: str = "CHW",
    out_dtype=jnp.float32,
    pad_output: bool = False,
    ext_h=None,  # [N] per-sample valid extents (pad policy only)
    ext_w=None,
    fill=None,  # [C] OUTPUT values for out-of-bounds pixels (pad policy)
):
    n, H, W, C = data.shape
    mean = jnp.asarray(mean, jnp.float32).reshape(-1)
    std = jnp.asarray(std, jnp.float32).reshape(-1)
    if mean.shape[0] == 1:
        mean = jnp.broadcast_to(mean, (C,))
    if std.shape[0] == 1:
        std = jnp.broadcast_to(std, (C,))
    # fold scale/shift: out = scale * (x - mean) / std + shift = x * a + b
    a = scale / std
    b = shift - mean * scale / std
    if fill is not None:
        fill = jnp.asarray(fill, jnp.float32).reshape(-1)
        if fill.shape[0] == 1:
            fill = jnp.broadcast_to(fill, (C,))

    def one(img, cy, cx, m, eh, ew):
        if fill is None:
            win = jax.lax.dynamic_slice(img, (cy, cx, 0), (crop_h, crop_w, C))
            win = win.astype(jnp.float32)
            if mirror is not None:
                # Mirror the per-sample VALID width, not the window canvas:
                # with no crop (crop_w = canvas W) or a trimmed window, the
                # slice tail past `ew - cx` is canvas padding, and a plain
                # [::-1] would pull that padding to column 0 (ragged batches
                # came out shifted). Reverse, then realign the valid region
                # to column 0 via a doubled-window dynamic slice (start is
                # 0 when the window is fully valid — the uniform fast path).
                vw = jnp.clip(ew - cx, 0, crop_w)
                rev = win[:, ::-1, :]
                rev = jax.lax.dynamic_slice(
                    jnp.concatenate([rev, rev], axis=1),
                    (0, crop_w - vw, 0), (crop_h, crop_w, C))
                win = jnp.where(m != 0, rev, win)
            return win * a + b
        # pad policy: origins may be negative / run past the extent — gather
        # with clipped indices and substitute `fill` (reference SliceBase
        # out_of_bounds_policy='pad': fill_values are final output values,
        # not normalized)
        rows = cy + jnp.arange(crop_h, dtype=jnp.int32)
        cols = cx + jnp.arange(crop_w, dtype=jnp.int32)
        win = jnp.take(img, jnp.clip(rows, 0, H - 1), axis=0)
        win = jnp.take(win, jnp.clip(cols, 0, W - 1), axis=1).astype(jnp.float32)
        valid = ((rows >= 0) & (rows < eh))[:, None, None] & (
            (cols >= 0) & (cols < ew)
        )[None, :, None]
        out = jnp.where(valid, win * a + b, fill)
        if mirror is not None:
            out = jnp.where(m != 0, out[:, ::-1, :], out)
        return out

    if ext_h is None:
        ext_h = jnp.full((n,), H, jnp.int32)
    if ext_w is None:
        ext_w = jnp.full((n,), W, jnp.int32)
    if mirror is None:
        out = jax.vmap(lambda i, y, x, eh, ew: one(i, y, x, 0, eh, ew))(
            data, crop_y, crop_x, ext_h, ext_w)
    else:
        out = jax.vmap(one)(data, crop_y, crop_x, mirror.astype(jnp.int32),
                            ext_h, ext_w)

    if pad_output:
        pad_c = 4 - C
        if pad_c > 0:
            out = jnp.pad(out, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
    if output_layout in ("CHW", "FCHW"):
        out = jnp.transpose(out, (0, 3, 1, 2))
    elif output_layout not in ("HWC", "", "FHWC"):
        raise ValueError(f"Unsupported output_layout {output_layout!r}")
    return out.astype(out_dtype)

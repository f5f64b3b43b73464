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

    def one(img, cy, cx, m):
        win = jax.lax.dynamic_slice(img, (cy, cx, 0), (crop_h, crop_w, C))
        win = win.astype(jnp.float32)
        if mirror is not None:
            win = jnp.where(m != 0, win[:, ::-1, :], win)
        out = win * a + b
        return out

    if mirror is None:
        out = jax.vmap(lambda i, y, x: one(i, y, x, 0))(data, crop_y, crop_x)
    else:
        out = jax.vmap(one)(data, crop_y, crop_x, mirror.astype(jnp.int32))

    if pad_output:
        pad_c = 4 - C
        if pad_c > 0:
            out = jnp.pad(out, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
    if output_layout in ("CHW", "FCHW"):
        out = jnp.transpose(out, (0, 3, 1, 2))
    elif output_layout not in ("HWC", "", "FHWC"):
        raise ValueError(f"Unsupported output_layout {output_layout!r}")
    return out.astype(out_dtype)

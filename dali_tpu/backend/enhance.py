"""Image enhancement ops used by AutoAugment: Equalize, AutoContrast pieces,
Sharpness blend (reference: ``dali/operators/image/color/equalize.*``,
``auto_aug/augmentations.py:54-230``)."""

from __future__ import annotations

import numpy as np

from .._schema import DALI_SCHEMA, ArgType, register_operator
from ..batch import DeviceBatch
from .base import Operator

DALI_SCHEMA("experimental.Equalize").DocStr(
    "Per-channel histogram equalization (reference image/color/equalize.cc; "
    "PIL-compatible LUT construction)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AllowSequences()


def _equalize_lut_np(channel: np.ndarray) -> np.ndarray:
    """PIL ImageOps.equalize-compatible LUT: step = (total - hist[255]) // 255,
    lut[i] = (step//2 + cumsum(hist)[:i]) // step (reference equalize kernel)."""
    hist = np.bincount(channel.reshape(-1), minlength=256)
    step = (hist.sum() - hist[255]) // 255
    if step == 0:
        return np.arange(256, dtype=np.uint8)
    lut = (np.concatenate([[0], np.cumsum(hist)[:-1]]) + step // 2) // step
    return np.clip(lut, 0, 255).astype(np.uint8)


@register_operator("experimental.Equalize", "cpu")
class EqualizeCPU(Operator):
    def run_sample(self, ctx, idx, img):
        out = np.empty_like(img)
        for c in range(img.shape[-1]):
            lut = _equalize_lut_np(img[..., c])
            out[..., c] = lut[img[..., c]]
        return out


@register_operator("experimental.Equalize", "gpu")
class EqualizeGPU(Operator):
    def lower(self, dctx, inp: DeviceBatch):
        import jax
        import jax.numpy as jnp

        x = inp.data.astype(jnp.int32)
        n, *dims, C = x.shape
        if inp.shapes is not None:
            # mask padding out of the histogram
            H, W = x.shape[1], x.shape[2]
            rows = jnp.arange(H)[None, :, None]
            cols = jnp.arange(W)[None, None, :]
            valid = (rows < inp.extent(0)[:, None, None]) & (cols < inp.extent(1)[:, None, None])
            weight = valid[..., None].astype(jnp.int32)
        else:
            weight = jnp.ones_like(x[..., :1])

        def one(img, w):
            def chan(ch):
                hist = jnp.zeros((256,), jnp.int32).at[ch.reshape(-1)].add(w[..., 0].reshape(-1))
                csum = jnp.cumsum(hist)
                step = (csum[-1] - hist[255]) // 255
                shifted = jnp.concatenate([jnp.zeros((1,), csum.dtype), csum[:-1]]) + step // 2
                lut = jnp.clip(shifted // jnp.maximum(step, 1), 0, 255).astype(jnp.uint8)
                return jnp.where(step == 0, ch.astype(jnp.uint8), lut[ch])

            return jnp.stack([chan(img[..., c]) for c in range(C)], axis=-1)

        out = jax.vmap(one)(x, weight)
        return [inp.with_data(out)]

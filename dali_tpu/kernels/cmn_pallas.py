"""Pallas TPU kernel: fused crop + normalize + transpose + cast.

The hand-scheduled analogue of :mod:`dali_tpu.kernels.cmn` (reference: DALI's
fused CropMirrorNormalize CUDA kernel, ``dali/kernels/slice/
slice_flip_normalize_permute_pad*``). One grid step per sample: per-sample crop
offsets arrive as scalar-prefetch operands so the uint8 window DMA (HBM→VMEM) is
issued straight from the prefetched scalars; the VPU does uint8→f32 and the
folded ``x*a + b``; the HWC→CHW transpose happens in VMEM on the way out. The
sub-tile x shift and the conditional mirror ride an XLA epilogue (Mosaic
constrains dynamic DMA offsets to tile multiples and cannot lower ``lax.rev``).

**Why this is NOT the default path** (measured on v5e, documented for the
record): with interleaved RGB (C=3) the channel axis lands on the 128-lane dim,
so every VMEM window wastes 128/3 ≈ 42x of lane capacity, and tile-alignment
slack adds further read amplification — the kernel moves *more* HBM bytes than
XLA's fused gather+convert+transpose, which is already at HBM speed-of-light for
this memory-bound op. Pallas wins on TPU when the innermost dim is
lane-friendly (≥128: planar/feature-map layouts), not on 3-channel interleaved
pixels. The kernel is kept validated (interpret mode) for such layouts and as
the template for future lane-friendly fusions; enable with
``DALI_TPU_FORCE_PALLAS=1``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SLACK = 8  # sublane tile: dynamic DMA x-offsets must be multiples of this


def _kernel(crop_y, base_x, x_hbm, a_ref, b_ref, out_ref, scratch, sem):
    n = pl.program_id(0)
    ch, cww, C = scratch.shape

    bx = pl.multiple_of(base_x[n], _SLACK)  # provably tile-aligned (host-masked)
    dma = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(crop_y[n], ch), pl.ds(bx, cww), :],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    win = scratch[:].astype(jnp.int32).astype(jnp.float32)  # [ch, cw+8, C]
    out = win * a_ref[:] + b_ref[:]
    out_ref[0] = jnp.transpose(out, (2, 0, 1)).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("crop_h", "crop_w", "out_dtype", "interpret")
)
def cmn_pallas(
    data,  # [N, H, W, C] uint8 (padded canvas; W must be >= crop_w + 8)
    crop_y,  # [N] int32
    crop_x,  # [N] int32
    mirror,  # [N] int32
    a,  # [C] float32  (scale/std folded)
    b,  # [C] float32  (shift/mean folded)
    *,
    crop_h: int,
    crop_w: int,
    out_dtype=jnp.float32,
    interpret: bool = False,
):
    n, H, W, C = data.shape
    cww = crop_w + _SLACK
    crop_x = crop_x.astype(jnp.int32)
    base_x = jnp.minimum(crop_x & ~(_SLACK - 1), max(W - cww, 0))
    rem = crop_x - base_x

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # windows DMA manually
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, C, crop_h, cww), lambda i, *refs: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((crop_h, cww, C), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
    )
    wide = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, C, crop_h, cww), out_dtype),
        interpret=interpret,
    )(
        crop_y.astype(jnp.int32),
        base_x,
        data,
        a.astype(jnp.float32),
        b.astype(jnp.float32),
    )
    # epilogue: per-sample sub-tile shift + conditional mirror (one fused pass)
    def fix(sample, r, m):
        win = jax.lax.dynamic_slice(sample, (0, 0, r), (sample.shape[0], sample.shape[1], crop_w))
        return jnp.where(m != 0, win[:, :, ::-1], win)

    return jax.vmap(fix)(wide, rem, mirror.astype(jnp.int32))


def use_pallas() -> bool:
    """Opt-in (see module docstring: XLA fusion wins for interleaved RGB)."""
    import os

    if not os.environ.get("DALI_TPU_FORCE_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False

"""Device (gpu) implementations of the random-number operators.

The reference runs these as CUDA kernels with per-sample Philox streams
(``random/rng_base_gpu.h``); here they fold into the jitted device program via
JAX's counter-based PRNG — the per-op key derives from (pipeline seed,
iteration, op id), so determinism and checkpointability match the cpu path's
philosophy (state = counters).
"""

from __future__ import annotations

import numpy as np

from .._schema import register_operator
from ..batch import DeviceBatch
from ..types import DALIDataType, to_jnp_type
from .base import Operator


def _out_shape(spec, dctx, n):
    shape = spec.GetArgument("shape", None)
    if shape:
        return (n, *[int(v) for v in shape])
    return (n,)


class _RngShapeMixin:
    """Per-sample TENSOR `shape` arguments for device RNG ops: the target
    shapes are host data, so the host side computes a grow-latched canvas
    and the logical extents ride the output shapes (reference rng_base.h
    ShapeGenArg)."""

    def host_params(self, ctx, input_shapes):
        b = ctx._arg_batches.get(self.op_id, {}).get("shape")
        if b is None:
            if "shape" in self.spec.arg_inputs:
                # shape rides a DEVICE edge: extents are not host-known, so
                # the canvas can't be sized — silent scalar fallback would be
                # wrong output
                raise ValueError(
                    f"{self.spec.schema.name}: a tensor `shape` argument "
                    "must be a cpu tensor (device-resident shapes cannot "
                    "size the output canvas)")
            self._ps_shape = None
            return {}
        ps = np.asarray([np.asarray(s).reshape(-1) for s in b.samples],
                        np.int64)
        latch = getattr(self, "_canvas_latch", None)
        mx = ps.max(axis=0)
        self._canvas_latch = (mx if latch is None
                              else np.maximum(np.asarray(latch), mx))
        self._ps_shape = ps
        return {"rng_shapes": ps.astype(np.int32)}

    def device_statics(self, ctx, input_shapes, input_batches=None):
        if getattr(self, "_ps_shape", None) is None:
            return None
        return ("rngps",) + tuple(int(v) for v in self._canvas_latch)

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        ps = getattr(self, "_ps_shape", None)
        return None if ps is None else [ps]

    def _shape_for(self, dctx, n):
        """(batched draw shape, logical per-sample shapes or None)."""
        st = dctx.static(self)
        if isinstance(st, tuple) and st and st[0] == "rngps":
            import jax.numpy as jnp

            canvas = tuple(int(v) for v in st[1:])
            # logical extents are a traced param (they change per iteration)
            ps = jnp.asarray(dctx.param(self, "rng_shapes"))
            return (n, *canvas), ps
        return _out_shape(self.spec, dctx, n), None


@register_operator("random.Uniform", "gpu")
class UniformGPU(_RngShapeMixin, Operator):
    def lower(self, dctx, *inputs):
        import jax
        import jax.numpy as jnp

        n = dctx.batch_size if not inputs else inputs[0].data.shape[0]
        dt = to_jnp_type(self.spec.GetArgument("dtype", None) or DALIDataType.FLOAT)
        key = dctx.key(self)
        values = self.spec.GetArgument("values", None)
        shape, ps = self._shape_for(dctx, n)
        if values:
            idx = jax.random.randint(key, shape, 0, len(values))
            out = jnp.asarray(np.asarray(values, np.float32))[idx]
        else:
            lo, hi = self.spec.GetArgument("range", [-1.0, 1.0])
            out = jax.random.uniform(key, shape, jnp.float32, lo, hi)
        return [DeviceBatch(out.astype(dt), ps, "")]


@register_operator("random.Normal", "gpu")
class NormalGPU(_RngShapeMixin, Operator):
    def lower(self, dctx, *inputs):
        import jax
        import jax.numpy as jnp

        n = dctx.batch_size if not inputs else inputs[0].data.shape[0]
        dt = to_jnp_type(self.spec.GetArgument("dtype", None) or DALIDataType.FLOAT)
        shape, ps = self._shape_for(dctx, n)
        mean = dctx.arg(self, "mean", 0.0)
        std = dctx.arg(self, "stddev", 1.0)
        out = jax.random.normal(dctx.key(self), shape, jnp.float32)
        if hasattr(mean, "ndim") and getattr(mean, "ndim", 0) >= 1:
            mean = mean.reshape(n, *([1] * (len(shape) - 1)))
        if hasattr(std, "ndim") and getattr(std, "ndim", 0) >= 1:
            std = std.reshape(n, *([1] * (len(shape) - 1)))
        return [DeviceBatch((out * std + mean).astype(dt), ps, "")]


@register_operator("random.CoinFlip", "gpu")
class CoinFlipGPU(_RngShapeMixin, Operator):
    def lower(self, dctx, *inputs):
        import jax
        import jax.numpy as jnp

        n = dctx.batch_size if not inputs else inputs[0].data.shape[0]
        dt = to_jnp_type(self.spec.GetArgument("dtype", None) or DALIDataType.INT32)
        shape, ps = self._shape_for(dctx, n)
        p = dctx.arg(self, "probability", 0.5)
        u = jax.random.uniform(dctx.key(self), shape)
        if hasattr(p, "ndim") and getattr(p, "ndim", 0) >= 1:
            p = p.reshape(n, *([1] * (len(shape) - 1)))
        return [DeviceBatch((u < p).astype(dt), ps, "")]


@register_operator("random.Beta", "gpu")
class BetaGPU(_RngShapeMixin, Operator):
    def lower(self, dctx, *inputs):
        import jax
        import jax.numpy as jnp

        n = dctx.batch_size if not inputs else inputs[0].data.shape[0]
        dt = to_jnp_type(self.spec.GetArgument("dtype", None) or DALIDataType.FLOAT)
        shape, ps = self._shape_for(dctx, n)
        a = dctx.arg(self, "alpha", 1.0)
        b = dctx.arg(self, "beta", 1.0)
        a = jnp.broadcast_to(jnp.asarray(a, jnp.float32).reshape(-1, *([1] * (len(shape) - 1))), shape) \
            if hasattr(a, "ndim") and getattr(a, "ndim", 0) >= 1 else a
        b = jnp.broadcast_to(jnp.asarray(b, jnp.float32).reshape(-1, *([1] * (len(shape) - 1))), shape) \
            if hasattr(b, "ndim") and getattr(b, "ndim", 0) >= 1 else b
        out = jax.random.beta(dctx.key(self), a, b, shape)
        return [DeviceBatch(out.astype(dt), ps, "")]

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


@register_operator("random.Uniform", "gpu")
class UniformGPU(Operator):
    def lower(self, dctx, *inputs):
        import jax
        import jax.numpy as jnp

        n = dctx.batch_size if not inputs else inputs[0].data.shape[0]
        dt = to_jnp_type(self.spec.GetArgument("dtype", None) or DALIDataType.FLOAT)
        key = dctx.key(self)
        values = self.spec.GetArgument("values", None)
        shape = _out_shape(self.spec, dctx, n)
        if values:
            idx = jax.random.randint(key, shape, 0, len(values))
            out = jnp.asarray(np.asarray(values, np.float32))[idx]
        else:
            lo, hi = self.spec.GetArgument("range", [-1.0, 1.0])
            out = jax.random.uniform(key, shape, jnp.float32, lo, hi)
        return [DeviceBatch(out.astype(dt), None, "")]


@register_operator("random.Normal", "gpu")
class NormalGPU(Operator):
    def lower(self, dctx, *inputs):
        import jax
        import jax.numpy as jnp

        n = dctx.batch_size if not inputs else inputs[0].data.shape[0]
        dt = to_jnp_type(self.spec.GetArgument("dtype", None) or DALIDataType.FLOAT)
        shape = _out_shape(self.spec, dctx, n)
        mean = dctx.arg(self, "mean", 0.0)
        std = dctx.arg(self, "stddev", 1.0)
        out = jax.random.normal(dctx.key(self), shape, jnp.float32)
        if hasattr(mean, "ndim") and getattr(mean, "ndim", 0) >= 1:
            mean = mean.reshape(n, *([1] * (len(shape) - 1)))
        if hasattr(std, "ndim") and getattr(std, "ndim", 0) >= 1:
            std = std.reshape(n, *([1] * (len(shape) - 1)))
        return [DeviceBatch((out * std + mean).astype(dt), None, "")]


@register_operator("random.CoinFlip", "gpu")
class CoinFlipGPU(Operator):
    def lower(self, dctx, *inputs):
        import jax
        import jax.numpy as jnp

        n = dctx.batch_size if not inputs else inputs[0].data.shape[0]
        dt = to_jnp_type(self.spec.GetArgument("dtype", None) or DALIDataType.INT32)
        shape = _out_shape(self.spec, dctx, n)
        p = dctx.arg(self, "probability", 0.5)
        u = jax.random.uniform(dctx.key(self), shape)
        if hasattr(p, "ndim") and getattr(p, "ndim", 0) >= 1:
            p = p.reshape(n, *([1] * (len(shape) - 1)))
        return [DeviceBatch((u < p).astype(dt), None, "")]


@register_operator("random.Beta", "gpu")
class BetaGPU(Operator):
    def lower(self, dctx, *inputs):
        import jax
        import jax.numpy as jnp

        n = dctx.batch_size if not inputs else inputs[0].data.shape[0]
        dt = to_jnp_type(self.spec.GetArgument("dtype", None) or DALIDataType.FLOAT)
        shape = _out_shape(self.spec, dctx, n)
        a = dctx.arg(self, "alpha", 1.0)
        b = dctx.arg(self, "beta", 1.0)
        a = jnp.broadcast_to(jnp.asarray(a, jnp.float32).reshape(-1, *([1] * (len(shape) - 1))), shape) \
            if hasattr(a, "ndim") and getattr(a, "ndim", 0) >= 1 else a
        b = jnp.broadcast_to(jnp.asarray(b, jnp.float32).reshape(-1, *([1] * (len(shape) - 1))), shape) \
            if hasattr(b, "ndim") and getattr(b, "ndim", 0) >= 1 else b
        out = jax.random.beta(dctx.key(self), a, b, shape)
        return [DeviceBatch(out.astype(dt), None, "")]

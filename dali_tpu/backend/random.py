"""Random-number operators.

Reference: ``dali/operators/random/`` (``rng_base.h:108`` — per-sample Philox
streams, checkpointable). Here every draw comes from a counter-based Philox keyed
by (seed, op_id, iteration): state never needs to be stored, which makes
checkpoint/resume exact by construction (SURVEY §5.4).

These are CPU ops (like the reference defaults): their outputs are per-sample
scalars/tensors that either stay on host or get stacked into device-program inputs
when consumed as argument inputs of gpu ops (e.g. ``mirror=fn.random.coin_flip()``).
"""

from __future__ import annotations

import numpy as np

from .._schema import DALI_SCHEMA, ArgType, register_operator
from ..batch import HostBatch
from ..types import DALIDataType, to_numpy_type
from .base import Operator


def _shape_arg(ctx, op, idx, inputs):
    if inputs:
        return inputs[0].shape
    shape = ctx.arg(op, "shape", idx, None)
    if shape is None:
        return ()
    arr = np.asarray(shape).reshape(-1)
    return tuple(int(v) for v in arr)


class _RandomBase(Operator):
    default_dtype = DALIDataType.FLOAT

    def run_batch(self, ctx, *inputs):
        n = len(inputs[0]) if inputs else ctx.batch_size
        rng = ctx.rng(self)
        dt = to_numpy_type(self.spec.GetArgument("dtype", None) or self.default_dtype)
        samples = []
        for i in range(n):
            shape = _shape_arg(ctx, self, i, [b.samples[i] for b in inputs] if inputs else [])
            samples.append(self._draw(ctx, rng, i, shape).astype(dt))
        return [HostBatch(samples, layout="")]

    def _draw(self, ctx, rng, idx, shape):
        raise NotImplementedError


def _random_schema(name, doc):
    return (
        DALI_SCHEMA(name)
        .DocStr(doc)
        .NumInput(0, 1)
        .NumOutput(1)
        .Devices("cpu", "gpu")
        .AddRandomSeedArg()
        .AddOptionalArg("shape", ArgType.INT_VEC, "Output sample shape.", None, tensor_ok=True, per_sample=True)
        .AddOptionalArg("dtype", ArgType.DATA_TYPE, "Output dtype.", None)
    )


_random_schema(
    "random.Uniform",
    "Uniform random numbers in `range` or from discrete `values` "
    "(reference random/uniform_distribution.cc).",
).AddOptionalArg("range", ArgType.FLOAT_VEC, "Half-open range [lo, hi).", [-1.0, 1.0]).AddOptionalArg(
    "values", ArgType.FLOAT_VEC, "Discrete value set.", None
)


@register_operator("random.Uniform", "cpu")
class UniformCPU(_RandomBase):
    def _draw(self, ctx, rng, idx, shape):
        values = self.spec.GetArgument("values", None)
        if values:
            return np.asarray(rng.choice(np.asarray(values), size=shape or None))
        lo, hi = self.spec.GetArgument("range", [-1.0, 1.0])
        return np.asarray(rng.uniform(lo, hi, size=shape or None))


_random_schema(
    "random.Normal", "Normally distributed random numbers (reference random/normal_distribution.cc)."
).AddOptionalArg("mean", ArgType.FLOAT, "Mean.", 0.0, tensor_ok=True, per_sample=True).AddOptionalArg(
    "stddev", ArgType.FLOAT, "Standard deviation.", 1.0, tensor_ok=True, per_sample=True
)


@register_operator("random.Normal", "cpu")
class NormalCPU(_RandomBase):
    def _draw(self, ctx, rng, idx, shape):
        mean = float(np.asarray(ctx.arg(self, "mean", idx, 0.0)))
        std = float(np.asarray(ctx.arg(self, "stddev", idx, 1.0)))
        return np.asarray(rng.normal(mean, std, size=shape or None))


_random_schema(
    "random.CoinFlip", "Bernoulli 0/1 samples (reference random/coin_flip.cc)."
).AddOptionalArg("probability", ArgType.FLOAT, "P(1).", 0.5, tensor_ok=True, per_sample=True)


@register_operator("random.CoinFlip", "cpu")
class CoinFlipCPU(_RandomBase):
    default_dtype = DALIDataType.INT32

    def _draw(self, ctx, rng, idx, shape):
        p = float(np.asarray(ctx.arg(self, "probability", idx, 0.5)))
        return np.asarray(rng.random(size=shape or None) < p).astype(np.int32)


_random_schema(
    "random.Beta", "Beta-distributed samples (reference random/beta_distribution.cc)."
).AddOptionalArg("alpha", ArgType.FLOAT, "Alpha.", 1.0, tensor_ok=True, per_sample=True).AddOptionalArg(
    "beta", ArgType.FLOAT, "Beta.", 1.0, tensor_ok=True, per_sample=True
)


@register_operator("random.Beta", "cpu")
class BetaCPU(_RandomBase):
    def _draw(self, ctx, rng, idx, shape):
        a = float(np.asarray(ctx.arg(self, "alpha", idx, 1.0)))
        b = float(np.asarray(ctx.arg(self, "beta", idx, 1.0)))
        return np.asarray(rng.beta(a, b, size=shape or None))


_random_schema(
    "random.Choice",
    "Samples from the input's values or from range(n) with optional weights "
    "(reference random/choice.cc).",
).AddOptionalArg(
    "p", ArgType.FLOAT_VEC, "Probabilities.", None, tensor_ok=True, per_sample=True
).Devices("cpu")  # cpu-only, like the reference random/choice.cc


@register_operator("random.Choice", "cpu")
class ChoiceCPU(Operator):
    def run_batch(self, ctx, *inputs):
        n = len(inputs[0]) if inputs else ctx.batch_size
        rng = ctx.rng(self)
        samples = []
        for i in range(n):
            shape = None
            shape_arg = ctx.arg(self, "shape", i, None)
            if shape_arg is not None:
                shape = tuple(int(v) for v in np.asarray(shape_arg).reshape(-1))
            p = ctx.arg(self, "p", i, None)
            p = np.asarray(p, np.float64) if p is not None else None
            if p is not None:
                p = p / p.sum()
            src = inputs[0].samples[i]
            if src.ndim == 0 or src.size == 1:
                # range mode: output keeps the scalar input's dtype
                # (reference choice.cc output type = input type)
                v = rng.choice(int(np.asarray(src).reshape(-1)[0]), size=shape, p=p)
                v = np.asarray(v).astype(src.dtype)
            else:
                v = rng.choice(src, size=shape, p=p)
            samples.append(np.asarray(v))
        return [HostBatch(samples, layout="")]


DALI_SCHEMA("BatchPermutation").DocStr(
    "Random permutation of batch indices (reference random/batch_permutation.cc)."
).NumInput(0).NumOutput(1).Devices("cpu").AddRandomSeedArg().AddOptionalArg(
    "no_fixed_points", ArgType.BOOL, "Ensure perm[i] != i.", False
).AddOptionalArg(
    "allow_repetitions", ArgType.BOOL,
    "Sample indices WITH replacement instead of a permutation (reference "
    "batch_permutation.cc `allow_repetitions`).", False)


@register_operator("BatchPermutation", "cpu")
class BatchPermutation(Operator):
    def run_batch(self, ctx, *unused):
        rng = ctx.rng(self)
        n = ctx.batch_size
        if self.spec.GetArgument("allow_repetitions", False):
            perm = rng.integers(0, n, size=n)
            if self.spec.GetArgument("no_fixed_points", False) and n > 1:
                while np.any(perm == np.arange(n)):
                    perm = rng.integers(0, n, size=n)
        else:
            perm = rng.permutation(n)
            if self.spec.GetArgument("no_fixed_points", False) and n > 1:
                while np.any(perm == np.arange(n)):
                    perm = rng.permutation(n)
        return [HostBatch([np.int32(perm[i]) for i in range(n)], layout="")]


# noise ops (reference random/noise/) ---------------------------------------------------------

DALI_SCHEMA("noise.Gaussian").DocStr(
    "Additive Gaussian noise (reference noise/gaussian_noise.cc)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddRandomSeedArg().AddOptionalArg(
    "mean", ArgType.FLOAT, "Noise mean.", 0.0, tensor_ok=True, per_sample=True
).AddOptionalArg("stddev", ArgType.FLOAT, "Noise std.", 1.0, tensor_ok=True, per_sample=True)


@register_operator("noise.Gaussian", "cpu")
class GaussianNoiseCPU(Operator):
    def run_sample(self, ctx, idx, x):
        rng = ctx.rng(self, idx)
        mean = float(np.asarray(ctx.arg(self, "mean", idx, 0.0)))
        std = float(np.asarray(ctx.arg(self, "stddev", idx, 1.0)))
        noisy = x.astype(np.float32) + rng.normal(mean, std, size=x.shape).astype(np.float32)
        if np.issubdtype(x.dtype, np.integer):
            info = np.iinfo(x.dtype)
            noisy = np.clip(np.round(noisy), info.min, info.max)
        return noisy.astype(x.dtype)


@register_operator("noise.Gaussian", "gpu")
class GaussianNoiseGPU(Operator):
    def lower(self, dctx, inp):
        import jax
        import jax.numpy as jnp

        key = dctx.key(self)
        mean = dctx.arg(self, "mean", 0.0)
        std = dctx.arg(self, "stddev", 1.0)
        noise = jax.random.normal(key, inp.data.shape, jnp.float32)
        if hasattr(mean, "shape") and getattr(mean, "ndim", 0) >= 1:
            mean = mean.reshape((-1,) + (1,) * (inp.data.ndim - 1))
        if hasattr(std, "shape") and getattr(std, "ndim", 0) >= 1:
            std = std.reshape((-1,) + (1,) * (inp.data.ndim - 1))
        noisy = inp.data.astype(jnp.float32) + noise * std + mean
        if jnp.issubdtype(inp.data.dtype, jnp.integer):
            info = jnp.iinfo(inp.data.dtype)
            noisy = jnp.clip(jnp.round(noisy), info.min, info.max)
        return [inp.with_data(noisy.astype(inp.data.dtype))]

"""Operator base classes and execution contexts.

TPU-native re-design of DALI's ``OperatorBase`` (reference
``dali/pipeline/operator/operator.h:76-123``). The reference has one virtual
``Setup/Run`` pair specialized per backend; we split by where the work runs:

* **Host ops** (``device='cpu'`` and ``'mixed'``): ``run_batch`` over ragged
  ``HostBatch``es; the default implementation fans out ``run_sample`` per sample to
  the executor's thread pool — the analogue of the reference's CPU batch→sample
  loop (``operator.h:276-317``).
* **Device ops** (``device='gpu'``): ``lower`` is *traced* into the single jitted
  device program — the analogue of a CUDA kernel launch, except XLA fuses the whole
  device subgraph into one program.
* Device ops may additionally implement ``host_params`` — per-iteration host-side
  computation (e.g. random crop windows) whose numpy results feed the device program
  as extra inputs. This mirrors DALI attr classes like ``RandomCropAttr`` that run
  on CPU even for GPU ops.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from .._schema import OpSpec
from ..batch import DeviceBatch, HostBatch


class HostCtx:
    """Per-iteration host execution context (analogue of the reference
    ``Workspace``, ``dali/pipeline/workspace/workspace.h:138``)."""

    def __init__(self, pipeline, iteration: int, epoch: int, pool=None):
        self.pipeline = pipeline
        self.batch_size = pipeline.max_batch_size
        self.iteration = iteration
        self.epoch = epoch
        self._pool = pool
        self._arg_batches: Dict[int, Dict[str, HostBatch]] = {}
        # statically-propagated input layouts per device op (set by the
        # executor's Setup pass; lets device_statics/host_output_shapes
        # resolve layout-named axes on device-to-device edges)
        self.op_in_layouts: Dict[int, List[str]] = {}

    def in_layouts(self, op: "Operator") -> List[str]:
        return self.op_in_layouts.get(op.op_id, [])

    # -- RNG: counter-based, checkpoint == (seed, iteration) -------------------
    def rng(self, op: "Operator", sample_idx: Optional[int] = None) -> np.random.Generator:
        """Philox stream keyed by (pipeline seed ^ op seed, op id, iteration[, sample]).

        Counter-based like the reference per-sample Philox streams
        (``dali/operators/random/rng_base.h:108``) — state never needs saving;
        checkpoint/restore replays from the iteration index.
        """
        seed = op.spec.GetArgument("seed", -1) if op.spec.schema.has_random_seed else -1
        explicit = seed is not None and seed >= 0
        if not explicit:
            seed = self.pipeline.seed
        # Philox takes a 2x64-bit key: word0 = seed [⊕ op], word1 = iteration/
        # sample. An EXPLICIT per-op seed is position-independent (reference
        # contract: the same seed yields the same stream wherever the op sits
        # in the graph — rng_base.h); only implicit pipeline-seeded streams
        # mix in op_id to decorrelate ops.
        k0 = np.uint64(seed)
        if not explicit:
            k0 = k0 ^ (np.uint64(op.op_id) << np.uint64(32))
        k1 = np.uint64(self.iteration)
        if sample_idx is not None:
            k1 = k1 | (np.uint64(sample_idx) << np.uint64(40))
        return np.random.Generator(np.random.Philox(key=np.array([k0, k1], dtype=np.uint64)))

    # -- per-sample argument resolution ----------------------------------------
    def set_arg_batches(self, op_id: int, batches: Dict[str, HostBatch]):
        self._arg_batches[op_id] = batches

    def arg(self, op: "Operator", name: str, sample_idx: Optional[int] = None, default=None):
        """Resolve an argument that may be a constant or a tensor argument input
        (reference: ``OpSpec`` argument inputs, ``op_spec.h``)."""
        batches = self._arg_batches.get(op.op_id, {})
        if name in batches:
            b = batches[name]
            if sample_idx is None:
                return b
            v = b.samples[sample_idx]
            if v.ndim == 0:
                return v[()]
            return v
        if op.spec.HasArgument(name):
            return op.spec.GetArgument(name)
        v = op.spec.GetArgument(name, default)
        return default if v is None else v

    # -- sample-parallel map ------------------------------------------------------
    def map_samples(self, fn, n: int) -> list:
        """Run ``fn(i)`` for i in [0, n) on the executor thread pool."""
        if self._pool is None or n <= 1:
            return [fn(i) for i in range(n)]
        return self._pool.map_indices(fn, n)


class DeviceCtx:
    """Tracing context for the device program."""

    def __init__(
        self,
        batch_size: int,
        base_key,
        params: Dict[int, Dict[str, object]],
        arg_arrays,
        statics: Optional[Dict[int, object]] = None,
        iteration=None,
    ):
        import jax

        self.batch_size = batch_size
        self._base_key = base_key
        self._params = params
        self._arg_arrays = arg_arrays  # {op_id: {name: jnp array [N,...]}}
        self._statics = statics or {}
        self._iteration = iteration  # traced scalar (explicit-seed streams)
        self._jax = jax

    def static(self, op: "Operator"):
        return self._statics.get(op.op_id)

    def bind_device_args(self, device_arg_edges, env):
        """Register gpu-edge argument inputs (resolved from the device-program env
        at trace time)."""
        self._device_arg_edges = device_arg_edges
        self._env = env

    def key(self, op: "Operator"):
        """Per-op PRNG key. An EXPLICIT per-op seed gives a graph-position-
        independent stream keyed by (seed, iteration) alone (reference
        contract — rng_base.h: same seed, same stream); implicit streams
        derive from the pipeline-seeded iteration key ⊕ op_id."""
        s = -1
        if op.spec.schema.has_random_seed:
            v = op.spec.GetArgument("seed", -1)
            s = -1 if v is None else int(v)
        if s >= 0 and self._iteration is not None:
            return self._jax.random.fold_in(self._jax.random.PRNGKey(s),
                                            self._iteration)
        return self._jax.random.fold_in(self._base_key, op.op_id)

    def param(self, op: "Operator", name: str):
        return self._params[op.op_id][name]

    def arg(self, op: "Operator", name: str, default=None):
        """Argument value: a jnp array [N, ...] if given as a tensor argument,
        otherwise the python constant from the spec."""
        arrs = self._arg_arrays.get(op.op_id, {})
        if name in arrs:
            return arrs[name]
        dev_edges = getattr(self, "_device_arg_edges", None)
        if dev_edges and (op.op_id, name) in dev_edges:
            return self._env[dev_edges[(op.op_id, name)]].data
        if op.spec.HasArgument(name):
            return op.spec.GetArgument(name)
        v = op.spec.GetArgument(name, default)
        return default if v is None else v

    def has_tensor_arg(self, op: "Operator", name: str) -> bool:
        if name in self._arg_arrays.get(op.op_id, {}):
            return True
        dev_edges = getattr(self, "_device_arg_edges", None)
        return bool(dev_edges and (op.op_id, name) in dev_edges)

    def has_param(self, op: "Operator", name: str) -> bool:
        return name in self._params.get(op.op_id, {})


class Operator:
    """Base class for all operator implementations."""

    schema_name: str = None
    device: str = None

    def __init__(self, spec: OpSpec, op_id: int):
        self.spec = spec
        self.op_id = op_id

    # -- host path ---------------------------------------------------------------
    def run_batch(self, ctx: HostCtx, *inputs: HostBatch) -> Sequence[HostBatch]:
        """Default: per-sample fan-out, like the reference CPU operator
        specialization (``operator.h:276-317``)."""
        n = len(inputs[0]) if inputs else ctx.batch_size
        results = ctx.map_samples(lambda i: self.run_sample(ctx, i, *(b.samples[i] for b in inputs)), n)
        first = results[0]
        n_out = len(first) if isinstance(first, tuple) else 1
        outs = []
        for j in range(n_out):
            samples = [(r[j] if isinstance(r, tuple) else r) for r in results]
            outs.append(HostBatch(samples, layout=self.output_layout(j, inputs)))
        return outs

    def run_sample(self, ctx: HostCtx, idx: int, *inputs: np.ndarray):
        raise NotImplementedError(f"{type(self).__name__} has no host implementation")

    def output_layout(self, output_idx: int, inputs) -> str:
        return inputs[0].layout if inputs else ""

    # -- device path ---------------------------------------------------------------
    def lower(self, dctx: DeviceCtx, *inputs: DeviceBatch) -> Sequence[DeviceBatch]:
        raise NotImplementedError(f"{type(self).__name__} has no device lowering")

    def host_params(self, ctx: HostCtx, input_shapes: List[np.ndarray]) -> Dict[str, np.ndarray]:
        """Host-side per-iteration parameter computation for device ops."""
        return {}

    def device_statics(self, ctx: HostCtx, input_shapes: List[np.ndarray]):
        """Hashable trace-time constants for the device lowering (e.g. a grown max
        output canvas). Participates in the device-program cache key — return
        values that stabilize (grow policy) to bound recompiles."""
        return None

    def host_output_shapes(self, ctx: HostCtx, input_shapes, input_batches):
        """Host-side shape inference for a device op: per-output [N, ndim] arrays
        (or None if unknown). Lets downstream device ops' ``host_params`` see
        shapes through chains of device ops (the analogue of the reference's
        Setup() shape-inference pass, operator.h:88)."""
        return None

    def host_output_layouts(self, in_layouts: List[str]) -> List[str]:
        """Static layout inference for a device op (the layout leg of the
        Setup() pass). Default: pass through the first input's layout. Ops
        that permute or rename axes on the device (CMN, Transpose, Reshape,
        decoders) override this so downstream ``axis_names`` resolution works
        across device-to-device edges."""
        return [in_layouts[0] if in_layouts else ""]

    # -- padding hints ---------------------------------------------------------------
    def boundary_fill(self, output_idx: int = 0):
        """Pad fill value when this op's host output crosses to the device."""
        return 0

    # -- checkpointing (reference op_checkpoint.h:34) --------------------------------
    def save_state(self) -> Optional[dict]:
        return None

    def restore_state(self, state: dict):
        pass

    def __repr__(self):
        return f"<{type(self).__name__} op_id={self.op_id} name={self.spec.name!r}>"


# Device ops whose per-sample LOGICAL extents always equal their first input's
# (elementwise / value-only transforms). The executor propagates host-side
# shapes through these automatically so downstream ops with host canvas math
# (Rotate keep_size, Crop bounds checks) keep working mid-chain — the
# reference gets this for free from every operator's Setup() shape pass
# (operator.h:88); here only shape-CHANGING device ops implement
# host_output_shapes by hand. Keep this list strictly value-only: anything
# that can alter extents, channel count, or dimensionality must not be here.
SHAPE_PRESERVING_SCHEMAS = frozenset({
    "Brightness", "BrightnessContrast", "Contrast",
    "Hsv", "Hue", "Saturation", "ColorTwist",
    "Equalize", "experimental.Equalize",
    "Cast", "CastLike", "Copy",
    "Flip", "GridMask", "Jitter", "Sphere", "Water",
    "JpegCompressionDistortion", "LookupTable", "Normalize",
    "noise.Gaussian", "noise.SaltAndPepper", "noise.Shot",
    "GaussianBlur", "Laplacian",
    "experimental.Clahe", "experimental.MedianBlur",
    "experimental.Erode", "experimental.Dilate",
    "PreemphasisFilter", "ToDecibels", "PerFrame", "BbFlip",
    "_conditional.LogicalNot",
})


class ReaderOperator(Operator):
    """Base for readers: owns a Loader, exposes reader metadata
    (reference ``dali/operators/reader/reader_op.h:57``)."""

    def reader_meta(self) -> dict:
        raise NotImplementedError

    def epoch_size(self) -> int:
        return self.reader_meta()["epoch_size"]

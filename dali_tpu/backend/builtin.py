"""Built-in structural operators: device transfer, external source, constants.

Reference: ``dali/operators/builtin/`` (``external_source.h:33``,
``input_operator.h:134``, ``make_contiguous.cc``).
"""

from __future__ import annotations

import collections
import inspect
from typing import Optional

import numpy as np

from .._schema import DALI_SCHEMA, ArgType, register_operator
from ..batch import HostBatch
from ..types import BatchInfo, SampleInfo
from .base import Operator


# -- _CopyToDevice (DataNode.gpu()) --------------------------------------------------
DALI_SCHEMA("_CopyToDevice").DocStr(
    "Host→device transfer marker; the executor stages its output across the "
    "padded-canvas boundary (analogue of MakeContiguous inserted by DataNode.gpu(), "
    "reference make_contiguous.cc)."
).NumInput(1).NumOutput(1).Devices("mixed").MakeInternal()


@register_operator("_CopyToDevice", "mixed")
class CopyToDevice(Operator):
    def run_batch(self, ctx, inp: HostBatch):
        return [inp]


# -- Copy ------------------------------------------------------------------------------
DALI_SCHEMA("Copy").DocStr("Copies the input (reference builtin Copy op).").NumInput(1).NumOutput(
    1
).Devices("cpu", "gpu")


@register_operator("Copy", "cpu")
class CopyCPU(Operator):
    def run_sample(self, ctx, idx, x):
        return np.copy(x)


@register_operator("Copy", "gpu")
class CopyGPU(Operator):
    def lower(self, dctx, x):
        return [x]


# -- ExternalSource -----------------------------------------------------------------------
DALI_SCHEMA("ExternalSource").DocStr(
    """User data injection point (reference ``external_source.py:1002``,
    ``builtin/external_source.h:33``). Data arrives either from ``source``
    (callable / iterable / generator, per-sample or per-batch) or via
    ``Pipeline.feed_input``."""
).NumInput(0).OutputFn(lambda spec: spec.GetArgument("num_outputs", 1) or 1).Devices(
    "cpu"
).MakeStateful().AddOptionalArg(
    "num_outputs", ArgType.INT, "Number of outputs (source returns a tuple per call).", None
).AddOptionalArg(
    "source", ArgType.PYTHON_OBJECT, "Callable/iterable/generator producing data.", None
).AddOptionalArg(
    "batch", ArgType.BOOL, "source produces whole batches (True) or single samples (False).", True
).AddOptionalArg(
    "cycle", ArgType.STRING, "'no'|'quiet'|'raise' — iterable cycling policy.", None
).AddOptionalArg(
    "layout", ArgType.TENSOR_LAYOUT, "Layout of the produced data.", ""
).AddOptionalArg(
    "repeat_last", ArgType.BOOL, "Re-serve the last fed batch when queue is empty.", False
).AddOptionalArg(
    "blocking", ArgType.BOOL, "Block waiting for feed_input (True) or raise (False).", True
).AddOptionalArg(
    "no_copy", ArgType.BOOL, "Zero-copy hint (host batches are always borrowed).", False
).AddOptionalArg(
    "parallel", ArgType.BOOL, "Run source in worker processes.", False
).AddOptionalArg(
    "prefetch_queue_depth", ArgType.INT, "Parallel-mode prefetch depth.", 1
).AddOptionalArg(
    "dtype", ArgType.DATA_TYPE,
    "Expected data dtype; fed data of a different dtype raises (reference "
    "ExternalSource `dtype` validation).", None
).AddOptionalArg(
    "ndim", ArgType.INT,
    "Expected sample dimensionality; mismatches raise. Inferred from "
    "`layout` when that is set (reference ExternalSource `ndim`).", None
)


@register_operator("ExternalSource", "cpu")
class ExternalSource(Operator):
    def __init__(self, spec, op_id):
        super().__init__(spec, op_id)
        self._queue = collections.deque()
        self._last = None
        self._iter = None
        self._iteration = 0
        self._epoch = 0
        src = spec._extra.get("_source", spec.GetArgument("source", None))
        self._source = src
        self._batch_mode = bool(spec.GetArgument("batch", True))
        self._cycle = spec.GetArgument("cycle", None)
        self._layout = spec.GetArgument("layout", "") or ""
        self._num_outputs = spec.GetArgument("num_outputs", None)
        self._callable = callable(src)
        self._source_kind = self._classify(src)
        self._accepts_arg = False
        if self._callable:
            try:
                sig = inspect.signature(src)
                # the callback takes SampleInfo/BatchInfo only if it has a
                # *required* positional parameter (defaulted closure params like
                # `lambda i=i: ...` are not info arguments)
                self._accepts_arg = any(
                    p.default is inspect.Parameter.empty
                    and p.kind
                    in (inspect.Parameter.POSITIONAL_ONLY, inspect.Parameter.POSITIONAL_OR_KEYWORD)
                    for p in sig.parameters.values()
                )
            except (TypeError, ValueError):
                self._accepts_arg = False

    @staticmethod
    def _classify(src):
        if src is None:
            return "fed"
        if inspect.isgeneratorfunction(src):
            # a generator FUNCTION (reference SourceKind.GENERATOR_FUNC,
            # external_source_impl.py:38): call it to obtain the iterator;
            # cycle=True re-invokes it at exhaustion
            return "gen_func"
        if callable(src):
            return "callable"
        return "iterable"

    # feed_input path (reference input_operator.h caching_list queue)
    def feed(self, data, layout=None):
        self._queue.append((data, layout or self._layout))

    def run_batch(self, ctx, *unused):
        n_out = self._num_outputs or 1
        if self.spec.GetArgument("parallel", False) and self._source_kind == "callable":
            outs = self._run_parallel(ctx, n_out)
            self._iteration += 1
            self._validate_outs(outs)
            return outs
        data, layout = self._next_data(ctx)
        groups = self._split_outputs(data, n_out)
        outs = []
        for g in groups:
            samples = self._to_samples(g, ctx.batch_size)
            outs.append(HostBatch(samples, layout=layout))
        self._iteration += 1
        self._validate_outs(outs)
        return outs

    def _validate_outs(self, outs):
        """Enforce the declared dtype/ndim contract (reference ExternalSource
        dtype=/ndim= validation; mismatched feeds must raise, not corrupt)."""
        import numpy as np

        from ..types import DALIDataType, to_numpy_type

        want_dt = self.spec.GetArgument("dtype", None)
        want_nd = self.spec.GetArgument("ndim", None)
        if want_nd is None and self._layout:
            want_nd = len(self._layout)
        if want_dt is None and want_nd is None:
            return
        for hb in outs:
            if not hb.samples:
                continue
            s = np.asarray(hb.samples[0])
            if want_dt is not None:
                want = np.dtype(to_numpy_type(DALIDataType(int(want_dt))))
                if s.dtype != want:
                    raise TypeError(
                        f"ExternalSource '{self.spec.name}': declared dtype "
                        f"{want} but source produced {s.dtype}")
            if want_nd is not None and s.ndim != int(want_nd):
                raise ValueError(
                    f"ExternalSource '{self.spec.name}': declared ndim "
                    f"{int(want_nd)} but source produced {s.ndim}-D samples")

    def _run_parallel(self, ctx, n_out):
        """Multiprocess path (reference _multiproc pool; parallel=True)."""
        if self._batch_mode:
            raise ValueError("parallel=True requires a per-sample (batch=False) callable source")
        if not self._accepts_arg:
            raise ValueError(
                "parallel=True requires an indexed callable accepting SampleInfo "
                "(reference restriction: stateless sources only)"
            )
        if getattr(self, "_pool", None) is None:
            from .._multiproc import WorkerPool

            self._pool = WorkerPool(
                self._source,
                num_workers=ctx.pipeline.py_num_workers,
                batch_size=ctx.batch_size,
                queue_depth=ctx.pipeline.prefetch_queue_depth,
                start_method=ctx.pipeline.py_start_method,
                pickler=getattr(ctx.pipeline, "py_callback_pickler", None),
            )
        per_sample = self._pool.run_batch(self._iteration, self._epoch)
        outs = []
        for j in range(n_out):
            outs.append(HostBatch([s[j] for s in per_sample], layout=self._layout))
        return outs

    def _next_data(self, ctx):
        if self._source_kind == "fed":
            if not self._queue:
                if self.spec.GetArgument("repeat_last", False) and self._last is not None:
                    return self._last
                raise RuntimeError(
                    f"ExternalSource '{self.spec.name}' has no data; call Pipeline.feed_input first"
                )
            self._last = self._queue.popleft()
            return self._last
        if self._source_kind == "callable":
            if self._batch_mode:
                arg = BatchInfo(self._iteration, self._epoch) if self._accepts_arg else None
                data = self._source(arg) if self._accepts_arg else self._source()
            else:
                samples = []
                bs = ctx.batch_size
                for i in range(bs):
                    info = SampleInfo(self._iteration * bs + i, i, self._iteration, self._epoch)
                    samples.append(self._source(info) if self._accepts_arg else self._source())
                data = _transpose_samples(samples)
            return data, self._layout
        # iterable / generator object / generator function
        def fresh_iter():
            return self._source() if self._source_kind == "gen_func" else iter(self._source)

        if self._iter is None:
            self._iter = fresh_iter()
        try:
            data = next(self._iter)
        except StopIteration:
            if self._cycle in ("quiet", "raise") or self._cycle is True:
                self._iter = fresh_iter()
                self._epoch += 1
                if self._cycle == "raise":
                    raise StopIteration
                data = next(self._iter)
            else:
                raise
        return data, self._layout

    def _split_outputs(self, data, n_out):
        if n_out == 1:
            if isinstance(data, tuple) and self._num_outputs is None:
                data = data[0] if len(data) == 1 else data
            return [data]
        if not isinstance(data, (tuple, list)) or len(data) != n_out:
            raise ValueError(
                f"ExternalSource '{self.spec.name}' expected {n_out} outputs, got {type(data)}"
            )
        return list(data)

    @staticmethod
    def _to_samples(data, batch_size):
        import numpy as np

        if isinstance(data, np.ndarray):
            samples = [np.asarray(data[i]) for i in range(data.shape[0])]
        elif isinstance(data, (list, tuple)):
            samples = [np.asarray(s) for s in data]
        elif hasattr(data, "__array__"):
            arr = np.asarray(data)
            samples = [arr[i] for i in range(arr.shape[0])]
        else:
            raise TypeError(f"Unsupported external source data type {type(data)}")
        if len(samples) > batch_size:
            # variable batch sizes up to max_batch_size are fine (reference
            # external_source semantics); exceeding it is an error there too
            raise ValueError(
                f"external_source produced {len(samples)} samples, more than "
                f"the pipeline's max_batch_size={batch_size}"
            )
        return samples

    def reset_epoch(self):
        """Restart an exhausted source (reference ExternalSource reset): iterables
        re-iterate; callables restart idx_in_epoch at 0 with epoch_idx + 1."""
        if self._source_kind in ("iterable", "gen_func"):
            self._iter = None
            self._epoch += 1
        elif self._source_kind == "callable":
            self._iteration = 0
            self._epoch += 1

    def close(self):
        pool = getattr(self, "_pool", None)
        if pool is not None:
            pool.close()
            self._pool = None

    def save_state(self):
        st = {"iteration": self._iteration, "epoch": self._epoch}
        if self._source_kind in ("iterable", "gen_func") and (
                self._iteration or self._epoch):
            # reference contract (advanced_topics_checkpointing.rst):
            # external_source checkpoints only INDEXED callables — a plain
            # iterator/generator cannot be rewound, so restoring counters
            # would silently replay a DIFFERENT stream. Mark the snapshot;
            # Pipeline.checkpoint() refuses to serialize it.
            st["unresumable_source"] = (
                "external_source with an iterator/generator source cannot be "
                "checkpointed mid-stream; use an indexed callable "
                "(source=lambda sample_info: ...) for resumable pipelines")
        return st

    def restore_state(self, state):
        self._iteration = int(state["iteration"])
        self._epoch = int(state.get("epoch", 0))


def _transpose_samples(samples):
    """samples: list of per-sample results (possibly tuples) → tuple-of-lists or list."""
    if samples and isinstance(samples[0], tuple):
        return tuple(list(x) for x in zip(*samples))
    return samples


# -- Constant ----------------------------------------------------------------------------------
DALI_SCHEMA("Constant").DocStr(
    "Produces a constant batch (reference generic/constant.cc; created by types.Constant)."
).NumInput(0).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
    "fdata", ArgType.FLOAT_VEC, "Float payload.", None
).AddOptionalArg(
    "idata", ArgType.INT_VEC, "Int payload.", None
).AddOptionalArg(
    "shape", ArgType.INT_VEC, "Output sample shape.", None
).AddOptionalArg(
    "dtype", ArgType.DATA_TYPE, "Output dtype.", None
).AddOptionalArg(
    "layout", ArgType.TENSOR_LAYOUT, "Output layout.", ""
)


class _ConstantBase(Operator):
    def _value(self) -> np.ndarray:
        from .. import types as _t

        raw = self.spec._extra.get("_raw_value")
        if raw is not None:
            arr = np.asarray(raw)
        else:
            fdata = self.spec.GetArgument("fdata", None)
            idata = self.spec.GetArgument("idata", None)
            payload = fdata if fdata is not None else (idata if idata is not None else [0])
            arr = np.asarray(payload, dtype=np.float32 if fdata is not None else np.int32)
            shape = self.spec.GetArgument("shape", None)
            if shape is not None:
                shape = list(shape)
                if arr.size == int(np.prod(shape)) if shape else arr.size == 1:
                    arr = arr.reshape(shape)
                else:
                    arr = np.full(shape, arr.reshape(-1)[0], arr.dtype)
        dtype = self.spec.GetArgument("dtype", None)
        if dtype is not None:
            arr = arr.astype(_t.to_numpy_type(dtype))
        return arr


@register_operator("Constant", "cpu")
class ConstantCPU(_ConstantBase):
    def run_batch(self, ctx, *unused):
        v = self._value()
        return [HostBatch([v] * ctx.batch_size, layout=self.spec.GetArgument("layout", ""))]


@register_operator("Constant", "gpu")
class ConstantGPU(_ConstantBase):
    def lower(self, dctx, *unused):
        import jax.numpy as jnp

        from ..batch import DeviceBatch

        v = jnp.asarray(self._value())
        data = jnp.broadcast_to(v[None], (dctx.batch_size, *v.shape))
        return [DeviceBatch(data, None, self.spec.GetArgument("layout", ""))]

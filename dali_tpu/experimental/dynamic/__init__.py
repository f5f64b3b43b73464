"""Dynamic (eager / imperative) mode — ``ndd``.

Reference: ``dali/python/nvidia/dali/experimental/dynamic/`` (~10.2k LoC:
eval contexts, invocations, capture machinery). On TPU this collapses to a thin
layer: every registered operator becomes an eagerly-executing function over
:class:`Batch` objects — host ops run numpy immediately, device ops run jnp
eagerly (JAX op-by-op dispatch). Graph capture for replay is ``@pipeline_def``
itself (the declarative API compiles; the imperative API executes).

    import dali_tpu.experimental.dynamic as ndd
    batch = ndd.as_batch([img1, img2])
    out = ndd.resize(batch.gpu(), resize_x=224, resize_y=224)
    ndd.crop_mirror_normalize(out, mean=[...], std=[...])
"""

from __future__ import annotations

import sys
import types as _pytypes
from typing import List, Optional

import numpy as np

from ..._schema import GetSchema, OpSpec, RegisteredSchemas, get_operator_impl
from ...backend.base import DeviceCtx, HostCtx
from ...batch import DeviceBatch, HostBatch, pad_and_stack
from ...fn import _camel_to_snake


class EvalContext:
    """Seeds + iteration counter for eager random ops (reference
    ``dynamic/_eval_context.py:35``)."""

    _current: Optional["EvalContext"] = None

    def __init__(self, seed: int = 12345, num_threads: int = 4):
        self.seed = seed
        self.num_threads = num_threads
        self.counter = 0
        # persistent impls for STATEFUL ops (readers, anything MakeStateful):
        # the same call site advances the same reader across calls instead of
        # restarting it (reference dynamic _ops.Operator._get instance cache)
        self._op_cache = {}
        self._pending_states = {}  # cache key -> state to apply on creation

    def __enter__(self):
        self._prev = EvalContext._current
        EvalContext._current = self
        return self

    def __exit__(self, *exc):
        EvalContext._current = self._prev
        return False

    @classmethod
    def current(cls):
        if cls._current is None:
            cls._current = EvalContext()
        return cls._current


class Checkpoint:
    """Dynamic-mode checkpoint (reference ``dynamic/checkpoint.py``): captures
    the eval context's RNG stream position (seed + call counter — eager random
    ops key their streams off it) and every cached stateful operator's state
    (reader cursors etc.). ``apply`` restores onto an eval context; states for
    readers not yet instantiated are applied when they first run."""

    FORMAT_VERSION = 1

    def __init__(self, state=None):
        self.state = state or {}

    @classmethod
    def collect(cls, ectx: "EvalContext" = None) -> "Checkpoint":
        ectx = ectx or EvalContext.current()
        ops = {}
        for key, impl in ectx._op_cache.items():
            st = impl.save_state()
            if st is not None:
                ops[repr(key)] = {"type": type(impl).__name__, "state": st}
        return cls({
            "version": cls.FORMAT_VERSION,
            "seed": ectx.seed,
            "counter": ectx.counter,
            "ops": ops,
        })

    def apply(self, ectx: "EvalContext" = None) -> None:
        ectx = ectx or EvalContext.current()
        if self.state.get("version") != self.FORMAT_VERSION:
            raise ValueError(
                f"ndd checkpoint version {self.state.get('version')} != {self.FORMAT_VERSION}")
        ectx.seed = self.state["seed"]
        ectx.counter = self.state["counter"]
        for key_r, entry in self.state.get("ops", {}).items():
            impl = next((im for k, im in ectx._op_cache.items() if repr(k) == key_r), None)
            if impl is not None:
                if type(impl).__name__ != entry["type"]:
                    raise TypeError(
                        f"checkpoint state for {entry['type']} cannot apply to "
                        f"{type(impl).__name__}")
                impl.restore_state(entry["state"])
            else:
                ectx._pending_states[key_r] = entry

    def serialize(self) -> str:
        import base64
        import json

        from ... import pickling

        def enc(o):
            if isinstance(o, (np.integer, np.floating)):
                return o.item()
            return {"__pkl__": base64.b64encode(pickling.dumps(o)).decode()}

        return json.dumps(self.state, default=enc)

    @classmethod
    def deserialize(cls, payload: str) -> "Checkpoint":
        import base64
        import json

        from ... import pickling

        def dec(d):
            if "__pkl__" in d:
                return pickling.loads(base64.b64decode(d["__pkl__"]))
            return d

        return cls(json.loads(payload, object_hook=dec))


def current_checkpoint() -> Checkpoint:
    """Collect a checkpoint of the current eval context (reference
    ``dynamic/checkpoint.py`` ``current()``)."""
    return Checkpoint.collect(EvalContext.current())


class Batch:
    """An eager batch: host samples (ragged numpy) or a device array + extents."""

    def __init__(self, samples=None, device_data=None, shapes=None, layout=""):
        self._samples = samples
        self._device_data = device_data
        self._shapes = shapes
        self.layout = layout or ""

    # -- construction ---------------------------------------------------------
    @staticmethod
    def from_samples(samples, layout=""):
        return Batch(samples=[np.asarray(s) for s in samples], layout=layout)

    @property
    def is_gpu(self):
        return self._device_data is not None

    def __len__(self):
        if self._samples is not None:
            return len(self._samples)
        return int(self._device_data.shape[0])

    # -- movement ----------------------------------------------------------------
    def gpu(self) -> "Batch":
        if self.is_gpu:
            return self
        import jax

        hb = HostBatch(self._samples, self.layout)
        if hb.is_uniform():
            arr, shapes = pad_and_stack(hb, align=1)
            return Batch(device_data=jax.device_put(arr), shapes=None, layout=self.layout)
        align = [64] * hb.ndim
        for d in range(hb.ndim):
            if (self.layout and d < len(self.layout) and self.layout[d] in ("C", "N")) or (
                not self.layout and d == hb.ndim - 1 and hb.samples[0].shape[-1] <= 4
            ):
                align[d] = 1
        arr, shapes = pad_and_stack(hb, align=align)
        return Batch(
            device_data=jax.device_put(arr), shapes=jax.device_put(shapes), layout=self.layout
        )

    def cpu(self) -> "Batch":
        if not self.is_gpu:
            return self
        # NB: use builtins.slice — this module exposes the eager Slice op as
        # a module-level `slice` attribute (matching fn.slice).
        import builtins

        host = np.asarray(self._device_data)
        if self._shapes is None:
            samples = [host[i] for i in range(host.shape[0])]
        else:
            sh = np.asarray(self._shapes)
            samples = [
                host[(i, *(builtins.slice(0, int(e)) for e in sh[i]))]
                for i in range(host.shape[0])
            ]
        return Batch(samples=samples, layout=self.layout)

    # -- access ---------------------------------------------------------------------
    def at(self, i):
        if self.is_gpu:
            return self.cpu().at(i)
        return self._samples[i]

    def as_array(self):
        if self.is_gpu:
            return self._device_data
        return np.stack(self._samples, 0)

    def __repr__(self):
        kind = "gpu" if self.is_gpu else "cpu"
        return f"Batch({kind}, n={len(self)}, layout={self.layout!r})"


def _batch_arithm(op, *operands, reverse=False):
    """Eager arithmetic over Batch objects (reference dynamic-mode operator
    overloads): same _ArithmeticGenericOp + expression DSL as DataNode."""
    from ...data_node import _scalar_desc

    ops = list(operands[::-1]) if reverse else list(operands)
    inputs = []
    descs = []
    for o in ops:
        if isinstance(o, Batch):
            descs.append(f"&{len(inputs)}")
            inputs.append(o)
        elif isinstance(o, (bool, int, float)):
            descs.append(_scalar_desc(o, None))
        elif isinstance(o, np.generic):  # numpy scalars
            descs.append(_scalar_desc(o.item(), None))
        else:
            return NotImplemented
    expr = f"{op}({' '.join(descs)})"
    return _eager_call("_ArithmeticGenericOp", *inputs, expression_desc=expr)


def _add_batch_operators():
    binops = {
        "__add__": "add", "__sub__": "sub", "__mul__": "mul",
        "__truediv__": "fdiv", "__floordiv__": "div", "__mod__": "mod",
        "__pow__": "pow", "__eq__": "eq", "__ne__": "neq", "__lt__": "lt",
        "__le__": "leq", "__gt__": "gt", "__ge__": "geq",
        "__and__": "bitand", "__or__": "bitor", "__xor__": "bitxor",
    }
    for dunder, op in binops.items():
        def fwd(self, other, _op=op):
            return _batch_arithm(_op, self, other)
        setattr(Batch, dunder, fwd)
    for dunder, op in (("__radd__", "add"), ("__rsub__", "sub"),
                       ("__rmul__", "mul"), ("__rtruediv__", "fdiv"),
                       ("__rfloordiv__", "div"), ("__rmod__", "mod"),
                       ("__rpow__", "pow"), ("__rand__", "bitand"),
                       ("__ror__", "bitor"), ("__rxor__", "bitxor")):
        def rev(self, other, _op=op):
            return _batch_arithm(_op, other, self)
        setattr(Batch, dunder, rev)
    def _no_bool(self):
        raise TypeError(
            "A dynamic Batch cannot be used in a plain Python `if` or "
            "`bool()` — comparisons are elementwise (same contract as "
            "DataNode). Reduce explicitly, e.g. bool(np.all(...)).")

    Batch.__bool__ = _no_bool
    Batch.__neg__ = lambda self: _batch_arithm("minus", self)
    Batch.__pos__ = lambda self: _batch_arithm("plus", self)
    Batch.__abs__ = lambda self: _batch_arithm("abs", self)


_add_batch_operators()


def as_batch(data, layout="") -> Batch:
    if isinstance(data, Batch):
        return data
    if isinstance(data, np.ndarray):
        return Batch.from_samples(list(data), layout)
    if isinstance(data, (list, tuple)):
        return Batch.from_samples(data, layout)
    # jax array
    if hasattr(data, "device"):
        return Batch(device_data=data, layout=layout)
    raise TypeError(f"Cannot make a Batch from {type(data)}")


class _EagerPipelineShim:
    """Just enough Pipeline surface for HostCtx."""

    def __init__(self, ectx: EvalContext, batch_size: int):
        self.seed = ectx.seed
        self.max_batch_size = batch_size
        self.num_threads = ectx.num_threads
        self.pad_align = 64


def _fn_for_schema(schema_name: str):
    """The traced fn.* function for this schema (same naming convention)."""
    from ... import fn as fn_root

    mod = fn_root
    parts = schema_name.split(".")
    for p in parts[:-1]:
        mod = getattr(mod, p)
    return getattr(mod, _camel_to_snake(parts[-1]))


def _freeze_arg(v) -> str:
    """Hashable identity for a reader-cache kwarg. repr() truncates large
    numpy arrays ('...'), which would collide distinct readers — hash array
    contents instead."""
    import hashlib

    if isinstance(v, np.ndarray):
        h = hashlib.sha1(np.ascontiguousarray(v).tobytes()).hexdigest()[:16]
        return f"ndarray({v.dtype},{v.shape},{h})"
    if isinstance(v, (list, tuple)):
        return f"{type(v).__name__}[" + ",".join(_freeze_arg(x) for x in v) + "]"
    return repr(v)


def _eager_call(schema_name: str, *inputs, device=None, batch_size=None, **kwargs):
    # Inside a pipeline_def trace, ndd functions ARE the fn API: dispatch to
    # the traced operator so one function body works in both modes
    # (reference dynamic-mode capture interop).
    from ...data_node import DataNode
    from ...pipeline import Pipeline

    if Pipeline.current() is not None and (
        not inputs or any(isinstance(i, DataNode) for i in inputs)
    ):
        if device is not None:
            kwargs["device"] = device
        return _fn_for_schema(schema_name)(*inputs, **kwargs)

    schema = GetSchema(schema_name)
    batches = [as_batch(i) if not isinstance(i, Batch) else i for i in inputs]
    if device is None:
        device = "gpu" if any(b.is_gpu for b in batches) else "cpu"
        if device not in schema.devices:
            device = schema.devices[0]
    n = len(batches[0]) if batches else (batch_size or 1)
    ectx = EvalContext.current()
    ectx.counter += 1

    # split tensor-valued kwargs into per-sample argument batches
    arg_batches = {}
    plain_kwargs = {}
    for k, v in kwargs.items():
        if isinstance(v, Batch):
            arg_batches[k] = HostBatch(v.cpu()._samples)
        else:
            plain_kwargs[k] = v
    spec = OpSpec(schema_name, device=device if device != "gpu" else "gpu", **plain_kwargs)
    impl_cls = get_operator_impl(schema_name, device)
    if schema.is_reader:
        # persistent instance per (op, device, args): the reader ADVANCES
        # across eager calls instead of restarting, and its cursor is what
        # ndd.Checkpoint captures (reference dynamic _ops.Reader)
        key = (schema_name, device,
               tuple(sorted((k, _freeze_arg(v)) for k, v in plain_kwargs.items())))
        impl = ectx._op_cache.get(key)
        if impl is None:
            impl = impl_cls(spec, op_id=1_000_000 + len(ectx._op_cache))
            ectx._op_cache[key] = impl
            pend = ectx._pending_states.pop(repr(key), None)
            if pend is not None:
                if type(impl).__name__ != pend["type"]:
                    raise TypeError(
                        f"checkpoint state for {pend['type']} cannot apply to "
                        f"{type(impl).__name__}")
                impl.restore_state(pend["state"])
    else:
        impl = impl_cls(spec, op_id=ectx.counter)
    shim = _EagerPipelineShim(ectx, n)
    impl.pipeline = shim
    ctx = HostCtx.__new__(HostCtx)
    ctx.pipeline = shim
    ctx.batch_size = n
    ctx.iteration = ectx.counter
    ctx.epoch = 0
    ctx._pool = None
    ctx._arg_batches = {impl.op_id: arg_batches}
    ctx.op_in_layouts = {}

    if device in ("cpu", "mixed"):
        ins = [HostBatch(b.cpu()._samples, b.layout) for b in batches]
        outs = impl.run_batch(ctx, *ins)
        if not isinstance(outs, (list, tuple)):
            outs = [outs]
        result = [Batch(samples=o.samples, layout=o.layout) for o in outs]
        if device == "mixed":
            result = [r.gpu() for r in result]
    else:
        import jax

        dev_inputs = []
        for b in batches:
            g = b.gpu()
            dev_inputs.append(DeviceBatch(g._device_data, g._shapes, g.layout))
        ctx.op_in_layouts[impl.op_id] = [d.layout or "" for d in dev_inputs]
        # host params (e.g. RRC windows) from input shapes
        in_shapes = [
            np.asarray(d.shapes) if d.shapes is not None else
            np.tile(np.asarray(d.data.shape[1:], np.int32)[None], (n, 1))
            for d in dev_inputs
        ]
        params = impl.host_params(ctx, in_shapes) if type(impl).host_params.__qualname__ != "Operator.host_params" else {}
        # ops whose statics need batch metadata (e.g. Pad axis_names reads the
        # layout) declare a 4-arg device_statics — same dispatch as
        # executor.py; the arity is resolved once per impl instance
        takes_batches = getattr(impl, "_statics_takes_batches", None)
        if takes_batches is None:
            import inspect

            takes_batches = impl._statics_takes_batches = (
                len(inspect.signature(type(impl).device_statics).parameters) >= 4)
        if takes_batches:
            statics = impl.device_statics(ctx, in_shapes, batches)
        else:
            statics = impl.device_statics(ctx, in_shapes)
        key = jax.random.fold_in(jax.random.PRNGKey(ectx.seed), ectx.counter)
        arg_arrays = {
            impl.op_id: {k: np.stack([np.asarray(s) for s in v.samples]) for k, v in arg_batches.items()}
        }
        # host-known per-sample output shapes BEFORE lowering (executor order:
        # error-policy checks raise here; padded-canvas outputs get their
        # logical extents from the host instead of leaking the canvas)
        host_shapes = impl.host_output_shapes(
            ctx, in_shapes, [None] * len(dev_inputs))
        dctx = DeviceCtx(n, key, {impl.op_id: params}, arg_arrays,
                         {impl.op_id: statics} if statics else {},
                         iteration=ectx.counter)
        outs = impl.lower(dctx, *dev_inputs)
        if not isinstance(outs, (list, tuple)):
            outs = [outs]
        result = []
        for j, o in enumerate(outs):
            sh = o.shapes
            if (host_shapes is not None and j < len(host_shapes)
                    and host_shapes[j] is not None):
                sh = np.asarray(host_shapes[j])
            result.append(Batch(device_data=o.data, shapes=sh, layout=o.layout))
    return result[0] if len(result) == 1 else tuple(result)


def _make_eager_fn(schema_name):
    def eager_fn(*inputs, **kwargs):
        return _eager_call(schema_name, *inputs, **kwargs)

    eager_fn.__name__ = _camel_to_snake(schema_name.rsplit(".", 1)[-1])
    eager_fn.__doc__ = f"Eager {schema_name} (see fn.{eager_fn.__name__})."
    return eager_fn


def _submodule(parent, name):
    full = parent.__name__ + "." + name
    mod = sys.modules.get(full)
    if mod is None:
        mod = _pytypes.ModuleType(full)
        sys.modules[full] = mod
    if not hasattr(parent, name):
        setattr(parent, name, mod)
    return mod


def _populate():
    this = sys.modules[__name__]
    for schema_name in RegisteredSchemas():
        schema = GetSchema(schema_name)
        if schema.is_internal:
            continue
        # readers ARE exposed: stateful instances persist per call site in
        # the EvalContext (reference dynamic _ops.Reader), advancing across
        # calls and checkpointable via ndd.Checkpoint
        parts = schema_name.split(".")
        mod = this
        for p in parts[:-1]:
            mod = _submodule(mod, p)
        fn_name = _camel_to_snake(parts[-1])
        if not hasattr(mod, fn_name):
            setattr(mod, fn_name, _make_eager_fn(schema_name))


_populate()


# ---------------------------------- capture -----------------------------------


def capture(fn=None, *, num_threads: int = 1):
    """Compile an eager (ndd) function into a pipeline for replay (reference
    dynamic-mode capture machinery). The decorated function runs ONCE as a
    pipeline_def trace (ndd ops dispatch to traced operators there); every
    subsequent call feeds its Batch arguments through external_source nodes
    and runs the compiled pipeline.

        @ndd.capture
        def frontend(imgs):
            imgs = ndd.resize(imgs, resize_x=64, resize_y=64)
            return ndd.crop_mirror_normalize(imgs, ...)

        out = frontend(ndd.as_batch(samples))   # compiled from call #2 on
    """

    def deco(user_fn):
        import functools

        state = {}

        @functools.wraps(user_fn)
        def wrapper(*input_batches):
            from ... import fn as fn_root
            from ...pipeline import pipeline_def

            batches = [as_batch(b) if not isinstance(b, Batch) else b
                       for b in input_batches]
            bs = len(batches[0])
            pipe = state.get(bs)
            if pipe is None:
                ectx = EvalContext.current()

                @pipeline_def(batch_size=bs, num_threads=num_threads,
                              seed=ectx.seed)
                def _captured():
                    ins = [fn_root.external_source(name=f"__capture_in_{i}")
                           for i in range(len(batches))]
                    return user_fn(*ins)

                pipe = _captured()
                pipe.build()
                state[bs] = pipe
            for i, b in enumerate(batches):
                cpu = b.cpu()
                pipe.feed_input(f"__capture_in_{i}", list(cpu._samples))
            outs = pipe.run()
            result = []
            for tl in outs:
                if hasattr(tl, "jax_array"):
                    shp = tl._shapes_np() if tl._shapes is not None else None
                    result.append(Batch(device_data=tl.jax_array, shapes=shp,
                                        layout=tl.layout()))
                else:
                    result.append(Batch(samples=[tl.at(i) for i in range(len(tl))],
                                        layout=tl.layout()))
            return result[0] if len(result) == 1 else tuple(result)

        wrapper._captured_pipelines = state
        return wrapper

    return deco(fn) if fn is not None else deco

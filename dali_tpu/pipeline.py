"""Pipeline: graph building + lifecycle.

Analogue of DALI's ``Pipeline``/``@pipeline_def`` (reference
``dali/python/nvidia/dali/pipeline.py:97,2210`` and C++ ``dali/pipeline/pipeline.h:62``).
``build()`` traces the user's graph function, prunes + CSE's the graph, and hands it
to the :class:`~dali_tpu.executor.Executor`, which compiles the device subgraph into
one jitted JAX program on first run. ``run()/schedule_run()/outputs()`` follow the
reference semantics (prefetch queue, blocking outputs).
"""

from __future__ import annotations

import functools
import json
import threading
from typing import List, Optional

import numpy as np

from ._schema import OpSpec
from .data_node import DataNode
from .graph import Graph, OpNode

_pipeline_tls = threading.local()


def _current_pipeline() -> Optional["Pipeline"]:
    stack = getattr(_pipeline_tls, "stack", None)
    return stack[-1] if stack else None


class Pipeline:
    """Data pipeline: define → build → run.

    Args mirror the reference constructor (``pipeline.py:97``); TPU-irrelevant ones
    (``exec_pipelined``, ``exec_async``, ``device_id`` CUDA semantics) are accepted
    for compatibility and where meaningful re-interpreted:

    * ``device_id`` — index into ``jax.local_devices()`` (None = default device).
    * ``num_threads`` — host sample-parallel worker count.
    * ``prefetch_queue_depth`` — bounded in-flight iteration queue.
    * ``pad_align`` — TPU-specific: alignment of padded ragged extents at the
      host→device boundary (bounds XLA recompiles; "grow" canvas policy).
    """

    def __init__(
        self,
        batch_size: int = -1,
        num_threads: int = -1,
        device_id: Optional[int] = None,
        seed: int = -1,
        exec_pipelined: bool = True,
        prefetch_queue_depth: int = 2,
        exec_async: bool = True,
        bytes_per_sample: int = 0,
        set_affinity: bool = False,
        max_streams: int = -1,
        default_cuda_stream_priority: int = 0,
        *,
        enable_conditionals: bool = False,
        enable_checkpointing: bool = False,
        checkpoint: Optional[str] = None,
        py_num_workers: int = 1,
        py_start_method: str = "fork",
        py_callback_pickler=None,
        output_dtype=None,
        output_ndim=None,
        pad_align: int = 64,
        max_batch_size: Optional[int] = None,
        exec_dynamic: bool = False,
        transfer_chunk_bytes: int = 4 * 1024 * 1024,
        debug: bool = False,
    ):
        self.max_batch_size = max_batch_size if max_batch_size is not None else batch_size
        if self.max_batch_size is None or self.max_batch_size < 1:
            raise ValueError("batch_size must be a positive integer")
        self.num_threads = num_threads if num_threads and num_threads > 0 else 4
        self.device_id = device_id
        self.seed = seed if seed is not None and seed >= 0 else 12345
        # dict form separates the stage depths (reference separated queues:
        # {"cpu_size": N, "gpu_size": M}) — cpu_size bounds the host->device
        # staging queue, gpu_size bounds the in-flight device iterations
        if isinstance(prefetch_queue_depth, dict):
            cpu_d = int(prefetch_queue_depth.get("cpu_size", 2))
            gpu_d = int(prefetch_queue_depth.get("gpu_size", 2))
        else:
            cpu_d = gpu_d = int(prefetch_queue_depth)
        self.cpu_queue_depth = max(1, cpu_d)
        self.gpu_queue_depth = max(1, gpu_d)
        self.prefetch_queue_depth = max(self.cpu_queue_depth, self.gpu_queue_depth)
        self.enable_conditionals = enable_conditionals
        self.enable_checkpointing = enable_checkpointing
        self.py_num_workers = py_num_workers
        self.py_start_method = py_start_method
        self.py_callback_pickler = py_callback_pickler
        self.pad_align = pad_align
        self.transfer_chunk_bytes = int(transfer_chunk_bytes)
        # debug=True: run the device stage eagerly (no jit) so user prints /
        # breakpoints work per-op (reference _debug_mode.py:37)
        self.debug = bool(debug)
        # declared output contracts, validated on every iteration (reference
        # pipeline output_dtype/output_ndim checks)
        self.output_dtype = output_dtype
        self.output_ndim = output_ndim

        self._graph_fn = None
        self._graph: Optional[Graph] = None
        self._executor = None
        self._built = False
        self._traced_ops: List[OpNode] = []
        self._next_op_id = 0
        self._op_name_counts = {}
        self._outputs_raw = None
        self._restore_checkpoint = checkpoint
        self._batches_scheduled = 0
        self._batches_consumed = 0

    # -- graph building scope -----------------------------------------------------
    def __enter__(self):
        stack = getattr(_pipeline_tls, "stack", None)
        if stack is None:
            stack = _pipeline_tls.stack = []
        stack.append(self)
        return self

    def __exit__(self, *exc):
        _pipeline_tls.stack.pop()
        return False

    @staticmethod
    def current() -> Optional["Pipeline"]:
        return _current_pipeline()

    def add_op(self, spec: OpSpec) -> OpNode:
        """Register a traced operator call (reference ``Pipeline.AddOperator``,
        ``pipeline.cc``)."""
        if spec.name is None:
            base = spec.schema_name.replace(".", "__")
            # skip past any EXPLICIT names that squatted the pattern (and
            # adopted deserialized ops, which never seeded the counter):
            # colliding instance names silently alias in Graph._by_name,
            # mis-wiring deserialize and feed_input
            taken = {op.instance_name for op in self._traced_ops}
            n = self._op_name_counts.get(base, 0)
            while f"__{base}_{n}" in taken:
                n += 1
            self._op_name_counts[base] = n + 1
            spec.name = f"__{base}_{n}"
        elif any(op.instance_name == spec.name for op in self._traced_ops):
            raise ValueError(f"Duplicate operator instance name '{spec.name}'")
        node = OpNode(self._next_op_id, spec)
        self._next_op_id += 1
        out_device = "gpu" if spec.device in ("gpu", "mixed") else "cpu"
        n_out = spec.num_outputs()
        node.outputs = [DataNode(f"{spec.name}[{j}]", out_device, node, j) for j in range(n_out)]
        self._traced_ops.append(node)
        return node

    def set_outputs(self, *outputs):
        self._outputs_raw = outputs

    def _flatten_outputs(self, outputs):
        flat = []
        for o in outputs:
            if isinstance(o, DataNode):
                flat.append(o)
            elif isinstance(o, (int, float, bool, np.ndarray)) or np.isscalar(o):
                from . import types as _t

                flat.append(_t.Constant(np.asarray(o), device="cpu"))
            else:
                raise TypeError(f"Invalid pipeline output: {type(o)}")
        return flat

    # -- build ------------------------------------------------------------------------
    def build(self):
        if self._built:
            return self
        if self._outputs_raw is None and self._graph_fn is not None:
            with self:
                outputs = self._graph_fn()
            if not isinstance(outputs, tuple):
                outputs = (outputs,)
            self._outputs_raw = outputs
        if self._outputs_raw is None:
            raise RuntimeError("Pipeline has no outputs; define via pipeline_def or set_outputs()")
        with self:  # constant-wrapping of non-DataNode outputs adds graph nodes
            outputs = self._flatten_outputs(self._outputs_raw)
        graph = Graph.build(outputs, self._traced_ops).deduplicate()
        self._graph = graph
        from .executor import Executor

        self._executor = Executor(self, graph)
        if self._restore_checkpoint is not None:
            state = json.loads(self._restore_checkpoint)
            self._executor.restore_checkpoint(state.get("executor", state))
        self._built = True
        return self

    def _require_built(self):
        if not self._built:
            self.build()

    # -- run protocol (reference pipeline.py:1394,1515) ----------------------------------
    def schedule_run(self):
        self._require_built()
        self._executor.schedule_run()
        self._batches_scheduled += 1

    def run(self):
        self._require_built()
        self.schedule_run()
        return self.outputs()

    def outputs(self):
        self._require_built()
        if self._batches_consumed >= self._batches_scheduled:
            raise RuntimeError("outputs() called with no scheduled run; call schedule_run() first")
        self._batches_consumed += 1
        return self._executor.outputs()

    def share_outputs(self):
        return self.outputs()

    def reset(self):
        """Restart iteration after a StopIteration from an external source
        (reference ``pipeline.py`` reset)."""
        if self._executor is not None:
            self._executor.reset()
        self._batches_scheduled = 0
        self._batches_consumed = 0

    def release_outputs(self):
        pass  # outputs are immutable jax/numpy arrays; nothing to recycle

    def _prefetch(self):
        for _ in range(self.prefetch_queue_depth):
            self.schedule_run()

    def feed_input(self, data_node, data, layout=None, cuda_stream=None, use_copy_kernel=False):
        """Feed an ``external_source`` node (reference ``pipeline.py:1263``)."""
        self._require_built()
        name = data_node if isinstance(data_node, str) else data_node.source.instance_name
        for node in self._graph.ops:
            if node.instance_name == name:
                impl = self._executor.impls[node.id]
                if not hasattr(impl, "feed"):
                    raise TypeError(f"Operator '{name}' is not an input operator")
                impl.feed(data, layout=layout)
                return
        raise KeyError(f"No operator named '{name}' in the pipeline")

    # -- metadata -----------------------------------------------------------------------
    def epoch_size(self, name: Optional[str] = None):
        self._require_built()
        meta = self._executor.reader_meta()
        if name is not None:
            return meta[name]["epoch_size_padded"]
        return {k: v["epoch_size_padded"] for k, v in meta.items()}

    def reader_meta(self, name: Optional[str] = None):
        self._require_built()
        meta = self._executor.reader_meta()
        return meta[name] if name is not None else meta

    @property
    def batch_size(self):
        return self.max_batch_size

    def executor_statistics(self):
        self._require_built()
        return self._executor.statistics()

    # -- serialization ----------------------------------------------------------------------
    def serialize(self, filename: Optional[str] = None,
                  include_callables: bool = False) -> str:
        """Serialize the graph to JSON. ``include_callables=True`` embeds
        by-value pickles of external_source sources / python_function
        callables so ``deserialize`` restores a runnable pipeline (opt-in:
        the payload then contains code — reference dill-based ExternalSource
        serialization)."""
        self._require_built()
        params = {
            "batch_size": self.max_batch_size,
            "num_threads": self.num_threads,
            "device_id": self.device_id,
            "seed": self.seed,
            # dict form preserves SEPARATE stage depths on round-trip (a
            # flattened max would e.g. quadruple the host staging queue of a
            # {'cpu_size': 1, 'gpu_size': 4} pipeline)
            "prefetch_queue_depth": {"cpu_size": self.cpu_queue_depth,
                                     "gpu_size": self.gpu_queue_depth},
            "pad_align": self.pad_align,
            "enable_checkpointing": self.enable_checkpointing,
            "enable_conditionals": self.enable_conditionals,
            "transfer_chunk_bytes": self.transfer_chunk_bytes,
            "output_dtype": ([int(d) for d in self.output_dtype]
                             if isinstance(self.output_dtype, (list, tuple))
                             else (int(self.output_dtype)
                                   if self.output_dtype is not None else None)),
            "output_ndim": self.output_ndim,
        }
        payload = self._graph.serialize(params, include_callables=include_callables)
        if filename:
            with open(filename, "w") as f:
                f.write(payload)
        return payload

    @classmethod
    def deserialize(cls, serialized_pipeline: Optional[str] = None, filename: Optional[str] = None, **kwargs):
        if serialized_pipeline is None:
            with open(filename) as f:
                serialized_pipeline = f.read()
        doc = json.loads(serialized_pipeline)
        params = doc.get("params", {})
        params.update(kwargs)
        # forward EVERY recognized constructor parameter — a fixed shortlist
        # silently discarded overrides like enable_checkpointing=True or
        # debug=True (review r5); unknown keys raise like the constructor
        import inspect

        allowed = set(inspect.signature(cls.__init__).parameters) - {"self"}
        unknown = set(params) - allowed
        if unknown:
            raise TypeError(
                f"Pipeline.deserialize got unknown parameter(s) {sorted(unknown)}")
        params.setdefault("batch_size", 1)
        params.setdefault("num_threads", 4)
        pipe = cls(**params)
        graph = Graph.deserialize(serialized_pipeline)
        # adopt deserialized nodes as traced ops
        pipe._traced_ops = list(graph.ops)
        pipe._next_op_id = max((op.id for op in graph.ops), default=-1) + 1
        pipe._outputs_raw = tuple(graph.outputs)
        return pipe

    def save_graph_to_dot_file(self, filename: str, **kwargs):
        self._require_built()
        with open(filename, "w") as f:
            f.write(self._graph.to_dot())

    # -- checkpointing (reference pipeline.py:1878) --------------------------------------------
    def checkpoint(self, filename: Optional[str] = None) -> str:
        self._require_built()
        # consumed-batch-aligned: correct even when the consumer (framework
        # iterator / tf.data prefetch) runs the pipeline several iterations
        # ahead of what it has actually yielded (executor attaches the
        # per-iteration snapshot to each batch when enable_checkpointing)
        state = {"format": "dali_tpu.checkpoint.v1",
                 "executor": self._executor.consumed_checkpoint_state()}
        for name, st in state["executor"].get("ops", {}).items():
            if isinstance(st, dict) and st.get("unresumable_source"):
                raise ValueError(f"{name}: {st['unresumable_source']}")
        payload = json.dumps(state)
        if filename:
            with open(filename, "w") as f:
                f.write(payload)
        return payload

    def restore_checkpoint(self, payload: str):
        """Restore a checkpoint produced by :meth:`checkpoint` into this BUILT
        pipeline (the C API's restore path; Python callers usually pass
        ``checkpoint=`` at construction instead)."""
        self._require_built()
        state = json.loads(payload)
        self._executor.restore_checkpoint(state.get("executor", state))

    # -- teardown ---------------------------------------------------------------------------------
    def __del__(self):
        try:
            if self._executor is not None:
                self._executor.shutdown()
        except Exception:
            pass


def pipeline_def(fn=None, *, enable_conditionals=False, **pipeline_kwargs):
    """Decorator turning a graph function into a Pipeline factory (reference
    ``pipeline.py:2179-2324``)."""

    def actual_decorator(func):
        graph_func = func
        if enable_conditionals:
            from ._conditionals import autograph_convert

            graph_func = autograph_convert(func)

        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            ctor_names = (
                "batch_size",
                "num_threads",
                "device_id",
                "seed",
                "exec_pipelined",
                "prefetch_queue_depth",
                "exec_async",
                "bytes_per_sample",
                "set_affinity",
                "max_streams",
                "default_cuda_stream_priority",
                "enable_checkpointing",
                "checkpoint",
                "py_num_workers",
                "py_start_method",
                "py_callback_pickler",
                "output_dtype",
                "output_ndim",
                "pad_align",
                "max_batch_size",
                "exec_dynamic",
                "transfer_chunk_bytes",
                "debug",
            )
            ctor_kwargs = dict(pipeline_kwargs)
            fn_kwargs = {}
            for k, v in kwargs.items():
                if k in ctor_names:
                    ctor_kwargs[k] = v
                else:
                    fn_kwargs[k] = v
            pipe = Pipeline(enable_conditionals=enable_conditionals, **ctor_kwargs)
            pipe._graph_fn = lambda: graph_func(*args, **fn_kwargs)
            return pipe

        wrapper.is_pipeline_def = True
        wrapper._pipeline_def_func = func
        return wrapper

    if fn is not None:
        return actual_decorator(fn)
    return actual_decorator


def do_not_convert(fn):
    """Mark a function as exempt from conditional (AutoGraph) conversion
    (reference ``pipeline.py:2326``)."""
    fn._dali_do_not_convert = True
    return fn

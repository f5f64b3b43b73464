"""The pipeline executor.

TPU-native re-imagination of DALI's Executor2 (reference
``dali/pipeline/executor/executor2/exec2.h:43-99``, ``exec_graph.h``). DALI lowers
the op graph onto a C++ task scheduler with per-op queues, CPU/Mixed/GPU stage
overlap and per-op CUDA streams. On TPU the natural split is different:

* **host program** — cpu + mixed ops run on a dedicated host-stage thread, with
  per-sample work fanned out to a thread pool (GIL-releasing C/C++ work: decode,
  resize, numpy). One thread owns iteration order, so readers/RNG are deterministic.
* **boundary** — every host→device edge is padded & stacked to a static canvas
  ("grow" policy: canvas only ever grows, so XLA recompiles a bounded number of
  times; SURVEY §7 "ragged shapes vs static shapes").
* **device program** — the entire gpu subgraph is traced into ONE jitted JAX
  function; XLA fuses what DALI hand-schedules across streams. Dispatch is async,
  so device compute overlaps the next host iteration — that's DALI's CPU/GPU stage
  overlap (``prefetch_queue_depth``) with the queue realized as in-flight XLA
  executions in a bounded output queue.
"""

from __future__ import annotations

import collections
import queue
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Tuple

import numpy as np

from ._schema import get_operator_impl
from .backend.base import (SHAPE_PRESERVING_SCHEMAS, DeviceCtx, HostCtx,
                           Operator, ReaderOperator)
from .batch import DeviceBatch, HostBatch, pad_and_stack, round_up
from .graph import Graph
from .tensors import TensorListCPU, TensorListGPU


def _edge_key(edge) -> Tuple[int, int]:
    return (edge.source.id, edge.source_idx)


# Interpreter-exit discipline: the stage threads are daemons (a wedged device
# transport must not hang process exit forever), but dying MID-XLA-COMPILE
# aborts the process ("FATAL: exception not rethrown" out of the C++ runtime).
# One atexit hook stops every live executor and joins its device thread long
# enough for an in-flight compile to finish (bounded — a first compile of a
# large program runs tens of seconds).
_live_executors = None


def _register_atexit_shutdown(executor):
    global _live_executors
    if _live_executors is None:
        import atexit
        import weakref

        _live_executors = weakref.WeakSet()

        def _drain_all():
            for ex in list(_live_executors):
                try:
                    ex._shutdown = True
                    ex._work_q.put(None)
                    dt = ex._device_thread
                    if dt is not None and dt.is_alive():
                        deadline = time.monotonic() + 120  # compile bound
                        while dt.is_alive() and time.monotonic() < deadline:
                            # keep freeing queue slots so the thread can exit
                            for q in (ex._device_q, ex._out_q):
                                if q is None:
                                    continue
                                try:
                                    while True:
                                        q.get_nowait()
                                except queue.Empty:
                                    pass
                            dt.join(timeout=0.25)
                except Exception:
                    pass

        atexit.register(_drain_all)
    _live_executors.add(executor)


class _Staged:
    """A boundary batch already staged into its padded canvas (fused decode)."""

    __slots__ = ("array", "shapes", "layout")

    def __init__(self, array, shapes, layout):
        self.array = array
        self.shapes = shapes
        self.layout = layout


class _FlatStaged:
    """A boundary batch staged FLAT: each sample's payload dense at ``offsets``
    of a 1-D buffer — zero padding bytes on the wire. The device program
    scatters it onto the padded canvas with one gather (grow-policy canvas
    dims ride in the jit cache key)."""

    __slots__ = ("flat", "offsets", "shapes", "canvas", "layout")

    def __init__(self, flat, offsets, shapes, canvas, layout=""):
        self.flat = flat
        self.offsets = np.asarray(offsets, np.int32)
        self.shapes = shapes
        self.canvas = tuple(int(c) for c in canvas)
        self.layout = layout


class _SparseStaged:
    """A sparse-packed boundary batch (hybrid-JPEG AC planes): per-block
    nonzero bitmap ``mask`` (uint16, flat in the same block order/offsets as
    the DC plane) + the nonzero int8 values concatenated in slot order
    across the batch, nibble-packed (``nibs`` 4-bit codes + ``esc`` full
    bytes for |v|>7, ~34% on photo content). Self-describing — the device
    program rebuilds value positions from cumsum(popcount(mask)) and escape
    positions from cumsum(code==-8). Reconstruction: ``_unsparse_boundary``
    (+ ``_decode_nib_stream``). ``canvas`` is the dense canvas incl. the
    trailing nac dim; ``shapes`` are per-sample dense dims incl. nac."""

    __slots__ = ("mask", "nibs", "esc", "offsets", "shapes", "canvas",
                 "layout")

    def __init__(self, mask, nibs, esc, offsets, shapes, canvas, layout=""):
        self.mask = mask
        self.nibs = nibs
        self.esc = esc
        self.offsets = np.asarray(offsets, np.int32)
        self.shapes = shapes
        self.canvas = tuple(int(c) for c in canvas)
        self.layout = layout


class _Esc16Staged:
    """An int16 boundary plane (hybrid-JPEG DC) escape-packed to int8:
    ``dc8`` carries values in [-127, 127]; the marker -128 points at the
    next full int16 in ``esc`` (~1% of quantized DC terms). Halves the DC
    wire. Reconstruction: ``_decode_esc16_stream`` + ``_unflatten_boundary``."""

    __slots__ = ("dc8", "esc", "offsets", "shapes", "canvas", "layout")

    def __init__(self, dc8, esc, offsets, shapes, canvas, layout=""):
        self.dc8 = dc8
        self.esc = esc
        self.offsets = np.asarray(offsets, np.int32)
        self.shapes = shapes
        self.canvas = tuple(int(c) for c in canvas)
        self.layout = layout


class _YUVStaged:
    """A planar YUV 4:2:0 boundary batch (video mixed path): flat-packed
    ``y``/``u``/``v`` plane buffers (zero padding bytes on the wire — 1.5
    B/px vs RGB24's 3), per-sample element ``offsets`` [2, N] (row 0 = luma,
    row 1 = chroma), ``shapes`` [N, 4] logical output dims (F, h, w, 3) with
    chroma dims derived as ceil(h/2) x ceil(w/2), and the output ``canvas``
    (F, H, W, 3) — 4-dim so the executor's grow-only canvas bookkeeping is
    rank-compatible with the dense RGB fallback path for the same edge.
    The device program rebuilds the padded planes, upsamples
    chroma nearest-neighbor and applies the integer BT.601 matrix
    (``full_range`` selects the limited/full variant) — arithmetic identical
    to the host cpu path (video_decode.cc yuv420_frame_to_rgb), so cpu and
    mixed video outputs stay bit-equal. Reconstruction: ``_yuv420_boundary``."""

    __slots__ = ("y", "u", "v", "offsets", "shapes", "canvas", "full_range",
                 "layout")

    def __init__(self, y, u, v, offsets, shapes, canvas, full_range,
                 layout="FHWC"):
        self.y = y
        self.u = u
        self.v = v
        self.offsets = np.asarray(offsets, np.int32)
        self.shapes = shapes
        self.canvas = tuple(int(c) for c in canvas)
        self.full_range = bool(full_range)
        self.layout = layout


class SamplePool:
    """Per-sample worker pool (analogue of the reference thread pool,
    ``dali/pipeline/util/thread_pool.h:40``)."""

    def __init__(self, num_threads: int):
        self._n_threads = max(1, num_threads)
        self._pool = ThreadPoolExecutor(max_workers=self._n_threads, thread_name_prefix="dali-tpu-sample")

    def map_indices(self, fn, n: int) -> list:
        if self._n_threads <= 1:
            # inline: ThreadPoolExecutor.map costs ~0.1ms/task in dispatch —
            # pure overhead on single-core hosts
            return [fn(i) for i in range(n)]
        return list(self._pool.map(fn, range(n)))

    def shutdown(self):
        self._pool.shutdown(wait=False, cancel_futures=True)


class Executor:
    def __init__(self, pipeline, graph: Graph):
        self.pipeline = pipeline
        self.graph = graph

        # -- instantiate operator implementations ------------------------------
        self.impls: Dict[int, Operator] = {}
        self.host_ops: List = []
        self.device_ops: List = []
        for node in graph.ops:
            impl_cls = get_operator_impl(node.spec.schema_name, node.device)
            impl = impl_cls(node.spec, node.id)
            impl.pipeline = pipeline
            self.impls[node.id] = impl
            if node.device in ("cpu", "mixed"):
                self.host_ops.append(node)
            else:
                self.device_ops.append(node)
        self._validate_placement()

        # Batch-size providers (reference InitIteration's batch-size inference
        # task, executor2/exec_graph.h:403): ExternalSource and reader outputs
        # define each iteration's batch size, and every other op — including
        # 0-input sources like fn.random.* and Constant — must follow it.
        # Hoist providers to the front of the host program (they consume no
        # graph edges, so this is topologically safe) so the size is known
        # before anything that asks ctx.batch_size runs.
        def _is_provider(n):
            return ((n.spec.schema.is_reader
                     or n.spec.schema_name == "ExternalSource")
                    and not n.spec.inputs and not n.spec.arg_inputs)

        self._provider_ids = {n.id for n in self.host_ops if _is_provider(n)}
        self.host_ops.sort(key=lambda n: 0 if n.id in self._provider_ids else 1)

        # -- boundary edges ------------------------------------------------------
        # host-produced edges that the device program (or gpu pipeline outputs) need.
        self.boundary_edges: List = []
        seen = set()

        def add_boundary(edge):
            k = _edge_key(edge)
            if k not in seen:
                seen.add(k)
                self.boundary_edges.append(edge)

        host_ids = {n.id for n in self.host_ops}
        for node in self.device_ops:
            for inp in node.spec.inputs:
                if inp.source.id in host_ids:
                    add_boundary(inp)
        for out in graph.outputs:
            if out.device == "gpu" and out.source.id in host_ids:
                add_boundary(out)

        # arg-inputs of device ops: cpu edges → stacked host arrays; gpu edges
        # (e.g. a per-sample reduction feeding contrast_center) resolve inside the
        # device program.
        self.device_arg_edges: List[Tuple[int, str, object]] = []
        self.device_arg_device_edges: Dict[Tuple[int, str], Tuple[int, int]] = {}
        for node in self.device_ops:
            for name, edge in node.spec.arg_inputs.items():
                if edge.source.id in host_ids and edge.device == "cpu":
                    self.device_arg_edges.append((node.id, name, edge))
                else:
                    self.device_arg_device_edges[(node.id, name)] = _edge_key(edge)

        # device ops with host-side parameter / static computation
        self.param_ops = [
            n
            for n in self.device_ops
            if type(self.impls[n.id]).host_params is not Operator.host_params
            or type(self.impls[n.id]).device_statics is not Operator.device_statics
        ]
        # ops whose jit-statics depend on host VALUES (e.g. the JPEG sampling
        # mode) declare device_statics(self, ctx, in_shapes, in_batches=...);
        # resolve the arity ONCE here, per instance (an MRO-cached flag would
        # leak between a base and an override with different arities)
        import inspect

        for n in self.param_ops:
            impl = self.impls[n.id]
            fn_ = type(impl).device_statics
            impl._statics_takes_batches = (
                len(inspect.signature(fn_).parameters) >= 4
            )

        # -- canvas state ("grow" padding policy) --------------------------------
        self._canvas: Dict[Tuple[int, int], List[int]] = {}
        self._align = int(pipeline.pad_align)

        # -- threading -------------------------------------------------------------
        self.sample_pool = SamplePool(pipeline.num_threads)
        self._host_thread: Optional[threading.Thread] = None
        self._device_thread: Optional[threading.Thread] = None
        self._device_q: Optional["queue.Queue"] = None
        self._work_q: "queue.Queue" = queue.Queue()
        self._out_q: "queue.Queue" = queue.Queue(maxsize=pipeline.gpu_queue_depth)
        self._iteration = 0
        self._epoch = 0
        self._shutdown = False
        self._error: Optional[BaseException] = None

        self._jit_device_program = None
        self._device = None
        self._stats = {
            "iterations_completed": 0,
            "device_dispatches": 0,
            # stage-overlap observability (reference ExecutorMeta): cumulative
            # seconds each stage spent working vs waiting — if
            # host_stall >> device_stall the pipeline is device/transfer-bound
            # and vice versa (VERDICT r1: expose wait times so overlap
            # regressions are visible)
            "host_phase_seconds": 0.0,
            "host_phase_cpu_seconds": 0.0,
            "host_batches": 0,
            "device_phase_seconds": 0.0,
            "host_stall_seconds": 0.0,
            "device_stall_seconds": 0.0,
        }

    # ----------------------------------------------------------------------------
    def _validate_placement(self):
        for node in self.graph.ops:
            for inp in node.spec.inputs:
                in_dev = inp.device
                if node.device == "cpu" and in_dev == "gpu":
                    raise ValueError(
                        f"CPU operator '{node.instance_name}' cannot consume GPU input "
                        f"'{inp.name}' (reference rule: no gpu->cpu edges)"
                    )
            for name, inp in node.spec.arg_inputs.items():
                if inp.device != "cpu" and node.device != "gpu":
                    raise ValueError(
                        f"Argument input '{name}' of '{node.instance_name}' must be on CPU"
                    )
        host_ids = {n.id for n in self.graph.ops if n.device in ("cpu", "mixed")}
        for node in self.graph.ops:
            if node.device == "gpu":
                for inp in node.spec.inputs:
                    if inp.source.id in host_ids and inp.device == "cpu":
                        # Implicit cpu->gpu copies are DALI-illegal; require .gpu().
                        raise ValueError(
                            f"GPU operator '{node.instance_name}' consumes CPU edge "
                            f"'{inp.name}'; call .gpu() on it first"
                        )

    # -- lifecycle -------------------------------------------------------------------
    def start(self):
        if self._host_thread is None:
            self._device_q = queue.Queue(maxsize=self.pipeline.cpu_queue_depth)
            # the queues are BOUND to the threads at spawn: if reset() ever
            # abandons a stage thread that outlived its join deadline (e.g.
            # stuck in a 20-60 s first XLA compile), the zombie keeps
            # draining/filling only its own generation's queues — it can
            # never steal staged batches from, or leak stale results into,
            # a successor generation's queues (review r5)
            self._host_thread = threading.Thread(
                target=self._host_loop, args=(self._work_q, self._device_q),
                name="dali-tpu-host-stage", daemon=True
            )
            self._host_thread.start()
            self._device_thread = threading.Thread(
                target=self._device_loop, args=(self._device_q, self._out_q),
                name="dali-tpu-device-stage", daemon=True
            )
            self._device_thread.start()
            _register_atexit_shutdown(self)

    def shutdown(self):
        self._shutdown = True
        self._work_q.put(None)
        # drain queues so the stage threads can exit blocking puts
        for q in (getattr(self, "_device_q", None), self._out_q):
            if q is None:
                continue
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
        if self._host_thread is not None:
            self._host_thread.join(timeout=5)
            self._host_thread = None
        if getattr(self, "_device_thread", None) is not None:
            self._device_q.put(None)
            self._device_thread.join(timeout=5)
            self._device_thread = None
        self.sample_pool.shutdown()
        for impl in self.impls.values():
            close = getattr(impl, "close", None)
            if close is not None:
                try:
                    close()
                except Exception:
                    pass

    def reset(self):
        """Clear a raised-StopIteration state and restart the stage threads."""
        self._shutdown = True
        self._work_q.put(None)

        def drain():
            for q in (self._device_q, self._out_q):
                if q is None:
                    continue
                try:
                    while True:
                        q.get_nowait()
                except queue.Empty:
                    pass

        def join_draining(thread):
            # keep freeing queue slots while joining: the thread may be blocked
            # in put() on a bounded queue with more pending items than one
            # drain pass can clear
            deadline = time.monotonic() + 10
            while thread.is_alive() and time.monotonic() < deadline:
                drain()
                thread.join(timeout=0.05)

        if self._host_thread is not None:
            join_draining(self._host_thread)
            self._host_thread = None
        if self._device_thread is not None:
            self._device_q.put(None)
            join_draining(self._device_thread)
            self._device_thread = None
        self._shutdown = False
        self._error = None
        self._consumed_ckpt = None  # pre-reset snapshots are stale
        self._work_q = queue.Queue()
        self._out_q = queue.Queue(maxsize=self.pipeline.gpu_queue_depth)
        for impl in self.impls.values():
            r = getattr(impl, "reset_epoch", None)
            if r is not None:
                r()

    # -- scheduling --------------------------------------------------------------------
    def schedule_run(self):
        if self._error is not None:
            raise self._error
        self.start()
        self._work_q.put(self._iteration)
        self._iteration += 1

    def outputs(self):
        if self._error is not None:
            # a stage thread already died; don't block on a queue nobody fills
            raise self._error
        item = self._out_q.get()
        if isinstance(item, BaseException):
            self._error = item
            raise item
        if isinstance(item, tuple) and len(item) == 2 and isinstance(item[1], dict) \
                and "ops" in item[1]:
            # consumed-batch-aligned checkpoint (enable_checkpointing)
            result, self._consumed_ckpt = item
            return result
        return item

    def _host_loop(self, work_q, device_q):
        """Stage 1 thread: readers, decode, cpu ops, host params (analogue of the
        reference CPU stage; exec2 stage overlap via the bounded _device_q).
        Queue references are generation-bound arguments — see start()."""
        while not self._shutdown:
            it = work_q.get()
            if it is None:
                device_q.put(None)
                break
            try:
                import jax.profiler

                t0 = time.perf_counter()
                c0 = time.thread_time()
                with jax.profiler.TraceAnnotation("dali_tpu.host_phase"):
                    staged = self._host_phase(it)
                if self.pipeline.enable_checkpointing:
                    # Post-host-phase snapshot = the state that REPRODUCES
                    # iteration it+1 on restore. Attached to this iteration's
                    # outputs so checkpoint() aligns with what the consumer
                    # actually saw, independent of prefetch depth (reference:
                    # per-iteration OpCheckpoints + iterator external context).
                    st = self.checkpoint_state()
                    st["iteration"] = it + 1
                    staged["ckpt"] = st
                t1 = time.perf_counter()
                c1 = time.thread_time()
                device_q.put(staged)  # blocks when the device stage lags
                t2 = time.perf_counter()
                self._stats["host_phase_seconds"] += t1 - t0
                self._stats["host_stall_seconds"] += t2 - t1
                # thread-CPU twin of host_phase_seconds: unaffected by tunnel
                # weather (no H2D in this phase) and mostly load-immune (CPU
                # time does not advance while descheduled) — the basis of the
                # weather-immune per-lane host gates (qa/thresholds.json)
                self._stats["host_phase_cpu_seconds"] += c1 - c0
                self._stats["host_batches"] += 1
            except BaseException as e:  # propagate to outputs()
                device_q.put(e)
                return

    def _device_loop(self, device_q, out_q):
        """Stage 2 thread: host→device chunk transfers + jitted program dispatch.

        Runs concurrently with stage 1, so decode of iteration k+1 overlaps the
        transfer/compute of iteration k — DALI's CPU/GPU stage overlap.
        Queue references are generation-bound arguments — see start()."""
        while not self._shutdown:
            t0 = time.perf_counter()
            staged = device_q.get()  # blocks when the host stage lags
            self._stats["device_stall_seconds"] += time.perf_counter() - t0
            if staged is None:
                break
            if isinstance(staged, BaseException):
                out_q.put(staged)
                return
            try:
                import jax.profiler

                t1 = time.perf_counter()
                with jax.profiler.TraceAnnotation("dali_tpu.device_phase"):
                    result = self._device_phase(staged)
                self._stats["device_phase_seconds"] += time.perf_counter() - t1
                self._stats["iterations_completed"] += 1
                ck = staged.get("ckpt")
                out_q.put(result if ck is None else (result, ck))
            except BaseException as e:
                out_q.put(e)
                return

    def statistics(self) -> dict:
        """Executor observability (reference Pipeline.executor_statistics,
        pipeline.py:621 / ExecutorMetaMap)."""
        from . import _prof

        # the stage threads mutate _stats/_canvas concurrently; retry the
        # snapshots instead of locking the hot phases (a canvas growth or a
        # new stats key mid-iteration raises "dict changed size")
        out = {}
        for _ in range(8):
            try:
                out = dict(self._stats)
                out["canvases"] = {str(k): list(v)
                                   for k, v in self._canvas.items()}
                break
            except RuntimeError:
                continue
        out.setdefault("canvases", {})
        cache = self._jit_device_program or {}
        out["device_program_variants"] = len(cache)
        # itemized host time (seconds, cumulative): host.ops_total contains
        # the host.decode.* subsections; boundary_staging/param_prep are the
        # post-op staging work. See docs/performance.md "Host time budget".
        out["host_breakdown_seconds"] = _prof.snapshot()
        from . import native

        out["staging_arena"] = native.arena_stats()
        return out

    # -- one iteration --------------------------------------------------------------------
    def _host_phase(self, iteration: int):
        from . import _prof

        ctx = HostCtx(self.pipeline, iteration, self._epoch, pool=self.sample_pool)
        env: Dict[Tuple[int, int], HostBatch] = {}

        # Iteration batch size = what the batch-size providers produced
        # (reference InitIteration batch-size inference). Providers run first
        # (hoisted at build); all must agree, and everything downstream —
        # including 0-input ops asking ctx.batch_size — follows.
        inferred = [None]

        def _note_provider(node):
            out = env[(node.id, 0)]
            # HostBatch defines __len__; staged wire containers carry a
            # per-sample `shapes` array instead.
            n = len(out) if isinstance(out, HostBatch) else len(out.shapes)
            if inferred[0] is None:
                inferred[0] = n
                ctx.batch_size = n
            elif inferred[0] != n:
                raise ValueError(
                    f"Batch size providers disagree this iteration: "
                    f"'{node.instance_name}' produced {n} samples, a previous "
                    f"provider produced {inferred[0]}")

        # 1. host program
        _t_ops = time.perf_counter()
        for node in self.host_ops:
            impl = self.impls[node.id]
            arg_batches = {k: env[_edge_key(v)] for k, v in node.spec.arg_inputs.items()}
            ctx.set_arg_batches(node.id, arg_batches)
            ins = [env[_edge_key(e)] for e in node.spec.inputs]
            # Fused staging fast path: mixed ops may decode straight into the
            # padded boundary canvas (one pass, no intermediate per-sample copy).
            if node.device == "mixed" and hasattr(impl, "stage_batch") and len(node.outputs) == 1:
                k = (node.id, 0)
                staged = impl.stage_batch(ctx, ins, self._canvas.get(k))
                if staged is not None:
                    arr, shapes, layout = staged
                    self._canvas[k] = list(arr.shape[1:])
                    env[k] = _Staged(arr, shapes, layout)
                    if node.id in self._provider_ids:
                        _note_provider(node)
                    continue
            # multi-output variant: each element is a (arr, shapes, layout)
            # staged canvas or a plain HostBatch (small host-side outputs)
            if node.device == "mixed" and hasattr(impl, "stage_batch_multi"):
                ks = [(node.id, j) for j in range(len(node.outputs))]
                staged = impl.stage_batch_multi(ctx, ins, [self._canvas.get(k) for k in ks])
                if staged is not None:
                    for j, item in enumerate(staged):
                        k = (node.id, j)
                        if isinstance(item, HostBatch):
                            env[k] = item
                        elif isinstance(item, (_FlatStaged, _SparseStaged, _Esc16Staged, _YUVStaged)):
                            self._canvas[k] = list(item.canvas)
                            env[k] = item
                        else:
                            arr, shapes, layout = item
                            self._canvas[k] = list(arr.shape[1:])
                            env[k] = _Staged(arr, shapes, layout)
                    if node.id in self._provider_ids:
                        _note_provider(node)
                    continue
            try:
                outs = impl.run_batch(ctx, *ins)
            except Exception as e:
                origin = node.spec._extra.get("_origin")
                where = f" (defined at {origin})" if origin else ""
                msg = f"Error in operator '{node.instance_name}'{where}: {e}"
                try:
                    wrapped = type(e)(msg)  # not every exception takes one str arg
                except Exception:
                    wrapped = RuntimeError(msg)
                raise wrapped.with_traceback(e.__traceback__) from None
            if not isinstance(outs, (list, tuple)):
                outs = [outs]
            for j, out in enumerate(outs):
                env[(node.id, j)] = out
            if node.id in self._provider_ids:
                _note_provider(node)
        _prof.add("host.ops_total", time.perf_counter() - _t_ops)

        # 2. boundary staging: ragged host batches → padded canvases, transferred
        # in chunks. The chunking matters: host→device bandwidth degrades badly on
        # large single transfers (and chunked device_puts are async, overlapping
        # the next iteration's host work) — the TPU analogue of DALI's pinned
        # staging + async H2D copies.
        _t_stage = time.perf_counter()
        padded_arrays, shape_arrays, ragged_flags, boundary_layouts = [], [], [], []
        flat_meta, flat_offsets = [], []
        for edge in self.boundary_edges:
            hb = env[_edge_key(edge)]
            k = _edge_key(edge)
            if isinstance(hb, _FlatStaged):
                padded_arrays.append(hb.flat)
                shape_arrays.append(hb.shapes)
                ragged_flags.append(True)
                boundary_layouts.append(hb.layout)
                flat_meta.append(hb.canvas)
                flat_offsets.append(hb.offsets)
                continue
            if isinstance(hb, _SparseStaged):
                padded_arrays.append((hb.mask, hb.nibs, hb.esc))
                flat_meta.append(("sparse4",) + hb.canvas)
                shape_arrays.append(hb.shapes)
                ragged_flags.append(True)
                boundary_layouts.append(hb.layout)
                flat_offsets.append(hb.offsets)
                continue
            if isinstance(hb, _Esc16Staged):
                padded_arrays.append((hb.dc8, hb.esc))
                shape_arrays.append(hb.shapes)
                ragged_flags.append(True)
                boundary_layouts.append(hb.layout)
                flat_meta.append(("esc16",) + hb.canvas)
                flat_offsets.append(hb.offsets)
                continue
            if isinstance(hb, _YUVStaged):
                padded_arrays.append((hb.y, hb.u, hb.v))
                shape_arrays.append(hb.shapes)
                ragged_flags.append(True)
                boundary_layouts.append(hb.layout)
                flat_meta.append(("yuv420", 1 if hb.full_range else 0)
                                 + hb.canvas)
                flat_offsets.append(hb.offsets)
                continue
            flat_meta.append(None)
            flat_offsets.append(None)
            if isinstance(hb, _Staged):
                arr, shapes, layout = hb.array, hb.shapes, hb.layout
                ragged = bool((shapes != shapes[0]).any()) or bool(
                    (np.asarray(arr.shape[1 : 1 + shapes.shape[1]]) != shapes[0]).any()
                )
            else:
                impl = self.impls[edge.source.id]
                fill = impl.boundary_fill(edge.source_idx)
                # uniform batches need no alignment padding — stage exact
                if hb.is_uniform():
                    align = 1
                else:
                    align = None
                    if hasattr(impl, "boundary_align"):
                        align = impl.boundary_align(edge.source_idx, hb.ndim)
                    if align is None:
                        align = self._pad_align_for(hb)
                arr, shapes = pad_and_stack(
                    hb, canvas=self._canvas.get(k), align=align, fill=fill
                )
                self._canvas[k] = list(arr.shape[1:])
                # ragged vs the STAGED canvas: a uniform batch padded onto a
                # previously-grown canvas still needs per-sample extents
                ragged = not hb.is_uniform() or bool(
                    (np.asarray(arr.shape[1 : 1 + shapes.shape[1]]) != shapes[0]).any()
                )
                layout = hb.layout
            padded_arrays.append(arr)  # raw numpy; stage-2 thread issues the puts
            shape_arrays.append(shapes)
            ragged_flags.append(ragged)
            boundary_layouts.append(layout)

        _prof.add("host.boundary_staging", time.perf_counter() - _t_stage)

        # 3. stacked argument arrays for device ops
        _t_prep = time.perf_counter()
        arg_arrays = []
        for op_id, name, edge in self.device_arg_edges:
            hb = env[_edge_key(edge)]
            arg_arrays.append(np.stack([np.asarray(s) for s in hb.samples], axis=0))

        # 4. host-side params + trace-time statics for device ops, with host-side
        # shape propagation through device-op chains (reference Setup() pass)
        params_list = []
        params_struct = []
        statics = {}
        shape_env: Dict[Tuple[int, int], np.ndarray] = {}
        boundary_by_key = {(_edge_key(e)): i for i, e in enumerate(self.boundary_edges)}
        layout_env: Dict[Tuple[int, int], str] = {}
        for k, bi in boundary_by_key.items():
            shape_env[k] = shape_arrays[bi]
            layout_env[k] = boundary_layouts[bi] or ""

        param_op_ids = {n.id for n in self.param_ops}
        for node in self.device_ops:
            impl = self.impls[node.id]
            in_shapes = [shape_env.get(_edge_key(e)) for e in node.spec.inputs]
            in_layouts = [layout_env.get(_edge_key(e), "") for e in node.spec.inputs]
            ctx.op_in_layouts[node.id] = in_layouts
            louts = impl.host_output_layouts(in_layouts) or [""]
            for j in range(node.spec.num_outputs()):
                layout_env[(node.id, j)] = louts[min(j, len(louts) - 1)] or ""
            in_batches = [env.get(_edge_key(e)) for e in node.spec.inputs]
            in_batches = [b if isinstance(b, HostBatch) else None for b in in_batches]
            if node.id in param_op_ids:
                arg_b = {k: env.get(_edge_key(v)) for k, v in node.spec.arg_inputs.items()}
                arg_b = {k: v for k, v in arg_b.items() if isinstance(v, HostBatch)}
                ctx.set_arg_batches(node.id, arg_b)
                p = impl.host_params(ctx, in_shapes)
                for pname in sorted(p):
                    params_list.append(np.asarray(p[pname]))
                    params_struct.append((node.id, pname))
                if impl._statics_takes_batches:
                    st = impl.device_statics(ctx, in_shapes, in_batches)
                else:
                    st = impl.device_statics(ctx, in_shapes)
                if st is not None:
                    statics[node.id] = st
            out_shapes = impl.host_output_shapes(ctx, in_shapes, in_batches)
            if (out_shapes is None
                    and node.spec.schema_name in SHAPE_PRESERVING_SCHEMAS
                    and in_shapes and in_shapes[0] is not None):
                # elementwise device op: logical extents pass through
                out_shapes = [in_shapes[0]] * node.spec.num_outputs()
            if out_shapes is not None:
                for j, sh in enumerate(out_shapes):
                    if sh is not None:
                        shape_env[(node.id, j)] = np.asarray(sh)
        self._params_struct = params_struct
        _prof.add("host.param_prep", time.perf_counter() - _t_prep)

        cpu_outputs = {}
        for out in self.graph.outputs:
            if out.device != "gpu":
                cpu_outputs[_edge_key(out)] = env[_edge_key(out)]
        # host-known logical shapes of gpu outputs: avoids fetching the device
        # shapes array back to the host per iteration (on the axon tunnel, ANY
        # device->host readback permanently degrades the client to a slow
        # synchronous mode — and it's a needless round-trip everywhere else)
        out_shapes_host = {}
        for out in self.graph.outputs:
            if out.device == "gpu":
                out_shapes_host[_edge_key(out)] = shape_env.get(_edge_key(out))
        return {
            "out_shapes_host": out_shapes_host,
            "iteration": iteration,
            "padded": padded_arrays,
            "shapes": shape_arrays,
            "ragged": tuple(ragged_flags),
            "layouts": tuple(boundary_layouts),
            "flat_meta": tuple(flat_meta),
            "flat_offsets": tuple(flat_offsets),
            "args": arg_arrays,
            "params": params_list,
            "statics": tuple(sorted(statics.items())),
            "cpu_outputs": cpu_outputs,
        }

    def _device_phase(self, staged: dict):
        gpu_outputs = {}
        if self.device_ops or any(o.device == "gpu" for o in self.graph.outputs):
            fn = self._get_device_program(
                staged["ragged"], staged["layouts"], staged["statics"], staged["flat_meta"]
            )
            seed_arr = np.array(
                [self.pipeline.seed & 0x7FFFFFFF, staged["iteration"]], dtype=np.uint32
            )
            dev_outs = fn(
                tuple(
                    tuple(self._chunked_put(a) for a in arr)
                    if isinstance(arr, tuple) else self._chunked_put(arr)
                    for arr in staged["padded"]
                ),
                tuple(np.asarray(s) for s in staged["shapes"]),
                tuple(o for o in staged["flat_offsets"] if o is not None),
                tuple(staged["args"]),
                tuple(staged["params"]),
                seed_arr,
            )
            gpu_outputs = dict(zip(self._device_out_keys, dev_outs))
            self._stats["device_dispatches"] += 1

        results = []
        for out in self.graph.outputs:
            k = _edge_key(out)
            if out.device == "gpu":
                data, shapes, layout = gpu_outputs[k]
                # prefer host-propagated shapes — reading the device shapes
                # array back is a D2H round-trip (and on the axon tunnel it
                # permanently degrades the client). With no host shapes,
                # hand the DEVICE array to the TensorList, which fetches
                # lazily only if the user inspects per-sample shapes. This
                # must apply even when the device program carried no shapes
                # (shapes is None): otherwise a host-known ragged output
                # reads back as the padded canvas.
                host = staged["out_shapes_host"].get(k)
                if host is not None:
                    shapes_np = np.asarray(host)
                else:
                    shapes_np = shapes
                results.append(TensorListGPU(data, shapes_np, layout))
            else:
                hb = staged["cpu_outputs"][k]
                results.append(TensorListCPU(hb.samples, hb.layout))
        self._validate_outputs(results)
        return tuple(results)

    def _validate_outputs(self, results):
        """Enforce the pipeline's declared output_dtype / output_ndim
        (reference Pipeline output contracts: a mismatch raises, per output)."""
        from .types import DALIDataType, from_numpy_type, to_numpy_type

        want_dt = self.pipeline.output_dtype
        want_nd = self.pipeline.output_ndim
        if want_dt is None and want_nd is None:
            return
        n = len(results)
        dts = want_dt if isinstance(want_dt, (list, tuple)) else [want_dt] * n
        nds = want_nd if isinstance(want_nd, (list, tuple)) else [want_nd] * n
        for i, tl in enumerate(results):
            dt = dts[i] if i < len(dts) else None
            nd = nds[i] if i < len(nds) else None
            if dt is not None:
                got = np.dtype(tl.dtype)
                want = np.dtype(to_numpy_type(DALIDataType(int(dt))))
                if got != want:
                    raise RuntimeError(
                        f"Pipeline output {i}: declared output_dtype "
                        f"{DALIDataType(int(dt))!r} but got {got}"
                    )
            if nd is not None:
                # derive ndim WITHOUT tl.shape(): that would fetch the device
                # shapes array every iteration (a D2H sync per batch)
                if hasattr(tl, "jax_array"):
                    got_nd = tl.jax_array.ndim - 1
                else:
                    got_nd = tl.at(0).ndim if len(tl) else int(nd)
                if got_nd != int(nd):
                    raise RuntimeError(
                        f"Pipeline output {i}: declared output_ndim {nd} but "
                        f"got {got_nd}-D samples"
                    )

    def _chunked_put(self, arr: np.ndarray):
        """Split a staged batch along N and device_put each chunk (async).

        Returns a tuple of device arrays; the device program re-concatenates.
        """
        import jax

        chunk_bytes = self.pipeline.transfer_chunk_bytes
        n = arr.shape[0]
        per_sample = max(arr.nbytes // max(n, 1), 1)
        samples_per_chunk = max(int(chunk_bytes // per_sample), 1)
        n_chunks = -(-n // samples_per_chunk)
        # equal-size chunks (last may be short) keep retrace count low
        out = []
        for i in range(n_chunks):
            sl = arr[i * samples_per_chunk : (i + 1) * samples_per_chunk]
            out.append(jax.device_put(sl))
        return tuple(out)

    def _pad_align_for(self, hb: HostBatch):
        """Spatial dims align to pad_align; trailing channel-like dims stay exact."""
        align = [self._align] * hb.ndim
        layout = hb.layout
        for d in range(hb.ndim):
            if layout and d < len(layout) and layout[d] in ("C", "N"):
                align[d] = 1
        if not layout and hb.ndim >= 1:
            align[-1] = 1 if hb.samples and hb.samples[0].ndim and hb.samples[0].shape[-1] <= 4 else align[-1]
        return align

    # -- device program construction ----------------------------------------------------
    def _get_device_program(self, ragged_flags: tuple, boundary_layouts: tuple,
                            statics_key: tuple = (), flat_meta: tuple = ()):
        """Build (or fetch) the jitted device program for this boundary structure.

        The program structure depends on which boundary edges are ragged, their
        layouts, and per-op trace-time statics (grow-policy canvases); jax.jit then
        additionally caches per padded-shape signature.
        """
        if not flat_meta:
            flat_meta = (None,) * len(ragged_flags)
        cache_key = (ragged_flags, boundary_layouts, statics_key, flat_meta)
        statics = dict(statics_key)
        if self._jit_device_program is None:
            self._jit_device_program = {}
        if cache_key not in self._jit_device_program:
            import jax

            boundary_keys = [_edge_key(e) for e in self.boundary_edges]
            arg_struct = [(op_id, name) for op_id, name, _ in self.device_arg_edges]
            out_edges = [o for o in self.graph.outputs if o.device == "gpu"]
            self._device_out_keys = [_edge_key(o) for o in out_edges]
            device_nodes = list(self.device_ops)
            impls = self.impls
            pipeline = self.pipeline
            params_struct_ref = self  # _params_struct is stable after first iteration
            device_out_keys = self._device_out_keys
            # The per-op device outputs: layouts and shapes-structure are trace-time
            # constants; collect them as side outputs of the traced function.
            meta_box = {}

            def program(padded, shapes, flat_offs, args, params, seed):
                key = jax.random.PRNGKey(0)
                key = jax.random.fold_in(key, seed[0])
                key = jax.random.fold_in(key, seed[1])
                import jax.numpy as jnp

                env: Dict[Tuple[int, int], DeviceBatch] = {}
                def _cat(chunks):
                    return chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=0)

                fo = 0
                for i in range(len(boundary_keys)):
                    kind = flat_meta[i][0] if flat_meta[i] is not None else None
                    if kind == "sparse4":
                        mask = _cat(padded[i][0])
                        nibs = _cat(padded[i][1])
                        esc = _cat(padded[i][2])
                        vals = _decode_nib_stream(jnp, nibs, esc)
                        data = _unsparse_boundary(
                            jnp, mask, vals, flat_offs[fo], shapes[i], flat_meta[i][1:]
                        )
                        fo += 1
                    elif kind == "esc16":
                        dc8 = _cat(padded[i][0])
                        esc = _cat(padded[i][1])
                        flat16 = _decode_esc16_stream(jnp, dc8, esc)
                        data = _unflatten_boundary(
                            jnp, flat16, flat_offs[fo], shapes[i], flat_meta[i][1:]
                        )
                        fo += 1
                    elif kind == "yuv420":
                        yb = _cat(padded[i][0])
                        ub = _cat(padded[i][1])
                        vb = _cat(padded[i][2])
                        data = _yuv420_boundary(
                            jnp, yb, ub, vb, flat_offs[fo], shapes[i],
                            flat_meta[i][2:], bool(flat_meta[i][1])
                        )
                        fo += 1
                    else:
                        data = _cat(padded[i])
                        if flat_meta[i] is not None:
                            data = _unflatten_boundary(
                                jnp, data, flat_offs[fo], shapes[i], flat_meta[i]
                            )
                            fo += 1
                    env[boundary_keys[i]] = DeviceBatch(
                        data,
                        shapes[i] if ragged_flags[i] else None,
                        boundary_layouts[i],
                    )
                arg_arrays_by_op: Dict[int, Dict[str, object]] = collections.defaultdict(dict)
                for (op_id, name), arr in zip(arg_struct, args):
                    arg_arrays_by_op[op_id][name] = arr
                params_by_op: Dict[int, Dict[str, object]] = collections.defaultdict(dict)
                for (op_id, name), arr in zip(params_struct_ref._params_struct, params):
                    params_by_op[op_id][name] = arr
                dctx = DeviceCtx(pipeline.max_batch_size, key, params_by_op, arg_arrays_by_op, statics,
                                 iteration=seed[1])
                dctx.bind_device_args(self.device_arg_device_edges, env)
                for node in device_nodes:
                    impl = impls[node.id]
                    ins = [env[_edge_key(e)] for e in node.spec.inputs]
                    outs = impl.lower(dctx, *ins)
                    if not isinstance(outs, (list, tuple)):
                        outs = [outs]
                    for j, out in enumerate(outs):
                        env[(node.id, j)] = out
                data_out, shapes_out, layouts = [], [], []
                for k in device_out_keys:
                    db = env[k]
                    data_out.append(db.data)
                    shapes_out.append(db.shapes)
                    layouts.append(db.layout)
                meta_box["layouts"] = layouts
                return tuple(data_out), tuple(shapes_out)

            # debug mode: eager per-op device execution (reference PipelineDebug)
            # NB: donating staged buffers was measured a no-op here — the chunk
            # concatenate prevents aliasing, XLA just warns. Keep inputs plain.
            jitted = program if pipeline.debug else jax.jit(program)

            def call(padded, shapes, flat_offs, args, params, seed):
                data_out, shapes_out = jitted(padded, shapes, flat_offs, args, params, seed)
                layouts = meta_box["layouts"]
                return [
                    (d, s, l) for d, s, l in zip(data_out, shapes_out, layouts)
                ]

            # the raw traced function, for re-jitting the PRODUCTION device
            # program under a sharded mesh (dryrun_multichip /
            # tests/test_sharding.py trace the real sparse-wire gather + IDCT
            # + resample + CMN program with its batch dim sharded)
            call._raw_program = program
            self._jit_device_program[cache_key] = call
        return self._jit_device_program[cache_key]

    # -- metadata --------------------------------------------------------------------------
    def reader_meta(self) -> Dict[str, dict]:
        out = {}
        for node in self.graph.ops:
            impl = self.impls[node.id]
            if isinstance(impl, ReaderOperator):
                out[node.instance_name] = impl.reader_meta()
        return out

    def checkpoint_state(self) -> dict:
        states = {}
        for node in self.graph.ops:
            st = self.impls[node.id].save_state()
            if st is not None:
                states[node.instance_name] = st
        return {"iteration": self._iteration, "epoch": self._epoch, "ops": states}

    def consumed_checkpoint_state(self) -> dict:
        """The state aligned with the LAST CONSUMED batch (correct under
        prefetch: live reader cursors run prefetch_queue_depth iterations
        ahead of what the consumer has seen). Falls back to the live state
        when nothing was consumed yet or checkpointing is off."""
        ck = getattr(self, "_consumed_ckpt", None)
        return ck if ck is not None else self.checkpoint_state()

    def restore_checkpoint(self, state: dict):
        self._iteration = int(state.get("iteration", 0))
        self._epoch = int(state.get("epoch", 0))
        for node in self.graph.ops:
            st = state.get("ops", {}).get(node.instance_name)
            if st is not None:
                self.impls[node.id].restore_state(st)


def _unflatten_boundary(jnp, flat, offsets, shapes, canvas):
    """Scatter a flat-packed boundary buffer onto its padded canvas.

    flat [T]; offsets [N] element offsets; shapes [N, nd] per-sample dims
    (row-major dense at its offset); canvas: static per-sample canvas dims.
    One gather; padding positions read clipped indices and are zeroed."""
    import jax

    n = shapes.shape[0]
    nd = len(canvas)
    out_shape = (n,) + tuple(canvas)
    bshape = (n,) + (1,) * nd
    # per-sample row-major strides from the per-sample dims
    stride = jnp.ones((n,), jnp.int32)
    strides = [None] * nd
    for d in range(nd - 1, -1, -1):
        strides[d] = stride
        stride = stride * shapes[:, d].astype(jnp.int32)
    idx = jnp.broadcast_to(offsets.astype(jnp.int32).reshape(bshape), out_shape)
    valid = None
    for d in range(nd):
        coord = jax.lax.broadcasted_iota(jnp.int32, out_shape, d + 1)
        idx = idx + coord * strides[d].reshape(bshape)
        v = coord < shapes[:, d].astype(jnp.int32).reshape(bshape)
        valid = v if valid is None else (valid & v)
    out = jnp.take(flat, jnp.clip(idx, 0, flat.shape[0] - 1))
    return jnp.where(valid, out, jnp.zeros((), flat.dtype))


def _yuv420_boundary(jnp, y, u, v, offsets, shapes, canvas, full_range):
    """Rebuild padded RGB frames from the planar YUV 4:2:0 wire (_YUVStaged).

    y/u/v: flat uint8 plane buffers; offsets [2, N] (luma / chroma element
    offsets); shapes [N, 4] logical (F, h, w, 3); canvas (F, H, W, 3) output
    canvas. Chroma upsampling is nearest-neighbor (pixel x reads chroma
    x//2) and the BT.601 matrix is the same integer arithmetic as the host
    cpu path (video_decode.cc yuv420_frame_to_rgb) — cpu and mixed video
    decode are bit-equal by construction; reference analogue:
    dali/operators/video/color_space_conversion_impl.h (NVDEC YUV→RGB on
    device)."""
    F, H, W = (int(c) for c in canvas[:3])
    ch, cw = (H + 1) // 2, (W + 1) // 2
    yshapes = shapes[:, :3]
    yp = _unflatten_boundary(jnp, y, offsets[0], yshapes, (F, H, W))
    cshapes = jnp.stack(
        [yshapes[:, 0], (yshapes[:, 1] + 1) // 2, (yshapes[:, 2] + 1) // 2],
        axis=1)
    up = _unflatten_boundary(jnp, u, offsets[1], cshapes, (F, ch, cw))
    vp = _unflatten_boundary(jnp, v, offsets[1], cshapes, (F, ch, cw))
    u2 = jnp.repeat(up, 2, axis=2)[:, :, :H].repeat(2, axis=3)[..., :W]
    v2 = jnp.repeat(vp, 2, axis=2)[:, :, :H].repeat(2, axis=3)[..., :W]
    D = u2.astype(jnp.int32) - 128
    E = v2.astype(jnp.int32) - 128
    if full_range:
        Y = 256 * yp.astype(jnp.int32)
        r = (Y + 359 * E + 128) >> 8
        g = (Y - 88 * D - 183 * E + 128) >> 8
        b = (Y + 454 * D + 128) >> 8
    else:
        C = 298 * (yp.astype(jnp.int32) - 16)
        r = (C + 409 * E + 128) >> 8
        g = (C - 100 * D - 208 * E + 128) >> 8
        b = (C + 516 * D + 128) >> 8
    rgb = jnp.clip(jnp.stack([r, g, b], axis=-1), 0, 255).astype(jnp.uint8)
    # zero the padding (the dense RGB staging pads with fill=0; converted
    # zero-YUV padding would otherwise read as green)
    import jax

    n = yshapes.shape[0]
    bshape = (n, 1, 1, 1)
    valid = None
    for d in range(3):
        coord = jax.lax.broadcasted_iota(jnp.int32, (n, F, H, W), d + 1)
        vmask = coord < yshapes[:, d].astype(jnp.int32).reshape(bshape)
        valid = vmask if valid is None else (valid & vmask)
    return jnp.where(valid[..., None], rgb, jnp.zeros((), jnp.uint8))


def _decode_nib_stream(jnp, nibs, esc):
    """Expand a nibble-packed value stream (sparse_pack.cc nib_pack_i8) to
    int8: 4-bit signed codes, -8 escapes to the next full byte of ``esc``
    (positions self-described by cumsum(code == -8))."""
    n32 = nibs.astype(jnp.int32)
    lo = n32 & 0xF
    hi = (n32 >> 4) & 0xF
    nib = jnp.stack([lo, hi], axis=1).reshape(-1)  # little-nibble first
    v = (nib ^ 8) - 8  # sign-extend 4-bit
    is_esc = v == -8
    ecnt = is_esc.astype(jnp.int32)
    prefix = jnp.cumsum(ecnt) - ecnt
    ev = jnp.take(esc, jnp.clip(prefix, 0, esc.shape[0] - 1))
    return jnp.where(is_esc, ev.astype(jnp.int32), v).astype(jnp.int8)


def _decode_esc16_stream(jnp, dc8, esc):
    """Expand an escape-packed int16 stream (sparse_pack.cc esc_pack_i16):
    int8 values pass through, the -128 marker pulls the next int16 of
    ``esc`` (positions from cumsum(marker))."""
    v = dc8.astype(jnp.int32)
    is_esc = v == -128
    ecnt = is_esc.astype(jnp.int32)
    prefix = jnp.cumsum(ecnt) - ecnt
    ev = jnp.take(esc, jnp.clip(prefix, 0, esc.shape[0] - 1))
    return jnp.where(is_esc, ev.astype(jnp.int32), v).astype(jnp.int16)


def _zz_sel_perm(nac):
    """Mask-bit b -> slot (r*k+c-1) for the k*k-1 zigzag-ordered selection
    (the wire convention the pack-emit decoder produces; jpeg_huff.cc
    ..._crop_pack / sparse_pack.cc zz_sel_perm)."""
    k = 1
    while k * k - 1 < nac:
        k += 1
    perm, r, c = [], 0, 0
    for z in range(64):
        if z > 0 and r < k and c < k:
            perm.append(r * k + c - 1)
        if (r + c) % 2 == 0:
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r, c = r - 1, c + 1
        else:
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r, c = r + 1, c - 1
    return perm  # len == nac


def _unsparse_boundary(jnp, mask, vals, offsets, shapes, canvas):
    """Rebuild a dense padded AC canvas from the sparse wire (_SparseStaged).

    mask [Tb] uint16 — per-block nonzero bitmaps, flat in block order, bit b
    = b-th ZIGZAG-selected coefficient (see _zz_sel_perm — the pack-emit
    decoder appends values in decode order, which is zigzag order);
    vals [Tv] int8 — packed nonzero values in that same global order;
    offsets [N] — per-sample BLOCK offsets into mask (the DC plane's offsets);
    shapes [N, nd] — per-sample dense dims, last = nac; canvas — dense canvas
    dims, last = nac. Positions are self-describing: value p of block b lives
    at cumsum(popcount(mask))[b] + p. Two big gathers + one constant
    nac-permutation at the end (slot order for the IDCT); everything else is
    elementwise — negligible next to the IDCT that consumes the result."""
    import jax

    n = shapes.shape[0]
    nd = len(canvas)
    nac = int(canvas[-1])
    block_canvas = tuple(canvas[:-1])
    blk_shape = (n,) + block_canvas
    bshape = (n,) + (1,) * (nd - 1)
    # per-sample row-major strides over the BLOCK dims (all but the nac dim)
    stride = jnp.ones((n,), jnp.int32)
    strides = [None] * (nd - 1)
    for d in range(nd - 2, -1, -1):
        strides[d] = stride
        stride = stride * shapes[:, d].astype(jnp.int32)
    bidx = jnp.broadcast_to(offsets.astype(jnp.int32).reshape(bshape), blk_shape)
    valid = None
    for d in range(nd - 1):
        coord = jax.lax.broadcasted_iota(jnp.int32, blk_shape, d + 1)
        bidx = bidx + coord * strides[d].reshape(bshape)
        v = coord < shapes[:, d].astype(jnp.int32).reshape(bshape)
        valid = v if valid is None else (valid & v)
    bidx = jnp.clip(bidx, 0, mask.shape[0] - 1)
    mask_i32 = mask.astype(jnp.int32)
    nnz = jax.lax.population_count(mask_i32)
    starts = jnp.cumsum(nnz) - nnz  # exclusive prefix over the flat stream
    m_c = jnp.take(mask_i32, bidx)        # [n, *block_canvas]
    s_c = jnp.take(starts, bidx)
    j = jax.lax.broadcasted_iota(jnp.int32, blk_shape + (nac,), nd)
    m_e = m_c[..., None]
    has = (m_e >> j) & 1
    prefix = jax.lax.population_count(m_e & ((1 << j) - 1))
    pos = s_c[..., None] + prefix
    v = jnp.take(vals, jnp.clip(pos, 0, vals.shape[0] - 1))
    keep = (has == 1) & valid[..., None]
    out_zz = jnp.where(keep, v, jnp.zeros((), vals.dtype))
    # zigzag-bit order -> slot order: final[..., slot] = out_zz[..., b(slot)]
    perm = _zz_sel_perm(nac)
    import numpy as _np

    b_of_slot = _np.argsort(_np.asarray(perm))
    return jnp.take(out_zz, jnp.asarray(b_of_slot), axis=-1)

"""Parallel external source: multiprocess worker pool with shared-memory
transport.

Reference: ``dali/python/nvidia/dali/_multiproc/`` (``pool.py:329`` ProcPool,
``shared_batch.py``, ``shared_mem.py`` — fork/spawn workers computing source
callbacks, results returned through shared-memory chunks). This implementation
keeps the same architecture in compact form:

* N worker processes, each owning a ring of reusable ``multiprocessing.shared_memory``
  slots (no per-batch allocation after warm-up),
* tasks = (slot, iteration, epoch, sample indices); workers run the user callback
  per sample and pack the arrays into their slot,
* the parent unpacks and copies out (slots recycle after ``queue_depth`` batches).

Only *indexed* callables (accepting ``SampleInfo``) are parallelizable — the same
restriction as the reference (state can't be shared across processes).
"""

from __future__ import annotations

import multiprocessing as mp
import pickle
import struct
from multiprocessing import shared_memory
from typing import List

import numpy as np

from .types import SampleInfo

_HEADER = struct.Struct("<I")  # meta pickle length


def _pack_arrays(shm, arrays: List[np.ndarray]) -> int:
    """Pack arrays into shm: [meta_len][meta pickle][raw buffers...]. Returns
    total bytes needed (may exceed shm size → caller reallocates)."""
    metas = []
    offset = 0
    for a in arrays:
        a = np.ascontiguousarray(a)
        metas.append((a.dtype.str, a.shape, offset, a.nbytes))
        offset += a.nbytes
    meta_blob = pickle.dumps(metas, protocol=pickle.HIGHEST_PROTOCOL)
    total = _HEADER.size + len(meta_blob) + offset
    if shm is None or total > shm.size:
        return total
    buf = shm.buf
    _HEADER.pack_into(buf, 0, len(meta_blob))
    buf[_HEADER.size : _HEADER.size + len(meta_blob)] = meta_blob
    base = _HEADER.size + len(meta_blob)
    for a, (dstr, shape, off, nbytes) in zip(arrays, metas):
        a = np.ascontiguousarray(a)
        buf[base + off : base + off + nbytes] = a.tobytes()
    return total


def _unpack_arrays(shm) -> List[np.ndarray]:
    buf = shm.buf
    (meta_len,) = _HEADER.unpack_from(buf, 0)
    metas = pickle.loads(bytes(buf[_HEADER.size : _HEADER.size + meta_len]))
    base = _HEADER.size + meta_len
    out = []
    for dstr, shape, off, nbytes in metas:
        a = np.frombuffer(buf, dtype=np.dtype(dstr), count=nbytes // np.dtype(dstr).itemsize,
                          offset=base + off).reshape(shape)
        out.append(a.copy())  # copy out: the slot recycles
    return out


def _worker_main(worker_id, source_blob, task_q, result_q, batch_mode):
    source = pickle.loads(source_blob)
    slots = {}
    while True:
        task = task_q.get()
        if task is None:
            break
        slot_name, want_bytes, iteration, epoch, indices = task
        try:
            arrays = []
            for j, idx_in_batch in enumerate(indices):
                info = SampleInfo(*idx_in_batch) if not batch_mode else None
                r = source(info)
                if isinstance(r, tuple):
                    arrays.extend(np.asarray(x) for x in r)
                    n_out = len(r)
                else:
                    arrays.append(np.asarray(r))
                    n_out = 1
            shm = slots.get(slot_name)
            if shm is None and want_bytes:
                shm = shared_memory.SharedMemory(name=slot_name)
                slots[slot_name] = shm
            total = _pack_arrays(shm, arrays)
            if shm is None or total > shm.size:
                # allocate a bigger private segment and report its name
                new = shared_memory.SharedMemory(create=True, size=max(total, 1 << 20))
                _pack_arrays(new, arrays)
                result_q.put((worker_id, iteration, indices, new.name, total, n_out, None))
                new.close()
            else:
                result_q.put((worker_id, iteration, indices, slot_name, total, n_out, None))
        except BaseException as e:  # noqa: BLE001
            result_q.put((worker_id, iteration, indices, None, 0, 0, repr(e)))


class WorkerPool:
    """Reference ``_multiproc/pool.py:621`` WorkerPool, compact form."""

    def __init__(self, source, num_workers: int, batch_size: int, queue_depth: int = 2,
                 start_method: str = "fork", slot_bytes: int = 8 << 20, pickler=None):
        self._ctx = mp.get_context(start_method)
        self._num_workers = max(1, num_workers)
        self._task_qs = [self._ctx.Queue() for _ in range(self._num_workers)]
        self._result_q = self._ctx.Queue()
        self._batch_size = batch_size
        # per-worker slot rings (parent-owned shm, workers attach lazily)
        self._slots = {}
        self._slot_ring = []
        n_slots = queue_depth + 2
        for w in range(self._num_workers):
            ring = []
            for s in range(n_slots):
                shm = shared_memory.SharedMemory(create=True, size=slot_bytes)
                self._slots[shm.name] = shm
                ring.append(shm.name)
            self._slot_ring.append(ring)
        self._slot_cursor = [0] * self._num_workers
        if pickler is not None:
            blob = pickler.dumps(source)
        else:
            try:
                blob = pickle.dumps(source, protocol=pickle.HIGHEST_PROTOCOL)
            except Exception:
                # lambdas / closures / __main__ functions: serialize by value
                # (reference pickling.py behavior under spawn)
                from .pickling import dumps as _dumps

                blob = _dumps(source)
        self._procs = []
        for w in range(self._num_workers):
            p = self._ctx.Process(
                target=_worker_main,
                args=(w, blob, self._task_qs[w], self._result_q, False),
                daemon=True,
            )
            p.start()
            self._procs.append(p)
        self._install_finalizer()

    def run_batch(self, iteration: int, epoch: int) -> List[List[np.ndarray]]:
        """Compute one batch: returns per-sample lists of output arrays."""
        bs = self._batch_size
        # contiguous chunks per worker
        per = -(-bs // self._num_workers)
        pending = 0
        for w in range(self._num_workers):
            lo, hi = w * per, min((w + 1) * per, bs)
            if lo >= hi:
                continue
            infos = [
                (iteration * bs + i, i, iteration, epoch) for i in range(lo, hi)
            ]
            slot = self._slot_ring[w][self._slot_cursor[w]]
            self._slot_cursor[w] = (self._slot_cursor[w] + 1) % len(self._slot_ring[w])
            self._task_qs[w].put((slot, True, iteration, epoch, infos))
            pending += 1
        import queue as _queue

        results = {}
        while pending:
            try:
                worker_id, it, indices, shm_name, total, n_out, err = self._result_q.get(timeout=5.0)
            except _queue.Empty:
                dead = [i for i, p in enumerate(self._procs) if not p.is_alive()]
                if dead:
                    raise RuntimeError(
                        f"parallel external_source worker(s) {dead} died "
                        "(segfault/OOM in the source callback?)"
                    )
                continue
            if err is not None:
                raise RuntimeError(f"parallel external_source worker failed: {err}")
            if shm_name in self._slots:
                arrays = _unpack_arrays(self._slots[shm_name])
            else:  # oversized one-off segment from the worker
                shm = shared_memory.SharedMemory(name=shm_name)
                arrays = _unpack_arrays(shm)
                shm.close()
                shm.unlink()
            results[indices[0][1]] = (indices, arrays, n_out)
            pending -= 1
        samples: List[List[np.ndarray]] = [None] * bs
        for first_idx, (indices, arrays, n_out) in results.items():
            k = 0
            for (_, idx_in_batch, _, _) in indices:
                samples[idx_in_batch] = arrays[k : k + n_out]
                k += n_out
        return samples

    @staticmethod
    def _cleanup(task_qs, procs, slots):
        for q in task_qs:
            try:
                q.put(None)
            except Exception:
                pass
        for p in procs:
            p.join(timeout=2)
            if p.is_alive():
                p.terminate()
        for shm in slots.values():
            try:
                shm.close()
                shm.unlink()
            except Exception:
                pass
        slots.clear()

    def close(self):
        # via the finalizer so close() and interpreter-exit share one path
        # (and the finalizer becomes a no-op afterwards)
        self._finalizer()

    def _install_finalizer(self):
        import weakref

        # __del__ is unreliable at interpreter shutdown (the pool sits in GC
        # cycles with the executor), which leaked the shm slot rings until
        # the resource_tracker complained; weakref.finalize runs via atexit.
        self._finalizer = weakref.finalize(
            self, WorkerPool._cleanup, self._task_qs, self._procs, self._slots)

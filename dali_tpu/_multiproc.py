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

# worker→parent error sentinel for the epoch-end contract: the serial path
# propagates the source callable's StopIteration (builtin.py _next_data) and
# the pipeline treats it as end-of-epoch, so the parallel path must surface
# the SAME exception type, not a generic worker error
_STOP = "__stop_iteration__"


def _pack_arrays(shm, arrays: List[np.ndarray]) -> int:
    """Pack arrays into shm: [meta_len][meta pickle][raw buffers...]. Returns
    total bytes needed (may exceed shm size → caller reallocates)."""
    conv = []
    metas = []
    offset = 0
    for a in arrays:
        a = np.ascontiguousarray(a)
        conv.append(a)
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
    for a, (dstr, shape, off, nbytes) in zip(conv, metas):
        if nbytes:
            # one copy, straight into the slot (a is contiguous from the
            # first loop; tobytes() here would materialize a third full copy)
            buf[base + off : base + off + nbytes] = a.data.cast("B")
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


def _worker_main(worker_id, source_blob, task_q, result_q):
    source = pickle.loads(source_blob)
    slots = {}
    # one persistent worker-owned overflow segment, grown on demand: results
    # larger than the ring's slot_bytes would otherwise pay create+unlink per
    # batch forever. Safe to reuse each batch: run_batch copies every result
    # out before the next batch's tasks are enqueued.
    big = None
    try:
        while True:
            task = task_q.get()
            if task is None:
                break
            slot_name, iteration, epoch, indices = task
            try:
                arrays = []
                n_out = None
                for idx_in_batch in indices:
                    info = SampleInfo(*idx_in_batch)
                    r = source(info)
                    if isinstance(r, tuple):
                        arrays.extend(np.asarray(x) for x in r)
                        this = len(r)
                    else:
                        arrays.append(np.asarray(r))
                        this = 1
                    if n_out is None:
                        n_out = this
                    elif n_out != this:
                        # the serial path raises for ragged arities
                        # (_split_outputs); silently slicing flat `arrays`
                        # with one n_out would shuffle outputs across samples
                        raise ValueError(
                            f"source returned {this} outputs for sample "
                            f"{info.idx_in_epoch} but {n_out} for earlier "
                            "samples in the batch")
                shm = slots.get(slot_name)
                if shm is None:
                    shm = shared_memory.SharedMemory(name=slot_name)
                    slots[slot_name] = shm
                total = _pack_arrays(shm, arrays)
                if total > shm.size:
                    if big is None or big.size < total:
                        if big is not None:
                            big.close()
                            big.unlink()
                        big = shared_memory.SharedMemory(
                            create=True, size=max(total, 1 << 20))
                    _pack_arrays(big, arrays)
                    result_q.put((worker_id, iteration, epoch, indices,
                                  big.name, total, n_out, None))
                else:
                    result_q.put((worker_id, iteration, epoch, indices,
                                  slot_name, total, n_out, None))
            except StopIteration:
                result_q.put((worker_id, iteration, epoch, indices,
                              None, 0, 0, _STOP))
            except BaseException as e:  # noqa: BLE001
                result_q.put((worker_id, iteration, epoch, indices,
                              None, 0, 0, repr(e)))
    finally:
        if big is not None:
            try:
                big.close()
                big.unlink()
            except Exception:
                pass


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
        # cached attachments to worker-owned overflow segments, per worker
        self._big_attach = {}
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
                args=(w, blob, self._task_qs[w], self._result_q),
                daemon=True,
            )
            p.start()
            self._procs.append(p)
        self._install_finalizer()

    def _attach_result(self, worker_id, shm_name):
        """Arrays for one result: from the parent-owned ring, or from the
        worker's overflow segment (attached once per segment name and cached;
        the WORKER owns and unlinks it)."""
        if shm_name in self._slots:
            return _unpack_arrays(self._slots[shm_name])
        cached = self._big_attach.get(worker_id)
        if cached is None or cached.name != shm_name:
            if cached is not None:
                try:
                    cached.close()  # worker replaced (and unlinked) it
                except Exception:
                    pass
            cached = shared_memory.SharedMemory(name=shm_name)
            self._big_attach[worker_id] = cached
        return _unpack_arrays(cached)

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
            self._task_qs[w].put((slot, iteration, epoch, infos))
            pending += 1
        import queue as _queue

        results = {}
        stop = False
        err = None
        while pending:
            try:
                (worker_id, it, ep, indices, shm_name, total, n_out,
                 werr) = self._result_q.get(timeout=5.0)
            except _queue.Empty:
                dead = [i for i, p in enumerate(self._procs) if not p.is_alive()]
                if dead:
                    raise RuntimeError(
                        f"parallel external_source worker(s) {dead} died "
                        "(segfault/OOM in the source callback?)"
                    )
                continue
            if (it, ep) != (iteration, epoch):
                # stale result from a batch that aborted mid-collection
                # (error/StopIteration below drains on the NEXT call):
                # iteration numbers repeat across epochs and chunk keys
                # repeat every batch, so accepting it would silently serve
                # last batch's arrays as this batch's samples
                continue
            pending -= 1
            if werr == _STOP:
                stop = True  # keep draining this batch's results first
            elif werr is not None:
                err = err or RuntimeError(
                    f"parallel external_source worker failed: {werr}")
            else:
                results[indices[0][1]] = (
                    indices, self._attach_result(worker_id, shm_name), n_out)
        if stop:
            raise StopIteration  # end of epoch, same contract as serial
        if err is not None:
            raise err
        samples: List[List[np.ndarray]] = [None] * bs
        for first_idx, (indices, arrays, n_out) in results.items():
            k = 0
            for (_, idx_in_batch, _, _) in indices:
                samples[idx_in_batch] = arrays[k : k + n_out]
                k += n_out
        return samples

    @staticmethod
    def _cleanup(task_qs, procs, slots, big_attach):
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
        for shm in big_attach.values():
            # worker-owned; normally already unlinked by the worker — unlink
            # defensively in case it was terminated mid-batch
            try:
                shm.close()
                shm.unlink()
            except Exception:
                pass
        big_attach.clear()

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
            self, WorkerPool._cleanup, self._task_qs, self._procs,
            self._slots, self._big_attach)

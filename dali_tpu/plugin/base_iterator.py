"""Base framework iterator: epoch accounting, LastBatchPolicy, auto_reset.

Reference: ``dali/python/nvidia/dali/plugin/base_iterator.py`` (611 LoC) — the
semantics are kept: ``reader_name`` autosizing from reader metadata, FILL / DROP /
PARTIAL last-batch policies, multi-pipeline aggregation (one pipeline per shard).
"""

from __future__ import annotations

import enum
from typing import List, Optional


class LastBatchPolicy(enum.Enum):
    FILL = 0  # pad the last batch with wrapped-around samples (default)
    DROP = 1  # drop the incomplete last batch
    PARTIAL = 2  # return the incomplete last batch with a validity count


class DALIGenericIterator:
    """Iterates one or more pipelines, yielding per-pipeline output dicts.

    Subclasses implement ``_to_framework(category_outputs) -> framework batch``.
    """

    def __init__(
        self,
        pipelines,
        output_map: List[str],
        size: int = -1,
        reader_name: Optional[str] = None,
        auto_reset: bool = False,
        fill_last_batch: Optional[bool] = None,
        last_batch_padded: bool = False,
        last_batch_policy: LastBatchPolicy = LastBatchPolicy.FILL,
        prepare_first_batch: bool = True,
    ):
        if not isinstance(pipelines, (list, tuple)):
            pipelines = [pipelines]
        if len(set(output_map)) != len(output_map):
            raise ValueError("output_map names must be unique")
        self._pipes = list(pipelines)
        self.output_map = list(output_map)
        self._auto_reset = auto_reset in (True, "yes")
        self._last_batch_policy = last_batch_policy
        self._last_batch_padded = last_batch_padded
        self.batch_size = self._pipes[0].max_batch_size
        self._reader_name = reader_name

        if reader_name is not None:
            metas = [p.reader_meta(reader_name) for p in self._pipes]
            # aggregate shard sizes across the pipelines we drive. Reference
            # sizing rules (base_iterator.py:349-361): DROP rounds DOWN to the
            # global floor regardless of padding; padded shards are uniform;
            # otherwise the exact floor-formula shard size. PARTIAL trimming
            # always measures against the UNPADDED size (":374-390").
            total = 0
            total_no_pad = 0
            for m in metas:
                es, ns, sid = m["epoch_size"], m["number_of_shards"], m["shard_id"]
                exact = (sid + 1) * es // ns - sid * es // ns
                total_no_pad += exact
                if last_batch_policy == LastBatchPolicy.DROP:
                    total += es // ns
                elif m["pad_last_batch"]:
                    total += m["epoch_size_padded"] // ns
                else:
                    total += exact
            self._size = total
            self._size_no_pad = total_no_pad
            self._last_batch_padded = bool(metas[0]["pad_last_batch"])
        else:
            # explicit size is the TOTAL epoch size across all pipelines
            # (reference base_iterator.py:165) — the per-step counter already
            # advances by batch_size * len(pipes), so multiplying here served
            # every sample len(pipes) times per declared epoch
            self._size = size
            self._size_no_pad = self._size

        self._counter = 0
        self._ever_consumed = False
        for p in self._pipes:
            p._require_built()
            p._prefetch()

    @property
    def size(self):
        return self._size

    def __len__(self):
        if self._size <= 0:
            raise TypeError("Iterator size unknown (infinite external source)")
        n = self._size
        bs = self.batch_size * len(self._pipes)
        if self._last_batch_policy == LastBatchPolicy.DROP:
            return n // bs
        return -(-n // bs)

    def __iter__(self):
        return self

    def __next__(self):
        if self._size > 0 and self._counter >= self._size:
            if self._auto_reset:
                self.reset()
            raise StopIteration
        if self._size > 0 and self._last_batch_policy == LastBatchPolicy.DROP:
            remaining = self._size - self._counter
            if remaining < self.batch_size * len(self._pipes):
                if self._auto_reset:
                    self.reset()
                raise StopIteration
        self._ever_consumed = True
        # PARTIAL validity counts real (unpadded) samples — padding filler at
        # the shard tail is trimmed (reference base_iterator.py:386-388)
        left = self._size_no_pad - self._counter if self._size > 0 else None
        batches = []
        for p in self._pipes:
            outs = p.outputs()
            p.schedule_run()
            batches.append(dict(zip(self.output_map, outs)))
        self._counter += self.batch_size * len(self._pipes)
        out = self._to_framework(batches)
        if (
            self._last_batch_policy == LastBatchPolicy.PARTIAL
            and left is not None
            and left < self.batch_size * len(self._pipes)
        ):
            out = self._trim_output(out, left)
        return out

    next = __next__

    def reset(self):
        """Start a new epoch (reference base_iterator.py:496-534). Ignored
        before the epoch ends, like the reference."""
        step = self.batch_size * len(self._pipes)
        if self._last_batch_policy == LastBatchPolicy.DROP and self._size > 0:
            # DROP ends the epoch with the incomplete tail batch still queued
            # in the pipelines; extract and discard it here, or the samples
            # DROP promised to skip reappear as the NEXT epoch's first batch
            # and every later epoch is misaligned by the tail length
            remaining = self._size - self._counter
            if 0 < remaining < step:
                for p in self._pipes:
                    p.outputs()
                    p.schedule_run()
                self._counter += step
        if self._size < 0 or self._counter >= self._size:
            if (self._last_batch_policy == LastBatchPolicy.FILL
                    and not self._last_batch_padded and self._size > 0):
                # FILL on unpadded shards consumed wrap-around samples from
                # the next epoch; carry the overshoot so those samples are
                # not served twice (reference "legacy way")
                self._counter = self._counter % self._size
            else:
                self._counter = 0

    def checkpoints(self):
        """Per-pipeline checkpoints + iterator position (reference: iterator
        externals saved via ExternalContextCheckpoint, backend_impl.cc:3305).
        Restore by rebuilding the pipelines with ``checkpoint=`` and passing the
        counter back via ``restore_counter``."""
        return {
            "counter": self._counter,
            "pipelines": [p.checkpoint() for p in self._pipes],
        }

    def restore_counter(self, counter: int):
        self._counter = int(counter)

    def _to_framework(self, batches):
        return batches

    def _trim_output(self, out, n_valid: int):
        """Trim the last (incomplete) batch to ``n_valid`` samples —
        LastBatchPolicy.PARTIAL (reference base_iterator.py trimming of the
        filled tail). Works on dicts of batch-major arrays or lists thereof;
        with several pipelines the valid samples are the leading ones of each
        pipeline's batch in order."""

        from ..tensors import TensorListCPU, TensorListGPU

        def trim(v, n):
            if isinstance(v, TensorListCPU):
                return TensorListCPU([v.at(i) for i in range(n)], v.layout())
            if isinstance(v, TensorListGPU):
                # slice the shapes array WITHOUT materializing it: _shapes
                # may be device-resident, and a D2H readback here would
                # permanently degrade the tunnel (CLAUDE.md); [:n] stays on
                # device for jax arrays and is free for numpy
                shapes = None if v._shapes is None else v._shapes[:n]
                return TensorListGPU(v.as_tensor()[:n], shapes, v.layout())
            return v[:n]

        def trim_dict(d, n):
            return {k: trim(v, max(n, 0)) for k, v in d.items()}

        if isinstance(out, dict):
            return trim_dict(out, n_valid)
        if isinstance(out, list):
            trimmed = []
            for i, d in enumerate(out):
                n = min(max(n_valid - i * self.batch_size, 0), self.batch_size)
                trimmed.append(trim_dict(d, n))
            return trimmed
        return out

"""JAX integration — the front door of dali_tpu.

Reference: ``dali/python/nvidia/dali/plugin/jax/`` (``iterator.py:240-260`` builds
global ``jax.Array``s from per-device shards via
``jax.make_array_from_single_device_arrays`` + ``NamedSharding``). Here the
pipeline outputs already ARE ``jax.Array``s, so the iterator's job is (a) dict
packaging + epoch semantics, (b) assembling globally-sharded arrays when a
``sharding`` is given — one local pipeline per host feeding its shard, distribution
over ICI/DCN handled entirely by JAX (SURVEY §5.8).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..tensors import TensorListCPU, TensorListGPU
from .base_iterator import DALIGenericIterator as _Base
from .base_iterator import LastBatchPolicy  # noqa: F401  (re-export)


class DALIGenericIterator(_Base):
    """Yields dicts of ``jax.Array``s.

    With ``sharding=NamedSharding(...)``: each pipeline produces the local shard;
    the iterator assembles one global array per output category across this
    process's addressable devices (multi-host: each process contributes its
    local devices' shards, exactly like the reference JAX plugin).
    """

    def __init__(self, pipelines, output_map, *, sharding=None, **kwargs):
        self._sharding = sharding
        if sharding is not None and kwargs.get("last_batch_policy") == LastBatchPolicy.PARTIAL:
            raise ValueError(
                "LastBatchPolicy.PARTIAL is not supported with sharding — trimming "
                "a globally-sharded array is not well-defined (use FILL or DROP, "
                "like the reference JAX plugin)"
            )
        super().__init__(pipelines, output_map, **kwargs)

    def _to_jax(self, tl):
        import jax

        if isinstance(tl, TensorListGPU):
            return tl.as_tensor()
        if isinstance(tl, TensorListCPU):
            return jax.numpy.asarray(tl.as_array())
        return tl

    def _to_framework(self, batches):
        import jax

        if self._sharding is None:
            if len(batches) == 1:
                return {k: self._to_jax(v) for k, v in batches[0].items()}
            return [{k: self._to_jax(v) for k, v in b.items()} for b in batches]
        # Build one global array per category (reference iterator.py:246-260).
        out = {}
        devices = list(self._sharding.mesh.devices.flat) if hasattr(self._sharding, "mesh") else list(
            self._sharding._addressable_device_assignment
        )
        local_devices = [d for d in devices if d.process_index == jax.process_index()]
        for cat in self.output_map:
            shards = [self._to_jax(b[cat]) for b in batches]
            if len(shards) == 1 and len(local_devices) > 1:
                # one pipeline feeding several local devices: split the batch
                arr = shards[0]
                if arr.shape[0] % len(local_devices):
                    raise ValueError(
                        f"batch size {arr.shape[0]} does not divide evenly "
                        f"over {len(local_devices)} local devices — the "
                        "remainder samples would be silently dropped")
                per = arr.shape[0] // len(local_devices)
                shards = [arr[i * per : (i + 1) * per] for i in range(len(local_devices))]
            if len(shards) != len(local_devices):
                # zip would silently truncate: with more pipelines than local
                # devices, whole per-pipeline batches vanish every iteration
                raise ValueError(
                    f"{len(shards)} pipeline shards for "
                    f"{len(local_devices)} local devices in the sharding — "
                    "drive one pipeline per local device (or one pipeline "
                    "total with a device-divisible batch)")
            placed = [jax.device_put(s, d) for s, d in zip(shards, local_devices)]
            # global batch = per-device shard batch × total devices on the batch axis
            shard_shape = placed[0].shape
            global_shape = (shard_shape[0] * len(devices),) + tuple(shard_shape[1:])
            out[cat] = jax.make_array_from_single_device_arrays(global_shape, self._sharding, placed)
        return out


class DALIPeekableIterator(DALIGenericIterator):
    """Iterator with ``peek()`` — the CLU PeekableDatasetIterator surface
    (reference ``plugin/jax/clu.py``)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._peeked = None

    def peek(self):
        if self._peeked is None:
            self._peeked = super().__next__()
        return self._peeked

    def peek_async(self):
        """Prefetch the next element without consuming it (returns a 0-arg
        callable resolving to the element; reference clu.py peek_async)."""
        el = self.peek()
        return lambda: el

    def __next__(self):
        if self._peeked is not None:
            out, self._peeked = self._peeked, None
            return out
        return super().__next__()


def data_iterator(
    pipeline_fn=None,
    output_map=None,
    *,
    sharding=None,
    reader_name=None,
    auto_reset=False,
    last_batch_policy=LastBatchPolicy.FILL,
    **iterator_kwargs,
):
    """Decorator turning a ``@pipeline_def``-style function into an iterator
    factory (reference ``plugin/jax/iterator.py`` ``data_iterator``)."""

    def decorator(fn):
        def create(*args, **kwargs):
            from ..pipeline import pipeline_def

        # build pipelines: one per local shard when sharding is given
            import jax

            pd = fn if getattr(fn, "is_pipeline_def", False) else pipeline_def(fn)
            if sharding is None:
                pipes = [pd(*args, **kwargs)]
            else:
                devices = [
                    d for d in sharding.mesh.devices.flat if d.process_index == jax.process_index()
                ]
                num_shards = sharding.mesh.devices.size
                base = jax.process_index() * len(devices)
                pipes = [
                    pd(*args, shard_id=base + i, num_shards=num_shards, **kwargs)
                    for i in range(len(devices))
                ]
                # shard args are consumed by reader ops via fn kwargs; pipelines
                # that don't accept them will raise — matching reference behavior.
            return DALIGenericIterator(
                pipes,
                output_map,
                sharding=sharding,
                reader_name=reader_name,
                auto_reset=auto_reset,
                last_batch_policy=last_batch_policy,
                **iterator_kwargs,
            )

        return create

    if pipeline_fn is not None:
        return decorator(pipeline_fn)
    return decorator

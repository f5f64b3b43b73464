"""PyTorch integration (reference ``dali/python/nvidia/dali/plugin/pytorch/``).

On TPU hosts PyTorch is CPU-side: the iterator yields a LIST of per-pipeline
dicts of cpu torch tensors
(zero-copy from numpy where possible). Device outputs are brought back to host —
use the JAX iterator for on-device consumption.
"""

from __future__ import annotations

import numpy as np

from ..tensors import TensorListCPU, TensorListGPU
from .base_iterator import DALIGenericIterator as _Base
from .base_iterator import LastBatchPolicy  # noqa: F401


def to_torch_type(np_dtype):
    import torch

    return torch.from_numpy(np.empty(0, dtype=np_dtype)).dtype


def feed_ndarray(tensor_list, arr):
    """Copy a TensorList into a preallocated torch tensor (reference
    plugin/pytorch/__init__.py feed_ndarray)."""
    src = tensor_list.as_array() if isinstance(tensor_list, TensorListCPU) else np.asarray(
        tensor_list.as_tensor()
    )
    arr.copy_(__import__("torch").from_numpy(np.ascontiguousarray(src)))
    return arr


class DALIGenericIterator(_Base):
    def _to_framework(self, batches):
        import torch

        def conv(tl):
            if isinstance(tl, TensorListGPU):
                try:
                    # zero-copy DLPack handoff (works when the device memory is
                    # host-visible, e.g. the CPU backend; TPU-resident arrays
                    # fall back to a host copy — torch has no TPU device here)
                    return torch.from_dlpack(tl)
                except Exception:
                    return torch.from_numpy(np.array(tl.as_tensor()))
            try:
                return torch.from_dlpack(tl)  # zero-copy over the cached dense view
            except Exception:
                return torch.from_numpy(np.ascontiguousarray(tl.as_array()))

        # always a list of per-pipeline dicts, even for one pipeline — the
        # reference PyTorch plugin yields the same shape and the tests pin it
        return [{k: conv(v) for k, v in b.items()} for b in batches]


class DALIClassificationIterator(DALIGenericIterator):
    """(data, label) convenience iterator (reference plugin/pytorch)."""

    def __init__(self, pipelines, **kwargs):
        super().__init__(pipelines, ["data", "label"], **kwargs)

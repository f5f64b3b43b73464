"""PaddlePaddle integration (reference ``dali/python/nvidia/dali/plugin/paddle.py``).

Same surface as the PyTorch iterator, converting to paddle tensors. Gated on
paddle being importable — this image ships without it, so the import error is
raised lazily at construction (matching the reference's behavior of failing
only when the plugin is actually used)."""

from __future__ import annotations

import numpy as np

from ..tensors import TensorListCPU, TensorListGPU
from .base_iterator import DALIGenericIterator as _Base
from .base_iterator import LastBatchPolicy  # noqa: F401 (re-export)


class DALIGenericIterator(_Base):
    """Yields dicts of ``paddle.Tensor``."""

    def __init__(self, *args, **kwargs):
        try:
            import paddle  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "dali_tpu.plugin.paddle requires PaddlePaddle (pip install paddlepaddle)"
            ) from e
        super().__init__(*args, **kwargs)

    def _to_framework(self, batches):
        import paddle

        def conv(tl):
            if isinstance(tl, TensorListGPU):
                return paddle.to_tensor(np.asarray(tl.as_tensor()))
            if isinstance(tl, TensorListCPU):
                return paddle.to_tensor(tl.as_array())
            return paddle.to_tensor(np.asarray(tl))

        dicts = [{k: conv(v) for k, v in b.items()} for b in batches]
        return dicts[0] if len(dicts) == 1 else dicts


class DALIClassificationIterator(DALIGenericIterator):
    """(data, label) convenience wrapper (reference paddle.py)."""

    def __init__(self, pipelines, **kwargs):
        super().__init__(pipelines, ["data", "label"], **kwargs)

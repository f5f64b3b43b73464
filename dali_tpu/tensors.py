"""User-facing batch objects returned by ``Pipeline.run()``.

Analogues of DALI's ``TensorListCPU`` / ``TensorListGPU`` pybind objects
(reference ``dali/python/nvidia/dali/tensors.py``, ``backend_impl.cc:708,968``).
CPU lists wrap ragged numpy samples; GPU lists wrap an on-device padded
``jax.Array`` plus per-sample valid extents.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


class TensorListCPU:
    def __init__(self, samples: List[np.ndarray], layout: str = ""):
        self._samples = list(samples)
        self._layout = layout or ""

    def __len__(self):
        return len(self._samples)

    def __getitem__(self, i):
        return self._samples[i]

    def at(self, i) -> np.ndarray:
        return self._samples[i]

    def layout(self) -> str:
        return self._layout

    def shape(self):
        return [tuple(s.shape) for s in self._samples]

    @property
    def dtype(self):
        return self._samples[0].dtype if self._samples else np.dtype(np.uint8)

    def is_dense_tensor(self) -> bool:
        if not self._samples:
            return True
        s0 = self._samples[0].shape
        return all(s.shape == s0 for s in self._samples)

    def as_array(self) -> np.ndarray:
        if not self.is_dense_tensor():
            raise ValueError("TensorList is not dense (non-uniform sample shapes)")
        return np.stack(self._samples, 0)

    def as_tensor(self) -> np.ndarray:
        return self.as_array()

    def __repr__(self):
        return f"TensorListCPU(n={len(self)}, layout={self._layout!r}, dtype={self.dtype})"


class TensorListGPU:
    """On-device batch: padded jax.Array [N, *canvas] (+ shapes for ragged batches)."""

    def __init__(self, data, shapes: Optional[np.ndarray] = None, layout: str = ""):
        self._data = data
        self._shapes = shapes  # numpy [N, ndim] or None (uniform)
        self._layout = layout or ""

    def __len__(self):
        return int(self._data.shape[0])

    def layout(self) -> str:
        return self._layout

    @property
    def dtype(self):
        return self._data.dtype

    def is_dense_tensor(self) -> bool:
        return self._shapes is None

    def shape(self):
        if self._shapes is None:
            n = int(self._data.shape[0])
            return [tuple(self._data.shape[1:])] * n
        return [tuple(int(x) for x in row) for row in self._shapes]

    def as_tensor(self):
        """The underlying padded jax.Array (zero-copy)."""
        return self._data

    def as_array(self):
        return self._data

    @property
    def jax_array(self):
        return self._data

    def at(self, i):
        """Sample ``i`` as numpy, cropped to its valid extent (host transfer)."""
        arr = np.asarray(self._data[i])
        if self._shapes is not None:
            sl = tuple(slice(0, int(e)) for e in self._shapes[i])
            arr = arr[sl]
        return arr

    def as_cpu(self) -> TensorListCPU:
        host = np.asarray(self._data)
        if self._shapes is None:
            samples = [host[i] for i in range(host.shape[0])]
        else:
            samples = [
                host[(i, *(slice(0, int(e)) for e in self._shapes[i]))] for i in range(host.shape[0])
            ]
        return TensorListCPU(samples, self._layout)

    def __repr__(self):
        return (
            f"TensorListGPU(shape={tuple(self._data.shape)}, layout={self._layout!r},"
            f" dense={self.is_dense_tensor()})"
        )

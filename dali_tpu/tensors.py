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
        self._dense_cache: Optional[np.ndarray] = None

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
        if self._dense_cache is None:
            self._dense_cache = np.stack(self._samples, 0)
        return self._dense_cache

    def as_tensor(self) -> np.ndarray:
        return self.as_array()

    # -- zero-copy interop (reference dali/pipeline/data/dltensor.cc and the
    # __array_interface__ surface on TensorCPU, backend_impl.cc:708) ---------
    def __dlpack__(self, stream=None):
        return self.as_array().__dlpack__()

    def __dlpack_device__(self):
        return self.as_array().__dlpack_device__()

    @property
    def __array_interface__(self):
        return self.as_array().__array_interface__

    def __array__(self, dtype=None):
        a = self.as_array()
        return a.astype(dtype) if dtype is not None else a

    def __repr__(self):
        return f"TensorListCPU(n={len(self)}, layout={self._layout!r}, dtype={self.dtype})"


class TensorListGPU:
    """On-device batch: padded jax.Array [N, *canvas] (+ shapes for ragged batches)."""

    def __init__(self, data, shapes: Optional[np.ndarray] = None, layout: str = ""):
        self._data = data
        # numpy [N, ndim], a device array (fetched LAZILY — a device->host
        # readback is expensive, and on the axon tunnel it permanently
        # degrades the client; hot loops that never inspect per-sample
        # shapes must never pay for it), or None (uniform).
        self._shapes = shapes
        self._layout = layout or ""

    def _shapes_np(self) -> Optional[np.ndarray]:
        if self._shapes is not None and not isinstance(self._shapes, np.ndarray):
            self._shapes = np.asarray(self._shapes)
        return self._shapes

    def __len__(self):
        return int(self._data.shape[0])

    def layout(self) -> str:
        return self._layout

    @property
    def dtype(self):
        return self._data.dtype

    def is_dense_tensor(self) -> bool:
        if self._shapes is None:
            return True
        # dense iff every sample's logical shape fills the buffer exactly —
        # uniform logical shapes over a PADDED canvas are still ragged for
        # zero-copy purposes (the pad bytes would leak into the export).
        # DEVICE-resident shapes are answered conservatively (False) without
        # fetching: the D2H readback this would force degrades the tunnel
        # (CLAUDE.md), and "ragged" only routes callers to the copying path.
        if not isinstance(self._shapes, np.ndarray):
            return False
        sh = self._shapes_np()
        if sh.shape[1] != self._data.ndim - 1:
            return False
        first = sh[0]
        return bool((sh == first).all()) and tuple(
            int(x) for x in first) == tuple(self._data.shape[1:])

    def shape(self):
        if self._shapes is None:
            n = int(self._data.shape[0])
            return [tuple(self._data.shape[1:])] * n
        return [tuple(int(x) for x in row) for row in self._shapes_np()]

    def as_tensor(self):
        """The underlying padded jax.Array (zero-copy)."""
        return self._data

    def as_array(self):
        return self._data

    @property
    def jax_array(self):
        return self._data

    # -- zero-copy interop: delegate DLPack to the underlying jax.Array
    # (reference exposes TensorListGPU via __cuda_array_interface__/DLPack,
    # dltensor.cc; here the capsule views device memory with no host copy) ----
    def __dlpack__(self, stream=None):
        if not self.is_dense_tensor():
            raise ValueError(
                "DLPack export requires a dense TensorList (uniform shapes); "
                "ragged batches expose per-sample arrays via at(i)"
            )
        return self._data.__dlpack__()

    def __dlpack_device__(self):
        return self._data.__dlpack_device__()

    def at(self, i):
        """Sample ``i`` as numpy, cropped to its valid extent (host transfer)."""
        arr = np.asarray(self._data[i])
        if self._shapes is not None:
            sl = tuple(slice(0, int(e)) for e in self._shapes_np()[i])
            arr = arr[sl]
        return arr

    def as_cpu(self) -> TensorListCPU:
        host = np.asarray(self._data)
        if self._shapes is None:
            samples = [host[i] for i in range(host.shape[0])]
        else:
            shp = self._shapes_np()
            samples = [
                host[(i, *(slice(0, int(e)) for e in shp[i]))] for i in range(host.shape[0])
            ]
        return TensorListCPU(samples, self._layout)

    def __repr__(self):
        return (
            f"TensorListGPU(shape={tuple(self._data.shape)}, layout={self._layout!r},"
            f" dense={self.is_dense_tensor()})"
        )

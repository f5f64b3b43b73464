"""Batch containers.

TPU-native re-think of DALI's ``TensorList<Backend>`` (reference
``dali/pipeline/data/tensor_list.h:73``): DALI keeps one container type with CPU/GPU
backends and per-sample (possibly non-uniform) shapes. On TPU the two sides have
fundamentally different constraints, so we split:

* ``HostBatch`` — ragged, host-side (numpy). The working currency of readers,
  decoders and every ``device='cpu'`` operator.
* ``DeviceBatch`` — a padded, uniform ``jax.Array`` (or traced value inside the
  jitted device program) plus a per-sample valid-extent array. This is how ragged
  data rides XLA's static-shape world; ops that produce uniform output (resize,
  crop_mirror_normalize) drop the raggedness.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


class HostBatch:
    """Ragged batch of host (numpy) samples with a shared layout & dtype."""

    __slots__ = ("samples", "layout", "source_info")

    def __init__(self, samples: Sequence[np.ndarray], layout: str = "", source_info=None):
        self.samples = list(samples)
        self.layout = layout or ""
        self.source_info = source_info  # optional per-sample origin (filenames)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]

    @property
    def dtype(self):
        return self.samples[0].dtype if self.samples else np.dtype(np.uint8)

    @property
    def ndim(self):
        return self.samples[0].ndim if self.samples else 0

    def shapes(self) -> np.ndarray:
        return np.array([s.shape for s in self.samples], dtype=np.int32)

    def is_uniform(self) -> bool:
        if not self.samples:
            return True
        s0 = self.samples[0].shape
        return all(s.shape == s0 for s in self.samples)

    def as_array(self) -> np.ndarray:
        """Stack a uniform batch."""
        if not self.is_uniform():
            raise ValueError("Batch is not uniform; cannot stack without padding")
        return np.stack(self.samples, axis=0) if self.samples else np.empty((0,))

    def __repr__(self):
        return f"HostBatch(n={len(self.samples)}, layout={self.layout!r}, dtype={self.dtype})"


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_and_stack(
    batch: HostBatch,
    canvas: Optional[Sequence[int]] = None,
    align: Sequence[int] | int = 1,
    fill=0,
):
    """Pad ragged samples to a common canvas and stack → (array[N,...], shapes[N,D]).

    This is the host side of the ragged→static-shape hand-off (SURVEY §7 "hard
    parts": ragged shapes vs XLA static shapes). ``canvas`` pins the padded extent
    per dim; otherwise it's the per-dim max rounded up to ``align``.
    """
    n = len(batch.samples)
    if n == 0:
        raise ValueError("Cannot pad empty batch")
    ndim = batch.ndim
    shapes = batch.shapes()
    if isinstance(align, int):
        align = [align] * ndim
    if canvas is None:
        canvas = [round_up(int(shapes[:, d].max()), align[d]) for d in range(ndim)]
    else:
        canvas = [max(round_up(int(shapes[:, d].max()), align[d]), int(canvas[d])) for d in range(ndim)]
    # zeros() rides calloc's lazily-zeroed pages — np.full costs a real write
    # pass over the canvas (measured ~20 ms/batch on audio-sized canvases)
    if isinstance(fill, (int, float)) and fill == 0:
        out = np.zeros((n, *canvas), dtype=batch.dtype)
    else:
        out = np.full((n, *canvas), fill, dtype=batch.dtype)
    for i, s in enumerate(batch.samples):
        sl = tuple(slice(0, e) for e in s.shape)
        out[(i, *sl)] = s
    return out, shapes


class DeviceBatch:
    """A uniform (padded) on-device batch + per-sample valid extents.

    ``data``   — jax.Array (or tracer) of shape [N, *canvas]
    ``shapes`` — int32 [N, ndim] valid extents; ``None`` means fully uniform
    ``layout`` — DALI layout string of the *sample* dims (e.g. "HWC")
    """

    __slots__ = ("data", "shapes", "layout")

    def __init__(self, data, shapes=None, layout: str = ""):
        self.data = data
        self.shapes = shapes
        self.layout = layout or ""

    @property
    def uniform(self) -> bool:
        return self.shapes is None

    @property
    def batch_size(self):
        return self.data.shape[0]

    @property
    def canvas(self):
        return self.data.shape[1:]

    def with_data(self, data, shapes="keep", layout=None):
        return DeviceBatch(
            data,
            self.shapes if shapes == "keep" else shapes,
            self.layout if layout is None else layout,
        )

    def dim_index(self, name: str) -> int:
        idx = self.layout.find(name)
        if idx < 0:
            raise ValueError(f"dim '{name}' not in layout '{self.layout}'")
        return idx

    def extent(self, dim):
        """Per-sample valid extent of sample-dim ``dim`` (int or layout letter)."""
        import jax.numpy as jnp

        if isinstance(dim, str):
            dim = self.dim_index(dim)
        if self.shapes is None:
            return jnp.full((self.batch_size,), self.data.shape[1 + dim], dtype=jnp.int32)
        return self.shapes[:, dim]

    def __repr__(self):
        return (
            f"DeviceBatch(shape={getattr(self.data, 'shape', None)}, layout={self.layout!r},"
            f" uniform={self.uniform})"
        )

"""Numba-jitted operators (reference ``dali/python/nvidia/dali/plugin/numba/``:
``experimental.numba_function`` — a host operator whose kernel is a
numba-compiled function writing into preallocated outputs).

Gated on numba being importable; the op itself runs on the host stage like any
cpu operator, so a numba kernel slots into the pipeline exactly like a
python_function — just without the interpreter in the per-sample loop."""

from __future__ import annotations

import numpy as np

from .. import fn as _fn
from ..types import to_numpy_type


def numba_function(
    *inputs,
    run_fn,
    out_types,
    in_types,
    outs_ndim=None,
    ins_ndim=None,
    setup_fn=None,
    batch_processing: bool = False,
    device: str = "cpu",
    **kwargs,
):
    """fn.experimental.numba_function (reference numba/experimental/__init__.py).

    ``run_fn(out0, .., in0, ..)`` fills preallocated outputs;
    ``setup_fn(out_shapes, in_shapes)`` (optional) computes output shapes —
    without it outputs copy the first input's shape."""
    try:
        import numba  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "dali_tpu.plugin.numba requires numba (pip install numba)"
        ) from e
    if not isinstance(out_types, (list, tuple)):
        out_types = [out_types]
    if not isinstance(in_types, (list, tuple)):
        in_types = [in_types]
    # delegate to the registered NumbaFunction operator (backend/interop.py)
    return _fn.numba_function(
        *inputs,
        run_fn=run_fn,
        setup_fn=setup_fn,
        out_types=[int(t) for t in out_types],
        in_types=[int(t) for t in in_types],
        outs_ndim=outs_ndim,
        ins_ndim=ins_ndim,
        batch_processing=batch_processing,
        **kwargs,
    )


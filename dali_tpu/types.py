"""Core type system for dali_tpu.

TPU-native analogue of DALI's ``nvidia.dali.types`` (reference:
``dali/python/nvidia/dali/types.py``, ``include/dali/pipeline/data/dali_data_type.h:46``).
We collapse DALI's C++ ``DALIDataType`` enum into a thin wrapper over numpy/jax dtypes:
on TPU the device dtype universe is what XLA supports, and host staging buffers are
numpy — so a single dtype object (``DType``) serves both sides.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

import numpy as np


class DALIDataType(enum.IntEnum):
    """Mirror of DALI's data-type enum (``dali_data_type.h:46``).

    Values chosen to match the reference so serialized pipelines are portable.
    """

    NO_TYPE = -1
    UINT8 = 0
    UINT16 = 1
    UINT32 = 2
    UINT64 = 3
    INT8 = 4
    INT16 = 5
    INT32 = 6
    INT64 = 7
    FLOAT16 = 8
    FLOAT = 9
    FLOAT64 = 10
    BOOL = 11
    STRING = 12
    BFLOAT16 = 13  # TPU-native addition (no DALI equivalent; DALI reserves _HALF2)

    @property
    def np_dtype(self):
        return _TO_NUMPY[self]

    @property
    def jnp_dtype(self):
        import jax.numpy as jnp

        return jnp.dtype(_TO_JNP_NAME[self])


_TO_NUMPY = {
    DALIDataType.UINT8: np.dtype(np.uint8),
    DALIDataType.UINT16: np.dtype(np.uint16),
    DALIDataType.UINT32: np.dtype(np.uint32),
    DALIDataType.UINT64: np.dtype(np.uint64),
    DALIDataType.INT8: np.dtype(np.int8),
    DALIDataType.INT16: np.dtype(np.int16),
    DALIDataType.INT32: np.dtype(np.int32),
    DALIDataType.INT64: np.dtype(np.int64),
    DALIDataType.FLOAT16: np.dtype(np.float16),
    DALIDataType.FLOAT: np.dtype(np.float32),
    DALIDataType.FLOAT64: np.dtype(np.float64),
    DALIDataType.BOOL: np.dtype(np.bool_),
    # BFLOAT16 host-side staged as uint16 bit pattern when needed; numpy via ml_dtypes.
}

_TO_JNP_NAME = {
    DALIDataType.UINT8: "uint8",
    DALIDataType.UINT16: "uint16",
    DALIDataType.UINT32: "uint32",
    DALIDataType.UINT64: "uint64",
    DALIDataType.INT8: "int8",
    DALIDataType.INT16: "int16",
    DALIDataType.INT32: "int32",
    DALIDataType.INT64: "int64",
    DALIDataType.FLOAT16: "float16",
    DALIDataType.FLOAT: "float32",
    DALIDataType.FLOAT64: "float64",
    DALIDataType.BOOL: "bool",
    DALIDataType.BFLOAT16: "bfloat16",
}

try:  # numpy bfloat16 via ml_dtypes (ships with jax)
    import ml_dtypes

    _TO_NUMPY[DALIDataType.BFLOAT16] = np.dtype(ml_dtypes.bfloat16)
except Exception:  # pragma: no cover
    pass

_FROM_NUMPY = {v: k for k, v in _TO_NUMPY.items()}

# Public aliases matching nvidia.dali.types.*
NO_TYPE = DALIDataType.NO_TYPE
UINT8 = DALIDataType.UINT8
UINT16 = DALIDataType.UINT16
UINT32 = DALIDataType.UINT32
UINT64 = DALIDataType.UINT64
INT8 = DALIDataType.INT8
INT16 = DALIDataType.INT16
INT32 = DALIDataType.INT32
INT64 = DALIDataType.INT64
FLOAT16 = DALIDataType.FLOAT16
FLOAT = DALIDataType.FLOAT
FLOAT64 = DALIDataType.FLOAT64
BOOL = DALIDataType.BOOL
STRING = DALIDataType.STRING
BFLOAT16 = DALIDataType.BFLOAT16


def to_numpy_type(t) -> np.dtype:
    """Coerce a DALIDataType / numpy dtype / python type to a numpy dtype."""
    if isinstance(t, DALIDataType):
        return _TO_NUMPY[t]
    return np.dtype(t)


def from_numpy_type(dt) -> DALIDataType:
    dt = np.dtype(dt)
    try:
        return _FROM_NUMPY[dt]
    except KeyError:
        raise TypeError(f"No DALIDataType for numpy dtype {dt}")


def to_jnp_type(t):
    import jax.numpy as jnp

    if isinstance(t, DALIDataType):
        return jnp.dtype(_TO_JNP_NAME[t])
    return jnp.dtype(t)


class DALIImageType(enum.IntEnum):
    """Mirror of ``include/dali/pipeline/data/types.h`` DALIImageType."""

    RGB = 0
    BGR = 1
    GRAY = 2
    YCbCr = 3
    ANY_DATA = 4


RGB = DALIImageType.RGB
BGR = DALIImageType.BGR
GRAY = DALIImageType.GRAY
YCbCr = DALIImageType.YCbCr
ANY_DATA = DALIImageType.ANY_DATA


class DALIInterpType(enum.IntEnum):
    """Mirror of DALI's interpolation enum (``include/dali/core/geom/..``,
    ``daliInterpType``). Used by resize / warp / rotate."""

    INTERP_NN = 0
    INTERP_LINEAR = 1
    INTERP_CUBIC = 2
    INTERP_LANCZOS3 = 3
    INTERP_TRIANGULAR = 4
    INTERP_GAUSSIAN = 5


INTERP_NN = DALIInterpType.INTERP_NN
INTERP_LINEAR = DALIInterpType.INTERP_LINEAR
INTERP_CUBIC = DALIInterpType.INTERP_CUBIC
INTERP_LANCZOS3 = DALIInterpType.INTERP_LANCZOS3
INTERP_TRIANGULAR = DALIInterpType.INTERP_TRIANGULAR
INTERP_GAUSSIAN = DALIInterpType.INTERP_GAUSSIAN


class PipelineAPIType(enum.Enum):
    BASIC = 0
    ITERATOR = 1
    SCHEDULED = 2


@dataclass(frozen=True)
class ScalarConstant:
    """A typed scalar constant usable as an operator argument or in math expressions.

    Reference: ``nvidia.dali.types.ScalarConstant`` (``types.py``). On TPU these fold
    straight into the jitted program as literals.
    """

    value: object
    dtype: DALIDataType = None

    def __post_init__(self):
        if self.dtype is None:
            if isinstance(self.value, bool):
                object.__setattr__(self, "dtype", DALIDataType.BOOL)
            elif isinstance(self.value, int):
                object.__setattr__(self, "dtype", DALIDataType.INT32)
            elif isinstance(self.value, float):
                object.__setattr__(self, "dtype", DALIDataType.FLOAT)
            else:
                raise TypeError(f"Unsupported scalar constant {self.value!r}")


def Constant(value, dtype=None, shape=None, layout=None, device=None, **kwargs):
    """DALI's ``types.Constant`` — returns a ScalarConstant for scalars or a
    Constant-op DataNode for arrays (reference ``types.py:Constant``)."""
    import numpy as _np

    if shape is None and _np.isscalar(value) and not isinstance(value, (bytes, str)):
        if dtype is not None and device is None:
            return ScalarConstant(value, dtype if isinstance(dtype, DALIDataType) else from_numpy_type(dtype))
        if device is None:
            return ScalarConstant(value)
    # Array constant: lower to the Constant operator (payload kept as
    # fdata/idata so the graph stays serializable, reference generic/constant.cc).
    from . import fn

    arr = _np.asarray(value)
    if dtype is not None:
        arr = arr.astype(to_numpy_type(dtype))
    if shape is not None:
        arr = _np.broadcast_to(arr, shape).copy()
    flat = arr.reshape(-1)
    is_float = _np.issubdtype(arr.dtype, _np.floating)
    return fn.constant(
        fdata=[float(v) for v in flat] if is_float else None,
        idata=None if is_float else [int(v) for v in flat],
        shape=list(arr.shape),
        dtype=from_numpy_type(arr.dtype) if arr.dtype in _FROM_NUMPY else None,
        layout=layout or "",
        device=device or "cpu",
        **kwargs,
    )


# Layout helpers ------------------------------------------------------------

def layout_find_dim(layout: str, dim_name: str) -> int:
    idx = layout.find(dim_name)
    if idx < 0:
        raise ValueError(f"Dimension '{dim_name}' not found in layout '{layout}'")
    return idx


class SampleInfo:
    """Passed to per-sample ``external_source`` callbacks.

    Reference: ``nvidia.dali.types.SampleInfo`` (``types.py``).
    """

    __slots__ = ("idx_in_epoch", "idx_in_batch", "iteration", "epoch_idx")

    def __init__(self, idx_in_epoch, idx_in_batch, iteration, epoch_idx):
        self.idx_in_epoch = idx_in_epoch
        self.idx_in_batch = idx_in_batch
        self.iteration = iteration
        self.epoch_idx = epoch_idx

    def __repr__(self):
        return (
            f"SampleInfo(idx_in_epoch={self.idx_in_epoch}, idx_in_batch={self.idx_in_batch},"
            f" iteration={self.iteration}, epoch_idx={self.epoch_idx})"
        )


class BatchInfo:
    """Passed to per-batch ``external_source`` callbacks (reference ``types.py``)."""

    __slots__ = ("iteration", "epoch_idx")

    def __init__(self, iteration, epoch_idx):
        self.iteration = iteration
        self.epoch_idx = epoch_idx

    def __repr__(self):
        return f"BatchInfo(iteration={self.iteration}, epoch_idx={self.epoch_idx})"

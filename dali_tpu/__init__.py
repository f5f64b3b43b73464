"""dali_tpu — a TPU-native data loading & preprocessing framework.

A from-scratch rebuild of the capabilities of NVIDIA DALI (reference:
``/root/reference``) designed for TPU: the ``@pipeline_def`` graph of ``fn.*``
operators compiles to a host program (readers, decoders, cpu ops — C++/numpy on a
thread pool) plus ONE jitted JAX/XLA device program with Pallas kernels for the hot
image/signal ops, fed through padded-canvas staging; outputs surface as ``jax.Array``s
(optionally globally sharded via ``NamedSharding``).
"""

__version__ = "0.1.0"

from . import types  # noqa: F401
from ._schema import (  # noqa: F401
    DALI_SCHEMA,
    GetSchema,
    OpSpec,
    RegisteredSchemas,
    register_operator,
)
from .data_node import DataNode  # noqa: F401


def _op_call(schema_name, device="cpu", inputs=(), name=None, **kwargs):
    """Create a graph node inside the current pipeline scope; the machinery behind
    every ``fn.*`` call (reference ``ops/__init__.py:553`` python_op_factory)."""
    from .pipeline import Pipeline

    pipe = Pipeline.current()
    if pipe is None:
        raise RuntimeError(
            f"Operator '{schema_name}' invoked outside a pipeline scope. Use "
            "@pipeline_def or `with pipe:`."
        )
    spec = OpSpec(schema_name, device=device, name=name, **kwargs)
    # attach the user's call site for error messages (reference
    # _utils/dali_trace.py source-location propagation)
    import traceback

    for fr in reversed(traceback.extract_stack(limit=12)[:-1]):
        if "dali_tpu" not in (fr.filename or ""):
            spec._extra["_origin"] = f"{fr.filename}:{fr.lineno}"
            break
    for i in inputs:
        if not isinstance(i, DataNode):
            raise TypeError(f"Inputs to '{schema_name}' must be DataNodes, got {type(i)}")
        spec.AddInput(i)
    schema = spec.schema
    n = len(spec.inputs)
    if n < schema.min_inputs or (schema.max_inputs is not None and n > schema.max_inputs):
        raise ValueError(
            f"Operator '{schema_name}' expects between {schema.min_inputs} and "
            f"{schema.max_inputs} inputs, got {n}"
        )
    node = pipe.add_op(spec)
    outs = node.outputs
    return outs[0] if len(outs) == 1 else tuple(outs)


from . import backend  # noqa: E402,F401  (registers all built-in operators)
from . import fn  # noqa: E402,F401
from . import ops  # noqa: E402,F401
from . import math  # noqa: E402,F401
from .external_source import external_source  # noqa: E402,F401
from .pipeline import Pipeline, do_not_convert, pipeline_def  # noqa: E402,F401

# fn.external_source is special-cased (reference external_source.py:1002)
fn.external_source = external_source

from . import tfrecord  # noqa: E402,F401


def _tfrecord_fn(path=None, index_path=None, features=None, name=None, **kwargs):
    """fn.readers.tfrecord returns a dict of DataNodes keyed by feature name
    (reference ops/__init__.py TFRecord special-casing)."""
    if not features:
        raise ValueError("readers.tfrecord requires `features`")
    outs = _op_call(
        "readers.TFRecord",
        device="cpu",
        inputs=(),
        name=name,
        path=path,
        index_path=index_path,
        _features=dict(features),
        **kwargs,
    )
    if not isinstance(outs, tuple):
        outs = (outs,)
    return dict(zip(features.keys(), outs))


fn.readers.tfrecord = _tfrecord_fn

_default_decoders_image = fn.decoders.image


def _decoders_image_fn(*inputs, device=None, hybrid_device_decode=False, hybrid_scale=1,
                       hybrid_chroma_full=False, hybrid_wire="int16", **kwargs):
    """fn.decoders.image with the TPU extension ``hybrid_device_decode``: host
    entropy decode → device IDCT/chroma-upsample/color-convert (the hybrid split
    nvJPEG does on GPU; see native/src/jpeg_coeffs.cc + kernels/jpeg.py).
    ``hybrid_scale`` ∈ {1,2,4} decodes at 1/scale resolution (DCT-domain).
    ``hybrid_wire='int8'`` ships DC as int16 + AC saturated to int8 — half the
    host→device traffic; saturation is a no-op for typical photographic JPEGs."""
    if not hybrid_device_decode:
        return _default_decoders_image(*inputs, device=device, **kwargs)
    if device != "mixed":
        raise ValueError("hybrid_device_decode requires device='mixed'")
    from .types import DALIDataType
    if kwargs.get("dtype", None) not in (None, DALIDataType.UINT8):
        raise ValueError(
            "hybrid_device_decode produces uint8 (8-bit JPEG device IDCT "
            "tail); use hybrid_device_decode=False for dtype conversion")
    if hybrid_scale not in (1, 2, 4):
        raise ValueError(f"hybrid_scale must be 1, 2, or 4 (got {hybrid_scale})")
    if hybrid_wire not in ("int16", "int8"):
        raise ValueError(f"hybrid_wire must be 'int16' or 'int8' (got {hybrid_wire!r})")
    name = kwargs.pop("name", None)
    cache_mb = int(kwargs.pop("cache_size", 0) or 0)
    adj = bool(kwargs.pop("adjust_orientation", True))
    if hybrid_wire == "int8":
        ydc, yac, cdc, cac, q, dims = _op_call(
            "_JpegCoeffsSplit", device="mixed", inputs=inputs, name=name,
            hybrid_scale=hybrid_scale, chroma_full=hybrid_chroma_full,
            cache_size=cache_mb, adjust_orientation=adj,
        )
        return _op_call(
            "_JpegIdctSplit", device="gpu", inputs=[ydc, yac, cdc, cac, q, dims],
            hybrid_scale=hybrid_scale, chroma_full=hybrid_chroma_full,
        )
    y, c, q, dims = _op_call(
        "_JpegCoeffs", device="mixed", inputs=inputs, name=name, hybrid_scale=hybrid_scale,
        chroma_full=hybrid_chroma_full, cache_size=cache_mb,
        adjust_orientation=adj,
    )
    return _op_call(
        "_JpegIdct", device="gpu", inputs=[y, c, q, dims], hybrid_scale=hybrid_scale,
        chroma_full=hybrid_chroma_full,
    )


fn.decoders.image = _decoders_image_fn

_default_decoders_audio = fn.decoders.audio


def _decoders_audio_fn(*inputs, device=None, **kwargs):
    """fn.decoders.audio with a TPU-native ``device='mixed'`` variant: host
    decode, device-resident output. 16-bit PCM rides the wire as int16 and is
    converted to float on device — half the host→device audio bytes
    (backend/audio.py `_AudioStage` + `_AudioToOutput`)."""
    if device != "mixed":
        return _default_decoders_audio(*inputs, device=device, **kwargs)
    name = kwargs.pop("name", None)
    dtype = kwargs.get("dtype", None)
    pcm, rate = _op_call("_AudioStage", device="mixed", inputs=inputs, name=name, **kwargs)
    out_kwargs = {} if dtype is None else {"dtype": dtype}
    audio = _op_call("_AudioToOutput", device="gpu", inputs=[pcm], **out_kwargs)
    return audio, rate


fn.decoders.audio = _decoders_audio_fn

_default_decoders_image_random_crop = fn.decoders.image_random_crop


def _decoders_image_random_crop_fn(*inputs, device=None, hybrid_device_decode=False,
                                   hybrid_scale=1, hybrid_chroma_full=False,
                                   random_area=(0.08, 1.0), random_aspect_ratio=(3 / 4, 4 / 3),
                                   num_attempts=10, seed=-1, **kwargs):
    """fn.decoders.image_random_crop with ``hybrid_device_decode``: the RRC
    window is sampled on the host and ONLY its DCT blocks are entropy-copied
    and transferred — decode output is already the crop (pair with fn.resize
    for full RandomResizedCrop semantics). Window quantization: the decoded
    region snaps to the 16px MCU grid; at hybrid_scale>1 the residual offset
    is quantized to the scale."""
    if not hybrid_device_decode:
        return _default_decoders_image_random_crop(
            *inputs, device=device, random_area=list(random_area),
            random_aspect_ratio=list(random_aspect_ratio), num_attempts=num_attempts,
            seed=seed, **kwargs)
    if device != "mixed":
        raise ValueError("hybrid_device_decode requires device='mixed'")
    from .types import DALIDataType, DALIImageType
    if kwargs.get("output_type", DALIImageType.RGB) != DALIImageType.RGB:
        raise ValueError("hybrid_device_decode produces RGB only")
    if kwargs.get("dtype", None) not in (None, DALIDataType.UINT8):
        raise ValueError(
            "hybrid_device_decode produces uint8 (8-bit JPEG device IDCT "
            "tail); use hybrid_device_decode=False for dtype conversion")
    name = kwargs.pop("name", None)
    outs = _op_call(
        "_JpegCoeffsSplitRRC", device="mixed", inputs=inputs, name=name,
        hybrid_scale=hybrid_scale, chroma_full=hybrid_chroma_full,
        random_area=list(random_area), random_aspect_ratio=list(random_aspect_ratio),
        num_attempts=num_attempts, seed=seed,
        cache_size=int(kwargs.pop("cache_size", 0) or 0),
        adjust_orientation=bool(kwargs.pop("adjust_orientation", True)),
    )
    return _op_call(
        "_JpegIdctSplitRRC", device="gpu", inputs=list(outs),
        hybrid_scale=hybrid_scale, chroma_full=hybrid_chroma_full,
    )


fn.decoders.image_random_crop = _decoders_image_random_crop_fn


def _make_function_op(schema_name, device):
    def wrapper(*inputs, function=None, name=None, **kwargs):
        if function is None:
            raise ValueError(f"{schema_name} requires `function`")
        return _op_call(
            schema_name, device=device, inputs=inputs, name=name, _function=function, **kwargs
        )

    return wrapper


# callables ride the _extra channel (not serialized; reference: PythonFunction
# pipelines are not serializable either)
fn.python_function = _make_function_op("PythonFunction", "cpu")
fn.dl_tensor_python_function = _make_function_op("DLTensorPythonFunction", "cpu")
fn.torch_python_function = _make_function_op("TorchPythonFunction", "cpu")
fn.jax_function = _make_function_op("_JaxFunction", "gpu")

from .external_source import ExternalSource as _ExternalSourceClass  # noqa: E402

ops.ExternalSource = _ExternalSourceClass

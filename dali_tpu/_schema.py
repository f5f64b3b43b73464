"""Operator schema registry — the keystone of the framework.

TPU-native re-design of DALI's ``OpSchema``/``OpSpec``
(reference: ``dali/pipeline/operator/op_schema.h:154``, ``op_spec.h:49``).
Like the reference, the schema registry is the single source of truth that drives:

* the auto-generated ``fn.*`` / ``ops.*`` Python API (reference
  ``dali/python/nvidia/dali/ops/__init__.py:553,722``),
* argument validation, defaults and docs,
* pipeline graph serialization,
* device-placement validation.

Unlike the reference there is no C++/Python split: schemas live in Python (the
graph-building layer is Python), while operator *implementations* may be host-C++,
host-numpy, or device (JAX/Pallas) — the schema records which.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

from . import types as _types


class ArgType:
    """Declared type of a schema argument. Mirrors DALIDataType-based arg typing
    in ``op_schema.h:446`` (AddArg/AddOptionalArg with type tags)."""

    INT = "int"
    FLOAT = "float"
    BOOL = "bool"
    STRING = "str"
    DATA_TYPE = "DALIDataType"  # dtype-valued argument
    IMAGE_TYPE = "DALIImageType"
    INTERP_TYPE = "DALIInterpType"
    INT_VEC = "int_vec"
    FLOAT_VEC = "float_vec"
    STRING_VEC = "str_vec"
    BOOL_VEC = "bool_vec"
    TENSOR_LAYOUT = "layout"
    PYTHON_OBJECT = "object"  # escape hatch (callbacks etc.)


_SCALAR_COERCERS = {
    ArgType.INT: lambda v: int(v),
    ArgType.FLOAT: lambda v: float(v),
    ArgType.BOOL: lambda v: bool(v),
    ArgType.STRING: lambda v: str(v),
    ArgType.TENSOR_LAYOUT: lambda v: str(v),
    ArgType.DATA_TYPE: lambda v: _types.DALIDataType(v),
    ArgType.IMAGE_TYPE: lambda v: _types.DALIImageType(v),
    ArgType.INTERP_TYPE: lambda v: _types.DALIInterpType(v),
    ArgType.PYTHON_OBJECT: lambda v: v,
}

_VEC_COERCERS = {
    ArgType.INT_VEC: lambda v: [int(x) for x in _as_list(v)],
    ArgType.FLOAT_VEC: lambda v: [float(x) for x in _as_list(v)],
    ArgType.STRING_VEC: lambda v: [str(x) for x in _as_list(v)],
    ArgType.BOOL_VEC: lambda v: [bool(x) for x in _as_list(v)],
}


def _as_list(v):
    import numpy as np

    if isinstance(v, (list, tuple)):
        return list(v)
    if isinstance(v, np.ndarray):
        return v.tolist()
    return [v]


@dataclass
class ArgDef:
    """One declared argument (reference ``op_schema.h`` ``ArgumentDef``)."""

    name: str
    type: str
    doc: str = ""
    default: Any = None
    required: bool = False
    tensor_ok: bool = False  # may be passed a DataNode (per-sample "argument input")
    per_sample: bool = False  # when tensor: one value per sample
    internal: bool = False
    deprecated_in_favor_of: Optional[str] = None
    deprecation_msg: Optional[str] = None

    def coerce(self, value):
        from .data_node import DataNode

        if isinstance(value, DataNode):
            if not self.tensor_ok:
                raise TypeError(
                    f"Argument '{self.name}' does not accept a DataNode (tensor argument)."
                )
            return value
        if isinstance(value, _types.ScalarConstant):
            value = value.value
        if value is None:
            return None
        if self.type in _SCALAR_COERCERS:
            return _SCALAR_COERCERS[self.type](value)
        if self.type in _VEC_COERCERS:
            return _VEC_COERCERS[self.type](value)
        return value


class OpSchema:
    """Declarative description of one operator (reference ``op_schema.h:154``)."""

    def __init__(self, name: str):
        self.name = name  # dotted, e.g. "readers.File", "CropMirrorNormalize"
        self.doc = ""
        self.min_inputs = 0
        self.max_inputs = 0
        self.num_outputs: Optional[int] = 1
        self.output_fn: Optional[Callable] = None  # spec -> int (dynamic #outputs)
        self.args: Dict[str, ArgDef] = {}
        self.devices = ("cpu",)  # subset of ("cpu", "mixed", "gpu")
        self.allow_sequences = False
        self.support_volumetric = False
        self.is_internal = False
        self.is_reader = False
        self.is_stateless = True  # participates in checkpointing if False
        self.has_random_seed = False
        self.deprecated_in_favor_of: Optional[str] = None
        self.input_devices: Optional[List[str]] = None  # per-input placement override
        self.input_names: List[str] = []
        self.passthrough = False
        # Common args present on every op (reference: OpSchema default args
        # "seed", "bytes_per_sample_hint", "preserve" — op_schema.cc).
        self.AddOptionalArg("bytes_per_sample_hint", ArgType.INT_VEC, "Output size hint (ignored; XLA allocates).", [0])
        self.AddOptionalArg("preserve", ArgType.BOOL, "Prevent removal from graph even if unused.", False)

    # -- builder API (mirrors reference naming) ------------------------------
    def DocStr(self, doc):
        self.doc = inspect.cleandoc(doc)
        return self

    def NumInput(self, min_n, max_n=None):
        self.min_inputs = min_n
        self.max_inputs = max_n if max_n is not None else min_n
        return self

    def InputNames(self, *names):
        self.input_names = list(names)
        return self

    def NumOutput(self, n):
        self.num_outputs = n
        self.output_fn = None
        return self

    def OutputFn(self, fn):
        self.output_fn = fn
        self.num_outputs = None
        return self

    def AddArg(self, name, type, doc="", per_sample=False, tensor_ok=False):
        self.args[name] = ArgDef(name, type, doc, required=True, tensor_ok=tensor_ok, per_sample=per_sample)
        return self

    def AddOptionalArg(self, name, type, doc="", default=None, per_sample=False, tensor_ok=False):
        self.args[name] = ArgDef(
            name, type, doc, default=default, required=False, tensor_ok=tensor_ok, per_sample=per_sample
        )
        return self

    def AddRandomSeedArg(self):
        """Reference ``op_schema.h:595`` — adds 'seed' and marks op stateful."""
        self.has_random_seed = True
        self.is_stateless = False
        self.AddOptionalArg("seed", ArgType.INT, "Random seed; -1 = derive from pipeline seed.", -1)
        return self

    def DeprecateArg(self, name, in_favor_of=None, msg=None):
        if name not in self.args:
            self.args[name] = ArgDef(name, ArgType.PYTHON_OBJECT)
        self.args[name].deprecated_in_favor_of = in_favor_of
        self.args[name].deprecation_msg = msg or ""
        return self

    def Devices(self, *devices):
        self.devices = tuple(devices)
        return self

    def AllowSequences(self):
        self.allow_sequences = True
        return self

    def SupportVolumetric(self):
        self.support_volumetric = True
        return self

    def MakeInternal(self):
        self.is_internal = True
        return self

    def MakeReader(self):
        """Adds the standard reader arguments (reference ``reader/loader/loader.h:41``
        and ``reader_op.h``): sharding, shuffling, epoch padding."""
        self.is_reader = True
        self.is_stateless = False
        self.AddOptionalArg("shard_id", ArgType.INT, "Index of this shard.", 0)
        self.AddOptionalArg("num_shards", ArgType.INT, "Number of dataset shards.", 1)
        self.AddOptionalArg("random_shuffle", ArgType.BOOL, "Shuffle with an initial-fill buffer.", False)
        self.AddOptionalArg(
            "initial_fill", ArgType.INT, "Size of the shuffling buffer (reference loader.h:79).", 1024
        )
        self.AddOptionalArg("stick_to_shard", ArgType.BOOL, "Do not rotate shards across epochs.", False)
        self.AddOptionalArg("pad_last_batch", ArgType.BOOL, "Pad final batch by repeating the last sample.", False)
        self.AddOptionalArg("lazy_init", ArgType.BOOL, "Defer dataset scan to first run.", False)
        self.AddOptionalArg("read_ahead", ArgType.BOOL, "Read ahead (hint).", False)
        self.AddOptionalArg("prefetch_queue_depth", ArgType.INT, "Reader-side prefetch depth (hint: prefetch happens in the executor's bounded stage queues here).", 1)
        self.AddOptionalArg("skip_cached_images", ArgType.BOOL, "Compatibility no-op.", False)
        self.AddOptionalArg("dont_use_mmap", ArgType.BOOL, "Use plain reads instead of mmap.", False)
        self.AddOptionalArg(
            "shuffle_after_epoch", ArgType.BOOL,
            "Reshuffle the WHOLE dataset every epoch with a global permutation "
            "(all shards see the same order; reference loader.h "
            "shuffle_after_epoch). Mutually amplifying with random_shuffle's "
            "buffer shuffle.", False)
        self.AddOptionalArg(
            "shuffle_after_epoch_seed", ArgType.INT,
            "Dedicated seed for the per-epoch global permutation (-1: derive "
            "from `seed`). Lets multiple readers share one permutation.", -1)
        self.AddOptionalArg(
            "tensor_init_bytes", ArgType.INT,
            "Initial per-sample buffer reservation hint (reference loader.h "
            "tensor_init_bytes). Host buffers here grow on demand; accepted "
            "for compatibility.", 1048576)
        self.AddRandomSeedArg()
        return self

    def MakeStateful(self):
        self.is_stateless = False
        return self

    def Passthrough(self):
        self.passthrough = True
        return self

    def InputDevices(self, *devs):
        self.input_devices = list(devs)
        return self

    # -- queries --------------------------------------------------------------
    def CalculateOutputs(self, spec: "OpSpec") -> int:
        if self.output_fn is not None:
            return self.output_fn(spec)
        return self.num_outputs

    def __repr__(self):
        return f"<OpSchema {self.name}>"


_registry: Dict[str, OpSchema] = {}
_impl_registry: Dict[Tuple[str, str], Any] = {}  # (schema_name, device) -> impl factory
_alias_targets: Dict[str, str] = {}  # alias schema name -> canonical name


def DALI_SCHEMA(name: str) -> OpSchema:
    """Create + register a schema (reference macro ``DALI_SCHEMA``,
    ``op_schema.h``). Returns the schema for builder-style chaining."""
    if name in _registry:
        raise ValueError(f"Schema '{name}' already registered")
    schema = OpSchema(name)
    _registry[name] = schema
    return schema


def GetSchema(name: str) -> OpSchema:
    try:
        return _registry[name]
    except KeyError:
        raise KeyError(f"No schema registered under '{name}'") from None


def TryGetSchema(name: str) -> Optional[OpSchema]:
    return _registry.get(name)


def RegisteredSchemas() -> List[str]:
    return sorted(_registry.keys())


def register_operator(schema_name: str, device: str = "cpu"):
    """Register an operator implementation class for (schema, device).

    Reference: ``DALI_REGISTER_OPERATOR`` (``operator.h:327``). The class is
    instantiated once per graph node at Build time with the resolved OpSpec.
    """

    def deco(cls):
        _impl_registry[(schema_name, device)] = cls
        cls.schema_name = schema_name
        cls.device = device
        return cls

    return deco


def get_operator_impl(schema_name: str, device: str):
    key = (schema_name, device)
    if key in _impl_registry:
        return _impl_registry[key]
    # alias schemas resolve to their canonical op DYNAMICALLY — impls for the
    # target may be registered after the alias was created
    target = _alias_targets.get(schema_name)
    if target is not None and (target, device) in _impl_registry:
        return _impl_registry[(target, device)]
    # "gpu" requests fall back to an op registered for mixed and vice versa is NOT
    # allowed; but cpu-only ops invoked with gpu device raise here.
    raise KeyError(f"No implementation of operator '{schema_name}' for device '{device}'")


def has_operator_impl(schema_name: str, device: str) -> bool:
    if (schema_name, device) in _impl_registry:
        return True
    target = _alias_targets.get(schema_name)
    return target is not None and (target, device) in _impl_registry


class OpSpec:
    """A concrete instantiation of a schema: device + resolved args + inputs.

    Reference: ``dali/pipeline/operator/op_spec.h:49``.
    """

    def __init__(self, schema_name: str, device: str = "cpu", name: Optional[str] = None,
                 _defer_required: bool = False, **kwargs):
        self.schema = GetSchema(schema_name)
        self.schema_name = schema_name
        self.device = device
        self.name = name  # instance name; filled by pipeline if None
        self.args: Dict[str, Any] = {}
        self.arg_inputs: Dict[str, Any] = {}  # tensor-valued args: name -> DataNode
        self.inputs: List[Any] = []  # DataNodes
        self._extra: Dict[str, Any] = {}  # non-serializable implementation payloads

        if device not in self.schema.devices:
            # reference compatibility: readers the reference registers as
            # device='gpu' (video, numpy/GDS) are host producers of
            # device-resident batches here — that is what 'mixed' means
            if (device == "gpu" and "mixed" in self.schema.devices
                    and self.schema.is_reader):
                device = self.device = "mixed"
            else:
                raise ValueError(
                    f"Operator '{schema_name}' does not support device '{device}' "
                    f"(supported: {self.schema.devices})"
                )

        from .data_node import DataNode

        for k, v in kwargs.items():
            if v is None:
                continue
            if k.startswith("_"):
                self._extra[k] = v
                continue
            arg = self.schema.args.get(k)
            if arg is None:
                raise TypeError(f"Operator '{schema_name}' got unexpected argument '{k}'")
            if arg.deprecated_in_favor_of or arg.deprecation_msg is not None:
                import warnings

                warnings.warn(
                    f"Argument '{k}' of '{schema_name}' is deprecated"
                    + (f"; use '{arg.deprecated_in_favor_of}'" if arg.deprecated_in_favor_of
                       else (f": {arg.deprecation_msg}" if arg.deprecation_msg else "")),
                    DeprecationWarning,
                    stacklevel=3,
                )
                if arg.deprecated_in_favor_of:
                    if arg.deprecated_in_favor_of in kwargs:
                        # both the deprecated arg and its replacement given:
                        # storing the old value under the dead key would
                        # silently discard it (no impl reads old keys) —
                        # raise like the reference's op_spec conflict check
                        raise TypeError(
                            f"Operator '{schema_name}' got both deprecated "
                            f"argument '{k}' and its replacement "
                            f"'{arg.deprecated_in_favor_of}'")
                    k = arg.deprecated_in_favor_of
                    arg = self.schema.args[k]
            if isinstance(v, DataNode):
                if not arg.tensor_ok:
                    # this check must live HERE: DataNode kwargs never reach
                    # ArgDef.coerce (they route to arg_inputs), and impls'
                    # GetArgument would silently return the schema default
                    raise TypeError(
                        f"Argument '{k}' of operator '{schema_name}' does "
                        "not accept a per-sample argument input (DataNode); "
                        "pass a constant")
                self.arg_inputs[k] = v
            else:
                self.args[k] = arg.coerce(v)

        if not _defer_required:
            self.validate_required()

    def validate_required(self):
        """Check required args are present (as values or tensor arg inputs).

        ``Graph.deserialize`` constructs specs with ``_defer_required=True``
        because required args supplied as arg INPUTS (DataNodes) are rewired
        after construction, then calls this."""
        for k, arg in self.schema.args.items():
            if arg.required and k not in self.args and k not in self.arg_inputs:
                raise TypeError(
                    f"Operator '{self.schema_name}' missing required argument '{k}'")

    _NO_DEFAULT = object()

    def GetArgument(self, name, default=_NO_DEFAULT):
        if name in self.args:
            return self.args[name]
        arg = self.schema.args.get(name)
        if arg is not None and not arg.required:
            if isinstance(arg.default, (list, dict)):
                # mutable defaults live on the GLOBAL schema registry: hand
                # out a copy so an impl normalizing its args in place cannot
                # corrupt the default for every later pipeline
                return type(arg.default)(arg.default)
            return arg.default
        if default is not OpSpec._NO_DEFAULT:
            return default
        raise KeyError(f"Argument '{name}' not set and has no default")

    def HasArgument(self, name):
        return name in self.args or name in self.arg_inputs

    def AddInput(self, node):
        self.inputs.append(node)
        return self

    def num_outputs(self):
        return self.schema.CalculateOutputs(self)

    def serializable_args(self):
        out = {}
        for k, v in self.args.items():
            if isinstance(v, _types.DALIDataType):
                out[k] = int(v)
            elif isinstance(v, (_types.DALIImageType, _types.DALIInterpType)):
                out[k] = int(v)
            else:
                out[k] = v
        return out

    def __repr__(self):
        return f"<OpSpec {self.schema_name}[{self.device}] name={self.name}>"

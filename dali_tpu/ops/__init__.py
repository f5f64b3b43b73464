"""Auto-generated class-based API (``nvidia.dali.ops`` analogue, reference
``dali/python/nvidia/dali/ops/__init__.py:553`` python_op_factory). Each schema
becomes a class whose constructor captures keyword args and whose ``__call__``
creates the graph node."""

from __future__ import annotations

import sys
import types as _pytypes

from .._schema import GetSchema, RegisteredSchemas


def _make_class(schema_name: str):
    schema = GetSchema(schema_name)

    class Op:
        def __init__(self, *, device=None, name=None, **kwargs):
            self._device = device
            self._name = name
            self._kwargs = kwargs

        def __call__(self, *inputs, **call_kwargs):
            from .. import _op_call

            kwargs = dict(self._kwargs)
            kwargs.update(call_kwargs)
            device = self._device
            if device is None:
                device = "gpu" if any(getattr(i, "device", "cpu") == "gpu" for i in inputs) else "cpu"
                if device not in schema.devices:
                    device = schema.devices[0]
            return _op_call(schema_name, device=device, inputs=inputs, name=self._name, **kwargs)

        @property
        def schema(self):
            return schema

    Op.__name__ = schema_name.rsplit(".", 1)[-1]
    Op.__qualname__ = Op.__name__
    Op.__doc__ = schema.doc
    return Op


def _submodule(parent, name: str):
    full = parent.__name__ + "." + name
    mod = sys.modules.get(full)
    if mod is None:
        mod = _pytypes.ModuleType(full)
        sys.modules[full] = mod
    if not hasattr(parent, name):
        setattr(parent, name, mod)
    return mod


def _populate():
    this = sys.modules[__name__]
    for schema_name in RegisteredSchemas():
        schema = GetSchema(schema_name)
        if schema.is_internal:
            continue
        parts = schema_name.split(".")
        mod = this
        for p in parts[:-1]:
            mod = _submodule(mod, p)
        if not hasattr(mod, parts[-1]):
            setattr(mod, parts[-1], _make_class(schema_name))


_populate()

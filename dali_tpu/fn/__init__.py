"""Auto-generated functional API.

Mirrors ``nvidia.dali.fn`` (reference ``dali/python/nvidia/dali/fn/__init__.py:34``):
every registered schema becomes a snake_case function, nested by its dotted module
path (``readers.File`` → ``fn.readers.file``). Generated from the schema registry —
the same single-source-of-truth mechanism as the reference.
"""

from __future__ import annotations

import re
import sys
import types as _pytypes

from .._schema import GetSchema, RegisteredSchemas


# reference fn/__init__.py:22 — special tokens kept whole
_special_case_mapping = {"b_box": "bbox", "mx_net": "mxnet", "tf_record": "tfrecord"}


def _camel_to_snake(name: str) -> str:
    # reference: fn/__init__.py _to_snake_case + _handle_special_case
    s = re.sub(r"(.)([A-Z][a-z]+)", r"\1_\2", name)
    s = re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", s)
    s = s.lower()
    for k, v in _special_case_mapping.items():
        s = s.replace(k, v)
    return s


def _make_fn(schema_name: str):
    schema = GetSchema(schema_name)

    def op_fn(*inputs, device=None, name=None, **kwargs):
        from .. import _op_call

        if device is None:
            if any(getattr(i, "device", "cpu") == "gpu" for i in inputs):
                device = "gpu"
            else:
                device = "cpu"
            if device not in schema.devices:
                device = schema.devices[0]
        return _op_call(schema_name, device=device, inputs=inputs, name=name, **kwargs)

    op_fn.__name__ = _camel_to_snake(schema_name.rsplit(".", 1)[-1])
    op_fn.__qualname__ = op_fn.__name__
    op_fn.__doc__ = _build_doc(schema)
    op_fn._schema_name = schema_name
    return op_fn


def _build_doc(schema) -> str:
    lines = [schema.doc or f"Operator {schema.name}.", "", f"Supported devices: {', '.join(schema.devices)}", ""]
    if schema.args:
        lines.append("Keyword args")
        lines.append("------------")
        for a in schema.args.values():
            if a.internal:
                continue
            extra = " (tensor argument allowed)" if a.tensor_ok else ""
            default = "" if a.required else f", default={a.default!r}"
            lines.append(f"{a.name} : {a.type}{default}{extra}")
            if a.doc:
                lines.append(f"    {a.doc}")
    return "\n".join(lines)


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
        fn_name = _camel_to_snake(parts[-1])
        if not hasattr(mod, fn_name):
            setattr(mod, fn_name, _make_fn(schema_name))


_populate()

"""Triton Inference Server integration surface.

Reference: ``dali/python/nvidia/dali/plugin/triton.py`` (the ``autoserialize``
marker consumed by the DALI Triton backend's model repository scanner) and
``dali/python/nvidia/dali/_utils/autoserialize.py`` (module-tree discovery +
``invoke_autoserialize``). The backend loads a serialized pipeline file
(``model.dali``) from the model repository; here that file carries the
``dali_tpu.graph.v1`` JSON serialization, which the C API
(``capi/dali_tpu.h``) and ``Pipeline.deserialize`` both consume — the same
embedding contract the reference's Triton backend relies on.

``save_model_repo`` additionally lays out a ready-to-load model-repository
entry (``<repo>/<name>/1/model.dali`` + a minimal ``config.pbtxt``), the
directory structure the Triton DALI backend expects.
"""

from __future__ import annotations

import inspect
import os


def autoserialize(dali_pipeline):
    """Mark a ``@pipeline_def`` for autoserialization in a Triton model
    repository (reference ``plugin/triton.py:16``). Only a ``pipeline_def``
    may be decorated, and only one per module tree."""
    if not getattr(dali_pipeline, "is_pipeline_def", False):
        raise TypeError("Only `@pipeline_def` can be decorated with `@triton.autoserialize`.")
    dali_pipeline._is_autoserialize = True
    return dali_pipeline


def _discover_autoserialize(module, visited):
    """Collect ``@autoserialize``-marked functions from a module tree
    (reference ``_utils/autoserialize.py:22``)."""
    assert module is not None
    ret = []
    try:
        module_members = inspect.getmembers(module)
    except (ModuleNotFoundError, ImportError):
        return ret
    modules = []
    for name, path in module_members:
        obj = getattr(module, name, None)
        if inspect.ismodule(obj) and path not in visited:
            modules.append(name)
            visited.append(path)
        elif inspect.isfunction(obj) and getattr(obj, "_is_autoserialize", False):
            ret.append(obj)
    for mod in modules:
        ret.extend(_discover_autoserialize(getattr(module, mod, None), visited=visited))
    return ret


def invoke_autoserialize(head_module, filename):
    """Find the single ``@autoserialize`` pipeline in ``head_module``'s tree
    and serialize it to ``filename`` (reference
    ``_utils/autoserialize.py:52``)."""
    found = _discover_autoserialize(head_module, visited=[])
    if len(found) > 1:
        raise RuntimeError(
            f"Precisely one autoserialize function must exist in the module. "
            f"Found {len(found)}: {found}."
        )
    if len(found) < 1:
        raise RuntimeError(
            "Precisely one autoserialize function must exist in the module. Found none."
        )
    found[0]().serialize(filename=filename)


def save_model_repo(pipeline, model_repo: str, model_name: str,
                    version: int = 1, max_batch_size: int = None):
    """Write a Triton model-repository entry for a built (or buildable)
    pipeline: ``<repo>/<name>/<version>/model.dali`` plus a minimal
    ``config.pbtxt`` naming the dali backend. Returns the model directory."""
    mdir = os.path.join(model_repo, model_name)
    vdir = os.path.join(mdir, str(int(version)))
    os.makedirs(vdir, exist_ok=True)
    pipeline.serialize(filename=os.path.join(vdir, "model.dali"))
    mbs = max_batch_size if max_batch_size is not None else pipeline.max_batch_size
    with open(os.path.join(mdir, "config.pbtxt"), "w") as f:
        f.write(
            f'name: "{model_name}"\n'
            f'backend: "dali"\n'
            f"max_batch_size: {int(mbs)}\n"
        )
    return mdir

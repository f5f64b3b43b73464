"""Custom-operator plugin loading (reference ``dali/plugin/plugin_manager.h:24``:
dlopen of .so files registering DALI_SCHEMA/DALI_REGISTER_OPERATOR). Here plugins
are Python modules that call ``dali_tpu.DALI_SCHEMA`` / ``register_operator`` at
import time; ``load_library`` imports by path or module name."""

from __future__ import annotations

import importlib
import importlib.util
import os


def load_library(path_or_module: str):
    """Import a plugin module (file path or dotted module name); its top-level
    code registers the schemas/operators."""
    if os.path.exists(path_or_module):
        name = os.path.splitext(os.path.basename(path_or_module))[0]
        spec = importlib.util.spec_from_file_location(f"dali_tpu_plugin_{name}", path_or_module)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    return importlib.import_module(path_or_module)


def load_directory(path: str):
    """Import every .py plugin in a directory (reference LoadDirectory)."""
    mods = []
    for f in sorted(os.listdir(path)):
        if f.endswith(".py") and not f.startswith("_"):
            mods.append(load_library(os.path.join(path, f)))
    return mods

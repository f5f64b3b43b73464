"""Triton plugin surface (reference dali/python/nvidia/dali/plugin/triton.py
+ _utils/autoserialize.py): the @autoserialize marker, module-tree discovery,
and model-repository export consumed by the DALI Triton backend pattern."""

import os
import sys
import types

import numpy as np
import pytest

from dali_tpu import Pipeline, fn, pipeline_def, types as dt
from dali_tpu.plugin import triton


def _make_pipe_def():
    @pipeline_def(batch_size=4, num_threads=1, seed=3)
    def p():
        u = fn.random.uniform(range=[0.0, 1.0], shape=[8])
        return fn.cast(u * 255.0, dtype=dt.UINT8)

    return p


def test_autoserialize_requires_pipeline_def():
    with pytest.raises(TypeError):
        triton.autoserialize(lambda: None)


def test_invoke_autoserialize_discovers_and_serializes(tmp_path):
    mod = types.ModuleType("triton_model_mod")
    mod.pipe = triton.autoserialize(_make_pipe_def())
    out = tmp_path / "model.dali"
    triton.invoke_autoserialize(mod, str(out))
    assert out.exists()
    restored = Pipeline.deserialize(filename=str(out))
    restored.build()
    (o,) = restored.run()
    assert np.asarray(o.at(0)).shape == (8,)


def test_invoke_autoserialize_rejects_zero_or_many(tmp_path):
    empty = types.ModuleType("empty_mod")
    with pytest.raises(RuntimeError):
        triton.invoke_autoserialize(empty, str(tmp_path / "x.dali"))
    two = types.ModuleType("two_mod")
    two.a = triton.autoserialize(_make_pipe_def())
    two.b = triton.autoserialize(_make_pipe_def())
    with pytest.raises(RuntimeError):
        triton.invoke_autoserialize(two, str(tmp_path / "x.dali"))


def test_save_model_repo_layout(tmp_path):
    pipe = _make_pipe_def()()
    mdir = triton.save_model_repo(pipe, str(tmp_path / "repo"), "preproc")
    assert os.path.isfile(os.path.join(mdir, "config.pbtxt"))
    model_file = os.path.join(mdir, "1", "model.dali")
    assert os.path.isfile(model_file)
    cfg = open(os.path.join(mdir, "config.pbtxt")).read()
    assert 'backend: "dali"' in cfg and "max_batch_size: 4" in cfg
    restored = Pipeline.deserialize(filename=model_file)
    restored.build()
    restored.run()

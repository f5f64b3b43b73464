"""Multi-chip data distribution tests on the virtual 8-device CPU mesh —
the single-host stand-in for pod-scale runs (SURVEY §4, §5.8)."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dali_tpu import fn, pipeline_def


def _cpu_devices(n):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} CPU devices (XLA_FLAGS=--xla_force_host_platform_device_count)")
    return devs[:n]


def test_global_array_from_shard_pipelines():
    devs = _cpu_devices(8)
    mesh = Mesh(np.array(devs), ("data",))
    sharding = NamedSharding(mesh, P("data"))

    from dali_tpu.plugin.jax import DALIGenericIterator

    pipes = []
    for i in range(8):
        def src(i=i):
            return np.full((4, 2), i, np.int32)

        @pipeline_def(batch_size=4, num_threads=1, seed=7)
        def pipe(src=src):
            return fn.external_source(source=src, batch=True)

        pipes.append(pipe())

    it = DALIGenericIterator(pipes, ["data"], size=32, sharding=sharding)
    batch = next(it)
    g = batch["data"]
    assert g.shape == (32, 2)
    assert len(g.sharding.device_set) == 8
    # each device shard carries its pipeline's payload
    for shard in g.addressable_shards:
        vals = np.asarray(shard.data)
        assert (vals == vals[0, 0]).all()
    host = np.asarray(g)
    assert sorted(set(host[:, 0].tolist())) == list(range(8))


def test_reader_shards_cover_dataset(jpeg_dataset):
    """shard_id/num_shards partition the dataset without overlap (loader.h math)."""
    seen = []
    for shard in range(4):
        @pipeline_def(batch_size=8, num_threads=1, seed=3)
        def pipe():
            _, labels = fn.readers.file(
                file_root=jpeg_dataset, shard_id=shard, num_shards=4, name="R"
            )
            return labels

        out = pipe().run()[0]
        seen.append({int(out.at(i)[0]) for i in range(8)})
    # 32 files, 4 classes: each shard of 8 = exactly one class directory
    assert [sorted(s) for s in seen] == [[0], [1], [2], [3]]


def test_dryrun_multichip_entrypoint():
    """The driver's multi-chip dry-run: full sharded train step compiles + runs."""
    import importlib.util, os, sys

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _cpu_devices(8)
    mod.dryrun_multichip(8)


@pytest.mark.slow
def test_multiprocess_distributed():
    """2-process jax.distributed cluster (Gloo) assembling global batches —
    the reference TL3_JAX_multiprocess analogue."""
    import os
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(__file__), "..", "tools", "multiprocess_test.py")
    # the outer cap must exceed the launcher's own worker wait (300 s in
    # tools/multiprocess_test.py) — the hybrid phase added two fresh XLA
    # compiles of the full hybrid-decode program (20-60 s each, two
    # processes sharing this one core), so a loaded cold box can push past
    # the old 280 s and must hit the launcher's orderly timeout, not ours
    r = subprocess.run([sys.executable, script, "--port", "12421"], timeout=420,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]


def test_real_hybrid_device_program_sharded_bit_equal():
    """The PRODUCTION sparse-wire device program (nibble/escape decode +
    gather reconstruction + IDCT + resample + CMN — the exact function the
    executor jits per batch) compiles and executes with its batch dim
    sharded over the 8-device mesh, bit-equal to the single-device run
    (VERDICT r4 #2; reference plugin/jax/iterator.py:240-260)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as g

    from dali_tpu import native

    if not (native.available() and native.has_jpeg()):
        pytest.skip("native hybrid decoder unavailable")
    devs = _cpu_devices(8)
    mesh = Mesh(np.array(devs).reshape(4, 2), ("data", "model"))
    assert g.check_real_program_sharded(mesh, "data", batch_size=8)

"""Multi-process data-loading test — single-host stand-in for multi-node
(reference ``qa/TL3_JAX_multiprocess/jax_server.py``/``jax_client.py``).

Each process owns 4 virtual CPU devices and its dataset shards; together they
form one 8-device jax.distributed cluster and assemble globally-sharded batches.

Usage: python tools/multiprocess_test.py  (spawns both processes itself)
       python tools/multiprocess_test.py --proc <i> --port <p>  (worker mode)
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(proc_id: int, port: int):
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    # the axon plugin must not join this cluster
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    sys.path.insert(0, REPO)
    import jax

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=proc_id
    )
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from dali_tpu import fn, pipeline_def
    from dali_tpu.plugin.jax import DALIGenericIterator

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    mesh = Mesh(np.array(jax.devices()), ("data",))
    sharding = NamedSharding(mesh, P("data"))

    local = jax.local_devices()
    pipes = []
    for li, dev in enumerate(local):
        shard_id = proc_id * len(local) + li

        def src(shard_id=shard_id):
            return np.full((2, 3), shard_id, np.int32)

        @pipeline_def(batch_size=2, num_threads=1, seed=1)
        def pipe(src=src):
            return fn.external_source(source=src, batch=True)

        pipes.append(pipe())

    it = DALIGenericIterator(pipes, ["data"], size=64, sharding=sharding)
    batch = next(it)
    g = batch["data"]
    assert g.shape == (16, 3), g.shape
    # each process sees only its addressable shards; verify payloads
    for shard in g.addressable_shards:
        v = np.asarray(shard.data)
        assert (v == v[0, 0]).all()
        assert proc_id * 4 <= v[0, 0] < (proc_id + 1) * 4, v[0, 0]
    # a global collective over the assembled batch proves ICI/DCN-style reduction
    total = jax.jit(lambda x: x.sum(), out_shardings=NamedSharding(mesh, P()))(g)
    expected = sum(s * 6 for s in range(8))
    assert int(total) == expected, (int(total), expected)
    print(f"proc {proc_id}: OK (global sum {int(total)})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--proc", type=int, default=None)
    ap.add_argument("--port", type=int, default=12388)
    args = ap.parse_args()
    if args.proc is not None:
        worker(args.proc, args.port)
        return
    env = dict(os.environ)
    # keep the axon TPU plugin out of the workers' clusters
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep) if "axon" not in p
    )
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--proc", str(i), "--port", str(args.port)],
            cwd=REPO,
            env=env,
        )
        for i in range(2)
    ]
    rc = [p.wait(timeout=300) for p in procs]
    if any(rc):
        raise SystemExit(f"multiprocess test failed: exit codes {rc}")
    print("multiprocess test: OK")


if __name__ == "__main__":
    main()

"""Test configuration: run JAX on a virtual 8-device CPU mesh so the full test
suite (including multi-chip sharding tests) runs without TPU hardware — the
analogue of the reference's single-host multi-GPU emulation (SURVEY §4)."""

import os

# FORCE cpu (the harness env carries JAX_PLATFORMS=axon, so setdefault would
# silently leave tests on the TPU platform).
os.environ["JAX_PLATFORMS"] = "cpu"
# Tests spawn subprocesses (C API smoke, cross-process checkpoint resume,
# multiproc workers). Each fresh interpreter re-registers the axon TPU plugin
# from sitecustomize when PALLAS_AXON_POOL_IPS is set, and initializing that
# plugin dials the shared tunnel — a hard hang when the tunnel is wedged.
# Blank the gate so children skip axon registration and stay pure-CPU.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin registers itself at interpreter startup regardless of
# JAX_PLATFORMS, and creating its client dials the shared tunnel — slow when
# healthy, a hard HANG when the tunnel is wedged. Tests must never ride it:
# drop the factory BEFORE any backend is initialized so jax only ever builds
# the 8-device virtual CPU backend.
import jax  # noqa: E402
from jax._src import xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)

# sitecustomize imports jax at interpreter startup, so jax_platforms was
# already captured from the env (=axon) before this file could touch
# os.environ — update the live config too.
jax.config.update("jax_platforms", "cpu")

try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except Exception:
    pass


@pytest.fixture(scope="session")
def jpeg_dataset(tmp_path_factory):
    """Synthetic ImageNet-like JPEG tree: 4 class dirs × 8 images, varied sizes."""
    import cv2

    root = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(42)
    sizes = [(300, 400), (480, 640), (240, 320), (512, 384)]
    for cls in range(4):
        d = root / f"class{cls}"
        d.mkdir()
        for i in range(8):
            h, w = sizes[(cls + i) % len(sizes)]
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            cv2.imwrite(str(d / f"img_{i}.jpg"), img[:, :, ::-1])
    return str(root)

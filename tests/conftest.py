"""Test configuration: run JAX on a virtual 8-device CPU mesh so the full test
suite (including multi-chip sharding tests) runs without TPU hardware — the
analogue of the reference's single-host multi-GPU emulation (SURVEY §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin registers itself regardless of JAX_PLATFORMS; pin the
# default device to CPU so tests never ride the (slow, shared) TPU tunnel.
import jax  # noqa: E402

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

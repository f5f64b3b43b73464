"""Pallas kernel correctness (interpret mode — runs without TPU hardware)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_cmn_pallas_matches_xla():
    from dali_tpu.kernels.cmn import crop_mirror_normalize
    from dali_tpu.kernels.cmn_pallas import cmn_pallas

    rng = np.random.default_rng(0)
    N, H, W, C = 4, 64, 96, 3
    data = rng.integers(0, 256, (N, H, W, C), np.uint8)
    cy = rng.integers(0, H - 32, N).astype(np.int32)
    cx = rng.integers(0, W - 48 - 8, N).astype(np.int32)
    m = (np.arange(N) % 2).astype(np.int32)
    mean = np.array([120.0, 115.0, 100.0], np.float32)
    std = np.array([60.0, 58.0, 55.0], np.float32)
    a = (1.0 / std).astype(np.float32)
    b = (-mean / std).astype(np.float32)

    out_p = cmn_pallas(
        jnp.asarray(data), jnp.asarray(cy), jnp.asarray(cx), jnp.asarray(m),
        jnp.asarray(a), jnp.asarray(b), crop_h=32, crop_w=48, interpret=True,
    )
    out_x = crop_mirror_normalize(
        jnp.asarray(data), jnp.asarray(cy), jnp.asarray(cx), jnp.asarray(m),
        32, 48, mean, std, 1.0, 0.0, "CHW", jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=1e-5)


def test_cmn_pallas_unaligned_offsets():
    """Sub-tile (non-multiple-of-8) x offsets must be exact via the epilogue shift."""
    from dali_tpu.kernels.cmn_pallas import cmn_pallas

    rng = np.random.default_rng(1)
    N, H, W, C = 2, 40, 72, 3
    data = rng.integers(0, 256, (N, H, W, C), np.uint8)
    cy = np.array([3, 7], np.int32)
    cx = np.array([5, 13], np.int32)  # deliberately unaligned
    m = np.array([0, 0], np.int32)
    a = np.ones(C, np.float32)
    b = np.zeros(C, np.float32)
    out = cmn_pallas(
        jnp.asarray(data), jnp.asarray(cy), jnp.asarray(cx), jnp.asarray(m),
        jnp.asarray(a), jnp.asarray(b), crop_h=16, crop_w=24, interpret=True,
    )
    for i in range(N):
        ref = data[i, cy[i] : cy[i] + 16, cx[i] : cx[i] + 24].astype(np.float32)
        np.testing.assert_allclose(np.asarray(out[i]), ref.transpose(2, 0, 1), atol=1e-5)

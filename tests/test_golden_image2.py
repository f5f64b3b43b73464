"""Second golden-fidelity batch: hue/saturation formulas, one_hot,
lookup_table, grid_mask geometry, warp_perspective vs cv2, equalize vs cv2,
paste placement (continuing the independent-golden program of
test_golden_image.py)."""

import cv2
import numpy as np
import pytest

from dali_tpu import fn, pipeline_def, types

from .test_utils import to_samples


def run_op(samples, body, device):
    @pipeline_def(batch_size=len(samples), num_threads=1, seed=5)
    def p():
        x = fn.external_source(source=lambda: samples, batch=True, cycle=True)
        if device == "gpu":
            x = x.gpu()
        return body(x)

    pipe = p()
    pipe.build()
    return to_samples(pipe.run()[0])


def imgs(n=3, h=40, w=48, seed=0):
    rng = np.random.default_rng(seed)
    return [cv2.resize(rng.integers(0, 256, (h // 4, w // 4, 3), np.uint8),
                       (w, h), interpolation=cv2.INTER_CUBIC) for _ in range(n)]


DEVICES = ("cpu", "gpu")


@pytest.mark.parametrize("device", DEVICES)
def test_one_hot_vs_numpy(device):
    data = [np.array([2], np.int32), np.array([0], np.int32), np.array([4], np.int32)]
    out = run_op(data, lambda x: fn.one_hot(x, num_classes=6), device)
    for s, o in zip(data, out):
        want = np.zeros(6, np.float32)
        want[int(s[0])] = 1
        np.testing.assert_array_equal(np.asarray(o, np.float32).reshape(-1), want)


@pytest.mark.parametrize("device", DEVICES)
def test_lookup_table_vs_numpy(device):
    rng = np.random.default_rng(1)
    data = [rng.integers(0, 10, (7, 5), np.uint8) for _ in range(2)]
    keys = [0, 3, 7]
    values = [10.0, 30.0, 70.0]
    out = run_op(data, lambda x: fn.lookup_table(
        x, keys=keys, values=values, default_value=-1.0, dtype=types.FLOAT), device)
    lut = np.full(256, -1.0, np.float32)
    for k, v in zip(keys, values):
        lut[k] = v
    for s, o in zip(data, out):
        np.testing.assert_array_equal(np.asarray(o), lut[s])


@pytest.mark.parametrize("device", DEVICES)
def test_hue_rotation_preserves_luma(device):
    """fn.hue rotates chroma about the luma axis (reference hsv.h math):
    BT.601 luma must be preserved to rounding."""
    src = imgs(seed=3)
    out = run_op(src, lambda x: fn.hue(x, hue=90.0), device)

    def luma(a):
        f = a.astype(np.float64)
        return 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]

    for s, o in zip(src, out):
        changed = np.abs(s.astype(int) - np.asarray(o).astype(int)).mean()
        assert changed > 1.0  # hue actually rotated
        assert np.abs(luma(s) - luma(np.asarray(o))).mean() < 2.0


@pytest.mark.parametrize("device", DEVICES)
def test_saturation_zero_is_grayscale(device):
    src = imgs(seed=4)
    out = run_op(src, lambda x: fn.saturation(x, saturation=0.0), device)
    for o in out:
        o = np.asarray(o).astype(np.int32)
        # all channels equal (gray) within rounding
        assert np.abs(o[..., 0] - o[..., 1]).max() <= 2
        assert np.abs(o[..., 1] - o[..., 2]).max() <= 2


@pytest.mark.parametrize("device", DEVICES)
def test_grid_mask_geometry(device):
    src = [np.full((64, 64, 3), 200, np.uint8)]
    out = run_op(src, lambda x: fn.grid_mask(
        x, tile=32, ratio=0.5, angle=0.0, shift_x=0.0, shift_y=0.0), device)
    o = np.asarray(out[0])
    masked = (o == 0).all(-1)
    frac = masked.mean()
    # ratio 0.5 → a quarter of each tile masked... reference semantics: the
    # masked square is (ratio*tile)^2 per tile^2 = 0.25
    assert 0.15 < frac < 0.35, frac
    # periodicity: pattern repeats with the tile size
    np.testing.assert_array_equal(masked[:32, :32], masked[32:, 32:])


@pytest.mark.parametrize("device", DEVICES)
def test_warp_perspective_vs_cv2(device):
    src = imgs(h=50, w=50, seed=5)
    m = np.array([[1.05, 0.1, -2.0], [0.02, 0.95, 1.0], [0.0005, -0.0002, 1.0]],
                 np.float32)
    out = run_op(src, lambda x: fn.experimental.warp_perspective(
        x, matrix=list(m.ravel()), interp_type=types.INTERP_LINEAR), device)
    for s, o in zip(src, out):
        g = cv2.warpPerspective(s, m, (50, 50),
                                flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
                                borderMode=cv2.BORDER_CONSTANT)
        diff = np.abs(np.asarray(o).astype(np.int32) - g.astype(np.int32))
        assert diff.mean() < 2.0 and (diff > 8).mean() < 0.03, (
            diff.mean(), (diff > 8).mean())


@pytest.mark.parametrize("device", DEVICES)
def test_equalize_vs_pil(device):
    """Histogram equalization follows PIL's ImageOps.equalize (the reference
    auto_aug convention) — bit-exact on cpu, near-exact on gpu."""
    from PIL import Image, ImageOps

    rng = np.random.default_rng(6)
    src = [cv2.resize(rng.integers(40, 200, (10, 12), np.uint8), (48, 40),
                      interpolation=cv2.INTER_CUBIC)[..., None] for _ in range(2)]
    out = run_op(src, lambda x: fn.experimental.equalize(x), device)
    for s, o in zip(src, out):
        g = np.asarray(ImageOps.equalize(Image.fromarray(s[..., 0])))[..., None]
        diff = np.abs(np.asarray(o).astype(np.int32) - g.astype(np.int32))
        assert diff.max() <= (0 if device == "cpu" else 1), diff.max()


@pytest.mark.parametrize("device", DEVICES)
def test_paste_placement(device):
    src = [np.full((10, 10, 3), 50, np.uint8)]
    out = run_op(src, lambda x: fn.paste(
        x, ratio=2.0, fill_value=[7, 8, 9], paste_x=0.0, paste_y=0.0), device)
    o = np.asarray(out[0])
    assert o.shape == (20, 20, 3)
    np.testing.assert_array_equal(o[:10, :10], src[0])  # pasted at origin
    np.testing.assert_array_equal(o[15, 15], [7, 8, 9])  # fill elsewhere

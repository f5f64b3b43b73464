"""Depth coverage for families VERDICT r1 flagged as one-assertion-tested:
every reduction variant vs numpy, transforms composition algebra, Pad
policies (align/shape/axes), noise distribution moments, segmentation edge
cases. Mirrors the reference's per-family operator test dirs
(dali/test/python/operator_1/, operator_2/)."""

import numpy as np
import pytest

from dali_tpu import fn, pipeline_def, types

from .test_utils import to_samples


def run(body, sources, device="cpu", seed=3):
    @pipeline_def(batch_size=len(sources), num_threads=1, seed=seed)
    def p():
        x = fn.external_source(source=lambda: sources, batch=True, cycle=True)
        if device == "gpu":
            x = x.gpu()
        out = body(x)
        return out

    pipe = p()
    pipe.build()
    res = pipe.run()
    return [to_samples(tl) for tl in res]


# ------------------------------ reductions ------------------------------

REDUCE_GOLDEN = {
    "sum": lambda a, ax: a.sum(ax),
    "mean": lambda a, ax: a.mean(ax),
    "max": lambda a, ax: a.max(ax),
    "min": lambda a, ax: a.min(ax),
    "mean_square": lambda a, ax: (a.astype(np.float64) ** 2).mean(ax),
    "rms": lambda a, ax: np.sqrt((a.astype(np.float64) ** 2).mean(ax)),
    "std_dev": None,  # two-input form tested separately
    "variance": None,
}


@pytest.mark.parametrize("name", ["sum", "mean", "max", "min", "mean_square", "rms"])
@pytest.mark.parametrize("axes", [[0], [1], [0, 1], None])
@pytest.mark.parametrize("device", ["cpu", "gpu"])
def test_reduction_vs_numpy(name, axes, device):
    rng = np.random.default_rng(1)
    data = [rng.standard_normal((6, 9)).astype(np.float32) * 4 for _ in range(3)]
    op = getattr(fn.reductions, name)
    out = run(lambda x: op(x, axes=axes), data, device)[0]
    golden = REDUCE_GOLDEN[name]
    ax = tuple(axes) if axes else None
    for s, o in zip(data, out):
        np.testing.assert_allclose(np.asarray(o), golden(s, ax), rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("device", ["cpu", "gpu"])
@pytest.mark.parametrize("ddof", [0, 1])
def test_stddev_variance_two_input(device, ddof):
    rng = np.random.default_rng(2)
    data = [rng.standard_normal((5, 7)).astype(np.float32) for _ in range(2)]

    def body(x):
        m = fn.reductions.mean(x, axes=[0, 1])
        return (fn.reductions.std_dev(x, m, axes=[0, 1], ddof=ddof),
                fn.reductions.variance(x, m, axes=[0, 1], ddof=ddof))

    sd, var = run(body, data, device)
    for s, o_sd, o_var in zip(data, sd, var):
        want_var = s.var(ddof=ddof)
        np.testing.assert_allclose(np.asarray(o_var), want_var, rtol=3e-4)
        np.testing.assert_allclose(np.asarray(o_sd), np.sqrt(want_var), rtol=3e-4)


def test_reduction_keep_dims_and_dtype():
    rng = np.random.default_rng(3)
    data = [rng.integers(0, 100, (4, 5), np.uint8) for _ in range(2)]
    out = run(lambda x: fn.reductions.sum(x, axes=[1], keep_dims=True,
                                          dtype=types.INT64), data)[0]
    for s, o in zip(data, out):
        assert np.asarray(o).shape == (4, 1)
        assert np.asarray(o).dtype == np.int64
        np.testing.assert_array_equal(np.asarray(o)[:, 0], s.sum(1))


# ------------------------------ transforms ------------------------------


def _apply_affine(m, pts):
    return pts @ m[:, :2].T + m[:, 2]


def test_transforms_composition_algebra():
    """transforms.* chained via the MT input compose as matrix products
    (reference transform ops' combine semantics)."""
    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def p():
        t = fn.transforms.translation(offset=[2.0, 3.0])
        r = fn.transforms.rotation(angle=90.0)
        s = fn.transforms.scale(t, scale=[2.0, 0.5])  # scale AFTER translation
        c = fn.transforms.combine(t, r)
        return t, r, s, c

    pipe = p()
    pipe.build()
    t, r, s, c = [np.asarray(tl.at(0)) for tl in pipe.run()]
    assert t.shape == (2, 3) and r.shape == (2, 3)
    pts = np.array([[1.0, 0.0], [0.0, 1.0], [2.0, 2.0]])
    # translation
    np.testing.assert_allclose(_apply_affine(t, pts), pts + [2, 3], atol=1e-5)
    # rotation by 90deg about origin: (x, y) -> (-y, x)
    np.testing.assert_allclose(_apply_affine(r, pts),
                               np.stack([-pts[:, 1], pts[:, 0]], 1), atol=1e-5)
    # scale(t): first translate then scale
    np.testing.assert_allclose(_apply_affine(s, pts), (pts + [2, 3]) * [2.0, 0.5],
                               atol=1e-5)
    # combine(t, r): r AFTER t
    np.testing.assert_allclose(_apply_affine(c, pts),
                               _apply_affine(r, _apply_affine(t, pts)), atol=1e-5)


def test_transforms_shear_and_crop():
    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def p():
        sh = fn.transforms.shear(shear=[0.5, 0.0])
        cr = fn.transforms.crop(from_start=[10.0, 20.0], from_end=[20.0, 40.0],
                                to_start=[0.0, 0.0], to_end=[1.0, 1.0])
        return sh, cr

    pipe = p()
    pipe.build()
    sh, cr = [np.asarray(tl.at(0)) for tl in pipe.run()]
    pts = np.array([[1.0, 1.0]])
    np.testing.assert_allclose(_apply_affine(sh, pts), [[1.5, 1.0]], atol=1e-5)
    np.testing.assert_allclose(_apply_affine(cr, np.array([[10.0, 20.0]])),
                               [[0.0, 0.0]], atol=1e-5)
    np.testing.assert_allclose(_apply_affine(cr, np.array([[20.0, 40.0]])),
                               [[1.0, 1.0]], atol=1e-5)


# ------------------------------ Pad policies ------------------------------


@pytest.mark.parametrize("device", ["cpu", "gpu"])
def test_pad_align_policy(device):
    rng = np.random.default_rng(4)
    data = [rng.integers(0, 255, (s, 3), np.uint8) for s in (5, 9, 7)]
    out = run(lambda x: fn.pad(x, axes=[0], align=[4], fill_value=3), data, device)[0]
    for o in out:
        assert o.shape[0] == 12  # max 9 -> aligned up to 12
    np.testing.assert_array_equal(out[0][5:], np.full((7, 3), 3, np.uint8))


@pytest.mark.parametrize("device", ["cpu", "gpu"])
def test_pad_min_shape_policy(device):
    rng = np.random.default_rng(5)
    data = [rng.integers(0, 255, (4, 2), np.uint8) for _ in range(2)]
    out = run(lambda x: fn.pad(x, axes=[0], shape=[10], fill_value=0), data, device)[0]
    for o in out:
        assert o.shape == (10, 2)


def test_pad_multiple_axes():
    rng = np.random.default_rng(6)
    data = [rng.integers(0, 255, (3, 4), np.uint8),
            rng.integers(0, 255, (5, 2), np.uint8)]
    out = run(lambda x: fn.pad(x, fill_value=9), data)[0]
    assert all(o.shape == (5, 4) for o in out)
    np.testing.assert_array_equal(out[0][3:], np.full((2, 4), 9, np.uint8))
    np.testing.assert_array_equal(out[1][:, 2:], np.full((5, 2), 9, np.uint8))


# ------------------------------ noise moments ------------------------------


@pytest.mark.parametrize("device", ["cpu", "gpu"])
def test_gaussian_noise_moments(device):
    base = [np.full((80, 80), 100.0, np.float32) for _ in range(2)]
    out = run(lambda x: fn.noise.gaussian(x, mean=5.0, stddev=12.0), base, device,
              seed=11)[0]
    flat = np.concatenate([np.asarray(o).ravel() for o in out])
    assert abs(flat.mean() - 105.0) < 0.5
    assert abs(flat.std() - 12.0) < 0.5


@pytest.mark.parametrize("device", ["cpu", "gpu"])
def test_salt_and_pepper_moments(device):
    # trailing dim = channels: per-pixel noise needs an explicit channel axis
    base = [np.full((100, 100, 1), 128, np.uint8) for _ in range(2)]
    out = run(lambda x: fn.noise.salt_and_pepper(x, prob=0.2, salt_vs_pepper=0.5),
              base, device, seed=12)[0]
    flat = np.concatenate([np.asarray(o).ravel() for o in out])
    frac_salt = (flat == 255).mean()
    frac_pepper = (flat == 0).mean()
    assert abs(frac_salt - 0.1) < 0.02, frac_salt
    assert abs(frac_pepper - 0.1) < 0.02, frac_pepper
    assert ((flat == 128) | (flat == 0) | (flat == 255)).all()


def test_uniform_and_normal_moments():
    @pipeline_def(batch_size=4, num_threads=1, seed=13)
    def p():
        u = fn.random.uniform(range=[-3.0, 7.0], shape=[4000])
        g = fn.random.normal(mean=2.0, stddev=0.5, shape=[4000])
        return u, g

    pipe = p()
    pipe.build()
    u, g = [np.concatenate([np.asarray(tl.at(i)) for i in range(4)])
            for tl in pipe.run()]
    assert abs(u.mean() - 2.0) < 0.15 and u.min() >= -3.0 and u.max() < 7.0
    # uniform variance = (b-a)^2/12
    assert abs(u.var() - 100 / 12) < 0.4
    assert abs(g.mean() - 2.0) < 0.05 and abs(g.std() - 0.5) < 0.03


# ------------------------------ segmentation edges ------------------------------


def test_select_masks_empty_and_reindex():
    polygons = [np.array([[0, 0, 3], [1, 3, 6], [2, 6, 9]], np.int32)]
    vertices = [np.arange(18, dtype=np.float32).reshape(9, 2)]
    ids = [np.array([2, 0], np.int32)]

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def p():
        polys = fn.external_source(source=lambda: polygons, batch=True, cycle=True)
        verts = fn.external_source(source=lambda: vertices, batch=True, cycle=True)
        mask_ids = fn.external_source(source=lambda: ids, batch=True, cycle=True)
        return fn.segmentation.select_masks(mask_ids, polys, verts, reindex_masks=True)

    pipe = p()
    pipe.build()
    out_p, out_v = pipe.run()
    sel = np.asarray(out_p.at(0))
    assert sel.shape[0] == 2
    # polygons keep INPUT order; reindex replaces ids with their position in
    # mask_ids ([2, 0] -> poly0 gets 1, poly2 gets 0) — reference select_masks
    assert list(sel[:, 0]) == [1, 0]
    v = np.asarray(out_v.at(0))
    np.testing.assert_allclose(v[:3], vertices[0][0:3])
    np.testing.assert_allclose(v[3:], vertices[0][6:9])


def test_random_mask_pixel_foreground():
    mask = np.zeros((20, 20), np.uint8)
    mask[5:8, 11:14] = 1

    @pipeline_def(batch_size=1, num_threads=1, seed=21)
    def p():
        m = fn.external_source(source=lambda: [mask], batch=True, cycle=True)
        return fn.segmentation.random_mask_pixel(m, foreground=1)

    pipe = p()
    pipe.build()
    for _ in range(5):
        c = np.asarray(pipe.run()[0].at(0))
        assert mask[c[0], c[1]] == 1


@pytest.mark.parametrize("device", ["cpu", "gpu"])
def test_pad_shape_indexed_by_axes(device):
    """`shape` entries correspond to positions in `axes` (reference Pad);
    regression for a bug where shape[k] was applied to raw dim k."""
    rng = np.random.default_rng(7)
    data = [rng.integers(0, 255, (3, 4), np.uint8) for _ in range(2)]
    out = run(lambda x: fn.pad(x, axes=[1], shape=[9], fill_value=1), data, device)[0]
    for o in out:
        assert o.shape == (3, 9), o.shape


def test_numba_function_batch_processing():
    """batch_processing=True passes LISTS of samples (the reference numba
    batch contract), not per-sample arrays."""
    def run_fn(outs, ins):
        assert isinstance(outs, list) and isinstance(ins, list)
        for o, i in zip(outs, ins):
            o[:] = i * 3

    data = [np.arange(4, dtype=np.int32), np.arange(6, dtype=np.int32)]

    @pipeline_def(batch_size=2, num_threads=1, seed=1)
    def p():
        x = fn.external_source(source=lambda: data, batch=True, cycle=True)
        return fn.numba_function(x, run_fn=run_fn, out_types=[int(types.INT32)],
                                 in_types=[int(types.INT32)], outs_ndim=[1],
                                 ins_ndim=[1], batch_processing=True)

    pipe = p()
    pipe.build()
    out = pipe.run()[0]
    for i, d in enumerate(data):
        np.testing.assert_array_equal(out.at(i), d * 3)


def test_staging_ring_depth_tracks_prefetch_queue():
    """The wire-buffer ring must cover every in-flight staged iteration
    (cpu_queue_depth + 2); a deeper queue gets a deeper ring."""
    from dali_tpu import native

    if not native.available():
        pytest.skip("native runtime not built")
    import cv2

    import tempfile, os
    root = tempfile.mkdtemp()
    os.makedirs(f"{root}/c")
    rng = np.random.default_rng(0)
    for i in range(8):
        cv2.imwrite(f"{root}/c/{i}.jpg", rng.integers(0, 255, (64, 64, 3), np.uint8),
                    [cv2.IMWRITE_JPEG_QUALITY, 90])

    @pipeline_def(batch_size=2, num_threads=1, seed=1,
                  prefetch_queue_depth={"cpu_size": 3, "gpu_size": 2})
    def p():
        jp, _ = fn.readers.file(file_root=root, name="r")
        img = fn.decoders.image_random_crop(jp, device="mixed",
                                            hybrid_device_decode=True)
        return fn.resize(img, resize_x=32, resize_y=32)

    pipe = p()
    pipe.build()
    for _ in range(6):
        pipe.run()
    rrc = next(i for i in pipe._executor.impls.values()
               if type(i).__name__ == "JpegCoeffsSplitRRC")
    assert rrc._ring.depth >= 5  # cpu_size 3 + building + in-transfer

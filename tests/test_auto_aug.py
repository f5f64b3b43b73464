"""AutoAugment / RandAugment / TrivialAugment tests (reference
``dali/test/python/auto_aug/``)."""

import numpy as np
import pytest

from dali_tpu import fn, pipeline_def, types
from dali_tpu import auto_aug
from dali_tpu.auto_aug import augmentations as a


def _src(n=4, h=32, w=32, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, (n, h, w, 3), np.uint8)
    return (lambda: data), data


def _run(build, bs=4):
    @pipeline_def(batch_size=bs, num_threads=2, seed=42, enable_conditionals=True)
    def pipe():
        return build()

    p = pipe()
    outs = p.run()
    res = []
    for tl in outs:
        tl = tl.as_cpu() if hasattr(tl, "as_cpu") else tl
        res.append(np.stack([tl.at(i) for i in range(len(tl))]))
    return res


def test_single_augmentations_run():
    cb, data = _src()

    def build():
        imgs = fn.external_source(source=cb, batch=True, layout="HWC").gpu()
        outs = []
        for aug in (a.invert, a.equalize, a.auto_contrast, a.identity):
            outs.append(aug(imgs))
        outs.append(a.solarize(imgs, magnitude_bin=5, num_magnitude_bins=11))
        outs.append(a.posterize(imgs, magnitude_bin=2, num_magnitude_bins=5))
        outs.append(a.brightness(imgs, magnitude_bin=8, num_magnitude_bins=11))
        return tuple(outs)

    outs = _run(build)
    cb2, data2 = _src()
    np.testing.assert_array_equal(outs[0], 255 - data2)  # invert
    np.testing.assert_array_equal(outs[3], data2)  # identity
    for o in outs:
        assert o.shape == data2.shape and o.dtype == np.uint8


def test_rand_augment_runs_and_varies():
    cb, data = _src(n=8)

    def build():
        imgs = fn.external_source(source=cb, batch=True, layout="HWC").gpu()
        return auto_aug.rand_augment(imgs, n=2, m=15)

    (out,) = _run(build, bs=8)
    assert out.shape == data.shape
    # at least some samples changed
    changed = sum(not np.array_equal(out[i], data[i]) for i in range(8))
    assert changed >= 6


def test_trivial_augment_runs():
    cb, data = _src(n=4)

    def build():
        imgs = fn.external_source(source=cb, batch=True, layout="HWC").gpu()
        return auto_aug.trivial_augment_wide(imgs)

    (out,) = _run(build)
    assert out.shape == data.shape


@pytest.mark.slow
def test_auto_augment_image_net_policy():
    cb, data = _src(n=4)

    def build():
        imgs = fn.external_source(source=cb, batch=True, layout="HWC").gpu()
        return auto_aug.auto_augment_image_net(imgs)

    (out,) = _run(build)
    assert out.shape == data.shape
    assert out.dtype == np.uint8


def test_augmentation_decorator():
    from dali_tpu.auto_aug import augmentation

    @augmentation(mag_range=(0, 10), randomly_negate=False)
    def my_aug(data, param):
        return data

    assert my_aug.name == "my_aug"
    mags = my_aug._magnitudes(11)
    np.testing.assert_allclose(mags, np.arange(11.0))
    tweaked = my_aug.augmentation(mag_range=(5, 15), name="other")
    assert tweaked.name == "other"
    np.testing.assert_allclose(tweaked._magnitudes(11), np.arange(5.0, 16.0))

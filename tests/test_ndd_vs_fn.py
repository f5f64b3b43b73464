"""Dynamic (ndd) mode vs pipeline (fn) mode parity — the analogue of the
reference's dedicated ndd_vs_fn suite (dali/test/python/ndd_vs_fn/): the
same operator invoked eagerly and through a compiled pipeline must produce
identical results on identical inputs."""

import numpy as np
import pytest

import dali_tpu.experimental.dynamic as ndd
from dali_tpu import fn, pipeline_def, types

from .test_utils import to_samples


def imgs(n=3, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (int(rng.integers(20, 40)),
                                  int(rng.integers(20, 40)), 3), np.uint8)
            for _ in range(n)]


def pipeline_run(body, samples, device):
    @pipeline_def(batch_size=len(samples), num_threads=1, seed=7)
    def p():
        x = fn.external_source(source=lambda: samples, batch=True, cycle=True,
                               layout="HWC" if samples[0].ndim == 3 else "")
        if device == "gpu":
            x = x.gpu()
        return body(fn, x)

    pipe = p()
    pipe.build()
    return [to_samples(tl) for tl in ([o for o in pipe.run()])]


def ndd_run(body, samples, device):
    x = ndd.as_batch(samples, layout="HWC")
    if device == "gpu":
        x = x.gpu()
    out = body(ndd, x)
    out = out if isinstance(out, tuple) else (out,)
    return [[np.asarray(o.cpu().at(i)) for i in range(len(o))] for o in out]


CASES = {
    "flip": lambda m, x: m.flip(x, horizontal=1, vertical=1),
    "resize": lambda m, x: m.resize(x, resize_x=24, resize_y=24,
                                    interp_type=types.INTERP_LINEAR),
    "crop_mirror_normalize": lambda m, x: m.crop_mirror_normalize(
        x, crop=(16, 16), mean=[10.0] * 3, std=[9.0] * 3, dtype=types.FLOAT,
        output_layout="CHW"),
    "gaussian_blur": lambda m, x: m.gaussian_blur(x, sigma=1.1),
    "brightness_contrast": lambda m, x: m.brightness_contrast(
        x, brightness=1.1, contrast=0.9),
    "color_space_conversion": lambda m, x: m.color_space_conversion(
        x, image_type=types.RGB, output_type=types.GRAY),
    "warp_affine": lambda m, x: m.warp_affine(
        x, matrix=[1.0, 0.1, 0.0, 0.0, 1.0, 2.0]),
    "rotate": lambda m, x: m.rotate(x, angle=90.0, interp_type=types.INTERP_NN),
    "transpose": lambda m, x: m.transpose(x, perm=[2, 0, 1]),
    "erase": lambda m, x: m.erase(x, anchor=[2.0, 2.0], shape=[5.0, 5.0],
                                  axis_names="HW"),
    "cast": lambda m, x: m.cast(x, dtype=types.FLOAT),
    "laplacian": lambda m, x: m.laplacian(x, window_size=3, dtype=types.FLOAT),
}


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("device", ["cpu", "gpu"])
def test_ndd_matches_fn(name, device):
    body = CASES[name]
    samples = imgs(seed=hash(name) % 1000)
    a = pipeline_run(body, samples, device)
    b = ndd_run(body, samples, device)
    assert len(a) == len(b)
    for ta, tb in zip(a, b):
        for sa, sb in zip(ta, tb):
            # integer outputs may differ by 1 LSB: the padded canvas differs
            # between modes, so resampling tap weights round differently
            tol = 1.0 if np.issubdtype(np.asarray(sa).dtype, np.integer) else 1e-4
            np.testing.assert_allclose(np.asarray(sa, np.float64),
                                       np.asarray(sb, np.float64), atol=tol)


def test_ndd_audio_chain_matches_fn():
    rng = np.random.default_rng(4)
    clips = [rng.standard_normal(4000).astype(np.float32) * 0.3 for _ in range(2)]

    def body(m, x):
        x = m.preemphasis_filter(x, preemph_coeff=0.97)
        s = m.spectrogram(x, nfft=256, window_length=200, window_step=80)
        mel = m.mel_filter_bank(s, sample_rate=16000.0, nfilter=32)
        return m.to_decibels(mel, multiplier=10.0, cutoff_db=-80.0)

    a = pipeline_run(body, clips, "gpu")
    b = ndd_run(body, clips, "gpu")
    for sa, sb in zip(a[0], b[0]):
        np.testing.assert_allclose(sa, sb, atol=1e-3, rtol=1e-4)


def test_ndd_reduction_matches_fn():
    rng = np.random.default_rng(5)
    data = [rng.standard_normal((7, 5)).astype(np.float32) for _ in range(3)]

    def body(m, x):
        return m.reductions.mean(x, axes=[0, 1])

    for device in ("cpu", "gpu"):
        a = pipeline_run(body, data, device)
        b = ndd_run(body, data, device)
        for sa, sb in zip(a[0], b[0]):
            np.testing.assert_allclose(np.asarray(sa), np.asarray(sb), rtol=1e-5)


def test_ndd_capture_compiles_and_matches_eager():
    samples = imgs(seed=42)

    @ndd.capture
    def frontend(x):
        x = ndd.resize(x, resize_x=16, resize_y=16)
        return ndd.crop_mirror_normalize(x, mean=[0.0] * 3, std=[1.0] * 3,
                                         dtype=types.FLOAT, output_layout="CHW")

    captured = frontend(ndd.as_batch(samples, layout="HWC"))
    # second call reuses the compiled pipeline
    captured2 = frontend(ndd.as_batch(samples, layout="HWC"))
    assert len(frontend._captured_pipelines) == 1

    eager = ndd.crop_mirror_normalize(
        ndd.resize(ndd.as_batch(samples, layout="HWC").gpu(),
                   resize_x=16, resize_y=16),
        mean=[0.0] * 3, std=[1.0] * 3, dtype=types.FLOAT, output_layout="CHW")
    for i in range(len(samples)):
        np.testing.assert_allclose(captured.cpu().at(i), eager.cpu().at(i), atol=1e-4)
        np.testing.assert_allclose(captured2.cpu().at(i), eager.cpu().at(i), atol=1e-4)

"""Checkpoint-resume sweep: EVERY seeded (RNG-carrying) op resumes to the
bit-identical continuation stream.

The reference's checkpointing suite covers each random-family op one by one
(dali/test/python/checkpointing/test_dali_checkpointing.py, the
`check_single_*_pipeline_checkpointing` helpers); this sweep enumerates the
schema registry instead so newly added RNG ops are covered automatically.
Pattern per op: run K iterations, checkpoint, run M more ("expected"), then
rebuild from the checkpoint and compare M continuation iterations bit-exactly.
"""

import numpy as np
import pytest

from dali_tpu import fn, pipeline_def, types
from dali_tpu._schema import _registry

from .test_utils import to_samples

BATCH = 4

_rng = np.random.default_rng(42)
_IMG = _rng.integers(0, 256, (24, 20, 3), np.uint8)
_MASK = (_rng.random((16, 16)) > 0.6).astype(np.uint8)
# two separated blobs -> the random object pick actually varies the bbox
_LABELMAP = np.zeros((16, 16), np.int32)
_LABELMAP[2:5, 2:6] = 1
_LABELMAP[9:14, 8:12] = 2
_LABELMAP[1:3, 11:14] = 3
# two small boxes (ltrb in [0,1]): random windows pass/fail the overlap
# filters differently per draw, so crops genuinely vary
_BOXES = np.array([[0.1, 0.1, 0.4, 0.45],
                   [0.55, 0.5, 0.85, 0.9]], np.float32)
_LABELS = np.arange(1, 3, dtype=np.int32)

# Per-op harness spec: inputs (list of constant sample arrays; layout per
# input) and kwargs. Ops absent here run with no inputs and no kwargs.
SPECS = {
    "Jitter": dict(inputs=[(_IMG, "HWC")]),
    "noise.Gaussian": dict(inputs=[(_IMG, "HWC")]),
    "noise.SaltAndPepper": dict(inputs=[(_IMG, "HWC")]),
    "noise.Shot": dict(inputs=[(_IMG, "HWC")]),
    "RandomResizedCrop": dict(inputs=[(_IMG, "HWC")], kwargs={"size": [16, 16]}),
    "RandomCropGenerator": dict(
        inputs=[(np.array([48, 64, 3], np.int64), "")]),
    # default scaling/aspect_ratio are [1,1] -> the window is always the whole
    # image; use real ranges so the stream is observable
    "RandomBBoxCrop": dict(inputs=[(_BOXES, ""), (_LABELS, "")],
                           kwargs={"bbox_layout": "xyXY",
                                   "scaling": [0.4, 0.9],
                                   "aspect_ratio": [0.7, 1.4],
                                   "thresholds": [0.0],
                                   "allow_no_crop": False}),
    "SSDRandomCrop": dict(inputs=[(_IMG, "HWC"), (_BOXES, ""), (_LABELS, "")],
                          kwargs={"num_attempts": 4}),
    "ROIRandomCrop": dict(kwargs={"crop_shape": [8, 8, 3],
                                  "roi_start": [2, 2, 0],
                                  "roi_shape": [14, 12, 3]}),
    "segmentation.RandomMaskPixel": dict(inputs=[(_MASK, "")]),
    "segmentation.RandomObjectBBox": dict(inputs=[(_LABELMAP, "")]),
    "random.Choice": dict(inputs=[(np.arange(10, dtype=np.int32), "")]),
}


def _jpeg_bytes():
    import cv2

    ok, enc = cv2.imencode(".jpg", _IMG[:, :, ::-1])
    assert ok
    return enc.reshape(-1)


# decode + random crop (the decoder family carries the RandomCropAttr seed)
_JPEG = _jpeg_bytes()
for _nm in ("decoders.ImageRandomCrop", "experimental.decoders.ImageRandomCrop",
            "ImageDecoderRandomCrop"):
    SPECS[_nm] = dict(inputs=[(_JPEG, "")],
                      kwargs={"random_area": [0.2, 0.8]})

# Schema name -> reason; an op may only be excluded with an honest reason.
EXCLUDE = {}


def _seeded_ops():
    out = []
    for name, schema in sorted(_registry.items()):
        if schema.is_internal or schema.is_reader:
            continue
        if "seed" not in schema.args or "cpu" not in schema.devices:
            continue
        out.append(name)
    return out


def test_sweep_covers_registry():
    ops = _seeded_ops()
    assert len(ops) >= 20, ops  # every seeded schema enumerated
    for name in EXCLUDE:
        assert name in ops


def _make(name, spec, checkpoint=None):
    from dali_tpu import _op_call

    @pipeline_def(batch_size=BATCH, num_threads=1, seed=1234,
                  enable_checkpointing=True, checkpoint=checkpoint)
    def p():
        inputs = []
        for arr, layout in spec.get("inputs", []):
            c = types.Constant(arr, device="cpu", layout=layout or None)
            inputs.append(c)
        out = _op_call(name, device="cpu", inputs=tuple(inputs),
                       **spec.get("kwargs", {}))
        return out if isinstance(out, (tuple, list)) else (out,)

    return p()


def _drain(pipe, iters):
    out = []
    for _ in range(iters):
        out.append([to_samples(tl) for tl in pipe.run()])
    return out


@pytest.mark.parametrize("name", [n for n in _seeded_ops() if n not in EXCLUDE])
def test_checkpoint_resume_bit_identical(name):
    spec = SPECS.get(name, {})
    p1 = _make(name, spec)
    p1.build()
    _drain(p1, 2)
    state = p1.checkpoint()
    expected = _drain(p1, 3)
    p2 = _make(name, spec, checkpoint=state)
    p2.build()
    got = _drain(p2, 3)
    for ita, itb in zip(expected, got):
        for ta, tb in zip(ita, itb):
            for sa, sb in zip(ta, tb):
                np.testing.assert_array_equal(sa, sb)
    # the op must actually be stochastic across iterations (guards against a
    # sweep that silently tests constant streams)
    def flat(it):
        return [np.asarray(s) for t in it for s in t]

    def iters_equal(a, b):
        return all(x.shape == y.shape and np.array_equal(x, y)
                   for x, y in zip(flat(a), flat(b)))

    if all(iters_equal(expected[0], it) for it in expected[1:]):
        pytest.fail(f"{name}: outputs identical across 3 iterations — "
                    "harness is not exercising the RNG stream")

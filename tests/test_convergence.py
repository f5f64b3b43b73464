"""End-to-end train-readiness (the reference's TL3 convergence tiers in
miniature): a linear classifier trained on the FULL pipeline's outputs
(file reader → hybrid/host decode → random crop → CMN, via the JAX
iterator) must separate a synthetic two-class image set. Exercises the
label↔image pairing, normalization sanity, shuffling, and epoch wrap that
unit tests can't see together."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dali_tpu import fn, pipeline_def, types
from dali_tpu.plugin.jax import DALIGenericIterator


@pytest.fixture(scope="module")
def two_class_jpegs(tmp_path_factory):
    root = tmp_path_factory.mktemp("conv")
    rng = np.random.default_rng(7)
    for label, tint in ((0, (200, 40, 40)), (1, (40, 40, 200))):
        d = root / f"class{label}"
        d.mkdir()
        for i in range(24):
            img = rng.integers(0, 80, (48, 56, 3), np.uint8) + np.asarray(
                tint, np.uint8) // 2
            cv2.imwrite(str(d / f"{i}.jpg"), img[..., ::-1],
                        [cv2.IMWRITE_JPEG_QUALITY, 90])
    return str(root)


def test_linear_probe_converges(two_class_jpegs):
    @pipeline_def(batch_size=16, num_threads=1, seed=11)
    def pipe():
        jpegs, labels = fn.readers.file(file_root=two_class_jpegs,
                                        random_shuffle=True, name="Reader")
        imgs = fn.decoders.image(jpegs, device="mixed")
        imgs = fn.random_resized_crop(imgs, size=[32, 32],
                                      random_area=[0.5, 1.0])
        out = fn.crop_mirror_normalize(imgs, dtype=types.FLOAT,
                                       output_layout="CHW",
                                       mean=[128.0] * 3, std=[64.0] * 3)
        return out, labels

    it = DALIGenericIterator([pipe()], ["x", "y"], reader_name="Reader",
                             auto_reset=True)
    w = np.zeros(4, np.float64)  # [r, g, b, bias] on channel means
    lr = 0.5
    batches = 0
    for _ in range(6):  # epochs
        for b in it:
            x = np.asarray(b["x"])  # [N, 3, 32, 32]
            y = np.asarray(b["y"]).reshape(-1).astype(np.float64)
            feats = np.concatenate(
                [x.mean(axis=(2, 3)), np.ones((x.shape[0], 1))], axis=1)
            z = feats @ w
            p = 1.0 / (1.0 + np.exp(-z))
            w -= lr * feats.T @ (p - y) / len(y)
            batches += 1
    # accuracy over one clean epoch
    correct = total = 0
    for b in it:
        x = np.asarray(b["x"])
        y = np.asarray(b["y"]).reshape(-1)
        feats = np.concatenate(
            [x.mean(axis=(2, 3)), np.ones((x.shape[0], 1))], axis=1)
        pred = (feats @ w) > 0
        correct += int((pred == (y > 0)).sum())
        total += len(y)
    assert batches >= 18
    assert correct / total >= 0.95, (correct, total, w)

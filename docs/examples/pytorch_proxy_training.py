"""PyTorch DALI-proxy: torch DataLoader workers produce lightweight sample
references; the dali_tpu pipeline runs in the MAIN process (where the TPU
lives) and its outputs are substituted into the collated batches.

Usage: python docs/examples/pytorch_proxy_training.py <imagenet-style dir>
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import torch

from dali_tpu import fn, pipeline_def, types
from dali_tpu.plugin import proxy as dali_proxy


@pipeline_def(batch_size=64, num_threads=4, seed=11)
def train_pipe():
    # fed by the proxy: raw encoded JPEG bytes from the torch dataset
    jpegs = fn.external_source(name="jpegs")
    images = fn.decoders.image(jpegs, device="mixed", hybrid_device_decode=True)
    images = fn.random_resized_crop(images, size=[224, 224])
    return fn.crop_mirror_normalize(
        images, mirror=fn.random.coin_flip(), dtype=types.FLOAT,
        output_layout="CHW", mean=[0.485 * 255, 0.456 * 255, 0.406 * 255],
        std=[0.229 * 255, 0.224 * 255, 0.225 * 255])


class JpegFolder(torch.utils.data.Dataset):
    def __init__(self, root, transform):
        import glob
        import os

        self.files = sorted(glob.glob(os.path.join(root, "*", "*.jpg")))
        self.labels = {d: i for i, d in enumerate(sorted(
            {os.path.basename(os.path.dirname(f)) for f in self.files}))}
        self.transform = transform

    def __len__(self):
        return len(self.files)

    def __getitem__(self, i):
        import os

        with open(self.files[i], "rb") as f:
            data = np.frombuffer(f.read(), np.uint8)
        label = self.labels[os.path.basename(os.path.dirname(self.files[i]))]
        return self.transform(data), label


def synth_dataset(root, n=64):
    import cv2

    os.makedirs(os.path.join(root, "class0"), exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.integers(0, 255, (375, 500, 3), np.uint8)
        cv2.imwrite(os.path.join(root, "class0", f"{i}.jpg"), img)
    return root


if __name__ == "__main__":
    data_dir = sys.argv[1] if len(sys.argv) > 1 else synth_dataset(
        "/tmp/dali_tpu_proxy_example")
    with dali_proxy.DALIServer(train_pipe()) as server:
        ds = JpegFolder(data_dir, transform=server.proxy)
        loader = dali_proxy.DataLoader(server, ds, batch_size=64, num_workers=4,
                                       shuffle=True)
        for images, labels in loader:
            print("batch:", images.shape, labels.shape)
            break

"""DALI proxy / DALIServer pattern (reference
plugin/pytorch/experimental/proxy/__init__.py:346): DataLoader workers emit
proxy references; the pipeline runs in the main process and its outputs are
substituted into the collated batch."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from dali_tpu import fn, pipeline_def, types  # noqa: E402
from dali_tpu.plugin import proxy as dali_proxy  # noqa: E402


class _DS(torch.utils.data.Dataset):
    def __init__(self, transform, n=10):
        self.t = transform
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        img = np.full((8, 6, 3), i, np.uint8)
        return self.t(img), i


def make_pipe(bs):
    @pipeline_def(batch_size=bs, num_threads=1, seed=3)
    def p():
        images = fn.external_source(name="images", layout="HWC")
        out = fn.crop_mirror_normalize(
            images, dtype=types.FLOAT, output_layout="CHW", mean=[0.0] * 3,
            std=[1.0] * 3)
        return out

    return p()


@pytest.mark.parametrize("num_workers", [0, 2])
def test_dali_proxy_dataloader(num_workers):
    with dali_proxy.DALIServer(make_pipe(4)) as server:
        ds = _DS(server.proxy, n=10)
        loader = dali_proxy.DataLoader(server, ds, batch_size=4,
                                       num_workers=num_workers)
        seen = 0
        for data, labels in loader:
            assert isinstance(data, torch.Tensor)
            n = labels.shape[0]
            assert data.shape == (n, 3, 8, 6)
            for j in range(n):
                assert float(data[j, 0, 0, 0]) == float(labels[j])
            seen += n
        assert seen == 10  # incl. the partial final batch (trimmed)


def test_dali_proxy_discovers_input_names():
    server = dali_proxy.DALIServer(make_pipe(2))
    assert server.proxy._input_names == ["images"]


def test_dali_proxy_rejects_oversized_batch():
    with dali_proxy.DALIServer(make_pipe(2)) as server:
        ds = _DS(server.proxy, n=6)
        loader = dali_proxy.DataLoader(server, ds, batch_size=4)
        with pytest.raises(ValueError, match="exceeds pipeline batch size"):
            next(iter(loader))

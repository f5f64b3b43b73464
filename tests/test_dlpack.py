"""Zero-copy interop: DLPack / __array_interface__ on TensorListCPU/GPU
(reference contract: dali/pipeline/data/dltensor.cc + backend_impl.cc:708,968
— framework tensors consume DALI outputs without a copy)."""

import numpy as np
import pytest

from dali_tpu import fn, pipeline_def


def build(device):
    rng = np.random.default_rng(0)
    data = [rng.integers(0, 255, (8, 6, 3), np.uint8) for _ in range(4)]

    @pipeline_def(batch_size=4, num_threads=1, seed=1)
    def p():
        x = fn.external_source(source=lambda: data, batch=True, cycle=True)
        return x.gpu() if device == "gpu" else x

    pipe = p()
    pipe.build()
    return data, pipe.run()[0]


def test_cpu_dlpack_and_array_interface():
    data, tl = build("cpu")
    arr = np.from_dlpack(tl)
    np.testing.assert_array_equal(arr, np.stack(data))
    # __array_interface__ / __array__ views the SAME memory (zero-copy)
    a1 = np.asarray(tl)
    assert a1.__array_interface__["data"][0] == tl.as_array().__array_interface__["data"][0]
    np.testing.assert_array_equal(a1, np.stack(data))


def test_gpu_dlpack():
    data, tl = build("gpu")
    dev, _id = tl.__dlpack_device__()
    arr = np.from_dlpack(tl) if dev == 1 else np.asarray(tl.as_tensor())
    np.testing.assert_array_equal(arr, np.stack(data))


def test_gpu_dlpack_rejects_ragged():
    rng = np.random.default_rng(1)
    data = [rng.integers(0, 255, (n, 3), np.uint8) for n in (4, 7, 5, 6)]

    @pipeline_def(batch_size=4, num_threads=1, seed=1)
    def p():
        x = fn.external_source(source=lambda: data, batch=True, cycle=True)
        return x.gpu()

    tl = p().run()[0]
    with pytest.raises(ValueError):
        tl.__dlpack__()


def test_torch_from_dlpack_zero_copy_cpu():
    torch = pytest.importorskip("torch")
    data, tl = build("cpu")
    t = torch.from_dlpack(tl)
    np.testing.assert_array_equal(t.numpy(), np.stack(data))
    # mutating the torch tensor must reflect in the TensorList's dense cache
    t[0, 0, 0, 0] = 42
    assert tl.as_array()[0, 0, 0, 0] == 42


def test_torch_iterator_uses_dlpack():
    torch = pytest.importorskip("torch")
    from dali_tpu.plugin.pytorch import DALIGenericIterator

    rng = np.random.default_rng(2)
    data = [rng.standard_normal((5, 4)).astype(np.float32) for _ in range(4)]

    @pipeline_def(batch_size=4, num_threads=1, seed=1)
    def p():
        return fn.external_source(source=lambda: data, batch=True, cycle=True)

    pipe = p()
    pipe.build()
    it = DALIGenericIterator([pipe], ["x"], size=8)
    batch = next(it)[0]
    assert isinstance(batch["x"], torch.Tensor)
    np.testing.assert_array_equal(batch["x"].numpy(), np.stack(data))

"""TensorFlow plugin (reference plugin/tf.py DALIDataset)."""

import numpy as np
import pytest

import dali_tpu.fn as fn
from dali_tpu.pipeline import pipeline_def

tf = pytest.importorskip("tensorflow")


@pytest.mark.slow
def test_dali_dataset():
    from dali_tpu.plugin.tf import DALIDataset

    data = [np.full((3,), i, np.float32) for i in range(8)]

    # two outputs: one device-resident, one host
    @pipeline_def(batch_size=4, num_threads=1, seed=1)
    def pipe2():
        x = fn.external_source(source=lambda info: data[info.idx_in_epoch % 8])
        return x.gpu(), x

    p = pipe2()
    p.build()
    ds = DALIDataset(p, output_dtypes=(tf.float32, tf.float32),
                     output_shapes=((4, 3), (4, 3)))
    it = iter(ds)
    a, b = next(it)
    assert a.shape == (4, 3) and b.shape == (4, 3)
    np.testing.assert_array_equal(a.numpy(), b.numpy())
    a2, _ = next(it)
    assert float(a2.numpy()[0, 0]) == 4.0  # second batch starts at sample 4


def test_numba_plugin_gated():
    from dali_tpu.plugin import numba as numba_plugin

    with pytest.raises(ImportError, match="requires numba"):
        numba_plugin.numba_function(run_fn=None, out_types=[], in_types=[])


def test_paddle_plugin_gated():
    from dali_tpu.plugin.paddle import DALIGenericIterator

    with pytest.raises(ImportError, match="PaddlePaddle"):
        DALIGenericIterator([], ["x"])

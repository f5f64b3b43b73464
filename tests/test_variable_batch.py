"""Variable batch size + cpu-only mode + test-only executor operators
(reference test_dali_variable_batch_size.py, test_dali_cpu_only.py, and the
Exec2*/Dummy* test-op pattern from executor2/exec2_ops_for_test.h)."""

import numpy as np
import pytest

from dali_tpu import fn, pipeline_def, types
from dali_tpu._schema import DALI_SCHEMA, ArgType, register_operator
from dali_tpu.backend.base import Operator
from dali_tpu.batch import HostBatch

from .test_utils import to_samples


def test_variable_batch_size_through_device_stage():
    """external_source may feed fewer than max_batch_size samples; every op
    (host and device) must follow the per-iteration batch size."""
    sizes = [4, 1, 3, 2, 4]
    it = [0]

    def src():
        n = sizes[it[0] % len(sizes)]
        it[0] += 1
        return [np.full((5, 4), 10 * it[0] + i, np.float32) for i in range(n)]

    @pipeline_def(batch_size=4, num_threads=1, seed=1)
    def p():
        x = fn.external_source(source=src, batch=True)
        g = x.gpu() * 2.0 + 1.0
        r = fn.reductions.mean(g, axes=[0, 1])
        return x, g, r

    pipe = p()
    pipe.build()
    for i, n in enumerate(sizes):
        c, g, r = pipe.run()
        assert len(c) == n and len(g) == n and len(r) == n
        for j in range(n):
            want = np.full((5, 4), 10 * (i + 1) + j, np.float32)
            np.testing.assert_array_equal(np.asarray(c.at(j)), want)
            np.testing.assert_allclose(np.asarray(g.at(j)), want * 2 + 1)
            np.testing.assert_allclose(np.asarray(r.at(j)), want.mean() * 2 + 1,
                                       rtol=1e-6)


def test_variable_batch_size_ragged_images():
    rng = np.random.default_rng(3)
    batches = [
        [rng.integers(0, 255, (h, w, 3), np.uint8) for h, w in shapes]
        for shapes in ([(10, 12), (14, 8)], [(9, 9)], [(12, 10), (8, 8), (10, 14)])
    ]
    it = [0]

    def src():
        b = batches[it[0] % len(batches)]
        it[0] += 1
        return b

    @pipeline_def(batch_size=3, num_threads=1, seed=1)
    def p():
        x = fn.external_source(source=src, batch=True, layout="HWC")
        return fn.resize(x.gpu(), resize_x=8, resize_y=8)

    pipe = p()
    pipe.build()
    for b in batches:
        out = pipe.run()[0]
        assert len(out) == len(b)
        assert out.shape() == [(8, 8, 3)] * len(b)


def test_cpu_only_pipeline():
    """A pipeline with no gpu edges never builds a device program
    (reference CPU-only mode)."""
    rng = np.random.default_rng(4)
    data = [rng.integers(0, 255, (20, 20, 3), np.uint8) for _ in range(2)]

    @pipeline_def(batch_size=2, num_threads=1, seed=1)
    def p():
        x = fn.external_source(source=lambda: data, batch=True, cycle=True)
        y = fn.resize(x, resize_x=10, resize_y=10)
        return fn.crop_mirror_normalize(y, dtype=types.FLOAT, output_layout="CHW",
                                        mean=[0.0] * 3, std=[1.0] * 3)

    pipe = p()
    pipe.build()
    out = pipe.run()[0]
    assert out.at(0).shape == (3, 10, 10)
    stats = pipe.executor_statistics()
    assert stats["device_dispatches"] == 0  # nothing ran on device


# ----------------------- test-only executor operators -----------------------

DALI_SCHEMA("_TestCounter").DocStr(
    "Test-only stateful op (the Exec2*/Dummy* pattern): emits a per-build "
    "running counter; exercises save/restore through the executor."
).NumInput(0).NumOutput(1).Devices("cpu").MakeInternal().MakeStateful()


@register_operator("_TestCounter", "cpu")
class _TestCounter(Operator):
    def __init__(self, spec, op_id):
        super().__init__(spec, op_id)
        self._count = 0

    def run_batch(self, ctx):
        self._count += 1
        return [HostBatch([np.int64(self._count)] * ctx.batch_size, layout="")]

    def save_state(self):
        return {"count": self._count}

    def restore_state(self, state):
        self._count = int(state["count"])


DALI_SCHEMA("_TestMultiOut").DocStr(
    "Test-only multi-output op: (x+1, x*2) — exercises output fan-out."
).NumInput(1).NumOutput(2).Devices("cpu").MakeInternal()


@register_operator("_TestMultiOut", "cpu")
class _TestMultiOut(Operator):
    def run_batch(self, ctx, inp):
        plus = [s + 1 for s in inp.samples]
        times = [s * 2 for s in inp.samples]
        return [HostBatch(plus, inp.layout), HostBatch(times, inp.layout)]


def _counter_pipe(checkpoint=None):
    from dali_tpu._schema import OpSpec
    from dali_tpu.pipeline import Pipeline

    @pipeline_def(batch_size=2, num_threads=1, seed=1,
                  enable_checkpointing=True, checkpoint=checkpoint)
    def p():
        from dali_tpu.data_node import DataNode  # noqa: F401
        from dali_tpu.pipeline import Pipeline as _P

        spec = OpSpec("_TestCounter", device="cpu", name="ctr")
        node = _P.current().add_op(spec)
        return node.outputs[0]

    return p()


def test_test_only_stateful_op_checkpoints():
    p1 = _counter_pipe()
    p1.build()
    for _ in range(3):
        p1.run()
    state = p1.checkpoint()
    want = int(p1.run()[0].at(0))
    p2 = _counter_pipe(checkpoint=state)
    p2.build()
    got = int(p2.run()[0].at(0))
    assert got == want == 4


def test_test_only_multi_output_op():
    from dali_tpu._schema import OpSpec
    from dali_tpu.pipeline import Pipeline as _P

    data = [np.arange(4, dtype=np.int32), np.arange(3, dtype=np.int32)]

    @pipeline_def(batch_size=2, num_threads=1, seed=1)
    def p():
        x = fn.external_source(source=lambda: data, batch=True, cycle=True)
        spec = OpSpec("_TestMultiOut", device="cpu", name="mo")
        spec.AddInput(x)
        node = _P.current().add_op(spec)
        return node.outputs[0], node.outputs[1]

    pipe = p()
    pipe.build()
    plus, times = pipe.run()
    for i, d in enumerate(data):
        np.testing.assert_array_equal(plus.at(i), d + 1)
        np.testing.assert_array_equal(times.at(i), d * 2)


def test_error_in_mid_pipeline_op_names_the_op():
    def bad(x):
        raise RuntimeError("intentional test failure")

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def p():
        x = fn.external_source(source=lambda: [np.zeros(2, np.float32)],
                               batch=True, cycle=True)
        return fn.python_function(x, function=bad, num_outputs=1)

    pipe = p()
    pipe.build()
    with pytest.raises(Exception, match="intentional test failure"):
        pipe.run()

"""Schema registry / graph / serialization unit tests (reference analogues:
``dali/test/python/test_pipeline.py`` basics)."""

import numpy as np
import pytest

import dali_tpu
from dali_tpu import fn, pipeline_def, types


def test_schema_registry():
    s = dali_tpu.GetSchema("CropMirrorNormalize")
    assert "mean" in s.args
    assert s.devices == ("cpu", "gpu")
    assert "readers.File" in dali_tpu.RegisteredSchemas()


def test_fn_api_generated():
    assert callable(fn.crop_mirror_normalize)
    assert callable(fn.readers.file)
    assert callable(fn.decoders.image)
    assert callable(fn.random.coin_flip)


def test_unknown_arg_rejected():
    with pytest.raises(TypeError):
        dali_tpu.OpSpec("Cast", device="cpu", bogus_arg=3)


def test_missing_required_arg():
    with pytest.raises(TypeError):
        dali_tpu.OpSpec("Cast", device="cpu")


def test_graph_build_and_prune():
    @pipeline_def(batch_size=4, num_threads=1, seed=1)
    def pipe():
        a = fn.external_source(source=lambda: np.zeros((4, 2), np.float32), batch=True)
        b = a + 1.0
        _unused = a * 3.0  # should be pruned
        return b

    p = pipe()
    p.build()
    schemas = [op.spec.schema_name for op in p._graph.ops]
    assert schemas.count("_ArithmeticGenericOp") == 1
    assert schemas.count("ExternalSource") == 1


def test_cse_dedup():
    @pipeline_def(batch_size=2, num_threads=1, seed=1)
    def pipe():
        a = fn.external_source(source=lambda: np.ones((2, 3), np.float32), batch=True)
        b = a + 2.0
        c = a + 2.0  # structurally identical → CSE
        return b, c

    p = pipe()
    p.build()
    schemas = [op.spec.schema_name for op in p._graph.ops]
    assert schemas.count("_ArithmeticGenericOp") == 1


def test_serialize_roundtrip():
    @pipeline_def(batch_size=2, num_threads=1, seed=7)
    def pipe():
        a = fn.random.uniform(range=[0.0, 1.0], shape=[3])
        return a * 2.0

    p = pipe()
    p.build()
    payload = p.serialize()
    p2 = dali_tpu.Pipeline.deserialize(payload)
    p2.build()
    assert [op.spec.schema_name for op in p2._graph.ops] == [
        op.spec.schema_name for op in p._graph.ops
    ]
    out1 = p.run()[0]
    out2 = p2.run()[0]
    np.testing.assert_allclose(out1.as_array(), out2.as_array())


def test_gpu_requires_explicit_transfer():
    @pipeline_def(batch_size=2, num_threads=1, seed=1)
    def pipe():
        a = fn.external_source(source=lambda: np.ones((2, 4, 4, 3), np.uint8), batch=True, layout="HWC")
        return fn.crop_mirror_normalize(a, device="gpu", crop=[2, 2])

    p = pipe()
    with pytest.raises(ValueError, match=r"\.gpu\(\)"):
        p.build()


def test_datanode_bool_raises():
    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        a = fn.random.coin_flip()
        if a:  # must raise
            pass
        return a

    with pytest.raises(TypeError):
        pipe().build()


def test_every_declared_device_has_impl():
    """Every schema device must have a registered implementation — gpu variants
    that crash at build time are worse than absent ones."""
    from dali_tpu import _schema

    missing = [
        (name, dev)
        for name, schema in _schema._registry.items()
        for dev in schema.devices
        if not _schema.has_operator_impl(name, dev)
    ]
    assert not missing, f"schemas declaring devices without impls: {missing}"


def test_prefetch_queue_depth_dict_semantics():
    """Separated cpu/gpu queue depths (reference separated-queue executor
    policy) flow into the two stage queues instead of collapsing to max()."""
    import numpy as np

    from dali_tpu import fn, pipeline_def

    @pipeline_def(batch_size=1, num_threads=1, seed=1,
                  prefetch_queue_depth={"cpu_size": 3, "gpu_size": 1})
    def p():
        x = fn.external_source(source=lambda: [np.zeros((2,), np.float32)],
                               batch=True, cycle=True)
        return x.gpu() + 1.0

    pipe = p()
    assert pipe.cpu_queue_depth == 3 and pipe.gpu_queue_depth == 1
    pipe.build()
    for _ in range(4):
        pipe.run()
    assert pipe._executor._device_q.maxsize == 3
    assert pipe._executor._out_q.maxsize == 1


def test_output_dtype_and_ndim_contracts():
    """Declared output_dtype/output_ndim are enforced per iteration
    (reference pipeline output contracts)."""
    import numpy as np
    import pytest as _pytest

    from dali_tpu import Pipeline, fn, pipeline_def, types

    def make(**kw):
        @pipeline_def(batch_size=1, num_threads=1, seed=1, **kw)
        def p():
            x = fn.external_source(source=lambda: [np.zeros((2, 3), np.float32)],
                                   batch=True, cycle=True)
            return x

        return p()

    ok = make(output_dtype=types.FLOAT, output_ndim=2)
    ok.build()
    ok.run()

    bad_dt = make(output_dtype=types.INT32)
    bad_dt.build()
    with _pytest.raises(Exception, match="output_dtype"):
        bad_dt.run()

    bad_nd = make(output_ndim=3)
    bad_nd.build()
    with _pytest.raises(Exception, match="output_ndim"):
        bad_nd.run()


def test_ops_class_api_workflow():
    """The reference's class-style workflow: instantiate ops.* objects, call
    them inside a Pipeline scope, set_outputs, build, run."""
    import numpy as np

    from dali_tpu import Pipeline, ops, types

    data = [np.full((6, 4), i, np.float32) for i in range(2)]

    pipe = Pipeline(batch_size=2, num_threads=1, seed=5)
    src = ops.ExternalSource(source=lambda: data, batch=True, cycle=True)
    cast = ops.Cast(dtype=types.INT32, device="cpu")
    with pipe:
        x = src()
        y = cast(x)
        pipe.set_outputs(x, y)
    pipe.build()
    xs, ys = pipe.run()
    for i in range(2):
        np.testing.assert_array_equal(xs.at(i), data[i])
        assert ys.at(i).dtype == np.int32
        np.testing.assert_array_equal(ys.at(i), data[i].astype(np.int32))


def test_fn_stub_coverage():
    """Every public schema has a generated .pyi stub under dali_tpu/fn
    (reference type_annotations checks)."""
    import ast
    import os

    from dali_tpu._schema import GetSchema, RegisteredSchemas
    from dali_tpu.fn import _camel_to_snake

    root = os.path.join(os.path.dirname(__file__), "..", "dali_tpu", "fn")
    stubs = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".pyi"):
                mod = os.path.relpath(dirpath, root).replace(os.sep, ".")
                tree = ast.parse(open(os.path.join(dirpath, f)).read())
                for node in tree.body:
                    if isinstance(node, ast.FunctionDef):
                        key = node.name if mod == "." else f"{mod}.{node.name}"
                        stubs[key] = node
    missing = []
    for name in RegisteredSchemas():
        schema = GetSchema(name)
        if schema.is_internal:
            continue
        parts = name.split(".")
        key = ".".join(parts[:-1] + [_camel_to_snake(parts[-1])])
        if key not in stubs:
            missing.append(name)
    assert not missing, f"schemas without fn stubs: {missing[:10]} (+{len(missing)})"


def test_external_source_generator_function():
    """A generator FUNCTION source (reference SourceKind.GENERATOR_FUNC,
    _utils/external_source_impl.py:38): called to obtain the iterator;
    cycle=True re-invokes it on exhaustion (round-3 regression — was
    misclassified as a plain callable)."""

    def gen():
        for e in range(2):
            yield [np.full((3,), 10 * e + i, np.int32) for i in range(2)]

    @pipeline_def(batch_size=2, num_threads=1, seed=1)
    def pipe():
        return fn.external_source(source=gen, batch=True, cycle=True)

    p = pipe()
    p.build()
    firsts = []
    for _ in range(4):
        (out,) = p.run()
        firsts.append(int(np.asarray(out.at(0)).reshape(-1)[0]))
    assert firsts == [0, 10, 0, 10]


def test_external_source_generator_function_no_cycle_raises():
    def gen():
        yield [np.zeros((2,), np.float32)]

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def pipe():
        return fn.external_source(source=gen, batch=True)

    p = pipe()
    p.build()
    p.run()
    with pytest.raises(StopIteration):
        p.run()

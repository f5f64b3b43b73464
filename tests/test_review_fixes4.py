"""Round-5 review regression tests: front-end contracts (schema arg
validation, serialize/deserialize fidelity, instance-name uniqueness)."""

import json

import numpy as np
import pytest

import dali_tpu.tfrecord as tfrec
from dali_tpu import Pipeline, fn, pipeline_def
from dali_tpu._schema import DALI_SCHEMA, GetSchema, OpSpec


def test_tensor_arg_rejected_where_not_tensor_ok():
    """A DataNode passed for an argument that is not declared tensor_ok must
    raise — review r5: it silently landed in arg_inputs, GetArgument returned
    the schema default, and e.g. a DataNode num_shards ran unsharded."""
    with pytest.raises(TypeError, match="does not accept a per-sample"):
        @pipeline_def(batch_size=2, num_threads=1, seed=1)
        def p():
            ext = fn.external_source(
                source=lambda info: np.int64(2), batch=False)
            enc, lab = fn.readers.file(
                file_root="/nonexistent", num_shards=ext, name="r")
            return enc

        p().build()


def test_tensor_arg_accepted_where_tensor_ok(tmp_path):
    """Control: tensor_ok args still take DataNodes."""
    import cv2

    d = tmp_path / "c0"
    d.mkdir()
    cv2.imwrite(str(d / "a.jpg"),
                np.random.default_rng(1).integers(0, 256, (32, 32, 3), np.uint8))

    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def p():
        enc, _ = fn.readers.file(file_root=str(tmp_path), name="r")
        img = fn.decoders.image(enc, device="cpu")
        angle = fn.random.uniform(range=(-5.0, 5.0))
        return fn.rotate(img, angle=angle)

    pipe = p()
    pipe.build()
    pipe.run()


def test_tfrecord_serialize_roundtrip(tmp_path):
    """Serialized graphs record per-op output counts: ops whose output count
    comes from non-serialized _extra payloads (readers.TFRecord's _features)
    deserialized with 0 outputs and crashed rewiring (review r5)."""
    path = str(tmp_path / "d.tfrecord")
    rng = np.random.default_rng(0)
    with open(path, "wb") as f:
        for i in range(4):
            tfrec.write_record(f, tfrec.write_example({
                "data": bytes(rng.integers(0, 256, 8, np.uint8)),
                "label": np.array([i], np.int64),
            }))
    idx = str(tmp_path / "d.idx")
    tfrec.write_index(path, idx)

    @pipeline_def(batch_size=2, num_threads=1, seed=1)
    def p():
        feats = fn.readers.tfrecord(
            path=path, index_path=idx,
            features={"data": tfrec.FixedLenFeature((), tfrec.string, ""),
                      "label": tfrec.FixedLenFeature([1], tfrec.int64, -1)},
            name="R")
        return feats["data"], feats["label"]

    pipe = p()
    pipe.build()
    s = pipe.serialize()
    # the round-trip must reconstruct the 2-output reader and rewire its
    # consumers (running it would need the pickled features, which are
    # opt-in via include_callables — structure is what this pins)
    pipe2 = Pipeline.deserialize(s)
    assert len(pipe2._traced_ops[0].outputs) == 2


def test_deserialize_forwards_all_overrides(tmp_path):
    """Pipeline.deserialize(..., enable_checkpointing=True, debug=True, ...)
    must honor every constructor parameter, not a fixed shortlist that
    silently dropped the rest (review r5); unknown keys raise."""
    @pipeline_def(batch_size=2, num_threads=1, seed=1,
                  prefetch_queue_depth={"cpu_size": 1, "gpu_size": 3})
    def p():
        return fn.random.uniform(range=(0.0, 1.0), shape=[2])

    pipe = p()
    pipe.build()
    s = pipe.serialize()
    q = Pipeline.deserialize(s, enable_checkpointing=True, debug=True,
                             output_ndim=1)
    assert q.enable_checkpointing is True
    assert q.debug is True
    assert q.output_ndim == 1
    # the dict prefetch form survives the round trip (a flattened max would
    # set cpu_queue_depth to 3)
    assert (q.cpu_queue_depth, q.gpu_queue_depth) == (1, 3)
    with pytest.raises(TypeError, match="unknown parameter"):
        Pipeline.deserialize(s, not_a_real_param=1)


def test_auto_names_skip_explicitly_taken_names():
    """Auto-generated instance names must never collide with explicit names
    squatting the same pattern — colliding names silently alias in
    Graph._by_name, mis-wiring deserialize and feed_input (review r5)."""
    @pipeline_def(batch_size=1, num_threads=1, seed=1)
    def p():
        a = fn.random.uniform(range=(0.0, 1.0), shape=[1],
                              name="__random__Uniform_0")
        b = fn.random.uniform(range=(2.0, 3.0), shape=[1])  # auto-named
        return a, b

    pipe = p()
    pipe.build()
    names = [op.instance_name for op in pipe._graph.ops]
    assert len(names) == len(set(names)), names


def test_schema_vec_default_not_aliased():
    """GetArgument must hand out a COPY of mutable (vec) defaults — mutating
    a returned default corrupted the global schema registry for every later
    OpSpec (review r5)."""
    spec = OpSpec("Crop", device="cpu", _defer_required=True)
    d = spec.GetArgument("bytes_per_sample_hint")
    assert isinstance(d, list)
    d.append(999999)
    spec2 = OpSpec("Crop", device="cpu", _defer_required=True)
    assert 999999 not in spec2.GetArgument("bytes_per_sample_hint")


def test_deprecated_arg_conflicts_with_replacement():
    """Passing both a deprecated arg and its replacement raises instead of
    silently discarding the deprecated value (review r5)."""
    from dali_tpu._schema import ArgType

    name = "_TestDeprConflict"
    (DALI_SCHEMA(name)
     .DocStr("review r5 test schema")
     .NumInput(0).NumOutput(1).Devices("cpu")
     .AddOptionalArg("new_arg", ArgType.INT, "x", 0))
    GetSchema(name).DeprecateArg("old_arg", in_favor_of="new_arg")
    # old alone: remapped with a warning
    with pytest.warns(DeprecationWarning):
        sp = OpSpec(name, device="cpu", old_arg=5)
    assert sp.GetArgument("new_arg") == 5
    # both: conflict
    with pytest.warns(DeprecationWarning):
        with pytest.raises(TypeError, match="both deprecated"):
            OpSpec(name, device="cpu", old_arg=5, new_arg=7)

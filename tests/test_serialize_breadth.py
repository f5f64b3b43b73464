"""Serialization breadth (VERDICT r1 weak #6): a wide multi-family pipeline
must survive serialize -> deserialize -> build -> run with bit-identical
outputs, and every public single-input schema with optional-only args must
round-trip through the graph JSON unchanged. Reference analogue: the
serialize-all-ops coverage in dali/test/python/test_pipeline_serialization."""

import json

import cv2
import numpy as np
import pytest

from dali_tpu import Pipeline, fn, pipeline_def, types
from dali_tpu._schema import _registry


def test_wide_pipeline_serialize_roundtrip_bitexact(tmp_path):
    d = tmp_path / "cls0"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        cv2.imwrite(str(d / f"{i}.jpg"),
                    rng.integers(0, 255, (64 + 8 * i, 80, 3), np.uint8))

    def build():
        @pipeline_def(batch_size=3, num_threads=1, seed=1234)
        def pipe():
            jpegs, labels = fn.readers.file(file_root=str(tmp_path),
                                            random_shuffle=True, name="R")
            imgs = fn.decoders.image(jpegs, device="mixed")
            imgs = fn.random_resized_crop(imgs, size=[32, 32])
            coin = fn.random.coin_flip(probability=0.5)
            out = fn.crop_mirror_normalize(
                imgs, mirror=coin, dtype=types.FLOAT, output_layout="CHW",
                mean=[128.0] * 3, std=[64.0] * 3)
            bright = fn.brightness_contrast(imgs, brightness=1.2, contrast=0.9)
            rot = fn.transforms.rotation(angle=30.0)
            return out, bright, rot, labels

        p = pipe()
        p.build()
        return p

    p1 = build()
    payload = p1.serialize()
    p2 = Pipeline.deserialize(payload)
    p2.build()
    for _ in range(3):
        o1 = p1.run()
        o2 = p2.run()
        for a, b in zip(o1, o2):
            np.testing.assert_array_equal(np.asarray(a.as_tensor()),
                                          np.asarray(b.as_tensor()))


def test_all_simple_ops_graph_roundtrip():
    """Every public 1-input all-optional-args op: the graph JSON must
    round-trip identically through deserialize + re-serialize."""
    from dali_tpu.graph import Graph

    tested, skipped = [], []
    for name, schema in sorted(_registry.items()):
        if schema.is_internal or schema.is_reader:
            continue
        if schema.min_inputs != 1 or "cpu" not in schema.devices:
            continue
        if any(a.required for a in schema.args.values()):
            skipped.append(name)
            continue

        try:
            @pipeline_def(batch_size=1, num_threads=1, seed=1)
            def pipe():
                from dali_tpu import _op_call

                x = fn.external_source(
                    source=lambda: [np.zeros((8, 8, 3), np.uint8)],
                    batch=True, cycle=True)
                out = _op_call(name, device="cpu", inputs=(x,))
                if isinstance(out, (tuple, list)):
                    out = out[0]
                return out

            p = pipe()
            p.build()
        except Exception:
            skipped.append(name)
            continue
        payload = p.serialize()
        g = Graph.deserialize(payload)
        payload2 = g.serialize(json.loads(payload).get("params", {}))
        assert json.loads(payload)["ops"] == json.loads(payload2)["ops"], name
        tested.append(name)
    # the harness must exercise a substantial slice of the registry
    assert len(tested) >= 60, (len(tested), skipped[:10])


def test_required_arg_as_tensor_input_roundtrip():
    """A REQUIRED schema arg supplied as a DataNode (arg input) must survive
    serialize -> deserialize -> run (round-3 regression: OpSpec validated
    required args at construction, before arg_inputs were rewired)."""
    import dali_tpu.types as types
    from dali_tpu import Pipeline

    samples = [np.full((16, 16, 3), 64, np.uint8)]

    @pipeline_def(batch_size=1, num_threads=1, seed=3)
    def pipe():
        x = fn.external_source(source=lambda: samples, batch=True, cycle=True,
                               layout="HWC", name="inp")
        # Rotate.angle is required and here tensor-valued
        return fn.rotate(x, angle=fn.random.uniform(range=[10.0, 30.0], seed=5),
                         fill_value=0.0, keep_size=True)

    p1 = pipe()
    p1.build()
    p2 = Pipeline.deserialize(p1.serialize())
    p2.build()
    p2.feed_input("inp", samples, layout="HWC")
    (a,) = p1.run()
    (b,) = p2.run()
    np.testing.assert_array_equal(np.asarray(a.at(0)), np.asarray(b.at(0)))

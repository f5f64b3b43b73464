"""Pipeline serialization: save a built graph, reload it elsewhere.

The dali_tpu analogue of the reference's
`docs/examples/advanced/serialization.ipynb`: ``pipe.serialize()`` captures
the traced graph (ops, arguments, connections) plus the pipeline parameters
as a portable JSON payload — ``Pipeline.deserialize`` rebuilds an identical
pipeline with no access to the original Python definition (the reference
stores a protobuf; same fidelity contract). Also shows the graphviz dot
export for debugging.

Run:
    python docs/examples/serialization.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import dali_tpu.fn as fn
import dali_tpu.types as types
from dali_tpu import Pipeline, pipeline_def

BATCH = 4


def main():
    rng = np.random.default_rng(4)
    samples = [rng.integers(0, 256, (40, 56, 3), np.uint8) for _ in range(BATCH)]

    @pipeline_def(batch_size=BATCH, num_threads=1, seed=123)
    def original():
        img = fn.external_source(source=lambda: samples, batch=True,
                                 cycle=True, layout="HWC", name="input")
        img = fn.resize(img, resize_x=32, resize_y=32)
        img = fn.rotate(img, angle=fn.random.uniform(range=[-20.0, 20.0]),
                        fill_value=0.0, keep_size=True)
        out = fn.crop_mirror_normalize(img, dtype=types.FLOAT,
                                       output_layout="CHW",
                                       mean=[127.0] * 3, std=[64.0] * 3)
        return out

    p1 = original()
    p1.build()

    payload = p1.serialize()
    print(f"serialized pipeline: {len(payload)} bytes of JSON")

    # rebuild WITHOUT the original definition (fresh Pipeline class method);
    # feeds the same external source data by name
    p2 = Pipeline.deserialize(payload)
    p2.build()
    p2.feed_input("input", samples, layout="HWC")

    (a,) = p1.run()
    (b,) = p2.run()
    for i in range(BATCH):
        np.testing.assert_array_equal(np.asarray(a.at(i)), np.asarray(b.at(i)))
    print("deserialized pipeline output is bit-identical "
          f"(sample0 {np.asarray(a.at(0)).shape} {np.asarray(a.at(0)).dtype})")

    # dot export for graph inspection
    dot = os.path.join(tempfile.mkdtemp(), "pipe.dot")
    p1.save_graph_to_dot_file(dot)
    with open(dot) as f:
        txt = f.read()
    assert "Rotate" in txt and "->" in txt
    print(f"graph exported to {dot}: {txt.count('->')} edges")


if __name__ == "__main__":
    main()

"""Pipeline graph IR.

Re-design of DALI's ``OpGraph`` (reference ``dali/pipeline/graph/op_graph2.h:42-244``):
nodes are operator instances (``OpSpec``), edges are ``DataNode``s. The graph is
built by the Python tracer (``@pipeline_def``), then:

* pruned to nodes reachable from pipeline outputs (+ ``preserve=True`` nodes),
* CSE-deduplicated (reference ``graph/cse.cc``),
* partitioned into the *host program* (cpu ops, readers, decoders) and the
  *device program* (gpu ops → traced into one jitted JAX function).

Serialization: JSON (reference serializes protobuf, ``dali/pipeline/proto/dali.proto``).
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

from ._schema import OpSpec
from .data_node import DataNode


class OpNode:
    def __init__(self, op_id: int, spec: OpSpec):
        self.id = op_id
        self.spec = spec
        self.instance_name = spec.name
        self.outputs: List[DataNode] = []

    @property
    def inputs(self) -> List[DataNode]:
        return self.spec.inputs

    @property
    def arg_inputs(self) -> Dict[str, DataNode]:
        return self.spec.arg_inputs

    @property
    def device(self) -> str:
        return self.spec.device

    def all_input_nodes(self):
        return list(self.spec.inputs) + list(self.spec.arg_inputs.values())

    def __repr__(self):
        return f"<OpNode {self.id} {self.spec.schema_name}[{self.device}] {self.instance_name!r}>"


class Graph:
    """Final, validated graph: topo-ordered op list + output edges."""

    def __init__(self, ops: List[OpNode], outputs: List[DataNode]):
        self.ops = ops
        self.outputs = outputs
        self._by_name = {op.instance_name: op for op in ops}

    def op(self, instance_name: str) -> OpNode:
        return self._by_name[instance_name]

    @staticmethod
    def build(outputs: List[DataNode], all_traced: List[OpNode]) -> "Graph":
        """Prune to reachable nodes + preserve=True; return topo-ordered graph.

        Mirrors ``Pipeline._build_graph``'s backward walk (reference
        ``pipeline.py:906`` ``_collect_ops``).
        """
        preserved = [op for op in all_traced if op.spec.GetArgument("preserve", False)]
        roots = list(outputs) + [o for op in preserved for o in op.outputs]
        visited: Dict[int, OpNode] = {}
        order: List[OpNode] = []

        def visit(node: OpNode):
            if node.id in visited:
                if visited[node.id] is None:
                    raise ValueError(f"Cycle detected at op {node.instance_name}")
                return
            visited[node.id] = None
            for inp in node.all_input_nodes():
                if inp.source is not None:
                    visit(inp.source)
            visited[node.id] = node
            order.append(node)

        for out in roots:
            if not isinstance(out, DataNode):
                raise TypeError(f"Pipeline outputs must be DataNodes, got {type(out)}")
            if out.source is not None:
                visit(out.source)
        return Graph(order, list(outputs))

    # -- CSE (reference graph/cse.cc) -----------------------------------------
    def deduplicate(self) -> "Graph":
        """Merge structurally identical stateless ops."""
        key_to_op: Dict[str, OpNode] = {}
        replace: Dict[int, OpNode] = {}
        kept: List[OpNode] = []
        for op in self.ops:
            for i, inp in enumerate(op.spec.inputs):
                if inp.source is not None and inp.source.id in replace:
                    op.spec.inputs[i] = replace[inp.source.id].outputs[inp.source_idx]
            for k, inp in list(op.spec.arg_inputs.items()):
                if inp.source is not None and inp.source.id in replace:
                    op.spec.arg_inputs[k] = replace[inp.source.id].outputs[inp.source_idx]
            payload = {k: v for k, v in op.spec._extra.items() if k != "_origin"}
            if not op.spec.schema.is_stateless or payload:
                kept.append(op)
                continue
            key = _cse_key(op)
            if key in key_to_op:
                replace[op.id] = key_to_op[key]
            else:
                key_to_op[key] = op
                kept.append(op)
        outputs = []
        for out in self.outputs:
            if out.source is not None and out.source.id in replace:
                outputs.append(replace[out.source.id].outputs[out.source_idx])
            else:
                outputs.append(out)
        return Graph(kept, outputs)

    # -- serialization ---------------------------------------------------------
    def serialize(self, pipeline_params: Optional[dict] = None,
                  include_callables: bool = False) -> str:
        ops = []
        for op in self.ops:
            entry = {
                "name": op.instance_name,
                "schema": op.spec.schema_name,
                "device": op.device,
                "args": op.spec.serializable_args(),
                "inputs": [[i.source.instance_name, i.source_idx] for i in op.spec.inputs],
                "arg_inputs": {
                    k: [v.source.instance_name, v.source_idx] for k, v in op.spec.arg_inputs.items()
                },
                # recorded, not recomputed at load: ops whose output count
                # depends on non-serialized _extra payloads (readers.TFRecord
                # counts its _features) would deserialize with 0 outputs and
                # crash the first consumer's rewiring
                "num_outputs": len(op.outputs),
            }
            if include_callables:
                # by-value pickle of implementation payloads (external_source
                # sources, python_function callables) so deserialize restores
                # a RUNNABLE pipeline — the analogue of the reference's
                # dill-based ExternalSource serialization (opt-in because the
                # payload embeds code)
                import base64

                from . import pickling

                blobs = {}
                for k, v in op.spec._extra.items():
                    if k == "_origin" or v is None:
                        continue
                    blobs[k] = base64.b64encode(
                        pickling.dumps(v, by_value_all=True)).decode("ascii")
                if blobs:
                    entry["pickled_extra"] = blobs
            ops.append(entry)
        doc = {
            "format": "dali_tpu.graph.v1",
            "params": pipeline_params or {},
            "ops": ops,
            "outputs": [[o.source.instance_name, o.source_idx, o.device] for o in self.outputs],
        }
        return json.dumps(doc, indent=1)

    @staticmethod
    def deserialize(payload: str) -> "Graph":
        doc = json.loads(payload)
        if doc.get("format") != "dali_tpu.graph.v1":
            raise ValueError("Unrecognized serialized pipeline format")
        nodes: Dict[str, OpNode] = {}
        ops: List[OpNode] = []
        for i, entry in enumerate(doc["ops"]):
            spec = OpSpec(entry["schema"], device=entry["device"], name=entry["name"],
                          _defer_required=True, **entry["args"])
            for k, blob in entry.get("pickled_extra", {}).items():
                import base64

                from . import pickling

                spec._extra[k] = pickling.loads(base64.b64decode(blob))
            for src_name, idx in entry["inputs"]:
                spec.AddInput(nodes[src_name].outputs[idx])
            for k, (src_name, idx) in entry.get("arg_inputs", {}).items():
                spec.arg_inputs[k] = nodes[src_name].outputs[idx]
            spec.validate_required()
            node = OpNode(i, spec)
            # prefer the recorded count (see serialize); fall back to the
            # schema for pre-num_outputs payloads
            n_out = entry.get("num_outputs", None)
            if n_out is None:
                n_out = spec.num_outputs()
            node.outputs = [
                DataNode(f"{entry['name']}[{j}]", _out_device(spec), node, j) for j in range(n_out)
            ]
            nodes[entry["name"]] = node
            ops.append(node)
        outputs = [nodes[name].outputs[idx] for name, idx, dev in doc["outputs"]]
        return Graph(ops, outputs)

    def to_dot(self) -> str:
        """Graphviz export (reference ``graph/graph2dot.cc``,
        ``Pipeline.save_graph_to_dot_file`` pipeline.py:1837)."""
        lines = ["digraph pipeline {"]
        color = {"cpu": "lightblue", "mixed": "orange", "gpu": "lightgreen"}
        for op in self.ops:
            lines.append(
                f'  "{op.instance_name}" [label="{op.spec.schema_name}\\n{op.device}",'
                f' style=filled, fillcolor={color.get(op.device, "white")}];'
            )
            for inp in op.all_input_nodes():
                if inp.source is not None:
                    lines.append(f'  "{inp.source.instance_name}" -> "{op.instance_name}";')
        lines.append("}")
        return "\n".join(lines)


def _out_device(spec: OpSpec) -> str:
    return "gpu" if spec.device in ("gpu", "mixed") else "cpu"


def _cse_key(op: OpNode) -> str:
    spec = op.spec
    parts = [spec.schema_name, spec.device]
    for k in sorted(spec.args):
        parts.append(f"{k}={spec.args[k]!r}")
    for inp in spec.inputs:
        parts.append(f"i:{inp.source.id if inp.source else '?'}:{inp.source_idx}")
    for k in sorted(spec.arg_inputs):
        v = spec.arg_inputs[k]
        parts.append(f"a:{k}:{v.source.id if v.source else '?'}:{v.source_idx}")
    return "|".join(parts)

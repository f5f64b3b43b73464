"""Sequence operators (reference ``dali/operators/sequence/``: element_extract.cc,
per_frame.cc, sequence_rearrange.cc). Frame dim is the leading 'F' layout dim."""

from __future__ import annotations

import numpy as np

from .._schema import DALI_SCHEMA, ArgType, register_operator
from ..batch import DeviceBatch, HostBatch
from .base import Operator

DALI_SCHEMA("ElementExtract").DocStr(
    "Extracts elements (frames) from sequences (reference element_extract.cc); "
    "one output per entry in element_map."
).NumInput(1).OutputFn(lambda spec: max(len(spec.GetArgument("element_map") or [0]), 1)).Devices(
    "cpu", "gpu"
).AddArg("element_map", ArgType.INT_VEC, "Frame indices to extract.")


@register_operator("ElementExtract", "cpu")
class ElementExtractCPU(Operator):
    def run_batch(self, ctx, inp: HostBatch):
        emap = self.spec.GetArgument("element_map")
        outs = []
        layout = inp.layout[1:] if inp.layout.startswith("F") else inp.layout
        for e in emap:
            outs.append(HostBatch([s[e] for s in inp.samples], layout=layout))
        return outs


@register_operator("ElementExtract", "gpu")
class ElementExtractGPU(Operator):
    def lower(self, dctx, inp: DeviceBatch):
        emap = self.spec.GetArgument("element_map")
        layout = inp.layout[1:] if inp.layout.startswith("F") else inp.layout
        outs = []
        for e in emap:
            shapes = inp.shapes[:, 1:] if inp.shapes is not None else None
            outs.append(DeviceBatch(inp.data[:, e], shapes, layout))
        return outs


DALI_SCHEMA("SequenceRearrange").DocStr(
    "Reorders frames within each sequence (reference sequence_rearrange.cc)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddArg(
    "new_order", ArgType.INT_VEC, "New frame order.", tensor_ok=True, per_sample=True
)


@register_operator("SequenceRearrange", "cpu")
class SequenceRearrangeCPU(Operator):
    def run_sample(self, ctx, idx, seq):
        order = np.asarray(ctx.arg(self, "new_order", idx), np.int64).reshape(-1)
        return np.ascontiguousarray(seq[order])


@register_operator("SequenceRearrange", "gpu")
class SequenceRearrangeGPU(Operator):
    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp

        order = dctx.arg(self, "new_order")
        if hasattr(order, "ndim") and order.ndim == 2:
            # per-sample orders
            import jax

            out = jax.vmap(lambda s, o: s[o])(inp.data, order.astype(jnp.int32))
        else:
            order = jnp.asarray(order, jnp.int32).reshape(-1)
            out = inp.data[:, order]
        shapes = inp.shapes
        return [DeviceBatch(out, shapes, inp.layout)]


DALI_SCHEMA("PerFrame").DocStr(
    "Marks a tensor argument as per-frame (reference per_frame.cc); here a layout "
    "annotation pass-through."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").Passthrough().AddOptionalArg(
    "replace", ArgType.BOOL, "Replace existing layout.", False
)


@register_operator("PerFrame", "cpu")
class PerFrameCPU(Operator):
    def run_batch(self, ctx, inp: HostBatch):
        layout = inp.layout
        if not layout.startswith("F"):
            layout = "F" + (layout[1:] if self.spec.GetArgument("replace", False) else layout)
        return [HostBatch(inp.samples, layout=layout)]


@register_operator("PerFrame", "gpu")
class PerFrameGPU(Operator):
    def lower(self, dctx, inp: DeviceBatch):
        layout = inp.layout
        if not layout.startswith("F"):
            layout = "F" + (layout[1:] if self.spec.GetArgument("replace", False) else layout)
        return [DeviceBatch(inp.data, inp.shapes, layout)]

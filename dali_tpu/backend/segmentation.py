"""Segmentation operators (reference ``dali/operators/segmentation/``:
random_mask_pixel.cc, random_object_bbox.cc, select_masks.cc)."""

from __future__ import annotations

import numpy as np

from .._schema import DALI_SCHEMA, ArgType, register_operator
from ..batch import HostBatch
from .base import Operator

DALI_SCHEMA("segmentation.RandomMaskPixel").DocStr(
    "Picks a random pixel coordinate, optionally from the foreground "
    "(reference random_mask_pixel.cc)."
).NumInput(1).NumOutput(1).Devices("cpu").AddRandomSeedArg().AddOptionalArg(
    "foreground", ArgType.INT, "Sample only from pixels > threshold/value.", 0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "value", ArgType.INT, "Exact foreground value to sample.", None, tensor_ok=True, per_sample=True
).AddOptionalArg("threshold", ArgType.FLOAT, "Foreground threshold.", 0.0, tensor_ok=True, per_sample=True)


@register_operator("segmentation.RandomMaskPixel", "cpu")
class RandomMaskPixel(Operator):
    def run_sample(self, ctx, idx, mask):
        rng = ctx.rng(self, idx)
        fg = int(np.asarray(ctx.arg(self, "foreground", idx, 0)))
        if fg:
            value = ctx.arg(self, "value", idx, None)
            if value is not None:
                cand = np.argwhere(mask == int(np.asarray(value)))
            else:
                thr = float(np.asarray(ctx.arg(self, "threshold", idx, 0.0)))
                cand = np.argwhere(mask > thr)
            if len(cand):
                return cand[int(rng.integers(0, len(cand)))].astype(np.int64)
        coords = [int(rng.integers(0, d)) for d in mask.shape]
        return np.asarray(coords, np.int64)

    def output_layout(self, j, inputs):
        return ""


DALI_SCHEMA("segmentation.RandomObjectBBox").DocStr(
    "Bounding box of a randomly selected connected component / labeled object "
    "(reference random_object_bbox.cc)."
).NumInput(1).OutputFn(
    lambda spec: {"anchor_shape": 2, "start_end": 2, "box": 1}.get(spec.GetArgument("format", "anchor_shape"), 2)
    + (1 if spec.GetArgument("output_class", False) else 0)
).Devices("cpu").AddRandomSeedArg().AddOptionalArg(
    "format", ArgType.STRING, "'anchor_shape', 'start_end', or 'box'.", "anchor_shape"
).AddOptionalArg(
    "background", ArgType.INT, "Background label.", 0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "classes", ArgType.INT_VEC, "Labels eligible for selection.", None
).AddOptionalArg(
    "foreground_prob", ArgType.FLOAT, "Probability of picking foreground.", 1.0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "by_instance", ArgType.BOOL, "Treat connected components as instances.", False
).AddOptionalArg("output_class", ArgType.BOOL, "Also output the selected class label.", False)


@register_operator("segmentation.RandomObjectBBox", "cpu")
class RandomObjectBBox(Operator):
    def run_sample(self, ctx, idx, mask):
        from scipy import ndimage

        rng = ctx.rng(self, idx)
        bg = int(np.asarray(ctx.arg(self, "background", idx, 0)))
        fg_prob = float(np.asarray(ctx.arg(self, "foreground_prob", idx, 1.0)))
        fmt = self.spec.GetArgument("format", "anchor_shape")
        out_class = self.spec.GetArgument("output_class", False)
        nd = mask.ndim

        def full_box():
            start = np.zeros(nd, np.int32)
            end = np.asarray(mask.shape, np.int32)
            return start, end, bg

        if rng.random() > fg_prob:
            start, end, cls = full_box()
        else:
            classes = self.spec.GetArgument("classes", None)
            labels = np.unique(mask)
            labels = labels[labels != bg]
            if classes:
                labels = np.array([l for l in labels if l in set(classes)])
            if len(labels) == 0:
                start, end, cls = full_box()
            else:
                cls = int(labels[int(rng.integers(0, len(labels)))])
                bin_mask = mask == cls
                if self.spec.GetArgument("by_instance", False):
                    comp, n = ndimage.label(bin_mask)
                    pick = int(rng.integers(1, n + 1)) if n > 0 else 0
                    bin_mask = comp == pick
                idxs = np.argwhere(bin_mask)
                start = idxs.min(axis=0).astype(np.int32)
                end = (idxs.max(axis=0) + 1).astype(np.int32)
        outs = []
        if fmt == "anchor_shape":
            outs = [start, (end - start).astype(np.int32)]
        elif fmt == "start_end":
            outs = [start, end]
        else:
            outs = [np.concatenate([start, end]).astype(np.int32)]
        if out_class:
            outs.append(np.int32(cls))
        return tuple(outs)

    def output_layout(self, j, inputs):
        return ""


DALI_SCHEMA("segmentation.SelectMasks").DocStr(
    "Selects polygon masks by mask ids (reference select_masks.cc). Inputs: "
    "(mask_ids, polygons [n,3], vertices [m,2]); outputs filtered (polygons, vertices)."
).NumInput(3).NumOutput(2).Devices("cpu").AddOptionalArg(
    "reindex_masks", ArgType.BOOL, "Renumber selected masks densely.", False
)


@register_operator("segmentation.SelectMasks", "cpu")
class SelectMasks(Operator):
    def run_sample(self, ctx, idx, mask_ids, polygons, vertices):
        ids = np.asarray(mask_ids, np.int64).reshape(-1)
        polys = polygons.reshape(-1, 3)
        keep = np.isin(polys[:, 0], ids)
        sel = polys[keep].copy()
        out_v = []
        new_polys = []
        cursor = 0
        reindex = self.spec.GetArgument("reindex_masks", False)
        id_map = {int(v): i for i, v in enumerate(ids)} if reindex else None
        for p in sel:
            mid, v0, v1 = int(p[0]), int(p[1]), int(p[2])
            n = v1 - v0
            out_v.append(vertices[v0:v1])
            new_polys.append([id_map[mid] if reindex else mid, cursor, cursor + n])
            cursor += n
        if out_v:
            return np.asarray(new_polys, polys.dtype), np.concatenate(out_v, axis=0)
        return np.zeros((0, 3), polys.dtype), np.zeros((0,) + vertices.shape[1:], vertices.dtype)

    def output_layout(self, j, inputs):
        return ""

"""Miscellaneous operators: io.file.Read, PowerSpectrum, MultiPaste, DumpImage.

Reference: ``dali/operators/io/file/`` (io__file__Read),
``dali/operators/signal/fft/power_spectrum.cc``, ``dali/operators/image/paste/
multipaste.cc``, ``dali/operators/debug/dump_image.cc``.
"""

from __future__ import annotations

import numpy as np

from .._schema import DALI_SCHEMA, ArgType, register_operator
from ..batch import DeviceBatch, HostBatch
from .base import Operator

# ====================================== io.file.Read ===============================================

DALI_SCHEMA("io.file.Read").DocStr(
    "Reads whole files named by the input (reference io__file__Read)."
).NumInput(1).NumOutput(1).Devices("cpu").AddOptionalArg(
    "dont_use_mmap", ArgType.BOOL, "Plain reads instead of mmap.", False
)


@register_operator("io.file.Read", "cpu")
class IoFileRead(Operator):
    def run_sample(self, ctx, idx, fname):
        path = bytes(np.asarray(fname).tobytes()).decode().rstrip("\x00")
        with open(path, "rb") as f:
            return np.frombuffer(f.read(), np.uint8).copy()


# ====================================== PowerSpectrum ==============================================

DALI_SCHEMA("PowerSpectrum").DocStr(
    "Power spectrum of a 1-D signal (reference signal/fft/power_spectrum.cc)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
    "nfft", ArgType.INT, "FFT size (default: signal length).", None
).AddOptionalArg("axis", ArgType.INT, "Transform axis.", -1).AddOptionalArg(
    "power", ArgType.INT, "2 = power, 1 = magnitude.", 2
)


@register_operator("PowerSpectrum", "cpu")
class PowerSpectrumCPU(Operator):
    def run_sample(self, ctx, idx, x):
        axis = self.spec.GetArgument("axis", -1)
        nfft = self.spec.GetArgument("nfft", None) or x.shape[axis]
        spec = np.abs(np.fft.rfft(x.astype(np.float32), n=nfft, axis=axis))
        if self.spec.GetArgument("power", 2) == 2:
            spec = spec * spec
        return spec.astype(np.float32)


@register_operator("PowerSpectrum", "gpu")
class PowerSpectrumGPU(Operator):
    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp

        axis = self.spec.GetArgument("axis", -1)
        if axis >= 0:
            axis += 1
        nfft = self.spec.GetArgument("nfft", None) or inp.data.shape[axis]
        spec = jnp.abs(jnp.fft.rfft(inp.data.astype(jnp.float32), n=nfft, axis=axis))
        if self.spec.GetArgument("power", 2) == 2:
            spec = spec * spec
        return [DeviceBatch(spec.astype(jnp.float32), None, inp.layout)]


# ====================================== MultiPaste ==================================================

DALI_SCHEMA("MultiPaste").DocStr(
    """Pastes regions of (possibly several) input samples onto an output canvas
    (reference image/paste/multipaste.cc — the Mosaic-augmentation primitive).
    Regions are selected by ``in_ids`` + ``in_anchors``/``shapes`` and placed at
    ``out_anchors``."""
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddArg(
    "in_ids", ArgType.INT_VEC, "Source sample index per pasted region.", tensor_ok=True, per_sample=True
).AddOptionalArg(
    "in_anchors", ArgType.INT_VEC, "Flattened [k, 2] source anchors.", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "shapes", ArgType.INT_VEC, "Flattened [k, 2] region shapes.", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "out_anchors", ArgType.INT_VEC, "Flattened [k, 2] destination anchors.", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "output_size", ArgType.INT_VEC, "Output canvas (H, W).", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "dtype", ArgType.DATA_TYPE, "Output dtype.", None
).AddOptionalArg(
    "in_anchors_rel", ArgType.FLOAT_VEC,
    "Flattened [k, 2] source anchors relative to each source sample's extent "
    "(reference multipaste.cc `in_anchors_rel`).", None,
    tensor_ok=True, per_sample=True
).AddOptionalArg(
    "shapes_rel", ArgType.FLOAT_VEC,
    "Flattened [k, 2] region shapes relative to each source sample's extent.",
    None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "out_anchors_rel", ArgType.FLOAT_VEC,
    "Flattened [k, 2] destination anchors relative to the output canvas.",
    None, tensor_ok=True, per_sample=True)


def resolve_mp_regions(op, ctx, i, ids, src_hw, out_hw):
    """Resolve MultiPaste anchors/shapes from absolute or *_rel arguments.

    Returns (in_anchors[k,2] int, out_anchors[k,2] int, shapes[k,2] int or
    None). Relative values scale by the source sample extents (in_anchors,
    shapes) or the output canvas (out_anchors), reference multipaste.cc."""
    k = len(ids)

    def get(name, scale):
        v = ctx.arg(op, name, i, None)
        if v is not None:
            return np.asarray(v, np.float64).reshape(k, 2).round().astype(np.int64)
        rv = ctx.arg(op, name + "_rel", i, None)
        if rv is not None:
            rv = np.asarray(rv, np.float64).reshape(k, 2) * scale
            return rv.round().astype(np.int64)
        return None

    src_hw = np.asarray(src_hw, np.float64).reshape(k, 2)
    ia = get("in_anchors", src_hw)
    oa = get("out_anchors", np.asarray(out_hw, np.float64)[None].repeat(k, 0))
    sh = get("shapes", src_hw)
    z = np.zeros((k, 2), np.int64)
    return (ia if ia is not None else z), (oa if oa is not None else z), sh


@register_operator("MultiPaste", "cpu")
class MultiPaste(Operator):
    def run_batch(self, ctx, inp: HostBatch):
        out_samples = []
        for i in range(len(inp)):
            ids = np.asarray(ctx.arg(self, "in_ids", i), np.int64).reshape(-1)
            k = len(ids)
            osz = ctx.arg(self, "output_size", i, None)
            ref = inp.samples[i]
            oh, ow = (int(osz[0]), int(osz[1])) if osz is not None else ref.shape[:2]
            canvas = np.zeros((oh, ow, ref.shape[2]), ref.dtype)
            src_hw = [inp.samples[int(s)].shape[:2] for s in ids]
            in_anchors, out_anchors, shapes_arg = resolve_mp_regions(
                self, ctx, i, ids, src_hw, (oh, ow))
            for j, sid in enumerate(ids):
                src = inp.samples[int(sid)]
                if shapes_arg is not None:
                    rh, rw = shapes_arg[j]
                else:
                    rh, rw = src.shape[0], src.shape[1]
                iy, ix = in_anchors[j]
                oy, ox = out_anchors[j]
                rh = int(min(rh, src.shape[0] - iy, oh - oy))
                rw = int(min(rw, src.shape[1] - ix, ow - ox))
                if rh > 0 and rw > 0:
                    canvas[oy : oy + rh, ox : ox + rw] = src[iy : iy + rh, ix : ix + rw]
            out_samples.append(canvas)
        return [HostBatch(out_samples, layout=inp.layout or "HWC")]


# ====================================== DumpImage ===================================================

DALI_SCHEMA("DumpImage").DocStr(
    "Writes images to disk for debugging (reference debug/dump_image.cc); passes "
    "its input through."
).NumInput(1).NumOutput(1).Devices("cpu").Passthrough().AddOptionalArg(
    "suffix", ArgType.STRING, "Filename suffix.", ""
).AddOptionalArg("input_layout", ArgType.TENSOR_LAYOUT, "Layout of the input.", "HWC")


@register_operator("DumpImage", "cpu")
class DumpImage(Operator):
    def run_batch(self, ctx, inp: HostBatch):
        import cv2

        suffix = self.spec.GetArgument("suffix", "")
        layout = inp.layout or self.spec.GetArgument("input_layout", "HWC")
        for i, s in enumerate(inp.samples):
            if layout == "CHW" and s.ndim == 3:
                s = np.transpose(s, (1, 2, 0))
            if s.ndim == 3 and s.shape[-1] in (1, 3):
                img = s[:, :, ::-1] if s.shape[-1] == 3 else s
                cv2.imwrite(f"dump_{ctx.iteration}_{i}{('_' + suffix) if suffix else ''}.png", img)
        return [inp]

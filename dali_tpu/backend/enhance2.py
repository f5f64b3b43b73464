"""CLAHE, Debayer, OpticalFlow (host implementations).

Reference: ``dali/operators/image/clahe/`` (GPU hist/LUT), debayer
(``imgproc/color_manipulation/debayer``), ``dali/operators/sequence/optical_flow/``
(NVIDIA OF SDK hardware engine — no TPU analogue, so Farneback on host per
SURVEY §2.4 "optical flow = no HW engine")."""

from __future__ import annotations

import numpy as np

from .._schema import DALI_SCHEMA, ArgType, register_operator
from .base import Operator

DALI_SCHEMA("experimental.Clahe").DocStr(
    "Contrast-limited adaptive histogram equalization on the luma channel "
    "(reference image/clahe/)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
    "clip_limit", ArgType.FLOAT, "Contrast clip limit.", 4.0
).AddOptionalArg("tiles_x", ArgType.INT, "Grid tiles (x).", 8).AddOptionalArg(
    "tiles_y", ArgType.INT, "Grid tiles (y).", 8
).AddOptionalArg(
    "bins", ArgType.INT,
    "Histogram bins (power of 2; reference clahe_op.cc `bins`). The cpu "
    "delegate (cv2) supports 256 only; the gpu lowering honors any value.",
    256
).AddOptionalArg(
    "luma_only", ArgType.BOOL,
    "RGB inputs: equalize the luminance channel and scale chroma (True, "
    "default) or equalize each channel independently (False).", True
)


@register_operator("experimental.Clahe", "cpu")
class Clahe(Operator):
    def run_sample(self, ctx, idx, img):
        from .. import native

        bins = int(self.spec.GetArgument("bins", 256))
        clip = float(self.spec.GetArgument("clip_limit", 4.0))
        tx = int(self.spec.GetArgument("tiles_x", 8))
        ty = int(self.spec.GetArgument("tiles_y", 8))
        luma_only = bool(self.spec.GetArgument("luma_only", True))
        if native.available() and native.has_host_imgproc():
            # own-code kernel (host_ops.cc) whose math mirrors the gpu
            # lowering (ClaheGPU) operation-for-operation — the framework's
            # cpu reference semantics are now its own, not OpenCV's
            # (test_host_imgproc asserts cpu==gpu to <=1 LSB and a stated
            # tolerance vs cv2 for the single-plane core).
            f = img.astype(np.float32)

            def plane(p):
                return native.clahe_f32(p, clip, tx, ty, bins)

            if img.ndim == 3 and img.shape[-1] == 3:
                if not luma_only:
                    out = np.stack([plane(f[..., c]) for c in range(3)], -1)
                else:
                    luma = (0.299 * f[..., 0] + 0.587 * f[..., 1]
                            + 0.114 * f[..., 2])
                    eq = plane(luma)
                    ratio = (eq + 1.0) / (luma + 1.0)
                    out = f * ratio[..., None]
            else:
                p = f[..., 0] if f.ndim == 3 else f
                eq = plane(p)
                out = eq[..., None] if f.ndim == 3 else eq
            if np.issubdtype(img.dtype, np.integer):
                info = np.iinfo(img.dtype)
                out = np.clip(np.round(out), info.min, info.max)
            return out.astype(img.dtype)
        import cv2

        if bins != 256:
            raise ValueError(
                "experimental.Clahe cpu fallback supports bins=256 only (cv2); "
                "use device='gpu' or the native runtime for other bin counts")
        clahe = cv2.createCLAHE(clipLimit=clip, tileGridSize=(tx, ty))
        if img.ndim == 3 and img.shape[-1] == 3:
            if not luma_only:
                return np.stack([clahe.apply(img[..., c]) for c in range(3)], axis=-1)
            lab = cv2.cvtColor(img, cv2.COLOR_RGB2LAB)
            lab[..., 0] = clahe.apply(lab[..., 0])
            return cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)
        out = clahe.apply(img[..., 0] if img.ndim == 3 else img)
        return out[..., None] if img.ndim == 3 else out


DALI_SCHEMA("experimental.Debayer").DocStr(
    "Bayer→RGB demosaicing (reference debayer op; bilinear algorithm)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
    "blue_position", ArgType.INT_VEC, "Position of the blue sample in the 2x2 tile (y, x).", [0, 0]
).AddOptionalArg("algorithm", ArgType.STRING, "'bilinear_npp' (compat) / 'edge_aware'.", "bilinear_npp")


@register_operator("experimental.Debayer", "cpu")
class Debayer(Operator):
    def run_sample(self, ctx, idx, raw):
        from .. import native

        bp = tuple(int(v) for v in self.spec.GetArgument("blue_position", [0, 0]))
        x = raw[..., 0] if raw.ndim == 3 else raw
        algo = self.spec.GetArgument("algorithm", "bilinear_npp")
        if (algo != "edge_aware" and native.available() and native.has_debayer()
                and x.dtype in (np.uint8, np.uint16)):
            # own-code bilinear demosaic (host_ops.cc) — BIT-IDENTICAL to the
            # gpu lowering (straggler_gpu.py DebayerGPU) by construction;
            # reference: dali/kernels/imgproc/color_manipulation/debayer/
            return native.debayer_bilinear(x, bp[0], bp[1])
        import cv2

        # no-native fallback, and the edge-aware variant (cv2 _EA codes).
        # cv2's pattern letters name the colors at the SECOND row's 2nd/3rd
        # columns, so blue at (0,0) is cv2's "RG" pattern (verified
        # empirically with a constant-color mosaic; the golden debayer test
        # guards this — round 2 fixed an R/B swap here that the gpu lowering
        # exposed).
        code = {
            (0, 0): cv2.COLOR_BayerRG2RGB,
            (0, 1): cv2.COLOR_BayerGR2RGB,
            (1, 0): cv2.COLOR_BayerGB2RGB,
            (1, 1): cv2.COLOR_BayerBG2RGB,
        }[bp]
        if algo == "edge_aware":
            code = code - cv2.COLOR_BayerBG2RGB + cv2.COLOR_BayerBG2RGB_EA
        return cv2.cvtColor(x, code)

    def output_layout(self, j, inputs):
        return "HWC"


DALI_SCHEMA("OpticalFlow").DocStr(
    "Dense optical flow between consecutive frames (reference "
    "sequence/optical_flow/ — hardware engine there; Farneback here). Input "
    "[F, H, W, C]; output [F-1, H/grid, W/grid, 2] float32 (x, y) flow."
).NumInput(1).NumOutput(1).Devices("cpu").AddOptionalArg(
    "output_grid", ArgType.INT, "Output downsampling grid.", 4
).AddOptionalArg(
    "preset", ArgType.FLOAT, "Quality preset (0=slow/best, 1=fast; compat).", 0.0
).AddOptionalArg(
    "enable_temporal_hints", ArgType.BOOL, "Compatibility no-op.", False
).AddOptionalArg("image_type", ArgType.IMAGE_TYPE, "Input color space.", None)


@register_operator("OpticalFlow", "cpu")
class OpticalFlow(Operator):
    def run_sample(self, ctx, idx, seq):
        import cv2

        grid = max(1, self.spec.GetArgument("output_grid", 4))
        frames = [
            cv2.cvtColor(f, cv2.COLOR_RGB2GRAY) if f.ndim == 3 and f.shape[-1] == 3 else f.squeeze(-1)
            for f in seq
        ]
        flows = []
        for a, b in zip(frames[:-1], frames[1:]):
            flow = cv2.calcOpticalFlowFarneback(
                a, b, None, pyr_scale=0.5, levels=3, winsize=15, iterations=3,
                poly_n=5, poly_sigma=1.2, flags=0,
            )
            flows.append(flow[::grid, ::grid].astype(np.float32))
        return np.stack(flows, axis=0)

    def output_layout(self, j, inputs):
        return "FHWC"

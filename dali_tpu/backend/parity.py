"""API-parity operators and legacy aliases.

The reference keeps two generations of operator names alive: the modern
namespaced ones (``readers__File``, ``decoders__Image``) and the deprecated
flat aliases (``FileReader``, ``ImageDecoder``, ``Uniform``, …) registered by
``deprecated.cc`` stubs. This module registers the same aliases onto the same
implementations, plus a few remaining public ops: ``decoders.Numpy``,
``decoders.Video``, ``RandomCropGenerator``, ``ROIRandomCrop``,
``experimental.WarpPerspective``, ``readers.VideoResize`` and experimental
name variants.
"""

from __future__ import annotations

import io

import numpy as np

from .._schema import _alias_targets, DALI_SCHEMA, ArgType, _impl_registry, _registry, register_operator
from ..batch import DeviceBatch, HostBatch
from ..types import DALIInterpType
from .base import Operator
from .decoders import sample_rrc_window


def alias_schema(alias: str, target: str):
    """Register ``alias`` as a second name for ``target``'s schema and impls
    (the reference's deprecation stubs, e.g. operators/reader/file_reader_op.cc
    registering FileReader alongside readers__File)."""
    if alias in _registry:
        return
    _registry[alias] = _registry[target]
    _alias_targets[alias] = target  # impl lookup resolves through this
    for (name, dev), impl in list(_impl_registry.items()):
        if name == target:
            _impl_registry[(alias, dev)] = impl


_LEGACY = {
    # ops the reference promoted out of the experimental namespace (both
    # names stay registered there: image/clahe/clahe_op.cc DALI_SCHEMA(Clahe),
    # image/color/equalize.cc, image/convolution/filter.cc, debayer)
    "Clahe": "experimental.Clahe",
    "Equalize": "experimental.Equalize",
    "Filter": "experimental.Filter",
    "Debayer": "experimental.Debayer",
    "FileReader": "readers.File",
    "COCOReader": "readers.COCO",
    "CaffeReader": "readers.Caffe",
    "Caffe2Reader": "readers.Caffe2",
    "MXNetReader": "readers.MXNet",
    "TFRecordReader": "readers.TFRecord",
    "NumpyReader": "readers.Numpy",
    "SequenceReader": "readers.Sequence",
    "NemoAsrReader": "readers.NemoAsr",
    "VideoReader": "readers.Video",
    "ImageDecoder": "decoders.Image",
    "ImageDecoderCrop": "decoders.ImageCrop",
    "ImageDecoderRandomCrop": "decoders.ImageRandomCrop",
    "ImageDecoderSlice": "decoders.ImageSlice",
    "AudioDecoder": "decoders.Audio",
    "Uniform": "random.Uniform",
    "CoinFlip": "random.CoinFlip",
    "NormalDistribution": "random.Normal",
    "AudioResample": "experimental.AudioResample",
    # experimental variants sharing the stable implementation
    "experimental.decoders.Image": "decoders.Image",
    "experimental.decoders.ImageCrop": "decoders.ImageCrop",
    "experimental.decoders.ImageRandomCrop": "decoders.ImageRandomCrop",
    "experimental.decoders.ImageSlice": "decoders.ImageSlice",
    "experimental.Inflate": "decoders.Inflate",
    "experimental.readers.Fits": "readers.Fits",
    "experimental.readers.Video": "readers.Video",
    "experimental.PeekImageShape": "PeekImageShape",
    "reductions.RMS": "reductions.RootMeanSquare",
}


def register_aliases():
    missing = []
    for alias, target in _LEGACY.items():
        if target in _registry:
            alias_schema(alias, target)
        else:
            missing.append(target)
    return missing


# ====================================== decoders.Numpy ============================================

DALI_SCHEMA("decoders.Numpy").DocStr(
    "Parses serialized .npy buffers (reference decoders__Numpy, "
    "operators/decoder/numpy/)."
).NumInput(1).NumOutput(1).Devices("cpu", "mixed").AddOptionalArg(
    "dtype", ArgType.DATA_TYPE, "Cast the parsed array to this dtype.", None)


@register_operator("decoders.Numpy", "cpu")
@register_operator("decoders.Numpy", "mixed")
class NumpyDecoder(Operator):
    def run_sample(self, ctx, idx, buf):
        arr = np.lib.format.read_array(io.BytesIO(np.ascontiguousarray(buf).tobytes()),
                                       allow_pickle=False)
        dt = self.spec.GetArgument("dtype", None)
        if dt is not None:
            from ..types import to_numpy_type

            arr = arr.astype(to_numpy_type(dt))
        return np.ascontiguousarray(arr)


# ====================================== decoders.Video ============================================

DALI_SCHEMA("decoders.Video").DocStr(
    """Decodes a whole encoded video buffer to [F, H, W, C] uint8 (reference
    decoders__Video / experimental__decoders__Video; FFmpeg on the host —
    there is no NVDEC analogue on TPU hosts)."""
).NumInput(1).NumOutput(1).Devices("cpu", "mixed").AddOptionalArg(
    "start_frame", ArgType.INT, "First frame.", 0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "sequence_length", ArgType.INT, "Frames to decode (0 = all).", 0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "stride", ArgType.INT, "Frame stride.", 1
).AddOptionalArg(
    "end_frame", ArgType.INT,
    "Decode frames [start_frame, end_frame) — alternative to "
    "sequence_length (reference video_decoder_cpu.cc).", 0,
    tensor_ok=True, per_sample=True
).AddOptionalArg(
    "pad_mode", ArgType.STRING,
    'Sequence padding when the video runs short: "none", "constant" '
    '(pad_value), "edge"/"repeat", "reflect_1001"/"symmetric", '
    '"reflect_101"/"reflect" (reference video_decoder_cpu.cc).', "constant"
).AddOptionalArg(
    "pad_value", ArgType.FLOAT, "Constant pad value.", 0.0
).AddOptionalArg(
    "fill_value", ArgType.FLOAT, "Alias of pad_value.", None
).AddOptionalArg(
    "build_index", ArgType.BOOL,
    "Build a frame index for faster seeking (hint; the FFmpeg host decoder "
    "seeks sequentially).", True)


class _YUVPlanShort(Exception):
    """The planar-YUV wire plan (sized from the container's duration*fps
    frame-count ESTIMATE) filled completely and more real frames exist past
    it — the batch must re-run on the dense path, which reads to EOF."""


@register_operator("decoders.Video", "cpu")
@register_operator("decoders.Video", "mixed")
class VideoDecoder(Operator):
    def run_sample(self, ctx, idx, buf):
        import os
        import tempfile

        from ..native import VideoFile

        with tempfile.NamedTemporaryFile(suffix=".mp4", delete=False) as f:
            f.write(np.ascontiguousarray(buf).tobytes())
            path = f.name
        try:
            vf = VideoFile(path)
            start = int(np.asarray(ctx.arg(self, "start_frame", idx, 0)))
            length = int(np.asarray(ctx.arg(self, "sequence_length", idx, 0)))
            end = int(np.asarray(ctx.arg(self, "end_frame", idx, 0)))
            stride = self.spec.GetArgument("stride", 1)
            if length <= 0 and end > 0:
                length = max((end - start + stride - 1) // stride, 1)
            requested = length
            if length <= 0:
                length = max((vf.num_frames - start + stride - 1) // stride, 1)
                requested = 0  # "all available": never pad
            frames = vf.read(start, length, stride, pad=False)
            vf.close()
            if requested and frames.shape[0] < requested:
                frames = self._pad_sequence(frames, requested)
            return frames
        finally:
            os.unlink(path)

    def _pad_sequence(self, frames, want):
        """Short-video padding (reference pad_mode semantics)."""
        from .video import pad_frames

        fv = self.spec.GetArgument("fill_value", None)
        if fv is None:
            fv = self.spec.GetArgument("pad_value", 0.0)
        return pad_frames(frames, want, self.spec.GetArgument("pad_mode", "constant"), fv)

    def stage_batch_multi(self, ctx, ins, canvases):
        """Mixed fast path: 4:2:0 inputs cross the boundary as the planar
        YUV wire (see backend/video.py VideoReaderMixed — half the RGB24
        bytes, device BT.601, bit-equal to the cpu path). Zero 'constant'
        padding maps exactly (YUV black → RGB 0); nonzero fills and
        non-4:2:0 (or range-mixed) batches fall back to dense RGB staging.
        Planned emit counts come from the requested lengths (or the header's
        num_frames for 'all'), so the wire offsets are sized before any
        decode; the actual decoded counts shrink/pad per sample after."""
        import os
        import tempfile

        import numpy as np

        from .. import native
        from ..native import VideoFile
        from .video import pad_indices, stage_yuv_batch

        spec = self.spec
        pad_mode = spec.GetArgument("pad_mode", "constant")
        fv = spec.GetArgument("fill_value", None)
        if fv is None:
            fv = spec.GetArgument("pad_value", 0.0)
        if pad_mode == "constant" and float(np.asarray(fv).reshape(-1)[0]) != 0.0:
            return None
        inp = ins[0]
        n = len(inp.samples)
        stride = spec.GetArgument("stride", 1)
        vfs, paths, plans = [], [], []
        try:
            classes = set()
            for idx in range(n):
                f = tempfile.NamedTemporaryFile(suffix=".mp4", delete=False)
                f.write(np.ascontiguousarray(inp.samples[idx]).tobytes())
                f.close()
                paths.append(f.name)
                vf = VideoFile(f.name)
                vfs.append(vf)
                classes.add(vf.pixfmt_class)
                if len(classes) != 1 or 0 in classes:
                    # non-4:2:0 or range-mixed: bail BEFORE writing/opening
                    # the rest — the dense RGB path redoes this work
                    return None
                start = int(np.asarray(ctx.arg(self, "start_frame", idx, 0)))
                length = int(np.asarray(ctx.arg(self, "sequence_length", idx, 0)))
                end = int(np.asarray(ctx.arg(self, "end_frame", idx, 0)))
                if length <= 0 and end > 0:
                    length = max((end - start + stride - 1) // stride, 1)
                requested = length
                if length <= 0:
                    length = max((vf.num_frames - start + stride - 1) // stride, 1)
                    requested = 0  # "all available": never pad
                # padding samples request exactly `requested` frames (the
                # output IS that size); shrink samples ('all' / pad_mode
                # none) cap the PLANNED wire at the header estimate +2 — the
                # whole flat buffer crosses the tunnel, so planning a huge
                # sequence_length for a short clip must not ship slack, while
                # the +2 tolerates duration*fps estimate rounding (the
                # ACTUAL emitted count still comes back from read_yuv)
                shrink = not requested or pad_mode == "none"
                if shrink:
                    avail = max((vf.num_frames - start + stride - 1) // stride, 1)
                    length = min(length, avail + 2)
                # probe only when the plan's size came from the duration*fps
                # ESTIMATE ('all available', or the estimate capped a larger
                # request) — a plan that exactly satisfies the user's request
                # cannot be truncated, and probing it would find a next frame
                # on every normal long clip and bounce the batch to the dense
                # path forever
                probe = shrink and (requested == 0 or length < requested)
                plans.append((start, length, shrink, probe))

            full_range = classes.pop() == 2

            def decode_into(i, ys, us, vs, emit):
                start, length, shrink, probe = plans[i]
                fy = ys.shape[0] // emit
                fc = us.shape[0] // emit
                _, _, _, got = vfs[i].read_yuv(
                    start, length, stride, pad=False,
                    out=(ys[: length * fy], us[: length * fc],
                         vs[: length * fc]))
                if shrink:  # 'all available' / pad_mode none: emit what exists
                    if probe and got == length:
                        # the plan's cap comes from a duration*fps ESTIMATE
                        # (+2 slack); a completely filled plan may mean more
                        # real frames exist past it (bad metadata / VFR) —
                        # probe one more frame, and if it exists, bail to
                        # the dense path (vf.read to EOF) rather than emit a
                        # silently truncated sequence the cpu path wouldn't
                        try:
                            _, _, _, extra = vfs[i].read_yuv(
                                start + length * stride, 1, stride,
                                pad=False)
                        except ValueError:
                            extra = 0  # clean EOF: the plan was exact
                        if extra > 0:
                            raise _YUVPlanShort()
                    return got
                if emit > got:
                    if pad_mode == "constant":
                        ys[got * fy: emit * fy] = 0 if full_range else 16
                        us[got * fc: emit * fc] = 128
                        vs[got * fc: emit * fc] = 128
                    else:  # frame replication commutes with the conversion
                        src = pad_indices(got, emit, pad_mode)
                        y3 = ys.reshape(emit, fy)
                        u3 = us.reshape(emit, fc)
                        v3 = vs.reshape(emit, fc)
                        y3[got:] = y3[src]
                        u3[got:] = u3[src]
                        v3[got:] = v3[src]
                return emit

            dims = [(plans[i][1], vfs[i].height, vfs[i].width)
                    for i in range(n)]
            try:
                return [stage_yuv_batch(self, dims, full_range, canvases[0],
                                        decode_into)]
            except (_YUVPlanShort, native.VideoPixfmtChanged):
                # Short plan (estimate undercounted) or mid-stream
                # pixfmt/dimension change: fall back to the dense RGB path.
                # Short plans it handles fully (vf.read reads to EOF);
                # format changes it swscales per frame; a mid-stream
                # DIMENSION change stops the dense read at the change and
                # pads by repeating the last pre-change frame — identical
                # to the cpu path's behavior on the same file, which is the
                # contract (cpu == mixed), not full decode across splices.
                # Partial ring-buffer writes are harmless, the buffers are
                # re-taken every batch.
                return None
        finally:
            for vf in vfs:
                vf.close()
            for p in paths:
                try:
                    os.unlink(p)
                except OSError:
                    pass

    def output_layout(self, j, inputs):
        return "FHWC"


alias_schema("experimental.decoders.Video", "decoders.Video")


# ====================================== RandomCropGenerator =======================================

DALI_SCHEMA("RandomCropGenerator").DocStr(
    "Samples area/aspect crop windows without cropping (reference "
    "image/crop/random_crop_generator.cc): outputs (anchor, shape)."
).NumInput(1).NumOutput(2).Devices("cpu").AddRandomSeedArg().AddOptionalArg(
    "random_area", ArgType.FLOAT_VEC, "Crop area range.", [0.08, 1.0]
).AddOptionalArg(
    "random_aspect_ratio", ArgType.FLOAT_VEC, "Aspect-ratio range.", [3 / 4, 4 / 3]
).AddOptionalArg("num_attempts", ArgType.INT, "Sampling attempts.", 10)


@register_operator("RandomCropGenerator", "cpu")
class RandomCropGenerator(Operator):
    def run_batch(self, ctx, inp: HostBatch):
        area = self.spec.GetArgument("random_area")
        ar = self.spec.GetArgument("random_aspect_ratio")
        attempts = self.spec.GetArgument("num_attempts", 10)
        anchors, shapes = [], []
        for i, shp in enumerate(inp.samples):
            s = np.asarray(shp).reshape(-1)
            h, w = int(s[0]), int(s[1])
            rng = ctx.rng(self, i)
            y, x, ch, cw = sample_rrc_window(rng, h, w, area, ar, attempts)
            anchors.append(np.array([y, x], np.int64))
            shapes.append(np.array([ch, cw], np.int64))
        return [HostBatch(anchors), HostBatch(shapes)]


# ====================================== ROIRandomCrop =============================================

DALI_SCHEMA("ROIRandomCrop").DocStr(
    """Fixed-shape crop window placed randomly so it covers as much of the
    given ROI as possible (reference generic/roi_random_crop.cc). Outputs the
    window anchor."""
).NumInput(0, 1).NumOutput(1).Devices("cpu").AddRandomSeedArg().AddArg(
    "crop_shape", ArgType.INT_VEC, "Window shape.", tensor_ok=True, per_sample=True
).AddArg(
    "roi_start", ArgType.INT_VEC, "ROI start.", tensor_ok=True, per_sample=True
).AddOptionalArg(
    "roi_end", ArgType.INT_VEC, "ROI end.", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "roi_shape", ArgType.INT_VEC, "ROI shape.", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "in_shape", ArgType.INT_VEC, "Input shape bounds.", None, tensor_ok=True, per_sample=True
)


@register_operator("ROIRandomCrop", "cpu")
class ROIRandomCrop(Operator):
    def run_batch(self, ctx, *inputs):
        n = len(inputs[0]) if inputs else ctx.batch_size
        out = []
        for i in range(n):
            crop = np.asarray(ctx.arg(self, "crop_shape", i), np.int64).reshape(-1)
            rs = np.asarray(ctx.arg(self, "roi_start", i), np.int64).reshape(-1)
            re_ = ctx.arg(self, "roi_end", i, None)
            if re_ is None:
                rshape = np.asarray(ctx.arg(self, "roi_shape", i), np.int64).reshape(-1)
                re_ = rs + rshape
            else:
                re_ = np.asarray(re_, np.int64).reshape(-1)
            ishape = ctx.arg(self, "in_shape", i, None)
            if ishape is None and inputs:
                ishape = np.asarray(inputs[0].samples[i]).reshape(-1)
            ishape = None if ishape is None else np.asarray(ishape, np.int64).reshape(-1)
            rng = ctx.rng(self, i)
            anchor = np.zeros_like(crop)
            for d in range(len(crop)):
                # window must contain the ROI when it fits, else overlap maximally
                lo = max(int(re_[d]) - int(crop[d]), 0)
                hi = min(int(rs[d]), (int(ishape[d]) - int(crop[d])) if ishape is not None else int(rs[d]))
                if ishape is not None:
                    hi = max(min(hi, int(ishape[d]) - int(crop[d])), 0)
                if hi < lo:
                    lo, hi = hi, lo
                anchor[d] = int(rng.integers(lo, hi + 1))
            out.append(anchor)
        return [HostBatch(out)]


# ====================================== WarpPerspective ===========================================

DALI_SCHEMA("experimental.WarpPerspective").DocStr(
    """Perspective (homography) warp (reference
    image/remap/cvcuda/warp_perspective.cu — CV-CUDA there; an XLA per-pixel
    homography divide + bilinear gather here). ``matrix`` is the 3x3
    destination→source mapping (``inverse_map=False`` inverts it)."""
).NumInput(1, 2).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
    "matrix", ArgType.FLOAT_VEC, "3x3 homography (row-major).", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "size", ArgType.FLOAT_VEC, "Output size (H, W).", None
).AddOptionalArg(
    "fill_value", ArgType.FLOAT, "Out-of-bounds fill.", 0.0
).AddOptionalArg(
    "interp_type", ArgType.INTERP_TYPE, "NN or linear.", DALIInterpType.INTERP_LINEAR
).AddOptionalArg(
    "inverse_map", ArgType.BOOL, "Matrix maps dst→src (True).", True
).AddOptionalArg(
    "border_mode", ArgType.STRING,
    '"constant" (fill_value outside) or "replicate" (clamp to edge). '
    "Reference cvcuda/warp_perspective.cc `border_mode`.", "constant"
).AddOptionalArg(
    "pixel_origin", ArgType.STRING,
    '"corner" (default; (0,0) = top-left corner of the top-left pixel, '
    'OpenGL-style) or "center" (OpenCV-style). Reference '
    "warp_perspective.cc `pixel_origin`.", "corner")


class _WarpPerspectiveCommon(Operator):
    def _matrix(self, raw):
        m = np.asarray(raw, np.float32).reshape(3, 3)
        if not self.spec.GetArgument("inverse_map", True):
            m = np.linalg.inv(m).astype(np.float32)
        return self._origin_adjust(m, np)

    def _origin_adjust(self, m, xp):
        """pixel_origin='corner': indices address pixel CENTERS at i+0.5, so
        conjugate the dst→src map with the half-pixel shift; 'center' uses
        index coordinates directly (OpenCV convention, what the gather does).
        Works for [3,3] and batched [N,3,3] matrices."""
        if self.spec.GetArgument("pixel_origin", "corner") != "corner":
            return m
        to_corner = xp.asarray(
            [[1, 0, 0.5], [0, 1, 0.5], [0, 0, 1]], m.dtype if hasattr(m, "dtype") else None)
        to_center = xp.asarray(
            [[1, 0, -0.5], [0, 1, -0.5], [0, 0, 1]], m.dtype if hasattr(m, "dtype") else None)
        return to_center @ m @ to_corner


@register_operator("experimental.WarpPerspective", "cpu")
class WarpPerspectiveCPU(_WarpPerspectiveCommon):
    def run_sample(self, ctx, idx, img, *mtx_in):
        import cv2

        raw = mtx_in[0] if mtx_in else ctx.arg(self, "matrix", idx)
        m = self._matrix(raw)
        size = self.spec.GetArgument("size", None)
        out_h, out_w = (int(size[0]), int(size[1])) if size else img.shape[:2]
        interp = self.spec.GetArgument("interp_type", DALIInterpType.INTERP_LINEAR)
        flags = (cv2.INTER_NEAREST if interp == DALIInterpType.INTERP_NN else cv2.INTER_LINEAR)
        fill = self.spec.GetArgument("fill_value", 0.0)
        # our matrix is dst→src; cv2.warpPerspective wants src→dst unless WARP_INVERSE_MAP
        border = (cv2.BORDER_REPLICATE
                  if self.spec.GetArgument("border_mode", "constant") == "replicate"
                  else cv2.BORDER_CONSTANT)
        out = cv2.warpPerspective(
            img, m, (out_w, out_h), flags=flags | cv2.WARP_INVERSE_MAP,
            borderMode=border, borderValue=[fill] * 4,
        )
        return np.ascontiguousarray(out if out.ndim == img.ndim else out[..., None])


@register_operator("experimental.WarpPerspective", "gpu")
class WarpPerspectiveGPU(_WarpPerspectiveCommon):
    def lower(self, dctx, inp: DeviceBatch, *mtx_in):
        import jax.numpy as jnp

        from ..kernels import warp as wk

        n = inp.batch_size
        if mtx_in:
            m = mtx_in[0].data.reshape(n, 3, 3).astype(jnp.float32)
        else:
            raw = dctx.arg(self, "matrix")
            m = jnp.asarray(raw, jnp.float32).reshape(-1, 3, 3)
            if m.shape[0] == 1:
                m = jnp.broadcast_to(m, (n, 3, 3))
        if not self.spec.GetArgument("inverse_map", True):
            m = jnp.linalg.inv(m)
        m = self._origin_adjust(m, jnp)
        size = self.spec.GetArgument("size", None)
        H, W = inp.data.shape[1:3]
        out_h, out_w = (int(size[0]), int(size[1])) if size else (H, W)
        interp = self.spec.GetArgument("interp_type", DALIInterpType.INTERP_LINEAR)
        fill = self.spec.GetArgument("fill_value", 0.0)
        ext = inp.shapes[:, :2] if inp.shapes is not None else None
        out = wk.warp_perspective_batch(
            inp.data, m, out_h, out_w, ext, interp, fill, inp.data.dtype,
            replicate=self.spec.GetArgument("border_mode", "constant") == "replicate",
        )
        shapes = None
        if inp.shapes is not None and size is None:
            shapes = inp.shapes  # same canvas semantics as input
        return [DeviceBatch(out, shapes, inp.layout or "HWC")]


# ====================================== readers.VideoResize =======================================

from .video import _VideoReaderImpl  # noqa: E402


def _video_resize_schema():
    s = DALI_SCHEMA("readers.VideoResize")
    base = _registry["readers.Video"]
    # share the reader arg set, add resize extents
    s.DocStr(
        "readers.Video fused with per-frame resize (reference readers__VideoResize)."
    )
    s.args = dict(base.args)
    s.min_inputs, s.max_inputs = base.min_inputs, base.max_inputs
    s.output_fn = base.output_fn
    s.num_outputs = base.num_outputs
    s.devices = ("cpu", "mixed")
    s.is_reader = True
    s.is_stateless = False
    s.AddOptionalArg("resize_x", ArgType.FLOAT, "Output width.", 0.0)
    s.AddOptionalArg("resize_y", ArgType.FLOAT, "Output height.", 0.0)
    s.AddOptionalArg("resize_shorter", ArgType.FLOAT, "Resize shorter edge.", 0.0)
    s.AddOptionalArg("resize_longer", ArgType.FLOAT, "Resize longer edge.", 0.0)
    s.AddOptionalArg("size", ArgType.FLOAT_VEC, "Output size (H, W).", None)
    s.AddOptionalArg("mode", ArgType.STRING,
                     '"default", "stretch", "not_larger", "not_smaller".', "default")
    s.AddOptionalArg("interp_type", ArgType.INTERP_TYPE, "Interpolation.",
                     DALIInterpType.INTERP_LINEAR)
    s.AddOptionalArg("antialias", ArgType.BOOL, "Antialias on downscale.", True)
    s.AddOptionalArg("mag_filter", ArgType.INTERP_TYPE, "Filter for upscaling.", None)
    s.AddOptionalArg("min_filter", ArgType.INTERP_TYPE, "Filter for downscaling.", None)
    s.AddOptionalArg("roi_relative", ArgType.BOOL, "ROI in relative coords.", False)
    s.AddOptionalArg("roi_start", ArgType.FLOAT_VEC, "Input ROI origin.", None)
    s.AddOptionalArg("roi_end", ArgType.FLOAT_VEC, "Input ROI end.", None)
    s.AddOptionalArg("subpixel_scale", ArgType.BOOL,
                     "Adjust scale for fractional sizes.", True)
    s.AddOptionalArg("resize_z", ArgType.FLOAT,
                     "Volumetric depth (n/a for video frames).", 0.0)
    s.AddOptionalArg("minibatch_size", ArgType.INT,
                     "Reference GPU kernel batching hint (compat).", 32)
    s.AddOptionalArg("temp_buffer_hint", ArgType.INT,
                     "Reference GPU scratch hint (compat).", 0)
    return s


_video_resize_schema()


@register_operator("readers.VideoResize", "cpu")
@register_operator("readers.VideoResize", "mixed")
class VideoResizeReader(_VideoReaderImpl):
    def _read_payload(self, index: int):
        from .image import compute_resize_size

        out = super()._read_payload(index)
        frames = out[0] if isinstance(out, tuple) else out
        spec = self.spec
        f, h, w, c = frames.shape
        # optional input ROI (reference ResizeAttr roi_start/roi_end)
        rs0 = spec.GetArgument("roi_start", None)
        re0 = spec.GetArgument("roi_end", None)
        if rs0 is not None or re0 is not None:
            rel = spec.GetArgument("roi_relative", False)
            s0 = np.asarray(rs0 if rs0 is not None else ([0.0, 0.0] if rel else [0, 0]), np.float64)
            e0 = np.asarray(re0 if re0 is not None else ([1.0, 1.0] if rel else [h, w]), np.float64)
            if rel:
                s0, e0 = s0 * [h, w], e0 * [h, w]
            y0, x0 = int(round(s0[0])), int(round(s0[1]))
            y1, x1 = int(round(e0[0])), int(round(e0[1]))
            frames = frames[:, max(y0, 0):max(y1, y0 + 1), max(x0, 0):max(x1, x0 + 1)]
            h, w = frames.shape[1:3]
        try:
            oh, ow = compute_resize_size(h, w, spec,
                                         lambda n, d=None: spec.GetArgument(n, d))
        except ValueError:  # no resize extents given: pass through
            oh, ow = h, w
        if (oh, ow) != (h, w):
            # per-frame resample on the framework's own tap-plan math (the
            # same kernel as Resize/RCM cpu — not a cv2 delegate), matching
            # the reference's derivation of VideoResize from its one
            # resampling kernel (dali/operators/reader/video_reader_op.h)
            from ..kernels.resample import host_resample
            from .image import _pick_filter

            interp = _pick_filter(spec, oh < h or ow < w)
            antialias = spec.GetArgument("antialias", True)
            frames = np.stack([host_resample(fr, oh, ow, interp, antialias)
                               for fr in frames])
        return (frames,) + tuple(out[1:]) if isinstance(out, tuple) else frames


alias_schema("VideoReaderResize", "readers.VideoResize")

_ALIAS_MISS = register_aliases()


# ====================================== TensorResize ==============================================

DALI_SCHEMA("TensorResize").DocStr(
    "Resizes arbitrary-dimensional tensors (reference "
    "generic/resize/tensor_resize_cpu.cc + image/resize/tensor_resize_attr.cc)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
    "sizes", ArgType.FLOAT_VEC, "Output sizes per resized axis.", None,
    tensor_ok=True, per_sample=True
).AddOptionalArg(
    "scales", ArgType.FLOAT_VEC, "Scale factors per resized axis.", None,
    tensor_ok=True, per_sample=True
).AddOptionalArg(
    "axes", ArgType.INT_VEC, "Axes the sizes/scales refer to.", None
).AddOptionalArg(
    "alignment", ArgType.FLOAT, "ROI alignment for rounded extents (0..1); accepted for compatibility (extents are rounded per size_rounding).", 0.5
).AddOptionalArg(
    "interp_type", ArgType.INTERP_TYPE, "Interpolation.", DALIInterpType.INTERP_LINEAR
).AddOptionalArg(
    "antialias", ArgType.BOOL, "Antialias on downscale.", True
).AddOptionalArg(
    "dtype", ArgType.DATA_TYPE, "Output dtype.", None
).AddOptionalArg(
    "axis_names", ArgType.TENSOR_LAYOUT,
    "Axes to resize named by layout letters (alternative to `axes`).", None
).AddOptionalArg(
    "mode", ArgType.STRING, '"default", "stretch", "not_larger", "not_smaller".', "default"
).AddOptionalArg(
    "roi_start", ArgType.FLOAT_VEC, "Input ROI origin (per resized axis).", None,
    tensor_ok=True, per_sample=True
).AddOptionalArg(
    "roi_end", ArgType.FLOAT_VEC, "Input ROI end (per resized axis).", None,
    tensor_ok=True, per_sample=True
).AddOptionalArg(
    "roi_relative", ArgType.BOOL, "ROI in relative [0,1] coords.", False
).AddOptionalArg(
    "size_rounding", ArgType.STRING,
    'Fractional output extent rounding: "round", "truncate", "ceil" '
    "(reference tensor_resize_attr.cc).", "round"
).AddOptionalArg(
    "subpixel_scale", ArgType.BOOL, "Adjust scale for fractional sizes.", True
).AddOptionalArg(
    "mag_filter", ArgType.INTERP_TYPE, "Filter for upscaling.", None
).AddOptionalArg(
    "min_filter", ArgType.INTERP_TYPE, "Filter for downscaling.", None
).AddOptionalArg(
    "minibatch_size", ArgType.INT,
    "Reference GPU kernel batching hint; accepted for compatibility.", 32
).AddOptionalArg(
    "temp_buffer_hint", ArgType.INT,
    "Reference GPU scratch-size hint; accepted for compatibility.", 0
)


@register_operator("TensorResize", "cpu")
class TensorResize(Operator):
    def run_batch(self, ctx, inp):
        self._in_layout = inp.layout or ""
        return super().run_batch(ctx, inp)

    def run_sample(self, ctx, idx, x):
        from scipy import ndimage

        from ..types import to_numpy_type

        spec = self.spec
        axes = spec.GetArgument("axes", None)
        nd = x.ndim
        names = spec.GetArgument("axis_names", None)
        if names and not axes:
            layout = getattr(self, "_in_layout", "") or ""
            if not layout:
                raise ValueError("TensorResize axis_names requires a layout on the input")
            axes = [layout.index(ch) for ch in names]
        if not axes:
            axes = list(range(nd))
        # optional per-axis input ROI
        rs = ctx.arg(self, "roi_start", idx, None)
        re_ = ctx.arg(self, "roi_end", idx, None)
        if rs is not None or re_ is not None:
            rel = spec.GetArgument("roi_relative", False)
            exts = [x.shape[a] for a in axes]
            s0 = np.asarray(rs if rs is not None else [0.0] * len(axes), np.float64).reshape(-1)
            e0 = np.asarray(re_ if re_ is not None else ([1.0] * len(axes) if rel else exts),
                            np.float64).reshape(-1)
            if rel:
                s0 = s0 * exts
                e0 = e0 * exts
            sl = [slice(None)] * nd
            for k, a in enumerate(axes):
                sl[a] = slice(int(round(s0[k])), max(int(round(e0[k])), int(round(s0[k])) + 1))
            x = x[tuple(sl)]
        from .generic2 import _crop_round

        # "round" = half away from zero (reference std::round), NOT Python's
        # banker's rounding
        rounding = {"round": lambda v: _crop_round(v, "round"),
                    "truncate": int,
                    "ceil": lambda v: int(-(-v // 1))}[spec.GetArgument("size_rounding", "round")]
        sizes = ctx.arg(self, "sizes", idx, None)
        scales = ctx.arg(self, "scales", idx, None)
        zoom = [1.0] * nd
        for nm, v in (("sizes", sizes), ("scales", scales)):
            if v is not None and np.asarray(v).reshape(-1).size != len(axes):
                raise ValueError(
                    f"TensorResize: `{nm}` has "
                    f"{np.asarray(v).reshape(-1).size} entries but "
                    f"{len(axes)} axes are being resized (pass `axes`/"
                    f"`axis_names`, or one entry per input dim)")
        if sizes is not None:
            sizes = np.asarray(sizes, np.float64).reshape(-1)
            mode = spec.GetArgument("mode", "default")
            if mode in ("not_larger", "not_smaller") and sizes.size:
                ratios = [float(sizes[k]) / x.shape[a] for k, a in enumerate(axes)]
                r = min(ratios) if mode == "not_larger" else max(ratios)
                sizes = np.asarray([rounding(x.shape[a] * r) for a in axes], np.float64)
            for k, a in enumerate(axes):
                zoom[a] = float(rounding(sizes[k])) / x.shape[a]
        elif scales is not None:
            scales = np.asarray(scales, np.float64).reshape(-1)
            for k, a in enumerate(axes):
                zoom[a] = float(scales[k])
        else:
            raise ValueError("TensorResize requires `sizes` or `scales`")
        interp = spec.GetArgument("interp_type", DALIInterpType.INTERP_LINEAR)
        order = 0 if interp == DALIInterpType.INTERP_NN else 1
        out = ndimage.zoom(x.astype(np.float32), zoom, order=order, grid_mode=True,
                           mode="nearest")
        dt = spec.GetArgument("dtype", None)
        if dt is not None:
            out = out.astype(to_numpy_type(dt))
        elif np.issubdtype(x.dtype, np.integer):
            out = np.clip(np.round(out), np.iinfo(x.dtype).min, np.iinfo(x.dtype).max).astype(x.dtype)
        return np.ascontiguousarray(out)


alias_schema("experimental.TensorResize", "TensorResize")
alias_schema("experimental.Resize", "Resize")  # ref experimental/resize_op.cc
alias_schema("TransformTranslation", "transforms.Translation")  # deprecated name


# ====================================== BBoxRotate ================================================

DALI_SCHEMA("BBoxRotate").DocStr(
    """Rotates bounding boxes so they track an fn.rotate of the image
    (reference bbox/bbox_rotate.cc): each box's corners rotate about the image
    center; the output is their axis-aligned hull, clipped to the canvas.
    With ``keep_size=False`` the canvas grows like fn.rotate's; boxes fully
    outside are removed (labels, when given, are filtered identically)."""
).NumInput(1, 2).OutputFn(lambda spec: len(spec.inputs)).Devices("cpu").AddArg(
    "angle", ArgType.FLOAT, "Rotation angle in degrees.", tensor_ok=True, per_sample=True
).AddArg(
    "input_shape", ArgType.INT_VEC, "Original image shape.", tensor_ok=True, per_sample=True
).AddOptionalArg(
    "shape_layout", ArgType.TENSOR_LAYOUT, "Meaning of input_shape dims.", "HW"
).AddOptionalArg(
    "bbox_layout", ArgType.TENSOR_LAYOUT, "'xyXY' or 'xyWH'.", "xyXY"
).AddOptionalArg(
    "bbox_normalized", ArgType.BOOL, "Boxes are in [0,1] coords.", True
).AddOptionalArg(
    "keep_size", ArgType.BOOL, "Canvas keeps the input size.", False
).AddOptionalArg(
    "size", ArgType.FLOAT_VEC,
    "Output canvas size override — the `size` given to the paired fn.rotate "
    "(reference bbox_rotate.cc).", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "mode", ArgType.STRING,
    'Box transform mode: "expand" (axis-aligned hull of the rotated corners), '
    '"fixed" (keep original box extents, recentered), "halfway" (midpoint of '
    "the two). Reference bbox_rotate.cc.", "expand"
).AddOptionalArg(
    "remove_threshold", ArgType.FLOAT,
    "Remove boxes whose remaining area fraction after clipping to the canvas "
    "falls below this threshold (0 = never remove, 1 = remove if any part is "
    "outside).", 0.1)


@register_operator("BBoxRotate", "cpu")
class BBoxRotate(Operator):
    def run_batch(self, ctx, boxes_b, *labels_b):
        out_boxes, out_labels = [], []
        for i, b in enumerate(boxes_b.samples):
            angle = float(np.asarray(ctx.arg(self, "angle", i)))
            shape = np.asarray(ctx.arg(self, "input_shape", i), np.float64).reshape(-1)
            layout = self.spec.GetArgument("shape_layout", "HW")
            h = shape[layout.index("H")] if "H" in layout else shape[0]
            w = shape[layout.index("W")] if "W" in layout else shape[1]
            norm = self.spec.GetArgument("bbox_normalized", True)
            ltrb = self.spec.GetArgument("bbox_layout", "xyXY") == "xyXY"
            keep = self.spec.GetArgument("keep_size", False)
            bb = np.asarray(b, np.float64).reshape(-1, 4).copy()
            if bb.size == 0:
                out_boxes.append(bb.astype(np.float32))
                out_labels.append(np.zeros((0,), np.int32))
                continue
            if not ltrb:
                bb[:, 2:] += bb[:, :2]
            scale = np.array([w, h, w, h]) if norm else np.ones(4)
            bb *= scale
            a = np.deg2rad(angle)
            c, s = np.cos(a), np.sin(a)
            # fn.rotate convention: output canvas of the rotated image
            size_arg = ctx.arg(self, "size", i, None)
            if size_arg is not None:
                sz = np.asarray(size_arg, np.float64).reshape(-1)
                oh, ow = (float(sz[0]), float(sz[-1])) if sz.size > 1 else (float(sz[0]),) * 2
            elif keep:
                ow, oh = w, h
            else:
                ow = abs(w * c) + abs(h * s)
                oh = abs(w * s) + abs(h * c)
            cx, cy = w / 2, h / 2
            ocx, ocy = ow / 2, oh / 2
            corners = np.stack([
                bb[:, [0, 1]], bb[:, [2, 1]], bb[:, [0, 3]], bb[:, [2, 3]]
            ], axis=1)  # [M, 4, 2]
            rel = corners - [cx, cy]
            # forward (content) map — the inverse of fn.rotate's dst→src
            # rotation_matrix [[c,-s],[s,c]]
            rx = rel[..., 0] * c + rel[..., 1] * s + ocx
            ry = -rel[..., 0] * s + rel[..., 1] * c + ocy
            nb = np.stack([rx.min(1), ry.min(1), rx.max(1), ry.max(1)], axis=1)
            mode = self.spec.GetArgument("mode", "expand")
            if mode in ("fixed", "halfway"):
                # "fixed": original box extents around the rotated center;
                # "halfway": midpoint between fixed and expanded extents
                # (reference bbox_rotate.cc Mode)
                mid = np.stack([(nb[:, 0] + nb[:, 2]) / 2, (nb[:, 1] + nb[:, 3]) / 2], axis=1)
                ow0 = bb[:, 2] - bb[:, 0]
                oh0 = bb[:, 3] - bb[:, 1]
                if mode == "halfway":
                    ow0 = (ow0 + (nb[:, 2] - nb[:, 0])) / 2
                    oh0 = (oh0 + (nb[:, 3] - nb[:, 1])) / 2
                nb = np.stack([mid[:, 0] - ow0 / 2, mid[:, 1] - oh0 / 2,
                               mid[:, 0] + ow0 / 2, mid[:, 1] + oh0 / 2], axis=1)
            area0 = np.maximum((nb[:, 2] - nb[:, 0]) * (nb[:, 3] - nb[:, 1]), 1e-9)
            nb[:, [0, 2]] = np.clip(nb[:, [0, 2]], 0, ow)
            nb[:, [1, 3]] = np.clip(nb[:, [1, 3]], 0, oh)
            area1 = (nb[:, 2] - nb[:, 0]) * (nb[:, 3] - nb[:, 1])
            # remove_threshold: fraction of the box surviving the canvas clip
            # (0 keeps everything, 1 keeps only fully-inside boxes)
            thresh = float(self.spec.GetArgument("remove_threshold", 0.1))
            valid = (area1 / area0) >= thresh
            if thresh > 0:
                valid &= (nb[:, 2] > nb[:, 0]) & (nb[:, 3] > nb[:, 1])
            nb = nb[valid]
            if norm:
                nb /= [ow, oh, ow, oh]
            if not ltrb:
                nb[:, 2:] -= nb[:, :2]
            out_boxes.append(nb.astype(np.float32))
            if labels_b:
                lab = np.asarray(labels_b[0].samples[i]).reshape(-1)
                out_labels.append(np.ascontiguousarray(lab[valid]))
        outs = [HostBatch(out_boxes)]
        if labels_b:
            outs.append(HostBatch(out_labels))
        return outs

"""Video readers/decoders.

Reference: ``dali/operators/video/`` (~9.9k LoC: FFmpeg demux +
libavcodec/NVDEC decode) and the legacy ``readers__Video``. TPU plan (SURVEY
§2.4): FFmpeg demux + CPU decode on host (native/src/video_decode.cc); frame
color conversion / resize happen on the device like any image batch.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from .._schema import DALI_SCHEMA, ArgType, register_operator
from ..batch import HostBatch
from .base import Operator
from .readers import BaseReader


def _wire_ring(op):
    """Per-op YUV wire-buffer ring drawing from the host staging arena
    (same lifetime policy as the hybrid decoder's _wire_ring: depth =
    cpu_queue_depth + one being built + one in transfer; see
    native.StagingRing safety contract). Avoids a fresh ~5-8 MiB np.empty
    page-fault storm per batch and keeps staging pages mlock-pinned under
    the async H2D writer."""
    from .. import native

    ring = getattr(op, "_ring", None)
    depth = getattr(op.pipeline, "cpu_queue_depth", 2) + 2
    if ring is None or ring.depth < depth:
        ring = op._ring = native.StagingRing(depth)
    return ring


_INT32_MAX = 2**31 - 1


def stage_yuv_batch(op, dims, full_range, prev_canvas, decode_into,
                    map_indices=None):
    """Shared planar-YUV wire staging for the three video mixed paths
    (readers.Video, experimental.inputs.Video, decoders.Video): per-sample
    offset/shape accounting, ring-backed flat buffers, canvas growth and
    container assembly live HERE so padding/offset fixes apply once.

    ``dims``: planned per-sample luma dims ``[(emit, h, w)]``.
    ``decode_into(i, ys, us, vs, emit)``: decode sample i into its flat
    slices and return the ACTUAL emitted frame count (< emit only for
    samples the caller plans as shrinkable; the caller owns padding
    semantics). ``map_indices(fn, n)`` optionally parallelizes samples.

    The container's canvas is carried 4-dim (F, H, W, 3) so the executor's
    per-edge canvas bookkeeping stays RANK-COMPATIBLE with the dense RGB
    fallback — a corpus that alternates between the YUV wire and the dense
    path across batches must not corrupt the grow-only canvas."""
    from ..executor import _YUVStaged

    n = len(dims)
    shapes = np.empty((n, 4), np.int64)
    yoffs = np.zeros(n, np.int64)
    coffs = np.zeros(n, np.int64)
    ytot = ctot = 0
    for i, (emit, h_, w_) in enumerate(dims):
        shapes[i] = (emit, h_, w_, 3)
        yoffs[i], coffs[i] = ytot, ctot
        ytot += emit * h_ * w_
        ctot += emit * ((h_ + 1) // 2) * ((w_ + 1) // 2)
    if ytot > _INT32_MAX or ctot > _INT32_MAX:
        raise ValueError(
            f"video batch luma/chroma wire ({ytot} / {ctot} elements) "
            "exceeds int32 offset addressing — reduce batch_size or "
            "sequence_length (a padded dense canvas at this size would not "
            "fit either)")
    ring = _wire_ring(op)
    ybuf = ring.take("video_y", ytot, np.uint8)
    ubuf = ring.take("video_u", ctot, np.uint8)
    vbuf = ring.take("video_v", ctot, np.uint8)

    def one(i):
        emit, h_, w_ = dims[i]
        fy = emit * h_ * w_
        fc = emit * ((h_ + 1) // 2) * ((w_ + 1) // 2)
        actual = decode_into(
            i, ybuf[yoffs[i]: yoffs[i] + fy],
            ubuf[coffs[i]: coffs[i] + fc], vbuf[coffs[i]: coffs[i] + fc],
            emit)
        if actual is not None and actual != emit:
            shapes[i, 0] = actual

    (map_indices or (lambda f, m: [f(j) for j in range(m)]))(one, n)
    prev = list(prev_canvas) if prev_canvas else [0, 0, 0]
    canvas = [max(int(prev[d]) if d < len(prev) else 0,
                  int(shapes[:, d].max())) for d in range(3)] + [3]
    return _YUVStaged(ybuf, ubuf, vbuf,
                      np.stack([yoffs, coffs]).astype(np.int32),
                      shapes, canvas, full_range)


def pad_indices(got: int, want: int, mode: str) -> np.ndarray:
    """Source index per padded slot [got, want) (reference pad_mode
    semantics); -1 for constant padding."""
    extra = want - got
    if mode == "constant":
        return np.full(extra, -1, np.int64)
    if mode in ("edge", "repeat"):
        return np.full(extra, got - 1, np.int64)
    if mode in ("reflect_1001", "symmetric"):
        return np.array([(got - 1) - (i % got) if (i // got) % 2 == 0 else i % got
                         for i in range(extra)], np.int64)
    if mode in ("reflect_101", "reflect"):
        if got == 1:
            return np.full(extra, 0, np.int64)
        period = 2 * (got - 1)
        idx = []
        for i in range(extra):
            p = (got - 2 - i) % period
            idx.append(p if p < got else period - p)
        return np.asarray(idx, np.int64)
    raise ValueError(f"Unknown pad_mode {mode!r}")


def pad_frames(frames: np.ndarray, want: int, mode: str, fill=0.0) -> np.ndarray:
    """Pad a short [F, H, W, C] sequence to ``want`` frames (reference
    video pad_mode semantics: none/constant/edge/repeat/reflect variants)."""
    got = frames.shape[0]
    if want - got <= 0 or mode == "none" or got == 0:
        return frames
    idx = pad_indices(got, want, mode)
    if mode == "constant":
        fv = np.asarray(fill, np.float64).reshape(-1)
        pad = np.empty((len(idx),) + frames.shape[1:], frames.dtype)
        pad[...] = fv if fv.size == frames.shape[-1] else fv[0]
    else:
        pad = frames[idx]
    return np.concatenate([frames, pad], axis=0)

DALI_SCHEMA("readers.Video").DocStr(
    """Reads fixed-length frame sequences from video files (reference
    ``readers__Video``). Outputs [F, H, W, C] uint8 (+ label when
    ``file_list``/``labels`` given). Host FFmpeg decode; there is no NVDEC
    analogue on TPU hosts."""
).NumInput(0).OutputFn(
    lambda spec: (1 + (1 if (spec.GetArgument("labels", None)
                             or spec.GetArgument("file_list", None)
                             or spec.GetArgument("file_root", None)) else 0)
                  + (1 if spec.GetArgument("enable_frame_num", False) else 0)
                  + (1 if spec.GetArgument("enable_timestamps", False) else 0))
).Devices(
    "cpu", "mixed"
).MakeReader().AddOptionalArg(
    "filenames", ArgType.STRING_VEC, "Video file paths.", None
).AddOptionalArg(
    "file_root", ArgType.STRING, "Directory with class subdirs of videos.", None
).AddOptionalArg(
    "file_list", ArgType.STRING, "File with 'path label [start end]' lines.", None
).AddOptionalArg(
    "labels", ArgType.INT_VEC, "Labels for `filenames`.", None
).AddArg("sequence_length", ArgType.INT, "Frames per sample.").AddOptionalArg(
    "step", ArgType.INT, "Frame distance between first frames of sequences (-1 = sequence_length).", -1
).AddOptionalArg(
    "stride", ArgType.INT, "Distance between consecutive frames.", 1
).AddOptionalArg(
    "image_type", ArgType.IMAGE_TYPE, "Output color space (RGB).", None
).AddOptionalArg(
    "enable_frame_num", ArgType.BOOL,
    "Extra output: the sequence's first frame index (reference "
    "readers__Video `enable_frame_num`).", False
).AddOptionalArg(
    "enable_timestamps", ArgType.BOOL,
    "Extra output: per-frame timestamps in seconds (frame/fps).", False
).AddOptionalArg(
    "pad_sequences", ArgType.BOOL,
    "Also emit trailing sequences that run past the video's end, padded by "
    "repeating the last frame (reference `pad_sequences`).", False
).AddOptionalArg(
    "normalized", ArgType.BOOL, "Output floats scaled to [0, 1].", False
).AddOptionalArg(
    "dtype", ArgType.DATA_TYPE, "Output dtype (UINT8 or FLOAT).", None
).AddOptionalArg(
    "channels", ArgType.INT, "Output channels: 3 (RGB) or 1 (luma).", 3
).AddOptionalArg(
    "skip_vfr_check", ArgType.BOOL,
    "Skip the variable-frame-rate check (compat hint; the FFmpeg host "
    "decoder indexes frames by decode order).", False
).AddOptionalArg(
    "file_list_frame_num", ArgType.BOOL,
    "file_list start/end columns are frame numbers (True) or seconds "
    "(False).", False
).AddOptionalArg(
    "file_list_include_preceding_frame", ArgType.BOOL,
    "Seconds-based ranges include the frame straddling the start time.",
    False
).AddOptionalArg(
    "file_list_format", ArgType.STRING,
    'Experimental-reader form of the file_list range columns: "frames" or '
    '"timestamps" (reference experimental readers__Video '
    "`file_list_format`; overrides file_list_frame_num when set).", None
).AddOptionalArg(
    "file_list_rounding", ArgType.STRING,
    'Non-exact frame-match rounding: "start_down_end_up" (default), '
    '"start_up_end_down", "all_up", "all_down".', "start_down_end_up"
).AddOptionalArg(
    "file_list_include_end", ArgType.BOOL,
    "Include the end frame in the range.", True
).AddOptionalArg(
    "uniform_sample", ArgType.BOOL,
    "One sequence per video: sequence_length frames spread evenly over the "
    "video (linspace rounded half away from zero; repeats when the video is "
    "shorter). stride/step/pad_mode are ignored.", False
).AddOptionalArg(
    "pad_mode", ArgType.STRING,
    'Short-sequence handling: "none" (emit shorter tails), "constant" '
    '(fill_value), "edge"/"repeat", "reflect_101", "reflect_1001". When set, '
    "tail sequences past the video end are emitted (like pad_sequences).",
    None
).AddOptionalArg(
    "fill_value", ArgType.INT_VEC,
    "Pad value(s) 0..255 for pad_mode='constant' (per channel when several).",
    [0])


class _VideoReaderImpl(BaseReader):
    def __init__(self, spec, op_id):
        super().__init__(spec, op_id)
        self._sequences = None  # [(file_idx, start_frame, label)]
        self._files: List[str] = None
        self._handles: Dict[int, object] = {}
        self._ranges: List = []
        self._fps: Dict[int, float] = {}
        self._corpus_pix = None  # batch-path cache: 0 dense / 1 / 2 (lazy)

    def _build_index(self):
        if self._sequences is not None:
            return
        from .. import native

        spec = self.spec
        files, labels = [], []
        if spec.GetArgument("filenames", None):
            files = list(spec.GetArgument("filenames"))
            arg_labels = spec.GetArgument("labels", None)
            labels = list(arg_labels) if arg_labels else [-1] * len(files)
        elif spec.GetArgument("file_list", None):
            with open(spec.GetArgument("file_list")) as f:
                for line in f:
                    parts = line.split()
                    if not parts:
                        continue
                    if len(parts) >= 4:  # path label start end
                        files.append(parts[0])
                        labels.append(int(parts[1]))
                        self._ranges.append((float(parts[2]), float(parts[3])))
                    else:
                        path, _, lab = line.strip().rpartition(" ")
                        files.append(path)
                        labels.append(int(lab))
                        self._ranges.append(None)
        elif spec.GetArgument("file_root", None):
            root = spec.GetArgument("file_root")
            for li, sub in enumerate(sorted(os.listdir(root))):
                subp = os.path.join(root, sub)
                if os.path.isdir(subp):
                    for fname in sorted(os.listdir(subp)):
                        files.append(os.path.join(subp, fname))
                        labels.append(li)
        else:
            raise ValueError("readers.video requires filenames, file_list, or file_root")
        self._files = files
        L = spec.GetArgument("sequence_length")
        stride = spec.GetArgument("stride", 1)
        step = spec.GetArgument("step", -1)
        if step is None or step < 0:
            step = L
        self._sequences = []
        self._fps = {}
        self._spans = {}   # uniform_sample: fi -> (lo, hi)
        self._limits = {}  # fi -> range end (pad instead of reading past it)
        self._dims = {}    # fi -> (height, width)
        self._pix = {}     # fi -> pixfmt class (0 = not 4:2:0, 1/2 = 4:2:0)
        self._corpus_pix = None  # batch-path cache: 0 dense / 1 / 2 (lazy)
        span = (L - 1) * stride + 1
        pad_mode = spec.GetArgument("pad_mode", None)
        pad_seq = spec.GetArgument("pad_sequences", False) or (
            pad_mode is not None and pad_mode != "none")
        uniform = spec.GetArgument("uniform_sample", False)
        fmt = spec.GetArgument("file_list_format", None)
        by_frame = (fmt == "frames" if fmt is not None
                    else spec.GetArgument("file_list_frame_num", False))
        incl_prev = spec.GetArgument("file_list_include_preceding_frame", False)
        rounding = spec.GetArgument("file_list_rounding", "start_down_end_up")
        lo_fn, hi_fn = {
            "start_down_end_up": (np.floor, np.ceil),
            "start_up_end_down": (np.ceil, np.floor),
            "all_up": (np.ceil, np.ceil),
            "all_down": (np.floor, np.floor),
        }[rounding]
        if fmt is None and not incl_prev:
            lo_fn = np.ceil  # legacy reader: next frame at/after the start time
        for fi, path in enumerate(files):
            v = native.VideoFile(path)
            n = v.num_frames
            fps = getattr(v, "fps", 0.0) or 25.0
            self._fps[fi] = fps
            self._dims[fi] = (v.height, v.width)
            self._pix[fi] = getattr(v, "pixfmt_class", 0)
            v.close()
            rng = self._ranges[fi] if fi < len(self._ranges) else None
            lo, hi = 0, n
            if rng is not None:
                a, b = rng
                if by_frame:
                    lo = int(a) if a >= 0 else n + int(a)
                    hi = (int(b) if b >= 0 else n + int(b)) if b != 0 else n
                    if fmt is not None and spec.GetArgument("file_list_include_end", True):
                        hi += 1
                else:  # seconds
                    lo = int(lo_fn(a * fps))
                    hi = int(hi_fn(b * fps)) if b > 0 else n
                    if fmt is not None and spec.GetArgument("file_list_include_end", True):
                        hi += 1
                lo, hi = max(lo, 0), min(max(hi, lo), n)
            self._limits[fi] = hi
            if uniform:
                if lo < hi:
                    self._spans[fi] = (lo, hi)
                    self._sequences.append((fi, lo, labels[fi]))
                continue
            start = lo
            limit = hi if not pad_seq else hi - 1 + span  # allow padded tails
            while start + (1 if pad_seq else span) <= hi and start + span <= limit:
                self._sequences.append((fi, start, labels[fi]))
                start += step
        if not self._sequences:
            raise ValueError("readers.video found no sequences")

    def _num_samples(self):
        return len(self._sequences)

    def _handle(self, fi):
        from .. import native
        import threading

        h = self._handles.get(fi)
        if h is None:
            h = native.VideoFile(self._files[fi])
            h._lock = threading.Lock()
            self._handles[fi] = h
        return h

    def _has_labels(self):
        s = self.spec
        return bool(
            s.GetArgument("labels", None)
            or s.GetArgument("file_list", None)
            or s.GetArgument("file_root", None)
        )

    def _read_payload(self, index: int):
        fi, start, label = self._sequences[index]
        spec = self.spec
        L = spec.GetArgument("sequence_length")
        stride = spec.GetArgument("stride", 1)
        h = self._handle(fi)
        frame_idxs = None  # actual source-frame index per emitted frame
        if spec.GetArgument("uniform_sample", False):
            # L frames spread evenly over [lo, hi); round half away from zero
            # like std::round (reference experimental readers__Video)
            lo, hi = self._spans[fi]
            t = (np.arange(L) / (L - 1)) if L > 1 else np.zeros(1)
            idxs = lo + np.floor(t * (hi - lo - 1) + 0.5).astype(np.int64)
            with h._lock:
                frames = h.read(lo, hi - lo, 1)
            frames = frames[idxs - lo]
            frame_idxs = idxs
        else:
            # clamp the read to the file_list range end: frames past `hi` are
            # excluded by the range and must be PADDED, not read
            hi = self._limits.get(fi)
            want = L
            if hi is not None:
                want = max(min(L, -(-(hi - start) // stride)), 0)
            # the decoder handle is stateful: serialize reads per file
            with h._lock:
                frames = h.read(start, want, stride,
                                pad=spec.GetArgument("pad_mode", None) is None
                                and want == L)
        got = frames.shape[0]
        if got < L:
            # legacy default (pad_mode unset): repeat the last frame, as
            # pad_sequences always did; "none" leaves the tail short
            mode = spec.GetArgument("pad_mode", None) or "edge"
            frames = pad_frames(frames, L, mode,
                                spec.GetArgument("fill_value", [0]))
        if frame_idxs is None:
            # real frame index per emitted frame; padded slots report the
            # SOURCE frame index of their pad content (edge/reflect), or -1
            # for constant padding (reference readers__Video frame-num
            # semantics)
            frame_idxs = start + np.arange(frames.shape[0], dtype=np.int64) * stride
            if got < frames.shape[0] and got > 0:
                mode = spec.GetArgument("pad_mode", None) or "edge"
                src = pad_indices(got, frames.shape[0], mode)
                frame_idxs[got:] = np.where(src >= 0, frame_idxs[np.maximum(src, 0)], -1)
        if spec.GetArgument("channels", 3) == 1:
            luma = (0.299 * frames[..., 0] + 0.587 * frames[..., 1]
                    + 0.114 * frames[..., 2])
            frames = np.clip(np.round(luma), 0, 255).astype(np.uint8)[..., None]
        dt = spec.GetArgument("dtype", None)
        if spec.GetArgument("normalized", False):
            frames = frames.astype(np.float32) / 255.0
        elif dt is not None:
            from ..types import to_numpy_type

            frames = frames.astype(to_numpy_type(dt))
        outs = [frames]
        if self._has_labels():
            outs.append(np.array([label], np.int32))
        if spec.GetArgument("enable_frame_num", False):
            outs.append(np.array([int(frame_idxs[0])], np.int32))
        if spec.GetArgument("enable_timestamps", False):
            fps = self._fps.get(fi, 25.0)
            ts = np.where(frame_idxs >= 0, frame_idxs / fps, -1.0)
            outs.append(ts.astype(np.float64))
        return tuple(outs) if len(outs) > 1 else outs[0]

    def _payload_layouts(self):
        return ["FHWC", "", "", ""]


@register_operator("readers.Video", "cpu")
class VideoReaderCPU(_VideoReaderImpl):
    pass


@register_operator("readers.Video", "mixed")
class VideoReaderMixed(_VideoReaderImpl):
    """device='mixed': sequences land on the device side (padded [F,H,W,C]).

    Fast path (``stage_batch_multi``): for 4:2:0 sources the frames cross
    the host→device boundary as flat-packed PLANAR YUV (1.5 B/px vs RGB24's
    3 — half the wire) and the chroma upsample + integer BT.601 conversion
    run on the device (executor._yuv420_boundary), bit-identical to the cpu
    reader's own host conversion (video_decode.cc yuv420_frame_to_rgb).
    Mirrors the reference's NVDEC split: decode emits YUV, color conversion
    is GPU work (dali/operators/video/color_space_conversion_impl.h).
    Falls back to dense RGB staging for non-4:2:0 corpora, channels=1,
    float/normalized outputs, and pad_mode none/constant."""

    def _read_planes_into(self, index, y_out, u_out, v_out):
        """Decode one sample's planes straight into its flat wire slices;
        returns (label, frame_idxs, file_idx). Mirrors _read_payload's
        sequence-assembly semantics (range limits, EOF padding, uniform
        sampling) in YUV space — padding replicates whole frames, which
        commutes with the per-pixel color conversion."""
        fi, start, label = self._sequences[index]
        spec = self.spec
        L = spec.GetArgument("sequence_length")
        stride = spec.GetArgument("stride", 1)
        h_, w_ = self._dims[fi]
        ch, cw = (h_ + 1) // 2, (w_ + 1) // 2
        fy, fc = h_ * w_, ch * cw
        hnd = self._handle(fi)
        y3 = y_out.reshape(L, h_, w_)
        u3 = u_out.reshape(L, ch, cw)
        v3 = v_out.reshape(L, ch, cw)
        if spec.GetArgument("uniform_sample", False):
            lo, hi = self._spans[fi]
            t = (np.arange(L) / (L - 1)) if L > 1 else np.zeros(1)
            idxs = lo + np.floor(t * (hi - lo - 1) + 0.5).astype(np.int64)
            with hnd._lock:
                ty, tu, tv, _ = hnd.read_yuv(lo, hi - lo, 1)
            y3[:] = ty[idxs - lo]
            u3[:] = tu[idxs - lo]
            v3[:] = tv[idxs - lo]
            return label, idxs, fi
        hi = self._limits.get(fi)
        want = L
        if hi is not None:
            want = max(min(L, -(-(hi - start) // stride)), 0)
        pad_native = spec.GetArgument("pad_mode", None) is None and want == L
        with hnd._lock:
            _, _, _, got = hnd.read_yuv(
                start, want, stride, pad=pad_native,
                out=(y_out[: want * fy], u_out[: want * fc], v_out[: want * fc]))
        got_frames = want if pad_native else got
        frame_idxs = start + np.arange(L, dtype=np.int64) * stride
        if got_frames < L:
            mode = spec.GetArgument("pad_mode", None) or "edge"
            src = pad_indices(got_frames, L, mode)
            y3[got_frames:] = y3[src]
            u3[got_frames:] = u3[src]
            v3[got_frames:] = v3[src]
            if got_frames > 0:
                frame_idxs[got_frames:] = np.where(
                    src >= 0, frame_idxs[np.maximum(src, 0)], -1)
        return label, frame_idxs, fi

    def stage_batch_multi(self, ctx, ins, canvases):
        from .. import native
        from ..types import DALIDataType

        spec = self.spec
        dt = spec.GetArgument("dtype", None)
        if (spec.GetArgument("channels", 3) != 3
                or spec.GetArgument("normalized", False)
                or (dt is not None and int(dt) != int(DALIDataType.UINT8))
                or spec.GetArgument("pad_mode", None) in ("none", "constant")):
            return None
        # NB: all fallback decisions happen BEFORE consuming loader indices —
        # a bail-out after read_index() would skip samples.
        self._build_index()
        if self._corpus_pix is None:  # immutable after _build_index
            pix = set(self._pix.values())
            self._corpus_pix = pix.pop() if (len(pix) == 1 and 0 not in pix) else 0
        if self._corpus_pix == 0:
            return None  # non-4:2:0 (or mixed-format) corpus: dense RGB path
        full_range = self._corpus_pix == 2
        self._ensure_loader()
        L = spec.GetArgument("sequence_length")
        indices = [self._loader.read_index() for _ in range(ctx.batch_size)]
        n = len(indices)
        dims = [(L,) + self._dims[self._sequences[idx][0]] for idx in indices]
        results = [None] * n

        def decode_into(i, ys, us, vs, emit):
            results[i] = self._read_planes_into(indices[i], ys, us, vs)
            return emit

        try:
            outs = [stage_yuv_batch(self, dims, full_range, canvases[0],
                                    decode_into, map_indices=ctx.map_samples)]
        except native.VideoPixfmtChanged:
            # A mid-stream pixel-format change inside one FILE — the per-file
            # classes recorded at index-build time can't see it, so it only
            # surfaces here, AFTER the loader indices were consumed (returning
            # None would make run_batch re-read the loader and skip these
            # samples). Re-decode THIS batch densely from the same indices
            # (the RGB path swscales any format) and pin the reader to the
            # dense path for the rest of the run.
            self._corpus_pix = 0
            return self._dense_batch_from(ctx, indices)
        if self._has_labels():
            outs.append(HostBatch([np.array([r[0]], np.int32) for r in results]))
        if spec.GetArgument("enable_frame_num", False):
            outs.append(HostBatch(
                [np.array([int(r[1][0])], np.int32) for r in results]))
        if spec.GetArgument("enable_timestamps", False):
            ts_samples = []
            for r in results:
                fps = self._fps.get(r[2], 25.0)
                idxs = r[1]
                ts_samples.append(
                    np.where(idxs >= 0, idxs / fps, -1.0).astype(np.float64))
            outs.append(HostBatch(ts_samples))
        return outs


# ================================ experimental.inputs.Video =======================================

DALI_SCHEMA("experimental.inputs.Video").DocStr(
    """Feed-driven video input (reference ``video/input/video_input.h``): the
    user feeds ONE encoded video file via ``Pipeline.feed_input``; successive
    ``run()`` calls return batches of ``sequence_length``-frame [F,H,W,C]
    sequences until the file is consumed (the batch outline follows
    ``DetermineBatchOutline`` in video_input.h:52 — full batches, then one
    final batch holding the leftover full sequences plus a partial/padded
    one). The next fed file starts after the previous one is depleted."""
).NumInput(0).NumOutput(1).Devices("cpu", "mixed").MakeStateful().AddArg(
    "sequence_length", ArgType.INT, "Frames per returned sequence."
).AddOptionalArg(
    "last_sequence_policy", ArgType.STRING, "'partial' or 'pad'.", "partial"
).AddOptionalArg(
    "blocking", ArgType.BOOL, "Compatibility knob (feeding is synchronous here).", False
).AddOptionalArg("no_copy", ArgType.BOOL, "Zero-copy hint.", False)


class _VideoInputImpl(Operator):
    def __init__(self, spec, op_id):
        super().__init__(spec, op_id)
        policy = spec.GetArgument("last_sequence_policy", "partial")
        if policy not in ("partial", "pad"):
            raise ValueError(f"last_sequence_policy must be 'partial' or 'pad', got {policy!r}")
        self._policy = policy
        self._queue = []
        self._vf = None
        self._pos = 0
        self._tmp = None

    def feed(self, data, layout=None):
        """One feed = one encoded video file (bytes / uint8 array / 1-elem list)."""
        if isinstance(data, (list, tuple)):
            self._queue.extend(np.asarray(d, np.uint8).tobytes() for d in data)
        elif isinstance(data, (bytes, bytearray)):
            self._queue.append(bytes(data))
        else:
            self._queue.append(np.asarray(data, np.uint8).tobytes())

    def _open_next(self):
        import tempfile

        from ..native import VideoFile

        if not self._queue:
            raise RuntimeError(
                "inputs.video has no data; feed an encoded video via Pipeline.feed_input"
            )
        blob = self._queue.pop(0)
        self._tmp = tempfile.NamedTemporaryFile(suffix=".mp4", delete=False)
        self._tmp.write(blob)
        self._tmp.flush()
        self._vf = VideoFile(self._tmp.name)
        self._pos = 0

    def _close_current(self):
        if self._vf is not None:
            self._vf.close()
            self._vf = None
        if self._tmp is not None:
            try:
                os.unlink(self._tmp.name)
            except OSError:
                pass
            self._tmp = None

    def run_batch(self, ctx, *unused):
        if self._vf is None:
            self._open_next()
        L = self.spec.GetArgument("sequence_length")
        samples = []
        for _ in range(ctx.batch_size):
            remaining = self._vf.num_frames - self._pos
            if remaining <= 0:
                break
            take = min(L, remaining)
            frames = self._vf.read(self._pos, take)
            self._pos += take
            if take < L and self._policy == "pad":
                pad = np.zeros((L - take,) + frames.shape[1:], np.uint8)
                frames = np.concatenate([frames, pad], axis=0)
            samples.append(frames)
        if self._pos >= self._vf.num_frames:
            self._close_current()
        if not samples:  # fed an empty video
            raise RuntimeError("inputs.video: fed video has no frames")
        return [HostBatch(samples, layout="FHWC")]

    def output_layout(self, j, inputs):
        return "FHWC"

    def close(self):
        self._close_current()


@register_operator("experimental.inputs.Video", "cpu")
class VideoInputCPU(_VideoInputImpl):
    pass


@register_operator("experimental.inputs.Video", "mixed")
class VideoInputMixed(_VideoInputImpl):
    """device='mixed' (reference video_input_mixed.cc): sequences cross the
    boundary as padded device batches — for 4:2:0 sources as the planar YUV
    wire (half the RGB bytes; device BT.601, bit-equal to the cpu path —
    see VideoReaderMixed). 'pad' policy pads with YUV black (Y=16/0,
    U=V=128), which the integer conversion maps to exactly RGB 0 — the same
    bytes the cpu path's np.zeros padding produces."""

    def stage_batch_multi(self, ctx, ins, canvases):
        from .. import native

        if self._vf is None:
            self._open_next()
        pix = getattr(self._vf, "pixfmt_class", 0)
        if pix == 0:
            return None  # non-4:2:0 feed: dense RGB staging path
        full_range = pix == 2
        L = self.spec.GetArgument("sequence_length")
        h_, w_ = self._vf.height, self._vf.width
        ch, cw = (h_ + 1) // 2, (w_ + 1) // 2
        fy, fc = h_ * w_, ch * cw
        # batch outline first (DetermineBatchOutline): sizes known up front
        plan = []  # (start, take, emit) — emit = take, or L under 'pad'
        pos = self._pos
        for _ in range(ctx.batch_size):
            remaining = self._vf.num_frames - pos
            if remaining <= 0:
                break
            take = min(L, remaining)
            emit = L if (take < L and self._policy == "pad") else take
            plan.append((pos, take, emit))
            pos += take
        if not plan:
            raise RuntimeError("inputs.video: fed video has no frames")

        def decode_into(i, ys, us, vs, emit):
            start, take, _ = plan[i]
            # num_frames can be an estimate; pad=True repeats the last
            # decoded frame on a short read — same as the cpu path's read()
            self._vf.read_yuv(
                start, take, 1, pad=True,
                out=(ys[: take * fy], us[: take * fc], vs[: take * fc]))
            if emit > take:  # 'pad' policy: YUV black == RGB zeros exactly
                ys[take * fy:] = 0 if full_range else 16
                us[take * fc:] = 128
                vs[take * fc:] = 128
            return emit

        try:
            staged = stage_yuv_batch(self, [(e, h_, w_) for _, _, e in plan],
                                     full_range, canvases[0], decode_into)
        except native.VideoPixfmtChanged:
            # mid-stream pixel-format change: self._pos is still unadvanced,
            # so the dense RGB path (swscale handles any format) redoes this
            # exact batch — no frames are skipped or duplicated
            return None
        self._pos = pos
        if self._pos >= self._vf.num_frames:
            self._close_current()
        return [staged]

"""Planar YUV 4:2:0 video wire (round 4): readers.video device='mixed' ships
flat-packed Y/U/V planes (half the RGB24 wire) and converts on the device
with the SAME integer BT.601 arithmetic as the cpu reader's own host
conversion (video_decode.cc yuv420_frame_to_rgb == executor._yuv420_boundary)
— so cpu and mixed decode are bit-identical by construction.

Reference analogue: NVDEC emits YUV and DALI converts on the GPU
(dali/operators/video/color_space_conversion_impl.h)."""

import numpy as np
import pytest

import dali_tpu.fn as fn
from dali_tpu.pipeline import pipeline_def

from .test_utils import to_samples

cv2 = pytest.importorskip("cv2")


def _write_video(path, num_frames=12, w=64, h=48, fps=25, seed=0):
    rng = np.random.default_rng(seed)
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    assert wr.isOpened()
    base = rng.integers(0, 256, (h, w * 3, 3), np.uint8)
    for i in range(num_frames):
        wr.write(np.ascontiguousarray(base[:, i : i + w]))
    wr.release()
    return str(path)


def _pair(make_pipe):
    """Build the same pipeline on cpu and mixed; assert bit-equal runs."""
    pc, pm = make_pipe("cpu"), make_pipe("gpu")  # 'gpu' normalizes to mixed
    pc.build()
    pm.build()
    return pc, pm


def _assert_runs_equal(pc, pm, iters=3):
    for it in range(iters):
        outs_c, outs_m = pc.run(), pm.run()
        for j, (oc, om) in enumerate(zip(outs_c, outs_m)):
            sc, sm = to_samples(oc), to_samples(om)
            assert len(sc) == len(sm)
            for i, (a, b) in enumerate(zip(sc, sm)):
                a, b = np.asarray(a), np.asarray(b)
                assert a.shape == b.shape, (it, j, i, a.shape, b.shape)
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    # device floats are f32 (JAX x64 off) vs host f64 —
                    # value parity, not dtype parity (pre-existing device
                    # output contract, same as the dense RGB path)
                    np.testing.assert_allclose(
                        a.astype(np.float64), b.astype(np.float64),
                        rtol=1e-6, err_msg=f"iter {it} out {j} sample {i}")
                else:
                    np.testing.assert_array_equal(
                        a, b, err_msg=f"iter {it} out {j} sample {i}")


def test_yuv_wire_bit_equal_ragged_shuffled(tmp_path):
    a = _write_video(tmp_path / "a.mp4", w=64, h=48, seed=1)
    b = _write_video(tmp_path / "b.mp4", w=80, h=56, seed=2)

    def make(device):
        @pipeline_def(batch_size=4, num_threads=2, seed=7)
        def pipe():
            f, lab = fn.readers.video(
                filenames=[a, b], labels=[3, 9], sequence_length=4,
                random_shuffle=True, device=device, name="v")
            return f, lab
        return pipe()

    _assert_runs_equal(*_pair(make), iters=4)


def test_yuv_wire_frame_num_timestamps_stride(tmp_path):
    vid = _write_video(tmp_path / "v.mp4", num_frames=20, fps=10, seed=3)

    def make(device):
        @pipeline_def(batch_size=2, num_threads=1, seed=5)
        def pipe():
            f, fnum, ts = fn.readers.video(
                filenames=[vid], sequence_length=3, stride=2, step=4,
                enable_frame_num=True, enable_timestamps=True,
                device=device, name="v")
            return f, fnum, ts
        return pipe()

    _assert_runs_equal(*_pair(make), iters=3)


def test_yuv_wire_padded_tail_reflect(tmp_path):
    vid = _write_video(tmp_path / "v.mp4", num_frames=7, fps=10, seed=4)

    def make(device):
        @pipeline_def(batch_size=1, num_threads=1, seed=5)
        def pipe():
            return fn.readers.video(
                filenames=[vid], sequence_length=4, step=4,
                pad_mode="reflect_101", device=device, name="v")
        return pipe()

    _assert_runs_equal(*_pair(make), iters=2)  # second batch is the padded tail


def test_yuv_wire_uniform_sample(tmp_path):
    vid = _write_video(tmp_path / "v.mp4", num_frames=15, seed=5)

    def make(device):
        @pipeline_def(batch_size=1, num_threads=1, seed=5)
        def pipe():
            return fn.readers.video(
                filenames=[vid], sequence_length=5, uniform_sample=True,
                device=device, name="v")
        return pipe()

    _assert_runs_equal(*_pair(make), iters=1)


def test_yuv_wire_fallback_paths_still_work(tmp_path):
    """normalized / constant pad fall back to the dense RGB staging — both
    must keep producing (values then follow the float conversion of the SAME
    own-conversion RGB, so cpu/mixed still agree)."""
    vid = _write_video(tmp_path / "v.mp4", num_frames=6, seed=6)

    def make(device):
        @pipeline_def(batch_size=1, num_threads=1, seed=5)
        def pipe():
            return fn.readers.video(
                filenames=[vid], sequence_length=4, step=4, normalized=True,
                pad_mode="constant", fill_value=[7], device=device, name="v")
        return pipe()

    pc, pm = _pair(make)
    for _ in range(2):
        (oc,), (om,) = pc.run(), pm.run()
        for a, b in zip(to_samples(oc), to_samples(om)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_yuv_wire_matches_native_formula(tmp_path):
    """The end-to-end mixed output equals a from-scratch numpy rendering of
    the documented conversion contract (limited-range BT.601, nearest chroma
    upsample) applied to the raw planes — an independent check that BOTH
    paths implement the stated formula, not merely the same bug."""
    from dali_tpu import native

    vid = _write_video(tmp_path / "v.mp4", num_frames=4, w=64, h=48, seed=8)
    vf = native.VideoFile(vid)
    assert vf.pixfmt_class in (1, 2)
    y, u, v, _ = vf.read_yuv(0, 2)
    u2 = np.repeat(np.repeat(u, 2, 1), 2, 2)[:, : y.shape[1], : y.shape[2]].astype(np.int32) - 128
    v2 = np.repeat(np.repeat(v, 2, 1), 2, 2)[:, : y.shape[1], : y.shape[2]].astype(np.int32) - 128
    if vf.pixfmt_class == 2:
        Y = 256 * y.astype(np.int32)
        r, g, b = (Y + 359 * v2 + 128) >> 8, (Y - 88 * u2 - 183 * v2 + 128) >> 8, (Y + 454 * u2 + 128) >> 8
    else:
        C = 298 * (y.astype(np.int32) - 16)
        r, g, b = (C + 409 * v2 + 128) >> 8, (C - 100 * u2 - 208 * v2 + 128) >> 8, (C + 516 * u2 + 128) >> 8
    want = np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)
    vf.close()

    @pipeline_def(batch_size=1, num_threads=1, seed=5)
    def pipe():
        return fn.readers.video(filenames=[vid], sequence_length=2,
                                device="mixed", name="v")

    p = pipe()
    p.build()
    (f,) = p.run()
    got = np.asarray(to_samples(f)[0])
    np.testing.assert_array_equal(got, want)


def test_yuv_wire_file_list_range_limit(tmp_path):
    """file_list frame ranges clamp reads (want < L): the tail past the
    range end must be PADDED, not read — on both wires, bit-equally."""
    vid = _write_video(tmp_path / "v.mp4", num_frames=16, fps=10, seed=10)
    fl = tmp_path / "list.txt"
    fl.write_text(f"{vid} 5 2 10\n")  # label 5, frames [2, 10) under "frames"

    def make(device):
        @pipeline_def(batch_size=2, num_threads=1, seed=5)
        def pipe():
            f, lab = fn.readers.video(
                file_list=str(fl), file_list_format="frames",
                file_list_include_end=False, sequence_length=5, step=5,
                device=device, name="v")
            return f, lab
        return pipe()

    _assert_runs_equal(*_pair(make), iters=2)


def test_yuv_wire_inputs_video(tmp_path):
    """Feed-driven inputs.video mixed rides the YUV wire too; the 'pad'
    policy's zero frames survive bit-exactly (YUV black -> RGB 0)."""
    vid = _write_video(tmp_path / "v.mp4", num_frames=10, seed=9)
    blob = open(vid, "rb").read()

    def make(device):
        @pipeline_def(batch_size=2, num_threads=1, seed=1)
        def pipe():
            return fn.experimental.inputs.video(
                sequence_length=4, name="vin", last_sequence_policy="pad",
                device=device)
        return pipe()

    pc, pm = make("cpu"), make("mixed")
    pc.build()
    pm.build()
    pc.feed_input("vin", blob)
    pm.feed_input("vin", blob)
    for _ in range(2):  # second batch holds the zero-padded tail
        sc = to_samples(pc.run()[0])
        sm = to_samples(pm.run()[0])
        assert len(sc) == len(sm)
        for a, b in zip(sc, sm):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # partial policy: ragged last sample
    def make_partial(device):
        @pipeline_def(batch_size=2, num_threads=1, seed=1)
        def pipe():
            return fn.experimental.inputs.video(
                sequence_length=4, name="vin", last_sequence_policy="partial",
                device=device)
        return pipe()

    pc2, pm2 = make_partial("cpu"), make_partial("mixed")
    pc2.build()
    pm2.build()
    pc2.feed_input("vin", blob)
    pm2.feed_input("vin", blob)
    for _ in range(2):
        sc = to_samples(pc2.run()[0])
        sm = to_samples(pm2.run()[0])
        for a, b in zip(sc, sm):
            assert np.asarray(a).shape == np.asarray(b).shape
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_yuv_wire_decoders_video(tmp_path):
    """decoders.Video mixed rides the YUV wire: whole-file decode, per-sample
    tensor start/sequence_length, EOF padding — bit-equal to cpu."""
    a = _write_video(tmp_path / "a.mp4", num_frames=8, w=64, h=48, seed=11)
    b = _write_video(tmp_path / "b.mp4", num_frames=6, w=80, h=56, seed=12)
    blobs = [np.frombuffer(open(p, "rb").read(), np.uint8) for p in (a, b)]

    def make(device, **kw):
        @pipeline_def(batch_size=2, num_threads=1, seed=5)
        def pipe():
            buf = fn.external_source(source=lambda: blobs, batch=True, cycle=True)
            return fn.decoders.video(buf, device=device, **kw)
        return pipe()

    # whole-file decode (ragged F per sample)
    for kw in (
        {},
        {"start_frame": 2, "sequence_length": 3},
        {"sequence_length": 10, "pad_mode": "edge"},   # EOF padding
        {"sequence_length": 10},                       # constant zero pad
        {"sequence_length": 10, "pad_mode": "none"},   # short emit
        {"start_frame": 1, "sequence_length": 3, "stride": 2},
    ):
        pc, pm = make("cpu", **kw), make("mixed", **kw)
        pc.build()
        pm.build()
        sc = to_samples(pc.run()[0])
        sm = to_samples(pm.run()[0])
        for i, (x, y) in enumerate(zip(sc, sm)):
            x, y = np.asarray(x), np.asarray(y)
            assert x.shape == y.shape, (kw, i, x.shape, y.shape)
            np.testing.assert_array_equal(x, y, err_msg=str((kw, i)))


def test_yuv_wire_debug_mode_and_serialize_roundtrip(tmp_path):
    """debug=True (eager, un-jitted device program) and a serialize →
    deserialize round trip both execute the YUV boundary identically."""
    vid = _write_video(tmp_path / "v.mp4", num_frames=8, seed=13)

    @pipeline_def(batch_size=2, num_threads=1, seed=3)
    def pipe():
        return fn.readers.video(filenames=[vid], sequence_length=3,
                                device="mixed", name="v")

    p = pipe()
    p.build()
    want = [np.asarray(x) for x in to_samples(p.run()[0])]

    pdbg = pipe(debug=True)
    pdbg.build()
    got = [np.asarray(x) for x in to_samples(pdbg.run()[0])]
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a, b)

    from dali_tpu.pipeline import Pipeline

    blob = p.serialize()
    p2 = Pipeline.deserialize(blob, batch_size=2, num_threads=1, seed=3)
    p2.build()
    got2 = [np.asarray(x) for x in to_samples(p2.run()[0])]
    for a, b in zip(want, got2):
        np.testing.assert_array_equal(a, b)


def _write_avi(path, fourcc, num_frames=6, w=64, h=48, seed=20):
    rng = np.random.default_rng(seed)
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*fourcc), 25, (w, h))
    if not wr.isOpened():
        pytest.skip(f"cv2 cannot write {fourcc}")
    base = rng.integers(0, 256, (h, w * 2, 3), np.uint8)
    for i in range(num_frames):
        wr.write(np.ascontiguousarray(base[:, i : i + w]))
    wr.release()
    return str(path)


def test_yuv_wire_full_range_source(tmp_path):
    """MJPEG AVIs decode as FULL-RANGE 4:2:0 (yuvj420p): the full-range
    integer BT.601 variant must hold cpu/mixed bit-parity too."""
    from dali_tpu import native

    vid = _write_avi(tmp_path / "v.avi", "MJPG", num_frames=8)
    vf = native.VideoFile(vid)
    pc = vf.pixfmt_class
    vf.close()
    if pc != 2:
        pytest.skip("MJPG did not produce a full-range 4:2:0 stream here")

    def make(device):
        @pipeline_def(batch_size=2, num_threads=1, seed=5)
        def pipe():
            return fn.readers.video(filenames=[vid], sequence_length=3,
                                    device=device, name="v")
        return pipe()

    _assert_runs_equal(*_pair(make), iters=2)


def test_yuv_wire_dense_alternation(tmp_path):
    """A batch stream that ALTERNATES between the YUV wire and the dense RGB
    fallback on the same edge must not corrupt the executor's grow-only
    canvas (the YUV canvas is carried 4-dim for rank compatibility)."""
    from dali_tpu import native

    p420 = _write_video(tmp_path / "a.mp4", num_frames=6, seed=21)
    pflat = _write_avi(tmp_path / "b.avi", "HFYU", num_frames=6, seed=22)
    vf = native.VideoFile(pflat)
    if vf.pixfmt_class != 0:
        vf.close()
        pytest.skip("HFYU did not produce a non-4:2:0 stream here")
    vf.close()
    blobs_420 = [np.frombuffer(open(p420, "rb").read(), np.uint8)] * 2
    blobs_flat = [np.frombuffer(open(pflat, "rb").read(), np.uint8)] * 2
    batches = [blobs_420, blobs_flat, blobs_420, blobs_flat]

    def make(device):
        it = iter(batches)

        @pipeline_def(batch_size=2, num_threads=1, seed=5)
        def pipe():
            buf = fn.external_source(source=lambda: next(it), batch=True)
            return fn.decoders.video(buf, sequence_length=3, device=device)
        return pipe()

    pc, pm = make("cpu"), make("mixed")
    pc.build()
    pm.build()
    for b in range(len(batches)):
        sc = to_samples(pc.run()[0])
        sm = to_samples(pm.run()[0])
        for i, (a, g) in enumerate(zip(sc, sm)):
            a, g = np.asarray(a), np.asarray(g)
            assert a.shape == g.shape, (b, i, a.shape, g.shape)
            np.testing.assert_array_equal(a, g, err_msg=f"batch {b} sample {i}")

    # same alternation through the feed-driven input
    @pipeline_def(batch_size=4, num_threads=1, seed=5)
    def pin():
        return fn.experimental.inputs.video(sequence_length=3, name="vin",
                                            device="mixed")

    @pipeline_def(batch_size=4, num_threads=1, seed=5)
    def pin_cpu():
        return fn.experimental.inputs.video(sequence_length=3, name="vin",
                                            device="cpu")

    pm2, pc2 = pin(), pin_cpu()
    pm2.build()
    pc2.build()
    for blob in (open(p420, "rb").read(), open(pflat, "rb").read(),
                 open(p420, "rb").read()):
        pm2.feed_input("vin", blob)
        pc2.feed_input("vin", blob)
        sm = to_samples(pm2.run()[0])
        sc = to_samples(pc2.run()[0])
        for a, g in zip(sc, sm):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(g))


def test_yuv_wire_huge_shrink_request_stays_bounded(tmp_path):
    """sequence_length far beyond the clip with pad_mode='none' must plan
    the wire near the clip's real length (header estimate +2), not ship a
    huge mostly-uninitialized buffer — and still match cpu (review r4c)."""
    vid = _write_video(tmp_path / "v.mp4", num_frames=6, seed=30)

    def make(device):
        @pipeline_def(batch_size=1, num_threads=1, seed=5)
        def pipe():
            buf = fn.external_source(
                source=lambda: [np.frombuffer(open(vid, "rb").read(), np.uint8)],
                batch=True, cycle=True)
            return fn.decoders.video(buf, sequence_length=100000,
                                     pad_mode="none", device=device)
        return pipe()

    pc, pm = make("cpu"), make("mixed")
    pc.build()
    pm.build()
    a = np.asarray(to_samples(pc.run()[0])[0])
    b = np.asarray(to_samples(pm.run()[0])[0])
    assert a.shape == b.shape and a.shape[0] == 6
    np.testing.assert_array_equal(a, b)


def test_read_yuv_pixfmt_change_raises_distinct_error(tmp_path):
    """video_decode.cc returns -2 - got on a mid-stream pixel-format change
    (NEVER the EOF shape); the wrapper surfaces it as VideoPixfmtChanged
    carrying the frames decoded so far (advisor r4)."""
    from dali_tpu.native import VideoFile, VideoPixfmtChanged

    vid = _write_video(tmp_path / "v.mp4", num_frames=6, seed=40)
    vf = VideoFile(vid)

    class _Shim:
        def __init__(self, real):
            self._real = real

        def __getattr__(self, n):
            return getattr(self._real, n)

        def dali_tpu_video_read_frames_yuv(self, *a):
            return -5  # format change after 3 frames

    vf._lib = _Shim(vf._lib)
    with pytest.raises(VideoPixfmtChanged) as ei:
        vf.read_yuv(0, 4)
    assert ei.value.got == 3
    vf._lib = vf._lib._real
    vf.close()


def test_yuv_wire_pixfmt_change_falls_back_to_dense(tmp_path, monkeypatch):
    """A VideoPixfmtChanged mid-staging must drop decoders.Video mixed (and
    inputs.video mixed) to the dense RGB path — same output as cpu, no
    silent repeated-frame padding (advisor r4)."""
    from dali_tpu.native import VideoFile, VideoPixfmtChanged

    vid = _write_video(tmp_path / "v.mp4", num_frames=8, seed=41)
    blob = open(vid, "rb").read()

    def boom(self, *a, **kw):
        raise VideoPixfmtChanged(self.path, 0)

    monkeypatch.setattr(VideoFile, "read_yuv", boom)

    def make_dec(device):
        @pipeline_def(batch_size=1, num_threads=1, seed=5)
        def pipe():
            buf = fn.external_source(
                source=lambda: [np.frombuffer(blob, np.uint8)],
                batch=True, cycle=True)
            return fn.decoders.video(buf, sequence_length=4, device=device)
        return pipe()

    pc, pm = make_dec("cpu"), make_dec("mixed")
    pc.build()
    pm.build()
    a = np.asarray(to_samples(pc.run()[0])[0])
    b = np.asarray(to_samples(pm.run()[0])[0])
    assert a.shape == b.shape
    np.testing.assert_array_equal(a, b)

    def make_in(device):
        @pipeline_def(batch_size=2, num_threads=1, seed=1)
        def pipe():
            return fn.experimental.inputs.video(
                sequence_length=4, name="vin", last_sequence_policy="pad",
                device=device)
        return pipe()

    pc2, pm2 = make_in("cpu"), make_in("mixed")
    pc2.build()
    pm2.build()
    pc2.feed_input("vin", blob)
    pm2.feed_input("vin", blob)
    sc = to_samples(pc2.run()[0])
    sm = to_samples(pm2.run()[0])
    for x, y in zip(sc, sm):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_yuv_wire_undercounting_estimate_emits_all_frames(tmp_path, monkeypatch):
    """When the container's num_frames ESTIMATE undercounts by more than the
    +2 plan slack (bad duration metadata / VFR), a completely-filled shrink
    plan probes one frame past the cap and falls back to the dense path, so
    mixed emits every real frame exactly like cpu (advisor r4)."""
    from dali_tpu.native import VideoFile

    vid = _write_video(tmp_path / "v.mp4", num_frames=10, seed=42)
    blob = open(vid, "rb").read()

    orig_init = VideoFile.__init__

    def bad_meta_init(self, path):
        orig_init(self, path)
        self.num_frames = max(self.num_frames - 5, 1)  # estimate 5 short

    monkeypatch.setattr(VideoFile, "__init__", bad_meta_init)

    def make(device):
        @pipeline_def(batch_size=1, num_threads=1, seed=5)
        def pipe():
            buf = fn.external_source(
                source=lambda: [np.frombuffer(blob, np.uint8)],
                batch=True, cycle=True)
            return fn.decoders.video(buf, sequence_length=100000,
                                     pad_mode="none", device=device)
        return pipe()

    pc, pm = make("cpu"), make("mixed")
    pc.build()
    pm.build()
    a = np.asarray(to_samples(pc.run()[0])[0])
    b = np.asarray(to_samples(pm.run()[0])[0])
    assert a.shape[0] == 10, a.shape  # cpu reads to EOF: all real frames
    assert a.shape == b.shape
    np.testing.assert_array_equal(a, b)


def test_reader_mixed_pixfmt_change_redecodes_same_samples(tmp_path, monkeypatch):
    """readers.Video mixed consumes loader indices BEFORE staging, so a
    VideoPixfmtChanged mid-staging must re-decode THOSE samples densely
    (not bail to run_batch, which would re-read the loader and skip them)
    and pin later batches to the dense path (review r5)."""
    from dali_tpu.native import VideoFile, VideoPixfmtChanged

    a = _write_video(tmp_path / "a.mp4", num_frames=8, seed=51)
    b = _write_video(tmp_path / "b.mp4", num_frames=8, seed=52)

    def make(device):
        @pipeline_def(batch_size=2, num_threads=1, seed=9)
        def pipe():
            f, lab = fn.readers.video(
                filenames=[a, b], labels=[3, 9], sequence_length=4,
                random_shuffle=True, initial_fill=4, device=device, name="v")
            return f, lab
        return pipe()

    pc, pm = make("cpu"), make("mixed")
    pc.build()
    pm.build()

    orig = VideoFile.read_yuv

    def boom(self, *args, **kw):
        raise VideoPixfmtChanged(self.path, 0)

    monkeypatch.setattr(VideoFile, "read_yuv", boom)
    # identical seeds => identical shuffled index sequences; if the mixed
    # reader dropped the consumed indices, frames AND labels would diverge
    # from cpu on this and every later iteration
    for _ in range(3):
        outs_c, outs_m = pc.run(), pm.run()
        for oc, om in zip(outs_c, outs_m):
            for x, y in zip(to_samples(oc), to_samples(om)):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    monkeypatch.setattr(VideoFile, "read_yuv", orig)


def test_decoder_shrink_exact_request_stays_on_yuv_wire(tmp_path):
    """pad_mode='none' with a sequence_length fully satisfied by a longer
    clip must NOT probe past the plan (the probe would find a next frame on
    every normal clip and bounce the batch to the dense RGB path forever) —
    exactly one read_yuv per sample, zero dense RGB reads (review r5)."""
    from dali_tpu.native import VideoFile

    vid = _write_video(tmp_path / "v.mp4", num_frames=12, seed=53)
    blob = open(vid, "rb").read()
    calls = {"yuv": 0, "rgb": 0}
    orig_yuv, orig_rgb = VideoFile.read_yuv, VideoFile.read

    def count_yuv(self, *a, **kw):
        calls["yuv"] += 1
        return orig_yuv(self, *a, **kw)

    def count_rgb(self, *a, **kw):
        calls["rgb"] += 1
        return orig_rgb(self, *a, **kw)

    VideoFile.read_yuv, VideoFile.read = count_yuv, count_rgb
    try:
        def make(device):
            @pipeline_def(batch_size=1, num_threads=1, seed=5)
            def pipe():
                buf = fn.external_source(
                    source=lambda: [np.frombuffer(blob, np.uint8)],
                    batch=True, cycle=True)
                return fn.decoders.video(buf, sequence_length=4,
                                         pad_mode="none", device=device)
            return pipe()

        pm = make("mixed")
        pm.build()
        out = to_samples(pm.run()[0])[0]
        assert np.asarray(out).shape[0] == 4
        assert calls["rgb"] == 0, "bounced to the dense RGB path"
        assert calls["yuv"] == 1, f"extra probe read: {calls['yuv']}"
        # and the pixels still match cpu
        pc = make("cpu")
        pc.build()
        ref = to_samples(pc.run()[0])[0]
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    finally:
        VideoFile.read_yuv, VideoFile.read = orig_yuv, orig_rgb


def _write_ts(path, w, h, num_frames, seed):
    """One MPEG-TS segment via cv2 (FFmpeg backend picks a TS-legal codec).
    TS is byte-concatenable, so two segments with different dimensions make a
    REAL mid-stream reconfiguration — no shimming of return codes."""
    rng = np.random.default_rng(seed)
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mpg2"), 25, (w, h))
    if not wr.isOpened():
        return None
    for _ in range(num_frames):
        wr.write(rng.integers(0, 255, (h, w, 3), np.uint8))
    wr.release()
    import os

    return str(path) if os.path.getsize(path) > 0 else None


def test_real_midstream_reconfiguration_spliced_ts(tmp_path):
    """A REAL mid-stream decoder reconfiguration (two byte-concatenated
    MPEG-TS segments with different frame dimensions) must surface as
    VideoPixfmtChanged from read_yuv — this requires comparing the frame
    against the OPEN-TIME contract snapshot, because FFmpeg updates the live
    codec context to the new parameters on reconfiguration, so a live
    comparison can never fire (review r5; the older tests shim the return
    code and would not catch that). The mixed pipeline must then fall back
    to the dense path and stay bit-equal to cpu."""
    from dali_tpu.native import VideoFile, VideoPixfmtChanged

    a = _write_ts(tmp_path / "a.ts", 64, 48, 10, seed=50)
    b = _write_ts(tmp_path / "b.ts", 32, 24, 10, seed=51)
    if not (a and b):
        pytest.skip("cv2 build cannot write MPEG-TS")
    spliced = tmp_path / "ab.ts"
    spliced.write_bytes(open(a, "rb").read() + open(b, "rb").read())

    vf = VideoFile(str(spliced))
    try:
        # the open-time contract is the FIRST segment's
        assert (vf.width, vf.height) == (64, 48)
        if vf.pixfmt_class == 0:
            pytest.skip("cv2's TS codec is not 4:2:0 here; wire path unused")
        with pytest.raises(VideoPixfmtChanged) as ei:
            vf.read_yuv(0, 20, 1, pad=True)
        assert 0 < ei.value.got < 20  # real frames decoded before the splice
    finally:
        vf.close()

    blob = open(spliced, "rb").read()

    def make(device):
        @pipeline_def(batch_size=1, num_threads=1, seed=5)
        def pipe():
            buf = fn.external_source(
                source=lambda: [np.frombuffer(blob, np.uint8)],
                batch=True, cycle=True)
            return fn.decoders.video(buf, sequence_length=20, device=device)
        return pipe()

    pc, pm = make("cpu"), make("mixed")
    pc.build()
    pm.build()
    x = np.asarray(to_samples(pc.run()[0])[0])
    y = np.asarray(to_samples(pm.run()[0])[0])
    assert x.shape == y.shape
    np.testing.assert_array_equal(x, y)
